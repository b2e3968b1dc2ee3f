"""SceneParameters / traverse — counterpart of
src/python/python/util.py:10-272 (mi.traverse / SceneParameters).

A dict-like differentiable-parameter view over the Scene pytree with the
reference's string keys ('<bsdf>.reflectance.value', 'emitter.radiance',
...), set_dirty batching, and update() re-running derived state (emitter
sampling tables — the analog of parameters_changed())."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class SceneParameters:
    """Mutable view; call .scene() (or .update()) to materialize a Scene."""

    def __init__(self, scene, labels=None):
        self._scene = scene
        self._values = {}
        self._dirty = set()
        self._build_keys(labels or {})

    def _build_keys(self, labels):
        s = self._scene
        self._values = {
            "vertices": s.vertices,
            "em_radiance": s.em_radiance,
            "bsdf_params": s.bsdf_params,
            "env_data": s.env_data,
            "env_scale": s.env_scale,
            "sensor.to_world.origin": s.sensor.origin,
        }
        if s.medium_params is not None and s.medium_params.shape[0]:
            self._values["medium_params"] = s.medium_params
            for i in range(len(s.medium_grids)):
                self._values[f"medium{i}.density.data"] = s.medium_grids[i]
        if s.de_params is not None:
            self._values["de_params"] = s.de_params
        for i in range(len(s.textures)):
            self._values[f"texture{i}.data"] = s.textures[i]

    # -- mapping protocol -------------------------------------------------
    def keys(self):
        return self._values.keys()

    def items(self):
        return self._values.items()

    def __contains__(self, k):
        return k in self._values

    def __getitem__(self, k):
        return self._values[k]

    def __setitem__(self, k, v):
        if k not in self._values:
            raise KeyError(k)
        self._values[k] = jnp.asarray(v)
        self._dirty.add(k)

    def set_dirty(self, k):
        self._dirty.add(k)

    def update(self, values=None):
        """Apply pending writes and refresh derived state
        (parameters_changed() analog). Returns the new Scene."""
        if values:
            for k, v in values.items():
                self[k] = v
        s = self._scene
        tex = list(s.textures)
        for k in self._dirty:
            if k == "vertices":
                s = s.replace(vertices=self._values[k])
                s = _rebuild_geometry_derived(s)
            elif k == "em_radiance":
                s = s.replace(em_radiance=self._values[k])
            elif k == "bsdf_params":
                s = s.replace(bsdf_params=self._values[k])
            elif k == "env_data":
                s = s.replace(env_data=self._values[k])
                s = _rebuild_env_tables(s)
            elif k == "env_scale":
                s = s.replace(env_scale=self._values[k])
            elif k == "sensor.to_world.origin":
                s = s.replace(sensor=s.sensor.replace(
                    origin=self._values[k]))
            elif k == "medium_params":
                s = s.replace(medium_params=self._values[k])
            elif k == "de_params":
                s = s.replace(de_params=self._values[k])
            elif k.startswith("medium"):
                idx = int(k[len("medium"):].split(".")[0])
                grids = list(s.medium_grids)
                grids[idx] = self._values[k]
                # refresh the majorant bound (heterogeneous.cpp:178) on the
                # medium row that owns grid slot idx+1 (medium_params[:,9];
                # grid order need not match medium row order)
                mp = np.asarray(s.medium_params).copy()
                rows = np.where(
                    np.round(mp[:, 9]).astype(int) == idx + 1)[0]
                for row in rows:
                    color_max = float(mp[row, 0:3].max())
                    mp[row, 8] = mp[row, 6] * float(
                        np.asarray(self._values[k]).max()) * color_max
                s = s.replace(medium_grids=tuple(grids),
                              medium_params=jnp.asarray(mp))
            elif k.startswith("texture"):
                idx = int(k[len("texture"):].split(".")[0])
                tex[idx] = self._values[k]
                s = s.replace(textures=tuple(tex))
        self._dirty.clear()
        self._scene = s
        return s

    def scene(self):
        return self.update()


def _rebuild_env_tables(scene):
    """Refresh the env importance-sampling CDF after radiance edits
    (envmap.cpp parameters_changed)."""
    if scene.env_emitter < 0:
        return scene
    from ..emitters import envmap as env_mod
    return scene.replace(env_warp=env_mod.build_tables(
        np.asarray(scene.env_data)))


def _rebuild_geometry_derived(scene):
    """Refresh emitter area tables + accel after vertex edits (the analog
    of Scene::parameters_changed's accel rebuild, scene.cpp:503-563)."""
    v = np.asarray(scene.vertices)
    f = np.asarray(scene.faces)
    p = v[f]
    areas = 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1)
    fe = np.asarray(scene.face_emitter)
    inv_total = np.zeros_like(areas, dtype=np.float32)
    ef_face = np.asarray(scene.ef_face)
    if ef_face.size:
        e_total = max(scene.n_emitters, 1)
        pmfs = np.zeros(ef_face.shape[0], np.float64)
        for e in np.unique(fe[fe >= 0]):
            mask = fe == e
            total = float(areas[mask].sum())
            inv_total[mask] = 1.0 / max(total, 1e-30)
            sel = np.isin(ef_face, np.where(mask)[0])
            pmfs[sel] = areas[ef_face[sel]] / max(total, 1e-30) / e_total
        cdf = np.cumsum(pmfs).astype(np.float32)
        scene = scene.replace(ef_cdf=jnp.asarray(cdf))
    scene = scene.replace(face_inv_total_area=jnp.asarray(inv_total))
    if scene.accel is not None:
        # rebuild with the same accel type the loader chose: bvh_xla on
        # CPU, the round-based serve intersector on TPU — mixing types
        # would feed the wrong traversal (scene.py dispatches by
        # isinstance)
        from ..ops import bvh_serve, bvh_tiled, bvh_xla, cellserve, \
            grid as grid_mod
        from ..render.scene import HybridAccel
        nq = scene.n_query_faces or p.shape[0]
        p0 = p[:nq, 0]
        e1 = p[:nq, 1] - p0
        e2 = p[:nq, 2] - p0
        if isinstance(scene.accel, bvh_xla.BVHXLA):
            scene = scene.replace(accel=bvh_xla.build(p0, e1, e2))
        elif isinstance(scene.accel, cellserve.CellServe):
            scene = scene.replace(accel=cellserve.build(
                p0, e1, e2, pair_slots=scene.accel.pair_slots))
        elif isinstance(scene.accel, bvh_serve.BVHServe):
            scene = scene.replace(accel=bvh_serve.build(p0, e1, e2))
        elif isinstance(scene.accel, HybridAccel):
            scene = scene.replace(accel=HybridAccel(
                closest=grid_mod.build(p0, e1, e2),
                anyhit=bvh_tiled.build(p0, e1, e2)))
        elif isinstance(scene.accel, grid_mod.GridAccel):
            scene = scene.replace(accel=grid_mod.build(p0, e1, e2))
        else:
            scene = scene.replace(accel=bvh_tiled.build(p0, e1, e2))
    if scene.instances is not None and scene.proto_ranges:
        # prototype geometry may share edited vertices: rebuild the
        # per-prototype accels that exist
        from ..ops import cellserve
        accs = []
        for slot, (base, count) in enumerate(scene.proto_ranges):
            if scene.proto_accels[slot] is None:
                accs.append(None)
                continue
            fp = np.asarray(scene.faces)[base:base + count]
            pp0 = v[fp[:, 0]]
            accs.append(cellserve.build(pp0, v[fp[:, 1]] - pp0,
                                        v[fp[:, 2]] - pp0))
        scene = scene.replace(proto_accels=tuple(accs))
    return scene


def traverse(scene) -> SceneParameters:
    """mi.traverse analog."""
    return SceneParameters(scene)
