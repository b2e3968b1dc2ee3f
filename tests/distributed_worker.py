"""Worker for the real multi-process jax.distributed test (launched by
tests/test_distributed.py, one process per 'host'): initializes the
coordinator path in parallel/distributed.py, builds the global mesh,
renders a sharded cornell and runs one sharded PRB train step, then
prints machine-readable results for the parent to compare against the
single-process 8-device run."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    # initialize BEFORE importing the package: module-level jnp
    # constants (core/spectrum.py tables) would initialise the XLA
    # backend first. Load the real parallel/distributed.py standalone —
    # it is self-contained — so the coordinator branch under test is
    # the shipped code.
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mi3t_distributed",
        os.path.join(root, "mitsuba3_tpu", "parallel", "distributed.py"))
    dist = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dist)
    dist.initialize(coordinator=f"127.0.0.1:{port}", num_processes=2,
                    process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    import optax

    import mitsuba3_tpu as mi
    from mitsuba3_tpu.parallel import train_step_sharded

    d = mi.cornell_box(width=16, height=16, max_depth=2)
    d["integrator"] = {"type": "prb", "max_depth": 2}
    scene = mi.load_dict(d)

    def params_fn(s, p):
        if p is None:
            return {"em_radiance": s.em_radiance}
        return s.replace(em_radiance=p["em_radiance"])

    mesh = dist.global_mesh()
    assert mesh.shape == {"hosts": 2, "chips": 4}
    target = jnp.zeros((16, 16, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = params_fn(scene, None)
    opt_state = optimizer.init(params)
    new_params, _, loss = train_step_sharded(
        scene, mesh, target, opt_state, optimizer, params_fn,
        seed=7, spp=1)
    em = np.asarray(new_params["em_radiance"]).reshape(-1)
    print(f"DIST_RESULT rank={rank} loss={float(loss):.9e} "
          f"em={' '.join(f'{x:.9e}' for x in em)}", flush=True)


if __name__ == "__main__":
    main()
