"""Inventory tripwire: every plugin name the reference ships
(src/<family>/*.cpp plus the Python AD integrators) must be handled
somewhere in this package, under its reference spelling or a documented
alias. This is a static check — each plugin's behavior is covered by its
own functional tests across the suite; this test exists so that dropping
or renaming a plugin's spec handling fails loudly and the component
inventory stays checkable line by line (SURVEY.md section 2.5)."""
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "mitsuba3_tpu"

# reference plugin names by family (ls /root/reference/src/<family>)
REFERENCE_PLUGINS = {
    "integrators": [
        "aov", "depth", "direct", "moment", "path", "ptracer", "stokes",
        "volpath", "volpathmis",
        # python AD integrators (src/python/python/ad/integrators)
        "prb", "prb_basic", "prbvolpath", "direct_projective",
        "prb_projective", "volprim_rf_basic",
    ],
    "bsdfs": [
        "blendbsdf", "bumpmap", "circular", "conductor", "dielectric",
        "diffuse", "hair", "mask", "measured", "measured_polarized",
        "normalmap", "null", "plastic", "polarizer", "pplastic",
        "principled", "principledthin", "retarder", "roughconductor",
        "roughdielectric", "roughplastic", "thindielectric", "twosided",
    ],
    "shapes": [
        "bsplinecurve", "cube", "cylinder", "disk", "ellipsoids",
        "ellipsoidsmesh", "instance", "linearcurve", "merge", "obj",
        "ply", "rectangle", "sdfgrid", "serialized", "shapegroup",
        "sphere",
    ],
    "emitters": [
        "area", "constant", "directional", "directionalarea", "envmap",
        "point", "projector", "spot", "sunsky", "timed_sunsky",
    ],
    "sensors": [
        "batch", "distant", "irradiancemeter", "orthographic",
        "perspective", "radiancemeter", "thinlens",
    ],
    "films": ["hdrfilm", "specfilm"],
    "rfilters": ["box", "catmullrom", "gaussian", "lanczos", "mitchell",
                 "tent"],
    "samplers": ["independent", "ldsampler", "multijitter", "orthogonal",
                 "stratified"],
    "textures": ["bitmap", "checkerboard", "mesh_attribute", "volume"],
    "spectra": ["blackbody", "d65", "irregular", "rawconstant", "regular",
                "srgb", "uniform"],
    "media": ["heterogeneous", "homogeneous"],
    "phase": ["blendphase", "hg", "isotropic", "rayleigh", "sggx",
              "tabphase"],
    "volumes": ["constvolume", "gridvolume"],
}

# names handled under a different spelling, with where/why
ALIASES = {
    "prb_basic": "prb",          # subsumed: prb with NEE/MIS is a superset
}


def _package_source() -> str:
    return "\n".join(p.read_text(errors="ignore")
                     for p in PKG.rglob("*.py"))


def test_every_reference_plugin_name_is_handled():
    src = _package_source()
    missing = []
    for family, names in REFERENCE_PLUGINS.items():
        for name in names:
            probe = ALIASES.get(name, name)
            # the spec spelling must appear as a quoted string somewhere
            # (loader dispatch, registry, or plugin module)
            if not re.search(r"['\"]" + re.escape(probe) + r"['\"]", src):
                missing.append(f"{family}/{name}")
    assert not missing, f"unhandled reference plugins: {missing}"
