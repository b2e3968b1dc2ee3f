"""Volumetric rendering: a heterogeneous smoke-like medium with the
null-scattering volumetric path tracer (integrators/volpath.py — the
volpath.cpp analog).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import mitsuba3_tpu as mi


def main():
    # procedural density blob
    g = 24
    z, y, x = np.mgrid[0:g, 0:g, 0:g].astype(np.float32) / (g - 1)
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    density = np.clip(1.0 - 3.0 * r, 0.0, 1.0) ** 2

    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 8},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 96, "height": 96,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": 32}},
        "smoke": {"type": "cube",
                  "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "rgb",
                                           "value": [4.0, 4.0, 4.0]},
                               "albedo": {"type": "rgb",
                                          "value": [0.9, 0.9, 0.9]},
                               "density": density,
                               "phase": {"type": "hg", "g": 0.4}}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .translate([0, 2.2, 0]).rotate([1, 0, 0], 90)
                  .scale(1.2),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [12, 12, 12]}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 0.05}},
    }
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    print("volumetric render mean:", img.mean(axis=(0, 1)),
          "finite:", np.isfinite(img).all())


if __name__ == "__main__":
    main()
