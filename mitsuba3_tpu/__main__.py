"""Command-line renderer — counterpart of src/mitsuba/mitsuba.cpp.

    python -m mitsuba3_tpu scene.xml -o out.exr -D key=value -s 128

Options mirror the reference CLI (mitsuba.cpp:182-196) where they apply:
-D defines substitute $key scene parameters; -o selects the output image;
-s overrides samples per pixel; -m selects the variant (precision mode).
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mitsuba3_tpu",
        description="TPU-native differentiable renderer (Mitsuba 3 "
                    "capabilities on JAX/XLA/Pallas)")
    ap.add_argument("scene", help="scene file (.xml)")
    ap.add_argument("-o", "--output", default=None,
                    help="output image (.exr/.png/.npy; default: scene "
                         "name + .exr)")
    ap.add_argument("-D", "--define", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="set a scene parameter ($key substitution)")
    ap.add_argument("-s", "--spp", type=int, default=None,
                    help="override samples per pixel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-m", "--mode", default="rgb",
                    help="variant (rgb; spectral modes are config axes)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    params = {}
    for d in args.define:
        if "=" not in d:
            ap.error(f"-D expects KEY=VALUE, got {d!r}")
        k, v = d.split("=", 1)
        params[k] = v

    import numpy as np

    import mitsuba3_tpu as mi
    from mitsuba3_tpu.utils.xml import parse_file

    t0 = time.time()
    scene = mi.load_dict(parse_file(args.scene, params))
    print(f"[load] {time.time() - t0:.2f}s", file=sys.stderr)

    t0 = time.time()
    img = np.asarray(mi.render(scene, seed=args.seed, spp=args.spp))
    print(f"[render] {time.time() - t0:.2f}s "
          f"({scene.film.width}x{scene.film.height}, "
          f"spp={args.spp or scene.spp})", file=sys.stderr)

    out = args.output or (args.scene.rsplit(".", 1)[0] + ".exr")
    from mitsuba3_tpu.utils.image_io import write_image
    write_image(out, img)
    print(f"[write] {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
