"""Environment report — counterpart of src/python/python/util/sys_info.py
(version/devices dump for bug reports)."""
from __future__ import annotations

import platform
import sys


def info() -> dict:
    import jax

    import mitsuba3_tpu

    devs = []
    try:
        devs = [f"{d.platform}:{d.device_kind}" for d in jax.devices()]
    except Exception as exc:  # headless CI without a backend
        devs = [f"<unavailable: {exc}>"]
    return {
        "mitsuba3_tpu": getattr(mitsuba3_tpu, "__version__", "dev"),
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend() if devs else "none",
        "devices": devs,
    }


def print_info():
    for k, v in info().items():
        print(f"{k:14s} {v}")


if __name__ == "__main__":
    print_info()
