"""mitsuba3_tpu — a TPU-native differentiable renderer.

A from-scratch reimplementation of the capabilities of Mitsuba 3
(mitsuba-renderer/mitsuba3) designed for TPUs: JAX/XLA tracing replaces the
Dr.Jit JIT, Pallas kernels replace CUDA/OptiX/Embree intersection backends,
switch-based dispatch over flat parameter tables replaces vcall registries,
and jax.sharding scales the sample wavefront over device meshes (a
capability the reference does not have).

Public API mirrors the `mitsuba` Python package where it makes sense:

    import mitsuba3_tpu as mi
    scene = mi.load_dict(mi.cornell_box())
    img = mi.render(scene, spp=64)
"""

__version__ = "0.1.0"

from .core.transform import Transform4f
from .core import math, warp
from .core.random import PCG32, sample_tea_32
from .core.distr import DiscreteDistribution, ContinuousDistribution
from .loader import load_dict
from .utils.xml import load_file, load_string
from .models import cornell_box
from .render.integrator import render, render_with_stats
from .render.scene import Scene, FilmConfig
from .render import film as film_lib
from .utils.params import SceneParameters, traverse
from .utils.log import (DEBUG, ERROR, INFO, TRACE, WARN, ProgressReporter,
                        log, set_log_level)
from . import ad
from . import util
from .utils import chi2
from .util import Bitmap, convert_to_bitmap, write_bitmap, variant_context

ScalarTransform4f = Transform4f

# ---- reference-style type aliases (the Dr.Jit array names users type) ----
from .core.vec import Vec2, Vec3, luminance
from .core.frame import Frame
from .render.records import (BSDFSample, DirectionSample, PositionSample,
                             Ray, SurfaceInteraction)
import jax.numpy as _jnp

Point3f = Vector3f = Normal3f = Color3f = Vec3
Point2f = Vector2f = Vec2
ScalarPoint3f = ScalarVector3f = Vec3
Ray3f = Ray
Frame3f = Frame
SurfaceInteraction3f = SurfaceInteraction
DirectionSample3f = DirectionSample
PositionSample3f = PositionSample
Float = _jnp.float32
UInt32 = _jnp.uint32
Int32 = _jnp.int32
Mask = Bool = _jnp.bool_
TensorXf = _jnp.asarray

# ---- variant selection (mi.set_variant analog, alias.cpp:97-266) ----
# Variants are config axes, not compiled modules: 'llvm_rgb'/'cuda_rgb'
# style backend axes collapse to the JAX device backend; the color axis
# selects RGB vs hero-wavelength spectral transport.
_VARIANT = "rgb"
_KNOWN_VARIANTS = ("rgb", "spectral",
                   # reference-style aliases accepted for compatibility
                   "scalar_rgb", "llvm_rgb", "cuda_rgb", "llvm_ad_rgb",
                   "cuda_ad_rgb", "scalar_spectral", "llvm_ad_spectral")


def set_variant(*names):
    """Select the rendering variant (mi.set_variant). Reference-style
    names map onto the two real axes: anything containing 'spectral'
    enables hero-wavelength spectral transport; the backend prefix is
    ignored (JAX owns the device)."""
    global _VARIANT
    for name in names:
        if name in _KNOWN_VARIANTS or "rgb" in name or "spectral" in name:
            _VARIANT = "spectral" if "spectral" in name else "rgb"
            return
    raise ValueError(f"Unknown variant(s) {names!r}")


def variant() -> str:
    return _VARIANT


def variants():
    return list(_KNOWN_VARIANTS)


def register_bsdf(name, module, lower=None):
    """Register a user-defined Python BSDF plugin (the reference's
    mi.register_bsdf, src/python/python/__init__.py): scene dicts/XML
    may then use {"type": name, ...}. See bsdfs.register_custom for the
    module contract (FLAGS + sample + eval_pdf over parameter rows)."""
    from . import bsdfs
    return bsdfs.register_custom(name, module, lower)


def register_integrator(name, module):
    """Register a user-defined integrator plugin (mi.register_integrator
    analog). `module` provides sample(scene, rng, ray, cfg, active=None)
    -> (L, valid, rng) and config_from_dict(spec) -> frozen config
    dataclass with a `type` field equal to `name`."""
    from . import integrators
    integrators.register(name, module)
