"""Color/spectrum utilities — counterpart of ``include/mitsuba/core/spectrum.h``.

Round-1 scope: RGB rendering mode (3-channel Spectrum arrays [..., 3]) with
the standard ITU-R BT.709 luminance weights and sRGB <-> XYZ conversion
matrices used by the reference. Full spectral mode (CIE 1931 tables +
spectral sampling) is a variant axis added on top of the same [..., C]
channel layout.
"""
from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.709 / sRGB primaries (spectrum.h: luminance(), srgb_to_xyz)
LUMINANCE_WEIGHTS = jnp.array([0.212671, 0.715160, 0.072169], jnp.float32)

XYZ_TO_SRGB = jnp.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], jnp.float32)

SRGB_TO_XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], jnp.float32)


def luminance(rgb):
    return jnp.sum(rgb * LUMINANCE_WEIGHTS, axis=-1)


def srgb_to_xyz(rgb):
    return rgb @ SRGB_TO_XYZ.T


def xyz_to_srgb(xyz):
    return xyz @ XYZ_TO_SRGB.T
