from . import math, warp
from .frame import Frame, coordinate_system
from .random import PCG32, sample_tea_32, sample_tea_f32
from .distr import DiscreteDistribution, ContinuousDistribution
from .struct import pytree_dataclass, static_field
from .transform import Transform4f
from .spectrum import luminance, srgb_to_xyz, xyz_to_srgb
