from .base import Constituent
from .brdf import LambertianSurface
from .rayleigh import Rayleigh
from .vmr_absorber import VMRAltitudeAbsorber

__all__ = [
    "Constituent",
    "LambertianSurface",
    "Rayleigh",
    "VMRAltitudeAbsorber",
]
