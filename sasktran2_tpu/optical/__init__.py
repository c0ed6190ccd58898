from .base import OpticalProperty
from .henyey import HenyeyGreenstein
from .rayleigh import rayleigh_cross_section_bates
from .tabulated import TabulatedCrossSectionAbsorber

__all__ = [
    "HenyeyGreenstein",
    "OpticalProperty",
    "TabulatedCrossSectionAbsorber",
    "rayleigh_cross_section_bates",
]
