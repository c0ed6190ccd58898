from .base import Constituent
from .brdf import MODIS, LambertianSurface, SnowKokhanovsky
from .emission import (
    SurfaceThermalEmission,
    ThermalEmission,
    VolumeEmissionRate,
    planck_blackbody_radiance,
)
from .misc import (
    AirMassFactor,
    CollisionInducedAbsorber,
    ManualOpticalProperties,
    SolarIrradiance,
)
from .rayleigh import Rayleigh
from .scatterer import (
    HGScatteringOptical,
    MieScatteringOptical,
    NumberDensityScatterer,
)
from .vmr_absorber import VMRAltitudeAbsorber

__all__ = [
    "MODIS",
    "SnowKokhanovsky",
    "AirMassFactor",
    "CollisionInducedAbsorber",
    "Constituent",
    "HGScatteringOptical",
    "LambertianSurface",
    "ManualOpticalProperties",
    "MieScatteringOptical",
    "NumberDensityScatterer",
    "Rayleigh",
    "SolarIrradiance",
    "SurfaceThermalEmission",
    "ThermalEmission",
    "VMRAltitudeAbsorber",
    "VolumeEmissionRate",
    "planck_blackbody_radiance",
]
