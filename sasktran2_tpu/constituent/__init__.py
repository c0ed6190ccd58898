from .base import Constituent
from .brdf import MODIS, LambertianSurface, SnowKokhanovsky, WeightedBRDF
from .emission import (
    LineListVolumeEmissionRate,
    PopulationEmissionRate,
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
    ExtinctionScatterer,
    ExtinctionScatterer2D,
    GaussianHeightExtinction,
    HGScatteringOptical,
    MieScatteringOptical,
    NumberDensityScatterer,
    NumberDensityScatterer2D,
)
from .vmr_absorber import VMRAbsorber2D, VMRAltitudeAbsorber

# reference-name aliases (src/sasktran2/constituent/__init__.py)
Manual = ManualOpticalProperties
MonochromaticVolumeEmissionRate = VolumeEmissionRate

__all__ = [
    "MODIS",
    "SnowKokhanovsky",
    "WeightedBRDF",
    "AirMassFactor",
    "CollisionInducedAbsorber",
    "Constituent",
    "ExtinctionScatterer",
    "ExtinctionScatterer2D",
    "GaussianHeightExtinction",
    "HGScatteringOptical",
    "Manual",
    "MonochromaticVolumeEmissionRate",
    "LambertianSurface",
    "LineListVolumeEmissionRate",
    "ManualOpticalProperties",
    "MieScatteringOptical",
    "NumberDensityScatterer",
    "NumberDensityScatterer2D",
    "PopulationEmissionRate",
    "Rayleigh",
    "SolarIrradiance",
    "SurfaceThermalEmission",
    "ThermalEmission",
    "VMRAbsorber2D",
    "VMRAltitudeAbsorber",
    "VolumeEmissionRate",
    "planck_blackbody_radiance",
]
