from .model import SolarModel
from .geometry import (
    SolarGeometryHandlerAstropy,
    SolarGeometryHandlerBase,
    SolarGeometryHandlerEphemeris,
    SolarGeometryHandlerForced,
    solar_angles_from_times,
    to_mjd,
)

__all__ = [
    "SolarModel",
    "SolarGeometryHandlerAstropy",
    "SolarGeometryHandlerBase",
    "SolarGeometryHandlerEphemeris",
    "SolarGeometryHandlerForced",
    "solar_angles_from_times",
    "to_mjd",
]
