from .model import SolarModel
from .geometry import solar_angles_from_times

__all__ = ["SolarModel", "solar_angles_from_times"]
