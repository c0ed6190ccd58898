from . import wf
from .scenarios import default_pure_scattering_atmosphere, test_aerosol_constituent

__all__ = [
    "default_pure_scattering_atmosphere",
    "test_aerosol_constituent",
    "wf",
]
