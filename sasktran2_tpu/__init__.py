"""sasktran2_tpu — a TPU-native atmospheric radiative transfer framework.

A from-scratch JAX/XLA/Pallas implementation with the capability surface of
SASKTRAN2 (https://github.com/usask-arg/sasktran2): spherical and
plane-parallel radiance, exact single scatter, N-stream discrete ordinates,
two-stream and successive-orders multiple scatter, occultation / emission /
surface sources, and full analytic weighting functions via autodiff —
designed for wavelength x line-of-sight batching on TPU device meshes.
"""

from .atmosphere import Atmosphere
from .config import (
    Config,
    EmissionSource,
    FluxType,
    GeometryType,
    InputValidationMode,
    InterpolationMethod,
    LogLevel,
    MultipleScatterSource,
    OccultationSource,
    SingleScatterSource,
    SpectralGridMode,
    StokesBasis,
    ThreadingLib,
    ThreadingModel,
    TwoStreamBackend,
)
from .dataset import DataArray, Dataset
from .geodetic import Geodetic
from .geometry import Geometry1D, Geometry2D
from .viewinggeo import (
    FluxObserverSolar,
    GroundViewingSolar,
    SolarAnglesObserverLocation,
    TangentAltitude,
    TangentAltitudeSolar,
    ViewingGeometry,
)

__version__ = "0.1.0"

__all__ = [
    "Atmosphere",
    "Config",
    "DataArray",
    "Dataset",
    "EmissionSource",
    "Engine",
    "FluxObserverSolar",
    "FluxType",
    "Geometry1D",
    "Geometry2D",
    "GeometryType",
    "GroundViewingSolar",
    "InputValidationMode",
    "InterpolationMethod",
    "MultipleScatterSource",
    "OccultationSource",
    "SingleScatterSource",
    "SolarAnglesObserverLocation",
    "SpectralGridMode",
    "StokesBasis",
    "TangentAltitude",
    "TangentAltitudeSolar",
    "ThreadingLib",
    "ThreadingModel",
    "TwoStreamBackend",
    "LogLevel",
    "ViewingGeometry",
]


def __getattr__(name):
    # Engine imports jax-heavy modules; keep import lazy so light users
    # (constituent math, geometry) stay fast.
    import importlib

    if name == "Engine":
        from .engine import Engine

        globals()["Engine"] = Engine
        return Engine
    if name in ("constituent", "optical", "climatology", "test_util",
                "solar", "basis", "parallel", "mie", "legendre",
                "units", "constants", "database", "photchem",
                "spectroscopy", "util"):
        mod = importlib.import_module(f"sasktran2_tpu.{name}")
        globals()[name] = mod
        return mod
    msg = f"module 'sasktran2_tpu' has no attribute {name!r}"
    raise AttributeError(msg)
