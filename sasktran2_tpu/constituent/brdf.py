"""Surface BRDF constituents (reference ``src/sasktran2/constituent/brdf/``)."""

from __future__ import annotations

import numpy as np

from .base import Constituent


class LambertianSurface(Constituent):
    """Wavelength-dependent Lambertian albedo. ``albedo`` may be a scalar or
    an array on ``wavelengths_nm`` (interpolated to the engine grid)."""

    def __init__(self, albedo, wavelengths_nm=None, wavelengths_interpolator=None):
        self.albedo = np.atleast_1d(np.asarray(albedo, dtype=np.float64))
        self.wavelengths_nm = (
            np.asarray(wavelengths_nm, dtype=np.float64)
            if wavelengths_nm is not None
            else None
        )

    def _albedo_on_grid(self, atmo):
        if self.albedo.size == 1:
            return np.full(atmo.num_wavelengths, self.albedo[0]), None
        if self.wavelengths_nm is None:
            if self.albedo.size != atmo.num_wavelengths:
                msg = "albedo array length must match the wavelength grid"
                raise ValueError(msg)
            return self.albedo.copy(), None
        from ..util.interpolation import linear_interpolating_matrix

        interp = linear_interpolating_matrix(
            self.wavelengths_nm, atmo.wavelengths_nm, "extend"
        )
        return interp @ self.albedo, interp

    def add_to_atmosphere(self, atmo):
        alb, _ = self._albedo_on_grid(atmo)
        atmo.surface.albedo += alb

    def register_derivative(self, atmo, name: str):
        m = atmo.surface.get_derivative_mapping(f"wf_{name}_albedo")
        m.d_brdf[:] = 1.0
        m.interp_dim = "dummy"


class SnowKokhanovsky(Constituent):
    """Kokhanovsky snow BRDF surface (reference
    ``constituent/brdf/kokhanovsky.py``): args(0) = (chi + M)/wavelen * L."""

    def __init__(self, chi=1e-6, M=0.0, L=1e6):
        self.chi = chi
        self.M = M
        self.L = L

    def add_to_atmosphere(self, atmo):
        from ..rt.brdf import SnowKokhanovskyKernel

        wl_nm = atmo.wavelengths_nm
        args = (self.chi + self.M) / wl_nm * self.L
        atmo.surface.brdf = SnowKokhanovskyKernel()
        atmo.surface.brdf_args = args[:, None]

    def register_derivative(self, atmo, name: str):
        m = atmo.surface.get_derivative_mapping(f"wf_{name}_L")
        m.d_brdf = np.zeros((atmo.num_wavelengths, 1))
        m.d_brdf[:, 0] = (self.chi + self.M) / atmo.wavelengths_nm


class MODIS(Constituent):
    """MODIS RossThick-LiSparse kernel surface (reference
    ``constituent/brdf/modis.py``)."""

    def __init__(self, isotropic, volumetric, geometric):
        self.f_iso = np.atleast_1d(np.asarray(isotropic, dtype=np.float64))
        self.f_vol = np.atleast_1d(np.asarray(volumetric, dtype=np.float64))
        self.f_geo = np.atleast_1d(np.asarray(geometric, dtype=np.float64))

    def add_to_atmosphere(self, atmo):
        from ..rt.brdf import MODISKernel

        W = atmo.num_wavelengths
        args = np.stack([
            np.broadcast_to(self.f_iso, (W,)),
            np.broadcast_to(self.f_vol, (W,)),
            np.broadcast_to(self.f_geo, (W,)),
        ], axis=-1)
        atmo.surface.brdf = MODISKernel()
        atmo.surface.brdf_args = args

    def register_derivative(self, atmo, name: str):
        for i, pname in enumerate(("isotropic", "volumetric", "geometric")):
            m = atmo.surface.get_derivative_mapping(f"wf_{name}_{pname}")
            m.d_brdf = np.zeros((atmo.num_wavelengths, 3))
            m.d_brdf[:, i] = 1.0
