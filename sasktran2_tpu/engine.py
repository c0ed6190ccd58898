"""The radiative transfer Engine.

API-compatible with the reference ``sasktran2.Engine``
(``/root/reference/src/sasktran2/engine.py:50-263``): construct with
(config, model geometry, viewing geometry) — the geometry is traced and
cached — then ``calculate_radiance(atmosphere)`` runs the calculation and
returns a Dataset with ``radiance`` plus ``wf_*`` weighting functions.

TPU-first architecture (vs the reference's C++ per-wavelength loops,
``cpp/lib/engine/engine.cpp:493-675``):

* Construction compiles the static geometry into dense numpy tables
  (ray tracing weights, DO angular tables).
* The whole forward model is ONE jit-compiled function with wavelength as
  the leading batch axis everywhere.
* Weighting functions are reverse-mode autodiff (``jax.vjp``) of the per-
  wavelength radiance, vmapped over the wavelength batch — replacing the
  reference's hand-written forward-mode dual arithmetic and its
  ``backprop`` reverse mode (``sktran_do_rte.cpp:1813``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .atmosphere import Atmosphere
from .config import (
    Config,
    GeometryType,
    MultipleScatterSource,
    OccultationSource,
    SingleScatterSource,
)
from .dataset import DataArray, Dataset
from .geometry import Geometry1D
from .rt import disco, singlescatter
from .rt.raytrace import trace_spherical
from .viewinggeo import (
    GroundViewingSolar,
    SolarAnglesObserverLocation,
    TangentAltitudeSolar,
)


class Engine:
    def __init__(self, config: Config, geometry: Geometry1D, viewing_geometry):
        config.validate()
        self._config = config
        self._geometry = geometry
        self._viewing = viewing_geometry
        self._rays = list(viewing_geometry.observer_rays)
        if len(self._rays) == 0:
            msg = "viewing_geometry contains no rays"
            raise ValueError(msg)

        self._dtype = jnp.float64 if config.dtype == "float64" else jnp.float32

        # --- host-side geometry (reference calculate_geometry,
        # engine.cpp:354-427) -----------------------------------------
        self._traced = trace_spherical(
            geometry.altitudes(),
            geometry.earth_radius_m,
            geometry.cos_sza,
            self._rays,
        )

        self._needs_ss_exact = (
            config.single_scatter_source == SingleScatterSource.Exact
        )
        ms = config.multiple_scatter_source
        self._needs_do = ms in (
            MultipleScatterSource.DiscreteOrdinates,
            MultipleScatterSource.TwoStream,
        ) or config.single_scatter_source == SingleScatterSource.DiscreteOrdinates
        self._do_nstr = (
            2 if ms == MultipleScatterSource.TwoStream else config.num_streams
        )
        self._do_include_ss = (
            config.single_scatter_source == SingleScatterSource.DiscreteOrdinates
        )

        nleg = max(config.num_streams, config.num_singlescatter_moments)
        if self._needs_ss_exact:
            self._phase_tab = singlescatter.phase_tables(self._traced, nleg)

        self._do_groups = []
        self._limb_groups = []
        if self._needs_do:
            self._build_do_tables()

        self._compute_jit = None
        self._needs_leg_jac = False

    # ------------------------------------------------------------------
    def _build_do_tables(self):
        """Group rays by cos_sza and set up DO angular tables per group.

        The plane-parallel postprocessing mode (reference
        ``do_source_planeparallel.cpp``) evaluates the DO field at each
        ray's zenith cosine; rays with different solar geometry get
        independent solves (the reference's SZA grid, ``do_source.cpp:35``).
        """
        groups = {}
        limb_groups = {}
        for i, ray in enumerate(self._rays):
            if isinstance(ray, TangentAltitudeSolar):
                limb_groups.setdefault(float(ray.cos_sza), []).append(i)
                continue
            if isinstance(ray, (GroundViewingSolar, SolarAnglesObserverLocation)):
                mu0 = float(ray.cos_sza)
                up = (
                    True
                    if isinstance(ray, GroundViewingSolar)
                    else ray.cos_viewing_zenith < 0.0
                )
                mu_u = abs(float(ray.cos_viewing_zenith))
                azi = float(ray.relative_azimuth)
            else:
                msg = f"Unsupported ray type for DO: {type(ray)}"
                raise NotImplementedError(msg)
            groups.setdefault(mu0, []).append((i, mu_u, up, azi))

        nleg_ms = self._do_nstr
        num_azi = (
            self._config.num_forced_azimuth
            if self._config.num_forced_azimuth > 0
            else self._do_nstr
        )
        self._do_groups = []
        for mu0, entries in groups.items():
            idx = np.array([e[0] for e in entries])
            user_mu = np.array([e[1] for e in entries])
            user_up = np.array([e[2] for e in entries])
            user_azi = np.array([e[3] for e in entries])
            tables = disco.build_mode_tables(
                self._do_nstr, nleg_ms, mu0, user_mu, num_azimuth=num_azi
            )
            self._do_groups.append((idx, tables, user_up, user_azi))

        # Limb rays: DO solve per SZA group + analytic source evaluation
        # along the traced spherical rays (reference interpolated DO source,
        # ``do_source_interpolated_pp.cpp``)
        self._limb_groups = []
        if limb_groups:
            from .rt import do_source

            self._ray_ms_tables = do_source.build_ray_angular_tables(
                self._traced, nleg_ms, num_azi
            )
            for mu0, idx in limb_groups.items():
                tables = disco.build_mode_tables(
                    self._do_nstr, nleg_ms, mu0, np.array([0.5]),
                    num_azimuth=num_azi,
                )
                self._limb_groups.append((np.array(idx), tables))

    # ------------------------------------------------------------------
    def _layer_optical(self, extinction, ssa, leg_coeff):
        """Level quantities -> layer (TOA-first) dtau/omega/beta via
        trapezoidal averaging (reference two-stream ``prepare``,
        ``solver.rs:79-140``, and the DO layer integration,
        ``sktran_do_layerarray.cpp:333-400``).

        extinction/ssa: [W, A] bottom-up levels; leg_coeff: [W, A, L].
        Returns dtau/omega [W, P], beta [W, P, L] with P = A-1, TOA first.
        """
        alts = jnp.asarray(self._geometry.altitudes(), dtype=extinction.dtype)
        dz = alts[1:] - alts[:-1]  # [P] bottom-up
        k_lo = extinction[..., :-1]
        k_hi = extinction[..., 1:]
        ks_lo = k_lo * ssa[..., :-1]
        ks_hi = k_hi * ssa[..., 1:]
        k_avg = 0.5 * (k_lo + k_hi)
        ks_avg = 0.5 * (ks_lo + ks_hi)
        dtau = k_avg * dz
        omega = ks_avg / jnp.maximum(k_avg, 1e-300)
        bl = leg_coeff[..., :-1, :] * ks_lo[..., None]
        bh = leg_coeff[..., 1:, :] * ks_hi[..., None]
        beta = 0.5 * (bl + bh) / jnp.maximum(ks_avg[..., None], 1e-300)
        # flip to TOA-first layer order
        return (
            dtau[..., ::-1],
            omega[..., ::-1],
            beta[..., ::-1, :],
        )

    def _radiance_single_wavelength(self, core):
        """Radiance [nlos] for one wavelength's core inputs (each leading
        axis W removed). Differentiated per-wavelength via vjp."""
        cfg = self._config
        ext = core["extinction"][None, :]
        ssa = core["ssa"][None, :]
        leg = core["leg_coeff"][None, :, :]
        alb = core["albedo"][None]
        emis = core["emission"][None, :]

        nlos = len(self._rays)
        rad = jnp.zeros((nlos,), dtype=ext.dtype)

        if self._needs_ss_exact:
            rad = rad + singlescatter.integrate_single_scatter(
                ext, ssa, leg, alb, self._traced, self._phase_tab,
                emission=emis,
                include_emission=cfg.emission_source.name == "Standard",
            )[0]

        if cfg.occultation_source == OccultationSource.Standard:
            rad = rad + singlescatter.occultation_radiance(ext, self._traced)[0]

        if self._needs_do:
            from .rt import do_source as do_source_mod
            from .rt.singlescatter import integrate_od_source

            dtau, omega, beta = self._layer_optical(ext, ssa, leg)
            chapman = self._chapman_factors(ext.dtype)
            for idx, tables, user_up, user_azi in self._do_groups:
                r = disco.solve_plane_parallel(
                    dtau, omega, beta, alb, tables, user_up, user_azi,
                    include_ss=self._do_include_ss,
                    chapman=chapman.get(tables.mu0),
                )[0]
                rad = rad.at[jnp.asarray(idx)].add(r)

            for idx, tables in self._limb_groups:
                _, internal = disco.solve_plane_parallel(
                    dtau, omega, beta, alb, tables,
                    np.array([True]), np.array([0.0]),
                    include_ss=self._do_include_ss,
                    chapman=chapman.get(tables.mu0),
                    return_internal=True,
                )
                j_in, j_out = do_source_mod.ms_source_along_rays(
                    internal, self._traced, self._ray_ms_tables,
                    include_ss=self._do_include_ss,
                )
                ms_rad = integrate_od_source(ext, j_in, j_out, self._traced)[0]
                rad = rad.at[jnp.asarray(idx)].add(ms_rad[jnp.asarray(idx)])

        return rad * core["solar_irradiance"]

    @functools.lru_cache(maxsize=4)
    def _chapman_cache(self, dtype_name):
        """Pseudo-spherical chapman factors per DO solar group (static)."""
        out = {}
        if not self._needs_do:
            return out
        geom_type = self._geometry.geometry_type
        alts = self._geometry.altitudes()
        P = len(alts) - 1
        re = self._geometry.earth_radius_m
        for _, tables, _, _ in self._do_groups:
            mu0 = tables.mu0
            if geom_type == GeometryType.PlaneParallel:
                out[mu0] = None  # default 1/mu0 inside the solver
                continue
            # spherical shell chapman: layer p bottom boundary at radius
            # r_p; slant path of the solar beam through layer q above
            radii = re + alts  # bottom-up levels
            # layer boundaries top-down: layer p spans levels [A-1-p, A-2-p]
            c = np.zeros((P, P))
            for p in range(P):
                r_b = radii[P - 1 - p]  # bottom boundary of layer p (TOA-first)
                rt = r_b * np.sqrt(max(1.0 - mu0 * mu0, 0.0))
                for q in range(p + 1):
                    r_hi = radii[P - q]
                    r_lo = radii[P - 1 - q]
                    l_hi = np.sqrt(max(r_hi**2 - rt**2, 0.0))
                    l_lo = np.sqrt(max(r_lo**2 - rt**2, 0.0))
                    dz = r_hi - r_lo
                    c[p, q] = (l_hi - l_lo) / dz
            out[mu0] = c
        return out

    def _chapman_factors(self, dtype):
        raw = self._chapman_cache(jnp.dtype(dtype).name)
        return {
            mu0: (None if v is None else jnp.asarray(v, dtype=dtype))
            for mu0, v in raw.items()
        }

    # ------------------------------------------------------------------
    def _build_jit(self, needs_leg_jac, needs_jac):
        def per_wavelength(core):
            if not needs_jac:
                return self._radiance_single_wavelength(core), {}
            rad, vjp = jax.vjp(self._radiance_single_wavelength, core)
            nlos = rad.shape[0]
            seeds = jnp.eye(nlos, dtype=rad.dtype)
            grads = jax.vmap(vjp)(seeds)[0]  # dict of [nlos, ...]
            if not needs_leg_jac:
                grads = {
                    k: v for k, v in grads.items() if k != "leg_coeff"
                }
            return rad, grads

        batched = jax.vmap(per_wavelength)
        return jax.jit(batched)

    # ------------------------------------------------------------------
    def calculate_radiance(self, atmosphere: Atmosphere) -> Dataset:
        core_np = atmosphere.internal_object()
        mappings = atmosphere.storage.derivative_mappings
        surf_mappings = atmosphere.surface.derivative_mappings
        needs_jac = atmosphere.calculate_derivatives and (
            len(mappings) > 0 or len(surf_mappings) > 0
        )
        needs_leg_jac = any(
            m.d_leg_coeff is not None and np.any(m.d_leg_coeff)
            for m in mappings.values()
        )

        key = (needs_leg_jac, needs_jac)
        if self._compute_jit is None or self._jit_key != key:
            self._compute_jit = self._build_jit(needs_leg_jac, needs_jac)
            self._jit_key = key

        core = {
            k: jnp.asarray(v, dtype=self._dtype) for k, v in core_np.items()
        }
        rad, grads = self._compute_jit(core)
        rad = np.asarray(rad)  # [W, nlos]

        out = Dataset()
        nstokes = self._config.num_stokes
        out["radiance"] = DataArray(
            rad[..., None], ("wavelength", "los", "stokes")
        )
        if atmosphere.wavelengths_nm is not None:
            out.coords["wavelength"] = atmosphere.wavelengths_nm
        out.coords["stokes"] = ["I", "Q", "U", "V"][:nstokes]

        if needs_jac:
            self._assemble_wfs(out, atmosphere, grads)

        if self._config.output_los_optical_depth:
            od = singlescatter.optical_depth(
                core["extinction"], self._traced
            )
            out["los_optical_depth"] = DataArray(
                np.asarray(od), ("wavelength", "los")
            )
        return out

    # ------------------------------------------------------------------
    def _assemble_wfs(self, out: Dataset, atmosphere: Atmosphere, grads):
        """Map core-space gradients through the derivative mappings
        (reference ``OutputDerivMapped``, ``cpp/lib/output/``)."""
        jext = np.asarray(grads["extinction"]) if "extinction" in grads else None
        jssa = np.asarray(grads["ssa"]) if "ssa" in grads else None
        jem = np.asarray(grads["emission"]) if "emission" in grads else None
        jleg = np.asarray(grads["leg_coeff"]) if "leg_coeff" in grads else None
        jalb = np.asarray(grads["albedo"]) if "albedo" in grads else None
        # shapes: j* = [W, nlos, A(, L)]; jalb = [W, nlos]

        for name, m in atmosphere.storage.derivative_mappings.items():
            # [W, nlos, A] core-space WF
            wf = 0.0
            if jext is not None:
                wf = wf + jext * m.d_extinction.T[:, None, :]
            if jssa is not None:
                wf = wf + jssa * m.d_ssa.T[:, None, :]
            if jem is not None and np.any(m.d_emission):
                wf = wf + jem * m.d_emission.T[:, None, :]
            if (
                jleg is not None
                and m.d_leg_coeff is not None
                and np.any(m.d_leg_coeff)
            ):
                dl = np.transpose(m.d_leg_coeff, (2, 1, 0))  # [W, A, L]
                wf = wf + np.einsum(
                    "wuag,wag->wua",
                    jleg[..., : dl.shape[-1]],
                    dl * m.scat_factor.T[..., None],
                )
            if m.interpolator is not None:
                wf = np.einsum("oa,wua->wuo", m.interpolator, wf)
            assign = m.assign_name if m.assign_name else name
            arr = np.moveaxis(wf, -1, 0)[..., None]  # [A/out, W, nlos, 1]
            da = DataArray(
                arr, (m.interp_dim, "wavelength", "los", "stokes")
            )
            if assign in out:
                out[assign] = out[assign] + da
            else:
                out[assign] = da

        for name, m in atmosphere.surface.derivative_mappings.items():
            if jalb is None:
                continue
            wf = jalb * m.d_brdf[:, 0][:, None]
            out[name] = DataArray(wf[..., None], ("wavelength", "los", "stokes"))
