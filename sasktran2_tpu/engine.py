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
import logging
import time

import jax

_LOG = logging.getLogger(__name__)
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
from .util.jaxmath import safe_div
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
        self._flux_observers = list(
            getattr(viewing_geometry, "flux_observers", [])
        )
        if len(self._rays) == 0:
            msg = "viewing_geometry contains no rays"
            raise ValueError(msg)

        self._dtype = jnp.float64 if config.dtype == "float64" else jnp.float32

        from .geometry import Geometry2D

        self._is_2d = isinstance(geometry, Geometry2D)
        if self._is_2d:
            if config.multiple_scatter_source != MultipleScatterSource.NoSource:
                msg = (
                    "Geometry2D supports single scatter, occultation and "
                    "emission (standard + volume emission rate) only "
                    "(reference restriction, src/sasktran2/engine.py:80-104)"
                )
                raise NotImplementedError(msg)
            from .config import EmissionSource, InterpolationMethod
            from .rt.raytrace2d import trace_2d
            from .viewinggeo import TangentAltitude, TangentAltitudeSolar

            if config.emission_source not in (
                EmissionSource.NoSource,
                EmissionSource.Standard,
                EmissionSource.VolumeEmissionRate,
            ):
                msg = (
                    "Geometry2D emission supports Standard and "
                    "VolumeEmissionRate modes only; got "
                    f"{config.emission_source}"
                )
                raise NotImplementedError(msg)
            if (
                geometry.interpolation_method
                != InterpolationMethod.LinearInterpolation
            ):
                msg = (
                    "Geometry2D supports LinearInterpolation only; got "
                    f"{geometry.interpolation_method}"
                )
                raise NotImplementedError(msg)

            from .viewinggeo import (
                GroundViewingSolar,
                SolarAnglesObserverLocation,
            )

            rays_2d = []
            theta0_ref = float(np.arccos(np.clip(geometry.cos_sza, -1, 1)))
            for r in self._rays:
                if isinstance(
                    r, (GroundViewingSolar, SolarAnglesObserverLocation)
                ) and (
                    isinstance(r, GroundViewingSolar)
                    or r.cos_viewing_zenith < 0
                ):
                    rays_2d.append(r)
                elif isinstance(r, TangentAltitudeSolar):
                    # place the tangent point at the horizontal angle where
                    # the in-plane local SZA (theta0 - theta, raytrace2d
                    # convention) matches the ray's cos_sza
                    th_t = theta0_ref - float(
                        np.arccos(np.clip(r.cos_sza, -1, 1))
                    )
                    rays_2d.append(TangentAltitude(
                        tangent_altitude_m=r.tangent_altitude_m,
                        observer_altitude_m=r.observer_altitude_m,
                        horizontal_angle_radians=th_t,
                        viewing_azimuth_radians=r.relative_azimuth,
                    ))
                elif isinstance(r, TangentAltitude):
                    rays_2d.append(r)
                else:
                    msg = (
                        "Geometry2D requires TangentAltitude, "
                        "TangentAltitudeSolar or ground-viewing rays"
                    )
                    raise NotImplementedError(msg)
            if config.solar_refraction:
                msg = (
                    "Geometry2D supports LOS refraction only; "
                    "solar_refraction is a 1D-path feature"
                )
                raise NotImplementedError(msg)
            self._traced2d = trace_2d(
                geometry.altitudes(), geometry.horizontal_angles(),
                geometry.earth_radius_m, geometry.cos_sza, rays_2d,
                refractive_index=geometry.refractive_index,
                los_refraction=config.los_refraction,
            )
            nleg2 = max(config.num_streams, config.num_singlescatter_moments)
            from .ops.wigner import legendre_p as _lp

            self._phase_tab2d = np.moveaxis(
                _lp(self._traced2d.cos_scatter, nleg2), 0, -1
            )
            self._traced = None
        else:
            # --- host-side geometry (reference calculate_geometry,
            # engine.cpp:354-427) -------------------------------------
            self._traced = trace_spherical(
                geometry.altitudes(),
                geometry.earth_radius_m,
                geometry.cos_sza,
                self._rays,
                refractive_index=geometry.refractive_index,
                los_refraction=config.los_refraction,
                solar_refraction=config.solar_refraction,
                interp_method=geometry.interpolation_method.value,
            )

        self._needs_ss_exact = config.single_scatter_source in (
            SingleScatterSource.Exact, SingleScatterSource.Table,
        )
        if (
            config.single_scatter_source == SingleScatterSource.Table
            and self._traced is not None
            and geometry.geometry_type != GeometryType.PlaneParallel
        ):
            # precomputed (altitude x SZA) solar-transmission table
            # (reference solartransmissiontable.cpp); recomposes the static
            # sun weights, jitted compute identical to the exact mode
            from .rt.raytrace import apply_solar_table

            table_kw = {}
            if config.num_solar_zenith_angles > 0:
                table_kw["n_sza"] = config.num_solar_zenith_angles
            self._traced = apply_solar_table(
                self._traced, geometry.altitudes(),
                geometry.earth_radius_m,
                **table_kw,
            )
        ms = config.multiple_scatter_source
        self._needs_so = ms == MultipleScatterSource.SuccessiveOrders
        self._needs_do = ms in (
            MultipleScatterSource.DiscreteOrdinates,
            MultipleScatterSource.TwoStream,
        ) or (
            config.single_scatter_source == SingleScatterSource.DiscreteOrdinates
            and not self._needs_so
        )
        self._do_nstr = (
            2 if ms == MultipleScatterSource.TwoStream else config.num_streams
        )
        self._do_include_ss = (
            config.single_scatter_source == SingleScatterSource.DiscreteOrdinates
        )

        nleg = max(config.num_streams, config.num_singlescatter_moments)
        if self._needs_ss_exact and not self._is_2d:
            self._phase_tab = singlescatter.phase_tables(self._traced, nleg)

        if config.num_stokes == 3:
            if self._needs_ss_exact and not self._is_2d:
                self._d02_tab = singlescatter.phase_tables_d02(
                    self._traced, nleg
                )

        self._do_groups = []
        self._do_groups_vec_minor = []
        self._limb_groups = []
        self._limb_groups_vec_minor = []
        self._flux_groups = []
        if self._is_2d:
            self._needs_do = False
            self._needs_so = False
            self._needs_ss_exact = (
                config.single_scatter_source == SingleScatterSource.Exact
            )
        if self._needs_do:
            self._build_do_tables()

        if self._needs_so:
            from .rt import successive

            n_inc = max(4, int(round(config.num_successive_orders_incoming
                                     ** 0.5)))
            # Diffuse profiles on a SZA grid (reference DiffuseTable
            # SZA x altitude diffuse-point grid,
            # ``cpp/lib/hr/diffuse_table.cpp:224``): the SO field is
            # solved once per grid SZA and the LOS source interpolates
            # between profiles at each traced-ray boundary's local SZA —
            # the same machinery as the limb DO SZA grid.
            n_so_sza = (
                max(1, config.num_successive_orders_sza)
                if config.num_stokes == 1 else 1
            )
            self._so_sza_weights = None
            self._so_ground_sza_weights = None
            if n_so_sza > 1:
                from .util.interpolation import linear_interpolating_matrix

                cs = self._traced.cos_sza
                seg_mask = self._traced.mask
                bmask = np.zeros(cs.shape)
                bmask[:, :-1] += seg_mask
                bmask[:, 1:] += seg_mask
                cs_valid = cs[bmask > 0]
                lo, hi = float(cs_valid.min()), float(cs_valid.max())
                if hi - lo < 1e-6:
                    hi = lo + 1e-6
                so_sza_grid = np.linspace(lo, hi, n_so_sza)
                self._so_sza_weights = linear_interpolating_matrix(
                    so_sza_grid, cs.ravel(), "extend"
                ).reshape(cs.shape + (n_so_sza,))
                self._so_ground_sza_weights = linear_interpolating_matrix(
                    so_sza_grid, self._traced.ground_cos_sza, "extend"
                )
            else:
                so_sza_grid = np.array([geometry.cos_sza])
            self._so_geoms = [
                successive.build_so_geometry(
                    geometry.altitudes(), geometry.earth_radius_m,
                    float(m0), nleg,
                    n_mu=n_inc, n_phi=n_inc,
                    refractive_index=geometry.refractive_index,
                    ms_refraction=config.multiple_scatter_refraction,
                )
                for m0 in so_sza_grid
            ]
            self._so_geom = self._so_geoms[0]
            self._so_obs_tables_list = [
                successive.observer_source_tables(self._traced, g)
                for g in self._so_geoms
            ]
            self._so_obs_tables = self._so_obs_tables_list[0]
            if config.num_stokes == 3:
                self._so_pol_tabs = successive.build_so_polarized_tables(
                    self._so_geom, nleg
                )
            self._so_do_init = (
                config.init_successive_orders_with_discrete_ordinates
                and config.num_stokes == 1  # DO-init is scalar-only
                and len(self._so_geoms) == 1  # single-profile only
            )
            if self._so_do_init:
                from .rt import do_source as do_source_mod

                nstr_so = config.num_streams
                num_azi_so = (
                    config.num_forced_azimuth
                    if config.num_forced_azimuth > 0
                    else nstr_so
                )
                self._so_do_tables = disco.build_mode_tables(
                    nstr_so, nstr_so, geometry.cos_sza, np.array([0.5]),
                    num_azimuth=num_azi_so,
                )
                self._so_dir_tables = (
                    do_source_mod.build_level_direction_tables(
                        self._so_geom.mu_d, self._so_geom.phi_d,
                        nstr_so, num_azi_so,
                    )
                )

        self._compute_jit = None
        self._needs_leg_jac = False
        self._surface_brdf = None
        self._stokes_cs = (
            self._stokes_basis_rotations()
            if config.num_stokes == 3 else None
        )

    def _stokes_basis_rotations(self):
        """Per-LOS (C, S) = (cos 2a, +-sin 2a) rotating output Stokes
        (Q, U) from the standard basis (meridian plane through the
        propagation direction and local up; the solver's native frame,
        pinned by the Coulson validation) into ``config.stokes_basis``
        (reference ``cpp/lib/output/output.cpp:28-56``,
        ``geometry.cpp:232-307``).

        solar: reference plane spanned by the look vector and the sun
        (S = -sin 2a); observer: plane spanned by the look vector and the
        observer position (S = +sin 2a). The rotation angle is the
        dihedral angle between the perpendicular projections onto the
        look vector (for 'observer' the reference dots perp_z with the
        raw position instead of its perpendicular projection,
        geometry.cpp:290 — we use the projected vector, which is the
        well-defined dihedral angle).
        """
        from .config import StokesBasis
        from .viewinggeo import (
            GroundViewingSolar,
            SolarAnglesObserverLocation,
            TangentAltitudeSolar,
        )

        basis = self._config.stokes_basis
        nlos = len(self._rays)
        cs = np.ones((nlos, 2))
        cs[:, 1] = 0.0
        if basis == StokesBasis.Standard:
            return cs

        re = self._geometry.earth_radius_m
        for i, ray in enumerate(self._rays):
            z = np.array([0.0, 0.0, 1.0])
            if isinstance(ray, TangentAltitudeSolar):
                theta0 = np.arccos(np.clip(ray.cos_sza, -1, 1))
                phi = ray.relative_azimuth
                look = np.array([1.0, 0.0, 0.0])
                # sun azimuth measured from the look azimuth
                s = np.array([
                    np.sin(theta0) * np.cos(phi),
                    np.sin(theta0) * np.sin(phi),
                    np.cos(theta0),
                ])
                rt = re + ray.tangent_altitude_m
                d = np.sqrt(
                    max((re + ray.observer_altitude_m) ** 2 - rt**2, 0.0)
                )
                pos = np.array([d, 0.0, rt])
            elif isinstance(
                ray, (GroundViewingSolar, SolarAnglesObserverLocation)
            ):
                muv = ray.cos_viewing_zenith
                theta0 = np.arccos(np.clip(ray.cos_sza, -1, 1))
                phi = ray.relative_azimuth
                sv = np.sqrt(max(1.0 - muv * muv, 0.0))
                look = np.array([sv, 0.0, abs(muv)])
                s = np.array([
                    np.sin(theta0) * np.cos(phi),
                    np.sin(theta0) * np.sin(phi),
                    np.cos(theta0),
                ])
                ground = np.array([0.0, 0.0, re])
                # observer up the (propagation) look direction from the
                # ground point at the requested altitude
                b = 2.0 * ground @ look
                c = re**2 - (re + ray.observer_altitude_m) ** 2
                d = 0.5 * (-b + np.sqrt(max(b * b - 4 * c, 0.0)))
                pos = ground + d * look
            else:
                continue

            if basis == StokesBasis.Solar:
                target = s
                sign = -1.0
            else:  # Observer
                target = pos / np.linalg.norm(pos)
                sign = 1.0
            perp_z = z - (z @ look) * look
            perp_t = target - (target @ look) * look
            nz = np.linalg.norm(perp_z)
            nt = np.linalg.norm(perp_t)
            if nz < 1e-10 or nt < 1e-10:
                continue  # degenerate: identity
            cos_a = float(np.clip(perp_z @ perp_t / (nz * nt), -1.0, 1.0))
            sin_a = np.sqrt(max(1.0 - cos_a * cos_a, 0.0))
            cs[i, 0] = 2.0 * cos_a * cos_a - 1.0
            cs[i, 1] = sign * 2.0 * sin_a * cos_a
        return cs

    def _rotate_stokes(self, arr, stokes_axis):
        """Rotate (Q, U) of an output array into the configured basis.
        ``arr``: numpy, with LOS axis immediately before the stokes axis.
        Q' = C Q - S U ; U' = S Q + C U (reference outputc.cpp:118-151).
        """
        if self._stokes_cs is None or self._config.num_stokes != 3:
            return arr
        cs = self._stokes_cs
        if not np.any(cs[:, 1]) and np.all(cs[:, 0] == 1.0):
            return arr
        arr = np.array(arr, copy=True)
        sl = [slice(None)] * arr.ndim
        slq = list(sl)
        slq[stokes_axis] = 1
        slu = list(sl)
        slu[stokes_axis] = 2
        q = arr[tuple(slq)].copy()
        u = arr[tuple(slu)].copy()
        # LOS axis is stokes_axis - 1; broadcast cs onto q/u shapes
        los_axis = (stokes_axis % arr.ndim) - 1
        bshape = [1] * q.ndim
        bshape[los_axis] = cs.shape[0]
        cvec = cs[:, 0].reshape(bshape)
        svec = cs[:, 1].reshape(bshape)
        arr[tuple(slq)] = cvec * q - svec * u
        arr[tuple(slu)] = svec * q + cvec * u
        return arr

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
        self._do_groups_vec_minor = []
        for mu0, entries in groups.items():
            idx = np.array([e[0] for e in entries])
            user_mu = np.array([e[1] for e in entries])
            user_up = np.array([e[2] for e in entries])
            user_azi = np.array([e[3] for e in entries])
            if self._config.num_stokes == 3:
                from .rt import disco_vec
                from .rt.disco_vec_minor import build_vector_minor_tables

                tables = disco_vec.build_vector_mode_tables(
                    self._do_nstr, nleg_ms, mu0, user_mu, num_azimuth=num_azi
                )
                self._do_groups_vec_minor.append((
                    idx,
                    build_vector_minor_tables(
                        self._do_nstr, nleg_ms, mu0, user_mu,
                        num_azimuth=num_azi,
                    ),
                    user_up, user_azi,
                ))
            else:
                tables = disco.build_mode_tables(
                    self._do_nstr, nleg_ms, mu0, user_mu, num_azimuth=num_azi
                )
            self._do_groups.append((idx, tables, user_up, user_azi))

        # Flux observers: per-SZA DO solves evaluated at the observer
        # altitudes (reference FluxObserverSolar, do_source_planeparallel.cpp
        # flux loop)
        self._flux_groups = []
        alts = self._geometry.altitudes()
        P = len(alts) - 1
        for mu0 in sorted({float(o.cos_sza) for o in self._flux_observers}):
            obs = [
                (i, o.observer_altitude_m)
                for i, o in enumerate(self._flux_observers)
                if float(o.cos_sza) == mu0
            ]
            idx = np.array([e[0] for e in obs])
            # interpolation of level-boundary quantities (TOA-first levels:
            # boundary b at altitude alts[::-1][b]) onto observer altitudes
            from .util.interpolation import linear_interpolating_matrix

            level_alts_toa_first = alts[::-1]
            interp = linear_interpolating_matrix(
                level_alts_toa_first[::-1],
                np.array([e[1] for e in obs]),
                "extend",
            )[:, ::-1]  # [nobs, P+1] in TOA-first boundary order
            if self._config.num_stokes == 3:
                from .rt import disco_vec

                tables = disco_vec.build_vector_mode_tables(
                    self._do_nstr, self._do_nstr, mu0, np.array([0.5]),
                    num_azimuth=1,
                )
            else:
                tables = disco.build_mode_tables(
                    self._do_nstr, self._do_nstr, mu0, np.array([0.5]),
                    num_azimuth=1,
                )
            self._flux_groups.append((idx, tables, interp))

        # Limb rays: DO solve per SZA + analytic source evaluation along
        # the traced spherical rays (reference interpolated DO source,
        # ``do_source_interpolated_pp.cpp``). With num_do_sza > 1 the DO
        # field is solved on a SZA grid spanning the rays' local solar
        # zenith range and the source is interpolated per boundary
        # (reference SZA-grid storage, ``do_source_diffuse_storage.cpp``).
        self._limb_groups = []
        self._limb_groups_vec_minor = []
        self._limb_sza_weights = None
        if limb_groups:
            from .rt import do_source

            polarized = self._config.num_stokes == 3

            def limb_tables(mu0):
                if polarized:
                    from .rt import disco_vec

                    return disco_vec.build_vector_mode_tables(
                        self._do_nstr, nleg_ms, mu0, np.array([0.5]),
                        num_azimuth=num_azi,
                    )
                return disco.build_mode_tables(
                    self._do_nstr, nleg_ms, mu0, np.array([0.5]),
                    num_azimuth=num_azi,
                )

            def limb_tables_minor(mu0):
                from .rt.disco_vec_minor import build_vector_minor_tables

                return build_vector_minor_tables(
                    self._do_nstr, nleg_ms, mu0, np.array([0.5]),
                    num_azimuth=num_azi,
                )

            if polarized:
                self._ray_ms_tables = do_source.build_ray_vector_tables(
                    self._traced, nleg_ms, num_azi
                )
            else:
                self._ray_ms_tables = do_source.build_ray_angular_tables(
                    self._traced, nleg_ms, num_azi
                )
            n_sza = max(1, self._config.num_do_sza)
            all_idx = np.concatenate([np.array(v) for v in limb_groups.values()])
            if n_sza == 1:
                for mu0, idx in limb_groups.items():
                    self._limb_groups.append(
                        (np.array(idx), [limb_tables(mu0)])
                    )
                    if polarized:
                        self._limb_groups_vec_minor.append(
                            (np.array(idx), [limb_tables_minor(mu0)])
                        )
            else:
                cs = self._traced.cos_sza[all_idx]
                seg_mask = self._traced.mask[all_idx]
                # boundary b is real when segment b or segment b-1 exists
                bmask = np.zeros(cs.shape)
                bmask[:, :-1] += seg_mask
                bmask[:, 1:] += seg_mask
                cs_valid = cs[bmask > 0]
                lo, hi = float(cs_valid.min()), float(cs_valid.max())
                if hi - lo < 1e-6:
                    hi = lo + 1e-6
                sza_grid = np.linspace(lo, hi, n_sza)
                tables_list = [limb_tables(float(m0)) for m0 in sza_grid]
                # per-boundary linear interpolation weights on the sza grid
                from .util.interpolation import linear_interpolating_matrix

                B = self._traced.cos_sza.shape[1]
                wts = np.zeros((len(self._traced.cos_sza), B, n_sza))
                interp = linear_interpolating_matrix(
                    sza_grid, self._traced.cos_sza.ravel(), "extend"
                )
                wts = interp.reshape(
                    self._traced.cos_sza.shape + (n_sza,)
                )
                self._limb_sza_weights = wts
                self._limb_groups.append((all_idx, tables_list))
                if polarized:
                    self._limb_groups_vec_minor.append((
                        all_idx,
                        [limb_tables_minor(float(m0)) for m0 in sza_grid],
                    ))

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
        omega = safe_div(ks_avg, k_avg)

        def avg_leg(lc):
            bl = lc[..., :-1, :] * ks_lo[..., None]
            bh = lc[..., 1:, :] * ks_hi[..., None]
            beta = safe_div(0.5 * (bl + bh), ks_avg[..., None])
            return beta[..., ::-1, :]

        if isinstance(leg_coeff, (tuple, list)):
            betas = tuple(avg_leg(lc) for lc in leg_coeff)
            return dtau[..., ::-1], omega[..., ::-1], betas
        # flip to TOA-first layer order
        return (
            dtau[..., ::-1],
            omega[..., ::-1],
            avg_leg(leg_coeff),
        )

    def _radiance_single_wavelength(self, core, skip_do_groups=False):
        """Radiance [nlos] for one wavelength's core inputs (each leading
        axis W removed). Differentiated per-wavelength via vjp.

        ``skip_do_groups``: omit the plane-parallel DO-group radiance (it
        is computed batch-wise by the wavelength-minor two-stream fast
        path, ``_twostream_do_groups_batched``)."""
        cfg = self._config
        ext = core["extinction"][None, :]
        ssa = core["ssa"][None, :]
        leg = core["leg_coeff"][None, :, :]
        alb = core["albedo"][None]
        emis = core["emission"][None, :]

        f0 = core["solar_irradiance"]
        surf_em = core.get("surface_emission", jnp.zeros_like(alb[..., 0]))

        nlos = len(self._rays)

        if cfg.num_stokes == 3:
            return self._radiance_polarized(core, skip_do_groups)

        if self._is_2d:
            from .config import EmissionSource

            rad = jnp.zeros((nlos,), dtype=ext.dtype)
            if self._needs_ss_exact:
                rad = rad + f0 * singlescatter.integrate_single_scatter_2d(
                    ext, ssa, leg, self._traced2d, self._phase_tab2d
                )[0]
            ground2d = jnp.asarray(
                self._traced2d.ground_hit, dtype=ext.dtype
            )
            if cfg.emission_source == EmissionSource.Standard:
                rad = rad + singlescatter.emission_radiance_2d(
                    ext, ssa, emis, self._traced2d
                )[0]
                # attenuated surface emission for ground-hitting rays
                # (reference 2D ground surface-emission test)
                od2 = singlescatter.optical_depth_2d(ext, self._traced2d)
                rad = rad + (
                    ground2d * (1.0 - alb[..., 0]) * surf_em
                    * jnp.exp(-od2)[0]
                )
            if cfg.emission_source == EmissionSource.VolumeEmissionRate:
                rad = rad + singlescatter.ver_emission_radiance_2d(
                    ext, emis, self._traced2d
                )[0]
            if cfg.occultation_source == OccultationSource.Standard:
                od2 = singlescatter.optical_depth_2d(ext, self._traced2d)
                rad = rad + jnp.exp(-od2)[0] * (1.0 - ground2d)
            return rad

        rad = jnp.zeros((nlos,), dtype=ext.dtype)

        if self._needs_ss_exact:
            # exact single scatter is solar-driven: scales with F0
            rad = rad + f0 * singlescatter.integrate_single_scatter(
                ext, ssa, leg, alb, self._traced, self._phase_tab,
            )[0]

        from .config import EmissionSource

        emission_standard = cfg.emission_source == EmissionSource.Standard
        emission_do = cfg.emission_source in (
            EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
        )
        if emission_standard:
            rad = rad + singlescatter.emission_radiance(
                ext, ssa, emis, alb, surf_em[None], self._traced
            )[0]
        if cfg.emission_source == EmissionSource.VolumeEmissionRate:
            rad = rad + singlescatter.ver_emission_radiance(
                ext, emis, self._traced
            )[0]

        if cfg.occultation_source == OccultationSource.Standard:
            rad = rad + singlescatter.occultation_radiance(ext, self._traced)[0]

        if self._needs_so:
            from .rt import successive
            from .rt.singlescatter import integrate_od_source

            j_init = None
            if self._so_do_init:
                from .rt import do_source as do_source_mod

                dtau_so, omega_so, beta_so = self._layer_optical(
                    ext, ssa, leg
                )
                _, do_internal = disco.solve_plane_parallel(
                    dtau_so, omega_so, beta_so, alb, self._so_do_tables,
                    np.array([True]), np.array([0.0]),
                    include_ss=False,
                    return_internal=True,
                )
                j_init = do_source_mod.ms_source_on_levels(
                    do_internal, self._so_dir_tables
                )
            if len(self._so_geoms) == 1:
                _, j_field, i_ground = successive.successive_orders_field(
                    ext, ssa, leg, alb, self._so_geom,
                    cfg.num_successive_orders_iterations,
                    j_init=j_init,
                )
                j_in, j_out = successive.so_source_along_rays(
                    j_field, self._traced, self._so_obs_tables
                )
                i_ground_ray = i_ground[:, None]  # [W, 1] broadcast
            else:
                # SZA-grid diffuse profiles: solve the SO field per grid
                # SZA and interpolate the LOS source at each boundary's
                # local SZA (reference DiffuseTable SZA x altitude grid)
                j_in_list, j_out_list, ig_list = [], [], []
                for g, ot in zip(self._so_geoms,
                                 self._so_obs_tables_list):
                    _, j_field, ig = successive.successive_orders_field(
                        ext, ssa, leg, alb, g,
                        cfg.num_successive_orders_iterations,
                        j_init=None,
                    )
                    ji, jo = successive.so_source_along_rays(
                        j_field, self._traced, ot
                    )
                    j_in_list.append(ji)
                    j_out_list.append(jo)
                    ig_list.append(ig)
                wts = jnp.asarray(
                    self._so_sza_weights, dtype=ext.dtype
                )  # [R, S+1, n]
                ji_stack = jnp.stack(j_in_list, axis=-1)   # [W, R, S, n]
                jo_stack = jnp.stack(j_out_list, axis=-1)
                S = ji_stack.shape[-2]
                j_in = jnp.einsum("wrsn,rsn->wrs", ji_stack, wts[:, :S])
                j_out = jnp.einsum(
                    "wrsn,rsn->wrs", jo_stack, wts[:, 1 : S + 1]
                )
                gw = jnp.asarray(
                    self._so_ground_sza_weights, dtype=ext.dtype
                )  # [R, n]
                ig_stack = jnp.stack(ig_list, axis=-1)     # [W, n]
                i_ground_ray = jnp.einsum("wn,rn->wr", ig_stack, gw)
            rad = rad + f0 * integrate_od_source(
                ext, j_in, j_out, self._traced
            )[0]
            # end-of-ray diffuse ground reflection for ground-hitting
            # observer rays (the direct-beam reflection is already in the
            # exact single-scatter ground term)
            ground_obs = jnp.asarray(
                self._traced.ground_hit, dtype=ext.dtype
            )
            od_obs = singlescatter.optical_depth(ext, self._traced)[0]
            rad = rad + f0 * ground_obs * i_ground_ray[0] * jnp.exp(-od_obs)

        if self._needs_do:
            from .rt import do_source as do_source_mod
            from .rt.singlescatter import integrate_od_source

            dtau, omega, beta = self._layer_optical(ext, ssa, leg)
            brdf_kw = {}
            if self._surface_brdf is not None and "brdf_args" in core:
                brdf_kw = {
                    "brdf": self._surface_brdf,
                    "brdf_args": core["brdf_args"],
                }
            thermal_kw = {}
            if emission_do:
                # level emission -> (B at layer top, B at layer bottom),
                # TOA-first layer ordering
                b_top = emis[..., 1:][..., ::-1]
                b_bot = emis[..., :-1][..., ::-1]
                thermal_kw = {
                    "thermal_b0": b_top,
                    "thermal_b1_bottom": b_bot,
                    "surface_emission": surf_em[None],
                }
            chapman = self._chapman_factors(ext.dtype)
            if not skip_do_groups:
                for idx, tables, user_up, user_azi in self._do_groups:
                    r = disco.solve_plane_parallel(
                        dtau, omega, beta, alb, tables, user_up, user_azi,
                        include_ss=self._do_include_ss,
                        chapman=chapman.get(tables.mu0),
                        f0=f0,
                        num_azimuth=getattr(self, "_num_azi_eff", None),
                        **thermal_kw,
                        **brdf_kw,
                    )[0]
                    rad = rad.at[jnp.asarray(idx)].add(r)

            limb_groups = [] if skip_do_groups else self._limb_groups
            for idx, tables_list in limb_groups:
                j_in_list, j_out_list = [], []
                for tables in tables_list:
                    _, internal = disco.solve_plane_parallel(
                        dtau, omega, beta, alb, tables,
                        np.array([True]), np.array([0.0]),
                        include_ss=self._do_include_ss,
                        chapman=chapman.get(tables.mu0),
                        return_internal=True,
                        f0=f0,
                        num_azimuth=getattr(self, "_num_azi_eff", None),
                        **thermal_kw,
                    )
                    ji, jo = do_source_mod.ms_source_along_rays(
                        internal, self._traced, self._ray_ms_tables,
                        include_ss=self._do_include_ss,
                    )
                    j_in_list.append(ji)
                    j_out_list.append(jo)
                if len(tables_list) == 1:
                    j_in, j_out = j_in_list[0], j_out_list[0]
                else:
                    wts = jnp.asarray(
                        self._limb_sza_weights, dtype=ext.dtype
                    )  # [R, S+1, n_sza]
                    ji_stack = jnp.stack(j_in_list, axis=-1)   # [W,R,S,n]
                    jo_stack = jnp.stack(j_out_list, axis=-1)
                    S = ji_stack.shape[-2]
                    j_in = jnp.einsum(
                        "wrsn,rsn->wrs", ji_stack, wts[:, :S]
                    )
                    j_out = jnp.einsum(
                        "wrsn,rsn->wrs", jo_stack, wts[:, 1 : S + 1]
                    )
                ms_rad = integrate_od_source(ext, j_in, j_out, self._traced)[0]
                rad = rad.at[jnp.asarray(idx)].add(ms_rad[jnp.asarray(idx)])

        return rad

    def _radiance_polarized(self, core, skip_do_groups=False):
        """(I, Q, U) radiance [nlos, 3] for one wavelength. Multiple and
        single scatter both come from the polarized DO solve (the reference's
        Coulson validation configuration).

        ``skip_do_groups``: omit the plane-parallel DO-group radiance (it
        is computed batch-wise by the wavelength-minor polarized fast
        path, ``_polarized_do_groups_batched``)."""
        from .config import EmissionSource
        from .rt import disco_vec

        cfg = self._config
        ext = core["extinction"][None, :]
        ssa = core["ssa"][None, :]
        alb = core["albedo"][None]
        emis = core["emission"][None, :]
        f0 = core["solar_irradiance"]
        surf_em = core.get("surface_emission", jnp.zeros_like(alb[..., 0]))
        nlos = len(self._rays)
        rad = jnp.zeros((nlos, 3), dtype=ext.dtype)

        if self._needs_ss_exact:
            rad = rad + f0 * singlescatter.integrate_single_scatter_polarized(
                ext, ssa, core["leg_coeff"][None], core["leg_b1"][None],
                alb, self._traced, self._phase_tab, self._d02_tab,
            )[0]

        if cfg.occultation_source == OccultationSource.Standard:
            rad = rad.at[:, 0].add(
                singlescatter.occultation_radiance(ext, self._traced)[0]
            )
        if cfg.emission_source == EmissionSource.Standard:
            rad = rad.at[:, 0].add(
                singlescatter.emission_radiance(
                    ext, ssa, emis, alb, surf_em[None], self._traced
                )[0]
            )
        if cfg.emission_source == EmissionSource.VolumeEmissionRate:
            rad = rad.at[:, 0].add(
                singlescatter.ver_emission_radiance(
                    ext, emis, self._traced
                )[0]
            )

        if self._needs_so:
            from .rt import successive
            from .rt.singlescatter import integrate_od_source

            legs_so = (
                core["leg_coeff"][None], core["leg_a2"][None],
                core["leg_a3"][None], core["leg_b1"][None],
            )
            _, j_field, i_ground = (
                successive.successive_orders_field_polarized(
                    ext, ssa, legs_so, alb, self._so_geom,
                    self._so_pol_tabs,
                    cfg.num_successive_orders_iterations,
                )
            )
            j_in, j_out = successive.so_source_along_rays_polarized(
                j_field, self._traced, self._so_obs_tables
            )
            ms_rad = jax.vmap(
                lambda ji, jo: integrate_od_source(
                    ext, ji, jo, self._traced
                ),
                in_axes=-1, out_axes=-1,
            )(j_in, j_out)[0]  # [nlos, 3]
            rad = rad + f0 * ms_rad
            ground_obs = jnp.asarray(
                self._traced.ground_hit, dtype=ext.dtype
            )
            od_obs = singlescatter.optical_depth(ext, self._traced)[0]
            rad = rad.at[:, 0].add(
                f0 * ground_obs * i_ground[0] * jnp.exp(-od_obs)
            )

        if self._needs_do and not skip_do_groups:
            legs = (
                core["leg_coeff"][None], core["leg_a2"][None],
                core["leg_a3"][None], core["leg_b1"][None],
            )
            dtau, omega, (a1, a2, a3, b1) = self._layer_optical(ext, ssa, legs)
            brdf_kw = {}
            if self._surface_brdf is not None and "brdf_args" in core:
                brdf_kw = {
                    "brdf": self._surface_brdf,
                    "brdf_args": core["brdf_args"],
                }
            thermal_kw = {}
            if cfg.emission_source in (
                EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
            ):
                thermal_kw = {
                    "thermal_b0": emis[..., 1:][..., ::-1],
                    "thermal_b1_bottom": emis[..., :-1][..., ::-1],
                    "surface_emission": surf_em[None],
                }
            chapman = self._chapman_factors(ext.dtype)
            for idx, tables, user_up, user_azi in self._do_groups:
                r = disco_vec.solve_plane_parallel_vector(
                    dtau, omega, a1, a2, a3, b1, alb, tables, user_up,
                    user_azi,
                    include_ss=self._do_include_ss,
                    chapman=chapman.get(tables.mu0),
                    f0=f0,
                    num_azimuth=getattr(self, "_num_azi_eff", None),
                    **thermal_kw,
                    **brdf_kw,
                )[0]
                rad = rad.at[jnp.asarray(idx)].add(r)

            if self._limb_groups:
                from .rt import do_source as do_source_mod
                from .rt.singlescatter import integrate_od_source

                for idx, tables_list in self._limb_groups:
                    j_in_list, j_out_list = [], []
                    for tables in tables_list:
                        _, internal = disco_vec.solve_plane_parallel_vector(
                            dtau, omega, a1, a2, a3, b1, alb, tables,
                            np.array([True]), np.array([0.0]),
                            include_ss=self._do_include_ss,
                            chapman=chapman.get(tables.mu0),
                            return_internal=True,
                            f0=f0,
                            num_azimuth=getattr(self, "_num_azi_eff", None),
                            **thermal_kw,
                        )
                        ji, jo = do_source_mod.ms_source_along_rays_vec(
                            internal, self._traced, self._ray_ms_tables,
                            include_ss=self._do_include_ss,
                        )
                        j_in_list.append(ji)
                        j_out_list.append(jo)
                    if len(tables_list) == 1:
                        j_in, j_out = j_in_list[0], j_out_list[0]
                    else:
                        wts = jnp.asarray(
                            self._limb_sza_weights, dtype=ext.dtype
                        )  # [R, S+1, n_sza]
                        ji_stack = jnp.stack(j_in_list, axis=-1)  # [W,R,S,3,n]
                        jo_stack = jnp.stack(j_out_list, axis=-1)
                        S = ji_stack.shape[-3]
                        j_in = jnp.einsum(
                            "wrscn,rsn->wrsc", ji_stack, wts[:, :S]
                        )
                        j_out = jnp.einsum(
                            "wrscn,rsn->wrsc", jo_stack, wts[:, 1 : S + 1]
                        )
                    ms_rad = jax.vmap(
                        lambda ji, jo: integrate_od_source(
                            ext, ji, jo, self._traced
                        ),
                        in_axes=-1, out_axes=-1,
                    )(j_in, j_out)[0]  # [R, 3]
                    rad = rad.at[jnp.asarray(idx)].add(
                        ms_rad[jnp.asarray(idx)]
                    )
        return rad.ravel()

    def _flux_single_wavelength(self, core):
        """Fluxes [ntypes, nobs] for one wavelength (m=0 stream sums of the
        DO field at the flux-observer altitudes; reference flux loop,
        ``do_source_planeparallel.cpp:536-560``)."""
        from .config import EmissionSource, FluxType

        cfg = self._config
        ext = core["extinction"][None, :]
        ssa = core["ssa"][None, :]
        leg = core["leg_coeff"][None, :, :]
        alb = core["albedo"][None]
        emis = core["emission"][None, :]
        f0 = core["solar_irradiance"]
        surf_em = core.get("surface_emission", jnp.zeros_like(alb[..., 0]))

        emission_do = cfg.emission_source in (
            EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
        )
        polarized = cfg.num_stokes == 3
        if polarized:
            from .rt import disco_vec

            legs = (
                core["leg_coeff"][None], core["leg_a2"][None],
                core["leg_a3"][None], core["leg_b1"][None],
            )
            dtau, omega, (a1, a2, a3, b1) = self._layer_optical(
                ext, ssa, legs
            )
        else:
            dtau, omega, beta = self._layer_optical(ext, ssa, leg)
        thermal_kw = {}
        if emission_do:
            thermal_kw = {
                "thermal_b0": emis[..., 1:][..., ::-1],
                "thermal_b1_bottom": emis[..., :-1][..., ::-1],
                "surface_emission": surf_em[None],
            }
        chapman = self._chapman_factors(ext.dtype)

        nobs = len(self._flux_observers)
        ntypes = len(cfg.flux_types)
        flux = jnp.zeros((ntypes, nobs), dtype=ext.dtype)
        two_pi = 2.0 * jnp.pi
        mu = None
        for idx, tables, interp in self._flux_groups:
            if polarized:
                # the reference's flux sums only the I components of the
                # stream fields (``do_source_planeparallel.cpp`` h_lidx =
                # l * NSTOKES), so polarized fluxes reuse the scalar
                # formulas on the vector solve's I slices
                _, internal = disco_vec.solve_plane_parallel_vector(
                    dtau, omega, a1, a2, a3, b1, alb, tables,
                    np.array([True]), np.array([0.0]),
                    include_ss=self._do_include_ss,
                    chapman=chapman.get(tables.mu0),
                    return_internal=True,
                    f0=f0,
                    num_azimuth=1,
                    **thermal_kw,
                )
                lv = {
                    k: v[..., 0::3] for k, v in internal["levels"].items()
                }
            else:
                _, internal = disco.solve_plane_parallel(
                    dtau, omega, beta, alb, tables,
                    np.array([True]), np.array([0.0]),
                    include_ss=self._do_include_ss,
                    chapman=chapman.get(tables.mu0),
                    return_internal=True,
                    f0=f0,
                    num_azimuth=1,
                    **thermal_kw,
                )
                lv = internal["levels"]
            w = internal["w_quad"]
            muq = jnp.asarray(tables.mu, dtype=ext.dtype)
            # boundary fields TOA-first: tops of each layer + ground
            ip = jnp.concatenate(
                [lv["i_plus_top"][0], lv["i_plus_bot"][0][..., -1:, :]],
                axis=-2,
            )[0]  # [P+1, N]
            im = jnp.concatenate(
                [lv["i_minus_top"][0], lv["i_minus_bot"][0][..., -1:, :]],
                axis=-2,
            )[0]
            t_b = jnp.concatenate(
                [internal["t_top"][0], internal["t_ground"][0][None]], axis=-1
            )  # [P+1]
            wmu = w * muq
            f_up = two_pi * ip @ wmu
            f_dn_diff = two_pi * im @ wmu
            direct = (
                tables.mu0 * f0 * t_b if self._do_include_ss else 0.0 * t_b
            )
            f_dn = f_dn_diff + direct
            f_act = two_pi * (ip + im) @ w + (
                f0 * t_b if self._do_include_ss else 0.0 * t_b
            )
            # flux divergence = absorbed power density d(F_dn - F_up)/dz =
            # k_abs * F_actinic - 4 pi k_abs B (thermal).  NOTE: the
            # reference declares FluxType::divergence (config.h:175) but no
            # native code path computes it; this is the physically
            # consistent definition (validated against dF_net/dz).
            kabs_b = (ext * (1.0 - ssa))[..., ::-1][0]  # TOA-first levels
            f_div = kabs_b * f_act
            if emission_do:
                f_div = f_div - 4.0 * jnp.pi * kabs_b * emis[..., ::-1][0]
            interp_j = jnp.asarray(interp, dtype=ext.dtype)
            per_type = {
                FluxType.Upwelling: f_up,
                FluxType.Downwelling: f_dn,
                FluxType.Actinic: f_act,
                FluxType.Divergence: f_div,
            }
            for ti, ftype in enumerate(cfg.flux_types):
                if ftype not in per_type:
                    msg = f"Flux type {ftype} not implemented"
                    raise NotImplementedError(msg)
                vals = interp_j @ per_type[ftype]
                flux = flux.at[ti, jnp.asarray(idx)].set(vals)
        return flux

    @functools.lru_cache(maxsize=4)
    def _chapman_cache(self, dtype_name):
        """Pseudo-spherical chapman factors per DO solar-zenith group
        (static). Covers every solve group — nadir/ground DO groups, the
        SZA-gridded limb source solves, and flux-observer solves — mirroring
        the reference's per-SZA chapman factors
        (``sktran_do_layerarray.cpp:908-932``)."""
        out = {}
        if not self._needs_do:
            return out
        geom_type = self._geometry.geometry_type
        alts = self._geometry.altitudes()
        P = len(alts) - 1
        re = self._geometry.earth_radius_m
        all_tables = [tables for _, tables, _, _ in self._do_groups]
        all_tables += [
            t for _, tables_list in getattr(self, "_limb_groups", [])
            for t in tables_list
        ]
        all_tables += [
            tables for _, tables, _ in getattr(self, "_flux_groups", [])
        ]
        for tables in all_tables:
            mu0 = tables.mu0
            if mu0 in out:
                continue
            if geom_type == GeometryType.PlaneParallel:
                out[mu0] = None  # default 1/mu0 inside the solver
                continue
            # spherical shell chapman: layer p bottom boundary at radius
            # r_p; slant path of the solar beam through layer q above
            radii = re + alts  # bottom-up levels
            # layer boundaries top-down: layer p spans levels [A-1-p, A-2-p]
            c = np.zeros((P, P))
            if self._config.solar_refraction:
                from .rt.refraction import RefractiveShellIntegrator

                integ = RefractiveShellIntegrator(
                    radii, self._geometry.refractive_index
                )
                for p in range(P):
                    r_b = radii[P - 1 - p]
                    row = integ.chapman_row(r_b, mu0)  # bottom-up shells
                    c[p, : p + 1] = row[::-1][: p + 1]
                out[mu0] = c
                continue
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
    def _twostream_fast_ok(self):
        """The wavelength-minor fast path applies when every multiple-
        scatter contribution is a plane-parallel DO-group solve (scalar
        radiance). nstr=2 Lambertian groups dispatch to the closed-form
        two-stream solver (``rt/twostream.py``); everything else to the
        scan-based N-stream solver (``rt/disco_nstream.py``), which also
        carries BRDF surfaces for ground/nadir groups via the shared
        azimuth-moment quadrature. BRDF limb scans and BRDF flux
        observers keep the generic route."""
        brdf_ok = getattr(self, "_surface_brdf", None) is None or (
            not self._limb_groups and len(self._flux_observers) == 0
        )
        return (
            not self._is_2d
            and self._config.num_stokes == 1
            and self._needs_do
            and bool(self._do_groups or self._limb_groups)
            and not self._needs_so
            and brdf_ok
        )

    def _polarized_fast_ok(self):
        """The wavelength-minor polarized fast path applies when every
        multiple-scatter contribution is a DO-group solve — ground/nadir
        rays AND limb scans (SZA-interpolated vector source) — with a
        Lambertian surface and no thermal DO source. SO, BRDF and flux
        observers keep the generic per-wavelength route."""
        from .config import EmissionSource

        return (
            not self._is_2d
            and self._config.num_stokes == 3
            and self._needs_do
            and bool(
                self._do_groups_vec_minor or self._limb_groups_vec_minor
            )
            and len(self._limb_groups) == len(self._limb_groups_vec_minor)
            and not self._needs_so
            and len(self._flux_observers) == 0
            and getattr(self, "_surface_brdf", None) is None
            and self._config.emission_source not in (
                EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
            )
        )

    def _effective_num_azimuth(self, core_np):
        """Static azimuth-mode truncation from the phase expansion's
        support — the TPU analog of the reference's azimuth convergence
        early-exit (``do_source.cpp:47-57``). DO mode m contracts only
        Legendre/greek moments with l >= m in both its scattering kernel
        and its beam source, so when every moment with l >= m is exactly
        zero the mode's radiance is exactly zero and the mode scan can
        stop at m. The count is computed host-side from the numpy inputs
        before tracing and participates in the jit key (a Rayleigh
        atmosphere at nstr=16 solves 3 modes instead of 16 — same
        result, bit-for-bit in exact arithmetic).

        Disabled (returns None = solver default) under forced azimuth or
        a BRDF surface: BRDF azimuth moments couple the direct beam into
        every mode regardless of the phase expansion."""
        if self._config.num_forced_azimuth > 0:
            return None
        if getattr(self, "_surface_brdf", None) is not None:
            return None
        lmax = 0
        for key in ("leg_coeff", "leg_a2", "leg_a3", "leg_b1"):
            arr = core_np.get(key)
            if arr is None:
                continue
            nz = np.any(np.asarray(arr) != 0.0,
                        axis=tuple(range(np.ndim(arr) - 1)))
            if nz.any():
                lmax = max(lmax, int(np.max(np.nonzero(nz)[0])))
        return lmax + 1

    def _polarized_do_groups_batched(self, core):
        """All polarized DO-group radiances for the whole wavelength batch
        via the wavelength-minor vector solver
        (``rt/disco_vec_minor.solve_nstream_vector``). core arrays are
        wavelength-leading; returns [W, nlos, 3] with zeros at rays not
        covered by a DO group."""
        from .rt.disco_vec_minor import solve_nstream_vector

        ext = core["extinction"]  # [W, A]
        ssa = core["ssa"]
        alb = core["albedo"]
        f0 = core["solar_irradiance"]
        legs = (
            core["leg_coeff"], core["leg_a2"],
            core["leg_a3"], core["leg_b1"],
        )
        dtau, omega, (a1, a2, a3, b1) = self._layer_optical(ext, ssa, legs)
        dtau_t = jnp.moveaxis(dtau, 0, -1)        # [P, W]
        omega_t = jnp.moveaxis(omega, 0, -1)
        a1_t = jnp.transpose(a1, (2, 1, 0))       # [L, P, W]
        a2_t = jnp.transpose(a2, (2, 1, 0))
        a3_t = jnp.transpose(a3, (2, 1, 0))
        b1_t = jnp.transpose(b1, (2, 1, 0))

        chapman = self._chapman_factors(ext.dtype)
        W = ext.shape[0]
        rad = jnp.zeros((W, len(self._rays), 3), dtype=ext.dtype)
        for idx, tables, user_up, user_azi in self._do_groups_vec_minor:
            r = solve_nstream_vector(
                dtau_t, omega_t, a1_t, a2_t, a3_t, b1_t, alb, tables,
                user_up, user_azi,
                include_ss=self._do_include_ss,
                chapman=chapman.get(tables.mu0),
                f0=f0,
                num_azimuth=getattr(self, "_num_azi_eff", None),
            )  # [U, 3, W]
            rad = rad.at[:, jnp.asarray(idx)].add(
                jnp.transpose(r, (2, 0, 1))
            )

        # limb groups: wavelength-minor vector internals + segment
        # sources (the generic polarized limb block, batched over W)
        if self._limb_groups_vec_minor:
            from .rt import do_source as do_source_mod
            from .rt.singlescatter import integrate_od_source

            for idx, tables_list in self._limb_groups_vec_minor:
                j_in_list, j_out_list = [], []
                for tables in tables_list:
                    _, internal = solve_nstream_vector(
                        dtau_t, omega_t, a1_t, a2_t, a3_t, b1_t, alb,
                        tables,
                        np.array([True]), np.array([0.0]),
                        include_ss=self._do_include_ss,
                        chapman=chapman.get(tables.mu0),
                        f0=f0,
                        return_internal=True,
                        num_azimuth=getattr(self, "_num_azi_eff", None),
                    )
                    ji, jo = do_source_mod.ms_source_along_rays_vec_minor(
                        internal, self._traced, self._ray_ms_tables,
                        include_ss=self._do_include_ss,
                    )  # [R, S, 3, W]
                    j_in_list.append(jnp.moveaxis(ji, -1, 0))
                    j_out_list.append(jnp.moveaxis(jo, -1, 0))
                if len(tables_list) == 1:
                    j_in, j_out = j_in_list[0], j_out_list[0]
                else:
                    wts = jnp.asarray(
                        self._limb_sza_weights, dtype=ext.dtype
                    )  # [R, S+1, n]
                    ji_stack = jnp.stack(j_in_list, axis=-1)
                    jo_stack = jnp.stack(j_out_list, axis=-1)
                    S = ji_stack.shape[-3]
                    j_in = jnp.einsum(
                        "wrscn,rsn->wrsc", ji_stack, wts[:, :S]
                    )
                    j_out = jnp.einsum(
                        "wrscn,rsn->wrsc", jo_stack, wts[:, 1 : S + 1]
                    )
                ms_rad = jax.vmap(
                    lambda ji, jo: integrate_od_source(
                        ext, ji, jo, self._traced
                    ),
                    in_axes=-1, out_axes=-1,
                )(j_in, j_out)  # [W, R, 3]
                rad = rad.at[:, jnp.asarray(idx)].add(
                    ms_rad[:, jnp.asarray(idx)]
                )
        return rad

    def _twostream_do_groups_batched(self, core):
        """All DO-group radiances for the whole wavelength batch via the
        wavelength-minor solvers (``rt/twostream.py`` at nstr=2,
        ``rt/disco_nstream.py`` otherwise). core arrays are wavelength-
        leading; returns [W, nlos] with zeros at rays not covered by a DO
        group."""
        from .config import EmissionSource
        from .rt.disco_nstream import solve_nstream
        from .rt.twostream import solve_twostream

        cfg = self._config
        ext = core["extinction"]  # [W, A]
        ssa = core["ssa"]
        leg = core["leg_coeff"]
        alb = core["albedo"]
        emis = core["emission"]
        f0 = core["solar_irradiance"]
        surf_em = core.get("surface_emission", jnp.zeros_like(alb))

        dtau, omega, beta = self._layer_optical(ext, ssa, leg)
        dtau_t = jnp.moveaxis(dtau, 0, -1)        # [P, W]
        omega_t = jnp.moveaxis(omega, 0, -1)
        beta_t = jnp.transpose(beta, (2, 1, 0))   # [L, P, W]

        thermal_kw = {}
        if cfg.emission_source in (
            EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
        ):
            b_top = emis[..., 1:][..., ::-1]      # [W, P]
            b_bot = emis[..., :-1][..., ::-1]
            thermal_kw = {
                "thermal_b0": jnp.moveaxis(b_top, 0, -1),
                "thermal_b1_bottom": jnp.moveaxis(b_bot, 0, -1),
                "surface_emission": surf_em,
            }
        brdf_kw = {}
        if self._surface_brdf is not None and "brdf_args" in core:
            brdf_kw = {
                "brdf": self._surface_brdf,
                "brdf_args": core["brdf_args"],
            }
        chapman = self._chapman_factors(ext.dtype)
        W = ext.shape[0]
        rad = jnp.zeros((W, len(self._rays)), dtype=ext.dtype)
        for idx, tables, user_up, user_azi in self._do_groups:
            # BRDF surfaces ride the N-stream minor solver at any nstr
            # (the closed-form two-stream path is Lambertian-only)
            solver = (
                solve_twostream
                if self._do_nstr == 2 and not brdf_kw
                else solve_nstream
            )
            r = solver(
                dtau_t, omega_t, beta_t, alb, tables, user_up, user_azi,
                include_ss=self._do_include_ss,
                chapman=chapman.get(tables.mu0),
                f0=f0,
                num_azimuth=getattr(self, "_num_azi_eff", None),
                **thermal_kw,
                **brdf_kw,
            )  # [U, W]
            rad = rad.at[:, jnp.asarray(idx)].add(jnp.moveaxis(r, 0, -1))

        # limb groups: wavelength-minor N-stream internals + segment
        # sources (exactly the generic limb block, batched over W)
        if self._limb_groups:
            from .rt import do_source as do_source_mod
            from .rt.singlescatter import integrate_od_source

            for idx, tables_list in self._limb_groups:
                j_in_list, j_out_list = [], []
                for tables in tables_list:
                    _, internal = solve_nstream(
                        dtau_t, omega_t, beta_t, alb, tables,
                        np.array([True]), np.array([0.0]),
                        include_ss=self._do_include_ss,
                        chapman=chapman.get(tables.mu0),
                        f0=f0,
                        return_internal=True,
                        num_azimuth=getattr(self, "_num_azi_eff", None),
                        **thermal_kw,
                    )
                    ji, jo = do_source_mod.ms_source_along_rays_minor(
                        internal, self._traced, self._ray_ms_tables,
                        include_ss=self._do_include_ss,
                    )
                    j_in_list.append(jnp.moveaxis(ji, -1, 0))   # [W, R, S]
                    j_out_list.append(jnp.moveaxis(jo, -1, 0))
                if len(tables_list) == 1:
                    j_in, j_out = j_in_list[0], j_out_list[0]
                else:
                    wts = jnp.asarray(
                        self._limb_sza_weights, dtype=ext.dtype
                    )
                    ji_stack = jnp.stack(j_in_list, axis=-1)
                    jo_stack = jnp.stack(j_out_list, axis=-1)
                    S = ji_stack.shape[-2]
                    j_in = jnp.einsum(
                        "wrsn,rsn->wrs", ji_stack, wts[:, :S]
                    )
                    j_out = jnp.einsum(
                        "wrsn,rsn->wrs", jo_stack, wts[:, 1:S + 1]
                    )
                ms_rad = integrate_od_source(
                    ext, j_in, j_out, self._traced
                )  # [W, nlos]
                rad = rad.at[:, jnp.asarray(idx)].add(
                    ms_rad[:, jnp.asarray(idx)]
                )
        return rad

    def _flux_groups_batched(self, core):
        """Fluxes for the whole wavelength batch via the wavelength-minor
        m=0 N-stream level solve (``solve_nstream_m0_levels``). Mirrors
        ``_flux_single_wavelength``; returns [W, ntypes, nobs]."""
        from .config import EmissionSource, FluxType
        from .rt.disco_nstream import solve_nstream_m0_levels

        cfg = self._config
        ext = core["extinction"]  # [W, A]
        ssa = core["ssa"]
        leg = core["leg_coeff"]
        alb = core["albedo"]
        emis = core["emission"]
        f0 = core["solar_irradiance"]
        surf_em = core.get("surface_emission", jnp.zeros_like(alb))

        emission_do = cfg.emission_source in (
            EmissionSource.DiscreteOrdinates, EmissionSource.TwoStream,
        )
        dtau, omega, beta = self._layer_optical(ext, ssa, leg)
        dtau_t = jnp.moveaxis(dtau, 0, -1)
        omega_t = jnp.moveaxis(omega, 0, -1)
        beta_t = jnp.transpose(beta, (2, 1, 0))
        thermal_kw = {}
        if emission_do:
            b_top = emis[..., 1:][..., ::-1]
            b_bot = emis[..., :-1][..., ::-1]
            thermal_kw = {
                "thermal_b0": jnp.moveaxis(b_top, 0, -1),
                "thermal_b1_bottom": jnp.moveaxis(b_bot, 0, -1),
                "surface_emission": surf_em,
            }
        chapman = self._chapman_factors(ext.dtype)

        W = ext.shape[0]
        nobs = len(self._flux_observers)
        ntypes = len(cfg.flux_types)
        flux = jnp.zeros((W, ntypes, nobs), dtype=ext.dtype)
        two_pi = 2.0 * jnp.pi
        for idx, tables, interp in self._flux_groups:
            lv, t_top, t_ground = solve_nstream_m0_levels(
                dtau_t, omega_t, beta_t, alb, tables,
                include_ss=self._do_include_ss,
                chapman=chapman.get(tables.mu0),
                f0=f0,
                **thermal_kw,
            )
            wq = jnp.asarray(tables.w, dtype=ext.dtype)
            muq = jnp.asarray(tables.mu, dtype=ext.dtype)
            ip = jnp.concatenate(
                [lv["i_plus_top"], lv["i_plus_bot"][-1:]], axis=0
            )  # [P+1, N, W]
            im = jnp.concatenate(
                [lv["i_minus_top"], lv["i_minus_bot"][-1:]], axis=0
            )
            t_b = jnp.concatenate([t_top, t_ground[None]], axis=0)
            wmu = wq * muq
            f_up = two_pi * jnp.einsum("bnw,n->bw", ip, wmu)
            f_dn_diff = two_pi * jnp.einsum("bnw,n->bw", im, wmu)
            direct = (
                tables.mu0 * f0[None] * t_b
                if self._do_include_ss else 0.0 * t_b
            )
            f_dn = f_dn_diff + direct
            f_act = two_pi * jnp.einsum("bnw,n->bw", ip + im, wq) + (
                f0[None] * t_b if self._do_include_ss else 0.0 * t_b
            )
            kabs_b = jnp.moveaxis(
                (ext * (1.0 - ssa))[..., ::-1], 0, -1
            )  # [A(TOA-first), W]
            f_div = kabs_b * f_act
            if emission_do:
                f_div = f_div - 4.0 * jnp.pi * kabs_b * jnp.moveaxis(
                    emis[..., ::-1], 0, -1
                )
            interp_j = jnp.asarray(interp, dtype=ext.dtype)
            per_type = {
                FluxType.Upwelling: f_up,
                FluxType.Downwelling: f_dn,
                FluxType.Actinic: f_act,
                FluxType.Divergence: f_div,
            }
            for ti, ftype in enumerate(cfg.flux_types):
                if ftype not in per_type:
                    msg = f"Flux type {ftype} not implemented"
                    raise NotImplementedError(msg)
                vals = jnp.einsum("ob,bw->wo", interp_j, per_type[ftype])
                flux = flux.at[:, ti, jnp.asarray(idx)].set(vals)
        return flux

    def _build_jit(self, needs_leg_jac, needs_jac, with_flux):
        # TPU matmuls default to bf16 for f32 inputs; radiative transfer
        # needs full f32 accumulation throughout the solver.
        fast_vec = self._polarized_fast_ok()
        fast_ts = self._twostream_fast_ok() or fast_vec

        def outputs(core):
            rad = self._radiance_single_wavelength(core)
            if with_flux:
                flux = self._flux_single_wavelength(core)
                return jnp.concatenate([rad, flux.ravel()])
            return rad

        def per_wavelength(core):
            if not needs_jac:
                return outputs(core), {}
            out, vjp = jax.vjp(outputs, core)
            seeds = jnp.eye(out.shape[0], dtype=out.dtype)
            grads = jax.vmap(vjp)(seeds)[0]  # dict of [nout, ...]
            if not needs_leg_jac:
                grads = {
                    k: v for k, v in grads.items() if k != "leg_coeff"
                }
            return out, grads

        if fast_ts:
            # whole-batch function: per-wavelength sources minus the DO
            # groups (vmapped) + the wavelength-minor two-stream DO part.
            # Outputs are wavelength-diagonal in the inputs, so ONE
            # broadcast-seeded vjp per output yields all per-wavelength
            # Jacobian rows at once.
            def batched_outputs(core):
                rest = jax.vmap(
                    lambda c: self._radiance_single_wavelength(
                        c, skip_do_groups=True
                    )
                )(core)
                if fast_vec:
                    do_part = self._polarized_do_groups_batched(
                        core
                    ).reshape(rest.shape)
                else:
                    do_part = self._twostream_do_groups_batched(core)
                rad = rest + do_part
                if with_flux:
                    flux = self._flux_groups_batched(core)
                    return jnp.concatenate(
                        [rad, flux.reshape(rad.shape[0], -1)], axis=1
                    )
                return rad

            def batched(core):
                if not needs_jac:
                    return batched_outputs(core), {}
                out, vjp = jax.vjp(batched_outputs, core)
                nout = out.shape[1]
                seeds = jnp.broadcast_to(
                    jnp.eye(nout, dtype=out.dtype)[:, None, :],
                    (nout,) + out.shape,
                )
                # chunk the seed axis: a fully vmapped vjp carries the
                # output axis on EVERY solver cotangent, which at
                # production W x many-LOS limb scans exceeds HBM
                # (measured 27 GB at nout=20, W=512, nstr=16); chunks of
                # 4 bound cotangent memory while sharing the forward
                # residuals across chunks
                chunk = 4
                if nout <= chunk:
                    grads = jax.vmap(vjp)(seeds)[0]
                else:
                    padn = (-nout) % chunk
                    seeds_p = jnp.pad(
                        seeds, ((0, padn),) + ((0, 0),) * (seeds.ndim - 1)
                    ).reshape((nout + padn) // chunk, chunk, *out.shape)
                    grads = jax.lax.map(
                        lambda s: jax.vmap(vjp)(s)[0], seeds_p
                    )
                    grads = {
                        k: v.reshape((nout + padn,) + v.shape[2:])[:nout]
                        for k, v in grads.items()
                    }
                grads = {
                    k: jnp.moveaxis(v, 0, 1) for k, v in grads.items()
                    if needs_leg_jac or k != "leg_coeff"
                }
                return out, grads
        else:
            batched = jax.vmap(per_wavelength)

        def with_precision(core):
            with jax.default_matmul_precision("highest"):
                return batched(core)

        return jax.jit(with_precision)

    # ------------------------------------------------------------------
    def calculate_radiance(
        self, atmosphere: Atmosphere, mesh=None
    ) -> Dataset:
        """Run the forward model (+WFs). ``mesh``: an optional
        ``jax.sharding.Mesh`` with a "wavelength" axis — the wavelength
        batch is sharded across its devices (the TPU analog of the
        reference's OpenMP/Rayon wavelength threading,
        ``engine.cpp:560-572`` / ``bindings/engine.rs:164-266``); the
        solve is embarrassingly parallel along wavelength so XLA inserts
        no hot-path collectives."""
        core_np = atmosphere.internal_object()
        from .util.validation import validate_atmosphere_core

        nloc = (
            self._geometry.num_horizontal * self._geometry.num_altitudes
            if self._is_2d else self._geometry.num_altitudes
        )
        validate_atmosphere_core(
            core_np, nloc, self._config.input_validation_mode,
        )
        new_brdf = atmosphere.surface.brdf
        if getattr(self, "_surface_brdf", None) is not new_brdf:
            self._compute_jit = None  # different ground model -> new trace
        self._surface_brdf = new_brdf
        m_eff = self._effective_num_azimuth(core_np)
        if getattr(self, "_num_azi_eff", "unset") != m_eff:
            self._compute_jit = None  # different mode count -> new trace
        self._num_azi_eff = m_eff
        mappings = atmosphere.storage.derivative_mappings
        surf_mappings = atmosphere.surface.derivative_mappings
        needs_jac = atmosphere.calculate_derivatives and (
            len(mappings) > 0 or len(surf_mappings) > 0
        )
        needs_leg_jac = any(
            m.d_leg_coeff is not None and np.any(m.d_leg_coeff)
            for m in mappings.values()
        )

        with_flux = len(self._flux_observers) > 0 and self._needs_do
        key = (needs_leg_jac, needs_jac, with_flux)
        if self._compute_jit is None or self._jit_key != key:
            # solve-level observability (reference Tracy zones /
            # spdlog analog): variant retraces and per-call wall time at
            # DEBUG level on the `sasktran2_tpu.engine` logger
            _LOG.debug(
                "tracing new compute variant: needs_leg_jac=%s "
                "needs_jac=%s with_flux=%s fast_path=%s",
                needs_leg_jac, needs_jac, with_flux,
                self._twostream_fast_ok(),
            )
            self._compute_jit = self._build_jit(
                needs_leg_jac, needs_jac, with_flux
            )
            self._jit_key = key

        core = {
            k: jnp.asarray(v, dtype=self._dtype) for k, v in core_np.items()
        }
        W_in = next(iter(core.values())).shape[0]
        if mesh is not None:
            from .parallel import shard_core_wavelength

            core, W_in = shard_core_wavelength(core, mesh)
        t0 = time.perf_counter()
        full, grads = self._compute_jit(core)
        if mesh is not None:
            # trim the shard padding on every wavelength-leading output
            full = full[:W_in]
            grads = {k: v[:W_in] for k, v in grads.items()}
        # ONE device->host fetch for radiance + every gradient block: each
        # separate fetch through the device tunnel costs a ~30 ms round
        # trip, so fetching full + 5 grads individually spent ~5 extra
        # round trips per call (~60% of the engine-path per-call time at
        # W=1024 in the round-5 profile). device_get alone still
        # materializes leaves sequentially — start every D2H copy first
        # so the transfers overlap.
        for _leaf in jax.tree_util.tree_leaves((full, grads)):
            if hasattr(_leaf, "copy_to_host_async"):
                _leaf.copy_to_host_async()
        full, grads = jax.device_get((full, grads))
        full = np.asarray(full)
        if _LOG.isEnabledFor(logging.DEBUG):
            _LOG.debug(
                "calculate_radiance: W=%d nlos=%d jac=%s "
                "device-dispatch+host-fetch %.3f s",
                W_in, len(self._rays), needs_jac,
                time.perf_counter() - t0,
            )
        nlos = len(self._rays)
        nstokes = self._config.num_stokes
        nrad = nlos * nstokes
        rad = full[:, :nrad].reshape(-1, nlos, nstokes)
        rad = self._rotate_stokes(rad, 2)

        out = Dataset()
        out["radiance"] = DataArray(
            rad, ("wavelength", "los", "stokes")
        )
        if with_flux:
            ntypes = len(self._config.flux_types)
            nobs = len(self._flux_observers)
            flux = full[:, nrad:].reshape(-1, ntypes, nobs)
            flux_names = {0: "upwelling", 1: "downwelling", 2: "actinic",
                          3: "divergence"}
            for ti, ftype in enumerate(self._config.flux_types):
                out[f"{flux_names[ftype.value]}_flux"] = DataArray(
                    flux[:, ti, :], ("wavelength", "flux_location")
                )
        out_wavel = getattr(atmosphere, "_output_wavelengths_nm", None)
        if out_wavel is not None:
            out.coords["wavelength"] = out_wavel
        elif atmosphere.wavelengths_nm is not None:
            out.coords["wavelength"] = atmosphere.wavelengths_nm
        out.coords["stokes"] = ["I", "Q", "U", "V"][:nstokes]

        if needs_jac:
            self._assemble_wfs(out, atmosphere, grads, nlos, with_flux)

        if self._config.output_los_optical_depth:
            if self._is_2d:
                od = singlescatter.optical_depth_2d(
                    core["extinction"], self._traced2d
                )
            else:
                od = singlescatter.optical_depth(
                    core["extinction"], self._traced
                )
            out["los_optical_depth"] = DataArray(
                np.asarray(od), ("wavelength", "los")
            )

        if getattr(atmosphere, "_engine_lineshape", False):
            # EngineIntegratedLineShape: the engine ran on the fine grid;
            # map every wavelength-dimensioned output onto the output basis
            # (reference rebasis mapping_matrix, rust/rebasis/src/grid.rs:64)
            M = atmosphere._spectral_reduce  # [Wo, Wf]
            for vname in list(out.keys()):
                da = out[vname]
                if "wavelength" not in da.dims:
                    continue
                ax = da.dims.index("wavelength")
                vals = np.moveaxis(
                    np.tensordot(M, np.moveaxis(da.to_numpy(), ax, 0),
                                 axes=1),
                    0, ax,
                )
                out[vname] = DataArray(vals, da.dims)

        from .viewinggeo import ViewingGeometryContainer

        if isinstance(self._viewing, ViewingGeometryContainer):
            # merge per-ray geometry metadata (reference engine.py:245)
            out = self._viewing.add_geometry_to_radiance(out)
        return out

    # ------------------------------------------------------------------
    def _assemble_wfs(self, out: Dataset, atmosphere: Atmosphere, grads,
                      nlos=None, with_flux=False):
        """Map core-space gradients through the derivative mappings
        (reference ``OutputDerivMapped``, ``cpp/lib/output/``)."""
        if nlos is None:
            nlos = len(self._rays)
        flux_names = {0: "upwelling", 1: "downwelling", 2: "actinic",
                      3: "divergence"}
        ntypes = len(self._config.flux_types)
        nobs = len(self._flux_observers)

        ns = self._config.num_stokes
        nrad = nlos * ns

        def emit(name, wf, log_space=False):
            # wf: [W, nout(, extra)]; split into radiance + flux variables,
            # materializing the stokes axis
            rad_part = wf[:, :nrad].reshape(
                (wf.shape[0], nlos, ns) + wf.shape[2:]
            )
            if ns == 3:
                rad_part = self._rotate_stokes(rad_part, 2)
            if log_space:
                # log-radiance-space mapping (reference
                # ``outputc.cpp:153-162``): every stokes component's WF is
                # divided by the I component of the radiance
                rad = out["radiance"].to_numpy()  # [W, nlos, ns]
                intensity = rad[:, :, 0:1]
                intensity = intensity.reshape(
                    intensity.shape + (1,) * (rad_part.ndim - 3)
                )
                with np.errstate(invalid="ignore", divide="ignore"):
                    rad_part = np.where(
                        intensity != 0.0, rad_part / intensity, 0.0
                    )
            arrs = [(name, rad_part, ("wavelength", "los", "stokes"))]
            if with_flux:
                wf_flux = wf[:, nrad:].reshape(
                    (wf.shape[0], ntypes, nobs) + wf.shape[2:]
                )
                for ti, ftype in enumerate(self._config.flux_types):
                    fv = wf_flux[:, ti]
                    if log_space:
                        fname = f"{flux_names[ftype.value]}_flux"
                        fvals = out[fname].to_numpy()
                        fvals = fvals.reshape(
                            fvals.shape + (1,) * (fv.ndim - 2)
                        )
                        with np.errstate(invalid="ignore", divide="ignore"):
                            fv = np.where(fvals != 0.0, fv / fvals, 0.0)
                    arrs.append((
                        f"{name}_{flux_names[ftype.value]}_flux",
                        fv,
                        ("wavelength", "flux_location"),
                    ))
            return arrs
        jext = np.asarray(grads["extinction"]) if "extinction" in grads else None
        jssa = np.asarray(grads["ssa"]) if "ssa" in grads else None
        jem = np.asarray(grads["emission"]) if "emission" in grads else None
        jleg = np.asarray(grads["leg_coeff"]) if "leg_coeff" in grads else None
        jalb = np.asarray(grads["albedo"]) if "albedo" in grads else None
        # shapes: j* = [W, nlos, A(, L)]; jalb = [W, nlos]

        for name, m in atmosphere.storage.derivative_mappings.items():
            # [W, nout, A] core-space WF
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
            for vname, arr, dims in emit(assign, wf, m.log_radiance_space):
                # trailing axis is the altitude/output axis of the mapping
                da = DataArray(np.moveaxis(arr, -1, 0), (m.interp_dim, *dims))
                if vname in out:
                    out[vname] = out[vname] + da
                else:
                    out[vname] = da

        jbrdf = (
            np.asarray(grads["brdf_args"]) if "brdf_args" in grads else None
        )
        for name, m in atmosphere.surface.derivative_mappings.items():
            if jbrdf is not None and m.d_brdf.shape[1] == jbrdf.shape[-1]:
                wf = np.einsum("wuk,wk->wu", jbrdf, m.d_brdf)
            elif jalb is not None:
                wf = jalb * m.d_brdf[:, 0][:, None]
            else:
                continue
            for vname, arr, dims in emit(name, wf):
                out[vname] = DataArray(arr, dims)
