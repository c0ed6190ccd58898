"""HITRAN-style line-by-line absorption cross sections.

Role of the reference's ``rust/sasktran2-rs/src/optical/types/
line_absorber.rs`` + ``optical/line/db.rs``: given a catalogue of spectral
lines (center wavenumber, intensity at 296 K, air/self-broadened widths,
temperature exponent, pressure shift, lower-state energy), produce
absorption cross sections on a wavenumber grid at arbitrary (P, T) with
Voigt line shapes.

TPU-first: the (lines x grid) evaluation is chunked over lines with a
``lax.scan`` accumulating the spectrum, keeping peak memory at
``chunk x ngrid`` while the inner work is fully vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .base import OpticalProperty
from .lineshape import doppler_width, voigt_profile

C2 = 1.4387768775039339  # h c / k_B [cm K]


@dataclass
class LineCatalogue:
    """Line parameters (HITRAN .par semantics, wavenumbers in cm^-1)."""

    nu0: np.ndarray            # line centers [cm^-1]
    intensity: np.ndarray      # S at 296 K [cm^-1 / (molec cm^-2)]
    gamma_air: np.ndarray      # air-broadened HWHM at 296 K, 1 atm [cm^-1]
    gamma_self: np.ndarray
    n_air: np.ndarray          # temperature exponent
    delta_air: np.ndarray      # pressure shift [cm^-1/atm]
    elower: np.ndarray         # lower-state energy [cm^-1]
    molar_mass: float          # [kg/mol]
    einstein_a: np.ndarray | None = None  # A coefficient [1/s] (emission)
    iso_id: np.ndarray | None = None      # HITRAN isotopologue number
    g_upper: np.ndarray | None = None     # upper statistical weight g'
    g_lower: np.ndarray | None = None     # lower statistical weight g''
    quanta_upper: np.ndarray | None = None  # global upper quanta (str)
    quanta_lower: np.ndarray | None = None  # global lower quanta (str)
    # first-order line-mixing (Rosenkranz) coupling tables [nT, nlines]
    # tabulated at coupling_temps (AER line files; NaN where uncoupled)
    y_coupling: np.ndarray | None = None
    g_coupling: np.ndarray | None = None
    coupling_temps: np.ndarray | None = None


class LineAbsorber(OpticalProperty):
    """Line-by-line absorber (cross sections in m^2/molecule)."""

    def __init__(self, catalogue: LineCatalogue, partition_exponent=1.5,
                 line_chunk: int = 512, cutoff_cminv: float = 25.0,
                 enable_line_coupling: bool = False):
        self.cat = catalogue
        self.partition_exponent = partition_exponent
        self.line_chunk = line_chunk
        self.cutoff = cutoff_cminv
        self.enable_line_coupling = (
            enable_line_coupling and catalogue.y_coupling is not None
        )

    def cross_section_grid(self, wavenumber_cminv, pressure_pa, temperature_k,
                           self_vmr=0.0):
        """xs [len(P/T), len(grid)] in m^2. pressure/temperature arrays give
        one atmosphere level per row."""
        grid = jnp.asarray(np.atleast_1d(wavenumber_cminv), dtype=jnp.float64)
        p = np.atleast_1d(pressure_pa)
        t = np.atleast_1d(temperature_k)
        out = []
        for pi, ti in zip(p, t):
            out.append(self._xs_single(grid, float(pi), float(ti), self_vmr))
        return np.stack([np.asarray(o) for o in out])

    def _xs_single(self, grid, pressure_pa, temperature_k, self_vmr):
        cat = self.cat
        nlines = len(cat.nu0)
        chunk = self.line_chunk
        npad = (-nlines) % chunk

        def pad(a, fill=0.0):
            return jnp.asarray(
                np.concatenate([a, np.full(npad, fill)]), dtype=jnp.float64
            ).reshape(-1, chunk)

        # pad with nu0=1 (not 0) so the stimulated-emission ratio and the
        # Doppler width stay finite; padded intensities are zero anyway
        nu0 = pad(cat.nu0, 1.0)
        s0 = pad(cat.intensity)
        ga = pad(cat.gamma_air)
        gs = pad(cat.gamma_self)
        na = pad(cat.n_air)
        da = pad(cat.delta_air)
        el = pad(cat.elower)

        tref = 296.0
        p_atm = pressure_pa / 101325.0
        t = temperature_k

        # first-order line mixing: per-line Y(T), G(T) interpolated on the
        # host (T is a static float here); uncoupled lines get Y = G = 0
        if self.enable_line_coupling:
            ct = np.asarray(cat.coupling_temps, dtype=np.float64)
            tc = float(np.clip(t, ct[0], ct[-1]))
            j = int(np.clip(np.searchsorted(ct, tc) - 1, 0, ct.size - 2))
            f = (tc - ct[j]) / (ct[j + 1] - ct[j])
            y_line = (1 - f) * cat.y_coupling[j] + f * cat.y_coupling[j + 1]
            g_line = (1 - f) * cat.g_coupling[j] + f * cat.g_coupling[j + 1]
            y_line = np.nan_to_num(y_line)
            g_line = np.nan_to_num(g_line)
        else:
            y_line = np.zeros(nlines)
            g_line = np.zeros(nlines)
        yc = pad(y_line)
        gc = pad(g_line)

        def body(acc, inp):
            nu0c, s0c, gac, gsc, nac, dac, elc, ycc, gcc = inp
            # temperature-scaled intensity (HITRAN convention):
            # S(T) = S(296) Q(296)/Q(T) exp(-c2 E"/T)/exp(-c2 E"/296)
            #        (1-exp(-c2 nu0/T))/(1-exp(-c2 nu0/296))
            qratio = (tref / t) ** self.partition_exponent
            s = (
                s0c
                * qratio
                * jnp.exp(-C2 * elc / t)
                / jnp.exp(-C2 * elc / tref)
                * (1.0 - jnp.exp(-C2 * nu0c / t))
                / (1.0 - jnp.exp(-C2 * nu0c / tref))
            )
            gamma_l = (
                (tref / t) ** nac
                * (gac * (1.0 - self_vmr) + gsc * self_vmr)
                * p_atm
            )
            nu_shift = nu0c + dac * p_atm
            alpha_d = jnp.maximum(
                doppler_width(nu_shift, t, self.cat.molar_mass), 1e-12
            )
            dv = grid[None, :] - nu_shift[:, None]
            if self.enable_line_coupling:
                from .lineshape import voigt_profile_complex

                re_v, im_v = voigt_profile_complex(
                    grid[None, :], nu_shift[:, None], alpha_d[:, None],
                    gamma_l[:, None],
                )
                # sigma = S [(1 + P^2 G) ReW + P Y ImW] / (alpha sqrt(pi))
                prof = (
                    (1.0 + p_atm * p_atm * gcc)[:, None] * re_v
                    + (p_atm * ycc)[:, None] * im_v
                )
            else:
                prof = voigt_profile(
                    grid[None, :], nu_shift[:, None], alpha_d[:, None],
                    gamma_l[:, None],
                )
            prof = jnp.where(jnp.abs(dv) <= self.cutoff, prof, 0.0)
            return acc + jnp.sum(s[:, None] * prof, axis=0), None

        init = jnp.zeros_like(grid)
        acc, _ = jax.lax.scan(
            body, init, (nu0, s0, ga, gs, na, da, el, yc, gc)
        )
        # cm^2 -> m^2
        return acc * 1e-4

    def cross_sections(self, wavelengths_nm, altitudes_m=None,
                       pressure_pa=None, temperature_k=None, **kwargs):
        wvn = 1e7 / np.asarray(wavelengths_nm, dtype=np.float64)
        order = np.argsort(wvn)
        xs = self.cross_section_grid(wvn[order], pressure_pa, temperature_k)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return xs[:, inv]


def _float_or_nan(text):
    try:
        return float(text)
    except ValueError:
        return float("nan")


def load_hitran_par(path, molar_mass_kg_mol):
    """Parse a HITRAN 160-character .par line file into a LineCatalogue
    (role of the reference's ``optical/line/hitran_loader.rs``). Statistical
    weights g'/g'' live in columns 146:153 / 153:160 of full records and
    feed emission line weighting; short records leave them NaN."""
    nu0, s, aa, ga, gs, na, da, el = [], [], [], [], [], [], [], []
    iso, gp, gpp, qup, qlo = [], [], [], [], []
    with open(path) as f:
        for line in f:
            if len(line) < 100:
                continue
            iso.append(int(line[2:3]) if line[2:3].strip() else 1)
            nu0.append(float(line[3:15]))
            s.append(float(line[15:25]))
            aa.append(float(line[25:35]))
            ga.append(float(line[35:40]))
            gs.append(float(line[40:45]))
            el.append(float(line[45:55]))
            na.append(float(line[55:59]))
            da.append(float(line[59:67]))
            # global upper/lower quanta, HITRAN2004 cols 68-82 / 83-97
            qup.append(line[67:82].strip() if len(line) >= 97 else "")
            qlo.append(line[82:97].strip() if len(line) >= 97 else "")
            gp.append(_float_or_nan(line[146:153]) if len(line) >= 153
                      else float("nan"))
            gpp.append(_float_or_nan(line[153:160]) if len(line) >= 154
                       else float("nan"))
    return LineCatalogue(
        nu0=np.array(nu0), intensity=np.array(s),
        gamma_air=np.array(ga), gamma_self=np.array(gs),
        n_air=np.array(na), delta_air=np.array(da),
        elower=np.array(el), molar_mass=molar_mass_kg_mol,
        einstein_a=np.array(aa), iso_id=np.array(iso, dtype=np.int64),
        g_upper=np.array(gp), g_lower=np.array(gpp),
        quanta_upper=np.array(qup, dtype=object),
        quanta_lower=np.array(qlo, dtype=object),
    )


#: AER line-coupling tabulation temperatures [K]
AER_COUPLING_TEMPS = np.array([200.0, 250.0, 296.0, 340.0])

# HITRAN F100 fixed-width field layout (reference
# ``database/aer_line.py:_read_line_file_py`` / ``optical/line/
# aer_loader.rs``): molec_id, iso, nu, S, R, gamma_air, gamma_self,
# E'', n_air, delta_air, quanta/local-quanta fields, error codes, refs
_AER_WIDTHS = np.array([2, 1, 12, 10, 10, 5, 5, 10, 4, 8, 3, 3, 9, 9, 3, 6])
_AER_COLS = np.concatenate(([0], np.cumsum(_AER_WIDTHS)))


def load_aer_line_file(path, molar_mass_kg_mol):
    """Parse an AER line file (HITRAN F100 format with optional
    line-coupling continuation records) into a :class:`LineCatalogue`.

    Coupling records follow lines whose reference field ends in ``-N``;
    they carry first-order line-mixing Y and G at 200/250/296/340 K
    (reference ``database/aer_line.py``, ``optical/line/aer_loader.rs``).
    Fortran ``D`` exponents are accepted.
    """
    nu0, s, ga, gs, na, da, el, iso = [], [], [], [], [], [], [], []
    qup, qlo = [], []
    y_rows, g_rows = [], []
    nan4 = [float("nan")] * 4

    def _f(text):
        return float(text.replace("D", "E").replace("d", "E"))

    with open(path) as f:
        lines = iter(f)
        for line in lines:
            if not line.strip() or line[0] in (">", "%"):
                continue
            fields = [
                line[_AER_COLS[i]:_AER_COLS[i + 1]]
                for i in range(len(_AER_WIDTHS))
            ]
            iso.append(int(fields[1]) if fields[1].strip() else 1)
            nu0.append(_f(fields[2]))
            s.append(_f(fields[3]))
            ga.append(_f(fields[5]))
            gs.append(_f(fields[6]))
            el.append(_f(fields[7]))
            na.append(_f(fields[8]))
            da.append(_f(fields[9]))
            qup.append(fields[10].strip())
            qlo.append(fields[11].strip())
            ref = fields[15]
            if ref[-2:-1] == "-":
                lc = next(lines)
                y_rows.append([_f(lc[3:15]), _f(lc[26:39]),
                               _f(lc[50:63]), _f(lc[74:87])])
                g_rows.append([_f(lc[15:26]), _f(lc[39:50]),
                               _f(lc[63:74]), _f(lc[87:98])])
            else:
                y_rows.append(nan4)
                g_rows.append(nan4)

    y = np.array(y_rows, dtype=np.float64).T  # [4, L]
    g = np.array(g_rows, dtype=np.float64).T
    has_coupling = np.any(np.isfinite(y))
    return LineCatalogue(
        nu0=np.array(nu0), intensity=np.array(s),
        gamma_air=np.array(ga), gamma_self=np.array(gs),
        n_air=np.array(na), delta_air=np.array(da),
        elower=np.array(el), molar_mass=molar_mass_kg_mol,
        iso_id=np.array(iso, dtype=np.int64),
        quanta_upper=np.array(qup, dtype=object),
        quanta_lower=np.array(qlo, dtype=object),
        y_coupling=y if has_coupling else None,
        g_coupling=g if has_coupling else None,
        coupling_temps=AER_COUPLING_TEMPS if has_coupling else None,
    )


#: molar masses [kg/mol] for common AER line-file species
MOLAR_MASS_KG_MOL = {
    "H2O": 18.010565e-3, "CO2": 43.98983e-3, "O3": 47.984745e-3,
    "N2O": 44.001062e-3, "CO": 27.994915e-3, "CH4": 16.0313e-3,
    "O2": 31.98983e-3, "NO": 29.997989e-3, "SO2": 63.961901e-3,
    "NO2": 45.992904e-3, "NH3": 17.026549e-3, "HNO3": 62.995644e-3,
    "N2": 28.006148e-3,
}


class AERLineAbsorber(LineAbsorber):
    """Line-by-line absorber from an AER line file with first-order
    Rosenkranz line mixing enabled (reference
    ``src/sasktran2/optical/aerline.py``). ``source`` is the path to the
    per-molecule AER data file (zero-egress environment: the reference
    downloads the AER v3.8.1 archive; here supply the extracted file)."""

    def __init__(self, molecule: str, source, molar_mass_kg_mol=None,
                 **kwargs):
        mm = molar_mass_kg_mol or MOLAR_MASS_KG_MOL.get(molecule.upper())
        if mm is None:
            msg = (
                f"Unknown molar mass for {molecule!r}; pass "
                "molar_mass_kg_mol explicitly"
            )
            raise ValueError(msg)
        cat = load_aer_line_file(source, mm)
        super().__init__(cat, enable_line_coupling=True, **kwargs)
