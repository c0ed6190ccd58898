"""Airglow emission models: transitions, band structure from HITRAN lines,
and the McDade empirical oxygen green-line model.

Role of the reference's ``rust/sasktran2-rs/src/photchem/emission.rs``:
convert excited-state populations into photon volume emission rates (VER)
and distribute band VER over individual rotational lines so the engine's
line-list emission constituent can place them on the spectral grid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

OXYGEN_GREEN_LINE_WAVELENGTH_NM = 557.7
OXYGEN_GREEN_LINE_EINSTEIN_A_S = 1.26
MCDADE_OXYGEN_GREEN_LINE_EINSTEIN_A_558_S = 1.18
MCDADE_OXYGEN_GREEN_LINE_EINSTEIN_A_1S_S = 1.35
MCDADE_OXYGEN_GREEN_LINE_C0 = 0.0
MCDADE_OXYGEN_GREEN_LINE_C1 = 211.0
MCDADE_OXYGEN_GREEN_LINE_C2 = 15.0
O2_A_BAND_CENTER_WAVELENGTH_NM = 762.0
O2_A_BAND_TOTAL_EINSTEIN_A_S = 7.58e-2
O2_B0_X0_EINSTEIN_A_S = 7.58e-2
O2_B1_X0_EINSTEIN_A_S = 7.0e-2
O2_B1_X1_EINSTEIN_A_S = 7.0e-2
O2_B2_X2_EINSTEIN_A_S = 5.4e-2
O2_A_BAND_MIN_WAVELENGTH_NM = 759.0
O2_A_BAND_MAX_WAVELENGTH_NM = 776.0
O2_B_BAND_MIN_WAVELENGTH_NM = 675.0
O2_B_BAND_MAX_WAVELENGTH_NM = 705.0

C2_CM_K = 1.4387768775039339  # h c / k_B [cm K]


@dataclass(frozen=True)
class EmissionTransition:
    """A single emission line: VER = A * upper-state population."""

    name: str
    upper_state: str
    lower_state: str
    wavelength_nm: float
    einstein_a_s: float

    def __post_init__(self):
        if not np.isfinite(self.wavelength_nm) or self.wavelength_nm <= 0:
            msg = f"Bad emission wavelength {self.wavelength_nm}"
            raise ValueError(msg)
        if not np.isfinite(self.einstein_a_s) or self.einstein_a_s < 0:
            msg = f"Bad Einstein-A {self.einstein_a_s}"
            raise ValueError(msg)

    def photon_ver(self, upper_population):
        """Photon VER [photons m^-3 s^-1] from population [m^-3]."""
        return np.asarray(upper_population, dtype=np.float64) * (
            self.einstein_a_s
        )


def oxygen_green_line_transition() -> EmissionTransition:
    return EmissionTransition(
        "oxygen_green_5577", "O(1S)", "O(1D)",
        OXYGEN_GREEN_LINE_WAVELENGTH_NM, OXYGEN_GREEN_LINE_EINSTEIN_A_S,
    )


def mcdade_oxygen_green_line_photon_ver(
    temperature_k, atomic_oxygen_density_m3, o2_density_m3, n2_density_m3
):
    """McDade et al. (1986) empirical green-line (557.7 nm) photon VER
    [photons m^-3 s^-1] from O/O2/N2 densities [m^-3] — the two-step
    Barth mechanism with empirically fitted quenching coefficients."""
    t = np.asarray(temperature_k, dtype=np.float64)
    o = np.asarray(atomic_oxygen_density_m3, dtype=np.float64)
    o2 = np.asarray(o2_density_m3, dtype=np.float64)
    n2 = np.asarray(n2_density_m3, dtype=np.float64)
    if not (t.shape == o.shape == o2.shape == n2.shape):
        msg = "Temperature, O, O2, and N2 profiles must share a shape"
        raise ValueError(msg)
    if np.any(~np.isfinite(t)) or np.any(t <= 0):
        msg = "Temperature must be positive and finite"
        raise ValueError(msg)
    for name, v in (("O", o), ("O2", o2), ("N2", n2)):
        if np.any(~np.isfinite(v)) or np.any(v < 0):
            msg = f"{name} density must be non-negative and finite"
            raise ValueError(msg)

    o_cm3 = o / 1.0e6
    o2_cm3 = o2 / 1.0e6
    n2_cm3 = n2 / 1.0e6

    denom = (
        MCDADE_OXYGEN_GREEN_LINE_C0
        + MCDADE_OXYGEN_GREEN_LINE_C1 * o_cm3
        + MCDADE_OXYGEN_GREEN_LINE_C2 * o2_cm3
    )
    k1 = 4.7e-33 * (300.0 / t) ** 2                      # cm^6/s
    three_k5 = 4.0e-12 * np.exp(-865.0 / t)              # cm^3/s
    branch = MCDADE_OXYGEN_GREEN_LINE_EINSTEIN_A_558_S / (
        MCDADE_OXYGEN_GREEN_LINE_EINSTEIN_A_1S_S + three_k5 * o2_cm3
    )
    safe = (o_cm3 > 0) & (denom > 0)
    ver_cm3 = np.where(
        safe,
        k1 * o_cm3**2 * (n2_cm3 + o2_cm3) * o_cm3
        / np.where(safe, denom, 1.0) * branch,
        0.0,
    )
    return ver_cm3 * 1.0e6


def mcdade_oxygen_green_line_o1s_population(
    temperature_k, atomic_oxygen_density_m3, o2_density_m3, n2_density_m3
):
    """Implied steady-state O(1S) population [m^-3]."""
    return mcdade_oxygen_green_line_photon_ver(
        temperature_k, atomic_oxygen_density_m3, o2_density_m3,
        n2_density_m3,
    ) / MCDADE_OXYGEN_GREEN_LINE_EINSTEIN_A_558_S


def photon_ver_from_state_profile(state_profiles, state_name, einstein_a_s):
    """VER profile = A * population profile, from a solved-state dict."""
    if state_name not in state_profiles:
        msg = f"Population state {state_name!r} is not available"
        raise KeyError(msg)
    return np.asarray(state_profiles[state_name], dtype=np.float64) * (
        einstein_a_s
    )


# ---------------------------------------------------------------------------
# Band emission from HITRAN line catalogues


#: HITRAN O2 isotopologue natural abundances (reference emission.rs
#: ``o2_hitran_isotope_abundance``)
O2_ISOTOPE_ABUNDANCE = {1: 0.9952616, 2: 0.00399141, 3: 0.0007422352}


@dataclass
class EmissionBand:
    """A vibrational emission band resolved into rotational lines.

    ``weights`` (normalized to 1) distribute the band VER over lines;
    two weighting models mirror the reference
    (``AEmissionLineWeightModel``):

    - *static* (``weights``): relative A-coefficients x isotope
      abundance, temperature-independent (reference emission.rs
      ``relative_weight = einstein_a * abundance``).
    - *einstein_a_branching* (:meth:`lte_weights`): LTE Boltzmann upper
      populations ``abundance * g' * exp(-c2 E'/T)`` times the upper-level
      branching ratio ``A_line / sum_A(same upper level)`` (reference
      ``oxygen_a_band_einstein_branching_line_weights``).
    """

    name: str
    upper_state: str
    lower_state: str
    total_einstein_a_s: float
    wavelength_nm: np.ndarray        # [nlines]
    einstein_a_line_s: np.ndarray    # [nlines]
    upper_energy_cminv: np.ndarray   # [nlines]
    weights: np.ndarray              # [nlines], sums to 1
    g_upper: np.ndarray | None = None          # [nlines] statistical weight
    iso_abundance: np.ndarray | None = None    # [nlines]
    upper_branching: np.ndarray | None = None  # [nlines] A/sum_A(level)

    @staticmethod
    def from_catalogue(
        name, upper_state, lower_state, total_einstein_a_s, catalogue,
        min_wavelength_nm, max_wavelength_nm,
        isotope_abundances=None,
    ) -> "EmissionBand":
        """Build a band from a :class:`~..optical.line_absorber.
        LineCatalogue` by selecting lines inside a wavelength window.
        Requires the catalogue to carry Einstein-A coefficients
        (``load_hitran_par`` parses them, plus g' and isotopologue ids).

        ``isotope_abundances`` maps HITRAN isotopologue number to natural
        abundance (defaults to the O2 table)."""
        if min_wavelength_nm >= max_wavelength_nm:
            msg = "Invalid band wavelength range"
            raise ValueError(msg)
        a = getattr(catalogue, "einstein_a", None)
        if a is None:
            msg = "Line catalogue has no Einstein-A coefficients"
            raise ValueError(msg)
        wl = 1.0e7 / np.asarray(catalogue.nu0)
        keep = (
            (wl >= min_wavelength_nm)
            & (wl <= max_wavelength_nm)
            & np.isfinite(a)
            & (a > 0)
        )
        if not np.any(keep):
            msg = (
                f"No lines with Einstein-A in [{min_wavelength_nm}, "
                f"{max_wavelength_nm}] nm"
            )
            raise ValueError(msg)
        order = np.argsort(wl[keep])
        wl_k = wl[keep][order]
        a_k = np.asarray(a)[keep][order]
        eup = (
            np.asarray(catalogue.elower)[keep][order]
            + np.asarray(catalogue.nu0)[keep][order]
        )

        abund_table = (
            O2_ISOTOPE_ABUNDANCE if isotope_abundances is None
            else isotope_abundances
        )
        iso = getattr(catalogue, "iso_id", None)
        if iso is not None:
            iso_k = np.asarray(iso)[keep][order]
            abund = np.array(
                [abund_table.get(int(i), 0.0) for i in iso_k]
            )
        else:
            iso_k = np.ones(wl_k.size, dtype=np.int64)
            abund = np.ones(wl_k.size)

        gp = getattr(catalogue, "g_upper", None)
        gp_k = None
        if gp is not None:
            gp_k = np.asarray(gp)[keep][order]
            if not np.any(np.isfinite(gp_k) & (gp_k > 0)):
                gp_k = None

        # Branching ratio: group lines sharing the same upper level —
        # identified physically by (isotopologue, upper energy) since a
        # level's E' = E'' + nu0 is identical for its P/R/Q branches
        # (reference groups by parsed upper quanta; energy matching avoids
        # a quanta parser and is exact to catalogue precision).
        branching = np.ones(wl_k.size)
        level_key = np.stack([iso_k.astype(np.float64),
                              np.round(eup, 2)], axis=1)
        _, level_idx = np.unique(level_key, axis=0, return_inverse=True)
        sums = np.zeros(level_idx.max() + 1)
        np.add.at(sums, level_idx, a_k)
        branching = a_k / sums[level_idx]

        w = a_k * abund
        if w.sum() <= 0:
            msg = "Emission band line weights sum to zero"
            raise ValueError(msg)
        w = w / w.sum()
        return EmissionBand(
            name, upper_state, lower_state, float(total_einstein_a_s),
            wl_k, a_k, eup, w,
            g_upper=gp_k, iso_abundance=abund, upper_branching=branching,
        )

    def lte_weights(self, temperature_k: float) -> np.ndarray:
        """Boltzmann line weights at one temperature (LTE within the
        upper vibrational state): ``abundance * g' * exp(-c2 E'/T) *
        branching``, normalized (reference emission.rs
        ``oxygen_a_band_einstein_branching_line_weights``). Requires the
        catalogue to have carried upper statistical weights g'."""
        if self.g_upper is None:
            msg = (
                "LTE line weights need upper statistical weights g' — "
                "load the catalogue from a full 160-column HITRAN .par "
                "record (columns 146:153)"
            )
            raise ValueError(msg)
        abund = (
            self.iso_abundance if self.iso_abundance is not None
            else np.ones_like(self.einstein_a_line_s)
        )
        branch = (
            self.upper_branching if self.upper_branching is not None
            else np.ones_like(self.einstein_a_line_s)
        )
        gp = np.where(np.isfinite(self.g_upper), self.g_upper, 0.0)
        x = abund * gp * np.exp(
            -C2_CM_K
            * (self.upper_energy_cminv - self.upper_energy_cminv.min())
            / float(temperature_k)
        ) * branch
        if x.sum() <= 0:
            msg = "LTE line weights sum to zero"
            raise ValueError(msg)
        return x / x.sum()

    def photon_ver(self, upper_population):
        """Band-integrated photon VER from the upper-state population."""
        return np.asarray(upper_population, dtype=np.float64) * (
            self.total_einstein_a_s
        )


def oxygen_a_band_from_catalogue(catalogue) -> EmissionBand:
    """O2 A-band (b 1Sigma v'=0 -> X v''=0, ~762 nm)."""
    return EmissionBand.from_catalogue(
        "oxygen_a_band", "O2(b, v=0)", "O2(X)",
        O2_A_BAND_TOTAL_EINSTEIN_A_S, catalogue,
        O2_A_BAND_MIN_WAVELENGTH_NM, O2_A_BAND_MAX_WAVELENGTH_NM,
    )


def oxygen_b_band_from_catalogue(catalogue) -> EmissionBand:
    """O2 B-band (b 1Sigma v'=1 -> X v''=0, ~689 nm)."""
    return EmissionBand.from_catalogue(
        "oxygen_b_band", "O2(b, v=1)", "O2(X)",
        O2_B1_X0_EINSTEIN_A_S, catalogue,
        O2_B_BAND_MIN_WAVELENGTH_NM, O2_B_BAND_MAX_WAVELENGTH_NM,
    )
