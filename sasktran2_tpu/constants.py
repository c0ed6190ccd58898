"""Physical constants (reference ``src/sasktran2/constants.py``)."""

from __future__ import annotations

K_BOLTZMANN = 1.380649e-23  # J/K
PLANCK = 6.62607015e-34  # J s
SPEED_OF_LIGHT = 299792458.0  # m/s
