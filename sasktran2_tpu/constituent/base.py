"""Constituent ABC (reference ``src/sasktran2/constituent/base.py:9-26``).

A constituent adds its optical contribution to the atmosphere storage
(extensive accumulation: k in total_extinction, k_scat in ssa,
k_scat-weighted Legendre in leg_coeff) and registers derivative mappings
for its retrievable parameters. This is the user extension point, exactly
as in the reference (``docs/sphinx/source/extending/constituent.md``).
"""

from __future__ import annotations

import abc


class Constituent(abc.ABC):
    @abc.abstractmethod
    def add_to_atmosphere(self, atmo):
        """Accumulate this constituent's optical properties into
        ``atmo.storage`` (extensive units; the pipeline normalizes)."""

    @abc.abstractmethod
    def register_derivative(self, atmo, name: str):
        """Register derivative mappings on ``atmo.storage`` /
        ``atmo.surface`` for this constituent's parameters."""
