"""Shared harness for the executed validation book.

Each case script computes its numbers THROUGH THE LIBRARY at run time,
writes a markdown report under ``docs/book/output/``, and returns a
drift status — ``python docs/book/run_all.py`` regenerates every
committed output and fails if any number moved outside its stated
tolerance. This is the repo's analog of the reference's executed
notebook outputs (``docs/performance_book/source/external_validation``).
"""

from __future__ import annotations

import os
from pathlib import Path

OUT_DIR = Path(__file__).resolve().parent / "output"


def setup_backend(force_cpu: bool = True):
    """The container pre-imports jax on the axon TPU tunnel; the book
    runs on CPU + x64 by default so its numbers are reproducible
    anywhere (pass force_cpu=False to run on the attached TPU)."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    return jax.default_backend()


def write_report(name: str, lines: list[str]) -> Path:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    path = OUT_DIR / f"{name}.md"
    path.write_text("\n".join(lines) + "\n")
    return path


def fmt(x, digits=6):
    return f"{x:.{digits}e}" if abs(x) < 1e-2 or abs(x) > 1e4 else (
        f"{x:.{digits}f}"
    )
