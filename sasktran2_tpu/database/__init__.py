"""Database access layer.

Role of the reference's ``src/sasktran2/database/`` (CachedDatabase /
WebDatabase / ZipWebDatabase / StandardDatabase / zenodo with appdirs
caching). Downloads go through ``urllib`` (``web.py``), so ``file://``
URLs work without egress and locally-present files are always used
transparently; in a zero-egress environment a missing file raises a
clear error pointing at the local-path workflow.
"""

from __future__ import annotations

import os
from pathlib import Path


def database_root() -> Path:
    """The local database cache directory. Resolution order (see
    ``appconfig``): SASKTRAN2_TPU_DB_ROOT env var > user config file
    ``database_root`` key > ``~/.sasktran2_tpu/db``."""
    from ..appconfig import database_root as _cfg_root

    p = _cfg_root()
    p.mkdir(parents=True, exist_ok=True)
    return p


class CachedDatabase:
    """A locally-cached database directory."""

    def __init__(self, rel_path: str):
        self._path = database_root() / rel_path

    def path(self, rel: str = "") -> Path:
        return self._path / rel if rel else self._path

    def exists(self, rel: str = "") -> bool:
        return self.path(rel).exists()

    def clear(self):
        import shutil

        if self._path.exists():
            shutil.rmtree(self._path)


def __getattr__(name):
    # lazy: database.mie imports the optical layer, which imports this
    # package — defer to avoid the cycle (same for web.py, which imports
    # CachedDatabase from here)
    if name == "MieDatabase":
        from .mie import MieDatabase

        return MieDatabase
    if name == "HITRANLineDatabase":
        from .hitran_line import HITRANLineDatabase

        return HITRANLineDatabase
    if name in ("WebDatabase", "ZipWebDatabase", "StandardDatabase",
                "download_zenodo_record"):
        from . import web

        return getattr(web, name)
    msg = f"module 'sasktran2_tpu.database' has no attribute {name!r}"
    raise AttributeError(msg)
