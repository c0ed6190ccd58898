"""Database access layer.

Role of the reference's ``src/sasktran2/database/`` (CachedDatabase /
WebDatabase with appdirs caching). This build runs in a zero-egress
environment: the same API surface is provided, with downloads replaced by
clear errors pointing at the local-path workflow; any locally-present files
are used transparently.
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


class WebDatabase(CachedDatabase):
    """Reference API parity: a database normally fetched from a URL. In the
    zero-egress build, ``fetch`` validates the local cache instead of
    downloading and raises with instructions when data is missing."""

    def __init__(self, url: str, rel_path: str):
        super().__init__(rel_path)
        self.url = url

    def fetch(self, rel: str = "") -> Path:
        p = self.path(rel)
        if p.exists():
            return p
        msg = (
            f"Database file {p} is not present and this build cannot "
            f"download ({self.url}). Place the file there manually or set "
            "SASKTRAN2_TPU_DB_ROOT."
        )
        raise FileNotFoundError(msg)


def __getattr__(name):
    # lazy: database.mie imports the optical layer, which imports this
    # package — defer to avoid the cycle
    if name == "MieDatabase":
        from .mie import MieDatabase

        return MieDatabase
    if name == "HITRANLineDatabase":
        from .hitran_line import HITRANLineDatabase

        return HITRANLineDatabase
    msg = f"module 'sasktran2_tpu.database' has no attribute {name!r}"
    raise AttributeError(msg)
