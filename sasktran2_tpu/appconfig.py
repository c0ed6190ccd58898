"""User application configuration.

Role of the reference's ``src/sasktran2/appconfig.py``: a small YAML
config file holding user preferences (most importantly ``database_root``)
plus helpers to read/update it. Download helpers are omitted in this
zero-egress build; ``database_root`` resolution order is
``SASKTRAN2_TPU_DB_ROOT`` env var > config file > default user dir.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml

_CONFIG_DIR = Path(
    os.environ.get(
        "SASKTRAN2_TPU_CONFIG_DIR",
        os.path.join(os.path.expanduser("~"), ".sasktran2_tpu"),
    )
)


def user_config_file_location() -> Path:
    """Location of the user config file."""
    return _CONFIG_DIR / "config.yml"


def load_user_config() -> dict:
    """The user config file as a dict ({} when absent)."""
    try:
        with open(user_config_file_location()) as f:
            config = yaml.safe_load(f)
        return config if config is not None else {}
    except FileNotFoundError:
        return {}


def save_user_config(user_config: dict):
    """Write the user config dict back to disk."""
    p = user_config_file_location()
    p.parent.mkdir(exist_ok=True, parents=True)
    with open(p, "w") as f:
        yaml.dump(user_config, f, default_flow_style=False)


def database_root() -> Path | None:
    """The configured database root (see module docstring for the
    resolution order)."""
    env = os.environ.get("SASKTRAN2_TPU_DB_ROOT")
    if env:
        return Path(env)
    cfg = load_user_config().get("database_root")
    if cfg is not None:
        return Path(cfg)
    return _CONFIG_DIR / "db"
