"""Config surface basics (mirrors reference tests/config/test_config_basic.py)."""

import logging

import numpy as np
import pytest

import sasktran2_tpu as sk


def test_config_creation():
    assert sk.Config() is not None


def test_two_stream_backend_roundtrip():
    config = sk.Config()
    assert config.two_stream_backend == sk.TwoStreamBackend.Rust
    config.two_stream_backend = sk.TwoStreamBackend.Cpp
    assert config.two_stream_backend == sk.TwoStreamBackend.Cpp


def test_log_level_default_and_set():
    config = sk.Config()
    assert config.log_level == sk.LogLevel.Warn
    levels = [
        sk.LogLevel.Trace, sk.LogLevel.Debug, sk.LogLevel.Info,
        sk.LogLevel.Warn, sk.LogLevel.Error, sk.LogLevel.Critical,
        sk.LogLevel.Off,
    ]
    assert len({int(v) for v in levels}) == len(levels)
    # constructing with a level configures the package logger
    sk.Config(log_level=sk.LogLevel.Debug)
    assert logging.getLogger("sasktran2_tpu").level == logging.DEBUG
    sk.Config(log_level=sk.LogLevel.Error)
    assert logging.getLogger("sasktran2_tpu").level == logging.ERROR
    logging.getLogger("sasktran2_tpu").setLevel(logging.WARNING)


def test_config_validation_errors():
    with pytest.raises(ValueError, match="num_streams"):
        sk.Config(num_streams=3).validate()
    with pytest.raises(ValueError, match="num_stokes"):
        sk.Config(num_stokes=2).validate()


def test_config_independent_instances():
    c1 = sk.Config(num_streams=4)
    c2 = sk.Config(num_streams=8)
    assert c1.num_streams == 4
    assert c2.num_streams == 8


def test_config_aliases_and_guards():
    """Reference-compat aliases are honored, not silently ignored."""
    c = sk.Config(apply_delta_scaling=True)
    assert c.delta_m_scaling

    c = sk.Config(num_sza=3)
    assert c.num_do_sza == 3
    assert c.num_successive_orders_sza == 3

    # explicit per-source values win over the alias
    c = sk.Config(num_sza=3, num_do_sza=5)
    assert c.num_do_sza == 5

    with pytest.raises(NotImplementedError, match="tms"):
        sk.Config(singlescatter_phasefunction_from_tms=True)
