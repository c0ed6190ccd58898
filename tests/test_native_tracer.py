"""Native C++ tracer parity with the numpy tracer (the role of the
reference's Rust-vs-C++ raytracer parity tests,
``tests/raytracing/test_rust_raytracer_parity.cpp``)."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.native import get_native_lib
from sasktran2_tpu.rt.raytrace import trace_spherical


@pytest.fixture(scope="module")
def native_available():
    if get_native_lib() is None:
        pytest.skip("native library could not be built")


def _rays():
    return [
        sk.TangentAltitudeSolar(12000.0, 0.4, 2e5, 0.55),
        sk.TangentAltitudeSolar(31000.0, 2.1, 2e5, 0.55),
        sk.GroundViewingSolar(0.7, 0.9, 0.85, 2e5),
        sk.SolarAnglesObserverLocation(0.7, 1.2, +0.6, 0.0),
    ]


def test_native_matches_python(native_available):
    alts = np.linspace(0, 70000, 20)
    re = 6372000.0
    t_py = trace_spherical(alts, re, 0.55, _rays(), use_native=False)
    t_cc = trace_spherical(alts, re, 0.55, _rays(), use_native="require")

    for field in (
        "od_weights", "sun_weights", "interp_weights", "lengths", "mask",
        "cos_scatter", "cos_zenith", "cos_sza", "seg_entrance_frac",
        "seg_exit_frac", "boundary_relazi", "ground_cos_sza",
        "ground_cos_vza", "ground_relazi",
    ):
        a = getattr(t_py, field)
        b = getattr(t_cc, field)
        # weights are path lengths in meters; libm-vs-numpy ulp noise is
        # amplified by cancellation in thin shells (~1e-9 relative)
        np.testing.assert_allclose(
            b, a, rtol=1e-8, atol=1e-5, err_msg=field
        )
    np.testing.assert_array_equal(t_py.seg_layer, t_cc.seg_layer)
    np.testing.assert_array_equal(t_py.ground_hit, t_cc.ground_hit)
