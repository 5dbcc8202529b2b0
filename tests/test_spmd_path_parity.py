"""The single-device fast paths and the multi-device SPMD-safe paths of the
gated ops (sum_compensated, gaussian lon conv, lon gradient) must agree to
roundoff. The test suite runs on the 8-device virtual mesh, so the SPMD
branches are what every other test exercises; here the single-device
branches are invoked explicitly against them."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def field(rng):
    return jnp.asarray(rng.normal(280.0, 30.0, (19, 36)), jnp.float32)


def test_sum_compensated_branches_agree(field):
    from qingdai_tpu.ops import reductions as R
    # multi-device branch (device_count > 1 under conftest)
    hi_m, lo_m = R.sum_compensated(field)
    # single-device branch, invoked directly: flat ravel tree
    flat = field.ravel()
    hi_s, lo_s = R._ff_tree_axis0(flat, jnp.zeros_like(flat))
    ref = np.sum(np.asarray(field, np.float64))
    for hi, lo in ((hi_m, lo_m), (hi_s, lo_s)):
        got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
        assert abs(got - ref) < 1e-3 * max(1.0, abs(ref))


def test_gaussian_lon_conv_branches_agree(field):
    from qingdai_tpu.ops import smooth as S
    k = S._gauss_kernel(1.0)
    for mode in ("reflect", "wrap", "nearest"):
        pad_based = S._conv1d(field, k, axis=1, mode=mode)
        roll_based = S._conv1d_lon(field, k, mode=mode)  # multi-dev branch
        np.testing.assert_allclose(np.asarray(roll_based),
                                   np.asarray(pad_based),
                                   rtol=0, atol=2e-4, err_msg=mode)


def test_lon_gradient_branches_agree(field):
    from qingdai_tpu import grid as G
    d = 0.1
    concat = np.gradient(np.asarray(field, np.float64), d, axis=1)
    roll = np.asarray(G._gradient_axis1_np(field, d))  # multi-dev branch
    np.testing.assert_allclose(roll, concat, rtol=0, atol=1e-2)
