"""Orbital invariants & analytic flux checks, mirroring the reference's test
strategy (/root/reference/tests/test_orbital_module.py:14-82)."""

import math

import numpy as np
import jax.numpy as jnp

from qingdai_tpu import constants as const
from qingdai_tpu.grid import make_grid
from qingdai_tpu.physics import orbital, forcing


def test_periods_omega_consistency():
    assert orbital.T_BINARY > 0 and orbital.T_PLANET > orbital.T_BINARY
    np.testing.assert_allclose(orbital.OMEGA_BINARY * orbital.T_BINARY, 2 * math.pi)
    np.testing.assert_allclose(orbital.OMEGA_PLANET * orbital.T_PLANET, 2 * math.pi)
    # Kepler: T^2 ∝ a^3
    ratio = (orbital.T_PLANET / orbital.T_BINARY) ** 2
    np.testing.assert_allclose(ratio, (const.A_PLANET / const.A_BINARY) ** 3, rtol=1e-10)


def test_barycenter():
    xA, yA, xB, yB = (np.asarray(z) for z in orbital.stellar_positions(1.2345e6))
    scale = const.M_A * const.A_BINARY  # ~1e40; residual must be fp roundoff
    np.testing.assert_allclose(const.M_A * xA + const.M_B * xB, 0.0, atol=1e-12 * scale)
    np.testing.assert_allclose(const.M_A * yA + const.M_B * yB, 0.0, atol=1e-12 * scale)


def test_flux_at_t0_analytic():
    # At t=0: planet at (a_p, 0); A at (r_A, 0); B at (−r_B, 0).
    d_A = const.A_PLANET - orbital.R_A
    d_B = const.A_PLANET + orbital.R_B
    S = const.L_A / (4 * math.pi * d_A**2) + const.L_B / (4 * math.pi * d_B**2)
    np.testing.assert_allclose(float(orbital.total_flux(0.0)), S, rtol=1e-6)


def test_flux_positive_and_varies():
    ts = np.linspace(0, orbital.T_PLANET, 64)
    S = np.asarray([float(orbital.total_flux(t)) for t in ts])
    assert np.all(S > 0)
    assert S.max() / S.min() > 1.001


def test_insolation_geometry():
    g = make_grid(19, 36)
    insA, insB = forcing.insolation_components(g, 0.0)
    insA, insB = np.asarray(insA), np.asarray(insB)
    assert insA.min() >= 0 and insB.min() >= 0
    # total flux conservation: max cos_z = 1 at subsolar point → max ins <= flux
    assert insA.max() <= float(orbital.total_flux(0.0))
    # day/night contrast exists
    assert (insA == 0).any() and (insA > 0).any()
    # components sum = total field
    tot = np.asarray(forcing.insolation_total(g, 0.0))
    np.testing.assert_allclose(tot, insA + insB, rtol=1e-6)


def test_equilibrium_temp():
    g = make_grid(19, 36)
    isr = forcing.insolation_total(g, 0.0)
    Teq = np.asarray(forcing.equilibrium_temp(isr, 0.3))
    ref = (np.maximum(np.asarray(isr) * 0.7, 0) / const.SIGMA) ** 0.25
    np.testing.assert_allclose(Teq, ref, rtol=1e-5)
