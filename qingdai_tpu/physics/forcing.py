"""Dual-star insolation geometry and radiative-equilibrium forcing.

Per-star declination/right-ascension/hour-angle → cos(zenith), night-side
clamp; matches /root/reference/pygcm/forcing.py:32-165. Everything is a pure
function of (t, grid) so the jitted step fuses it with the rest of the physics.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..grid import Grid
from ..ops import safegrad
from . import orbital

# --- Precomputed planet-fixed equatorial frame (forcing.py:32-40) ---
# Stored as plain Python floats: NumPy f64 scalars are non-weak and would
# promote the whole insolation computation to f64 under jax_enable_x64.
_tilt = math.radians(const.PLANET_AXIAL_TILT)
_n_hat = np.array([math.sin(_tilt), 0.0, math.cos(_tilt)])
_x_in = np.array([1.0, 0.0, 0.0])
_x_eq = _x_in - np.dot(_x_in, _n_hat) * _n_hat
_x_eq = _x_eq / np.linalg.norm(_x_eq)
_y_eq = np.cross(_n_hat, _x_eq)
N_HAT = tuple(float(v) for v in _n_hat)
X_EQ = tuple(float(v) for v in _x_eq)
Y_EQ = tuple(float(v) for v in _y_eq)


def _single_star_insolation(grid: Grid, theta, flux, sx, sy):
    """Insolation field for one star given its planet→star vector (sx, sy, 0)
    and the planet rotation phase theta = Ω·t mod 2π."""
    norm = jnp.sqrt(sx * sx + sy * sy) + 1e-15
    shx, shy = sx / norm, sy / norm
    # s_hat · n_hat etc. with s_hat z-component = 0
    dot_n = shx * N_HAT[0] + shy * N_HAT[1]
    delta = jnp.arcsin(jnp.clip(dot_n, -1.0, 1.0))
    alpha = jnp.arctan2(shx * Y_EQ[0] + shy * Y_EQ[1],
                        shx * X_EQ[0] + shy * X_EQ[1])
    lon_rad = jnp.deg2rad(grid.lon_mesh)
    h = theta + lon_rad - alpha
    cos_z = (jnp.sin(grid.lat_rad) * jnp.sin(delta)
             + jnp.cos(grid.lat_rad) * jnp.cos(delta) * jnp.cos(h))
    return flux * jnp.maximum(0.0, cos_z)


def insolation_components_from_phases(grid: Grid, phase_rot, phase_binary,
                                      phase_planet):
    """(insA, insB) from carried orbital phases — the jit-internal path that
    avoids absolute-time f32 precision loss over multi-year runs."""
    x_A, y_A, x_B, y_B = orbital.stellar_positions_from_phase(phase_binary)
    x_p, y_p = orbital.planet_position_from_phase(phase_planet)
    vAx, vAy = x_A - x_p, y_A - y_p
    vBx, vBy = x_B - x_p, y_B - y_p
    dA2 = vAx * vAx + vAy * vAy
    dB2 = vBx * vBx + vBy * vBy
    flux_A = const.L_A / (4.0 * math.pi * dA2)
    flux_B = const.L_B / (4.0 * math.pi * dB2)
    insA = _single_star_insolation(grid, phase_rot, flux_A, vAx, vAy)
    insB = _single_star_insolation(grid, phase_rot, flux_B, vBx, vBy)
    return insA, insB


def insolation_components(grid: Grid, t):
    """(insA, insB): per-star surface insolation fields (W/m^2) at time t."""
    return insolation_components_from_phases(
        grid,
        jnp.mod(t * const.PLANET_OMEGA, 2.0 * math.pi),
        orbital.OMEGA_BINARY * t,
        orbital.OMEGA_PLANET * t)


def insolation_total(grid: Grid, t):
    insA, insB = insolation_components(grid, t)
    return insA + insB


def equilibrium_temp(isr, albedo):
    """Radiative equilibrium T_eq = (I(1−α)/σ)^¼ with night-side zeros.

    Unlike forcing.py:138-165 this takes the (already computed) insolation so
    it is not recomputed inside the step.
    """
    numerator = jnp.maximum(isr * (1.0 - albedo), 0.0)
    # safegrad: isr == 0 exactly on the night side; bare **0.25 there makes
    # every adjoint sweep NaN (inf · 0 in the chain rule). Forward identical.
    return safegrad.quartic_root(numerator / const.SIGMA)
