"""Orbital mechanics of the Harmony binary + Qingdai planet.

Pure jnp functions of time t (seconds). Circular, coplanar orbits around the
barycenter, matching /root/reference/pygcm/orbital.py:15-77.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .. import constants as const

# Derived scalars (trace-time constants)
T_BINARY = 2.0 * math.pi * math.sqrt(const.A_BINARY ** 3 / (const.G * const.M_TOTAL_STARS))
T_PLANET = 2.0 * math.pi * math.sqrt(const.A_PLANET ** 3 / (const.G * const.M_TOTAL_STARS))
OMEGA_BINARY = 2.0 * math.pi / T_BINARY
OMEGA_PLANET = 2.0 * math.pi / T_PLANET
R_A = const.A_BINARY * (const.M_B / const.M_TOTAL_STARS)
R_B = const.A_BINARY * (const.M_A / const.M_TOTAL_STARS)


def stellar_positions_from_phase(phase_binary):
    """(x_A, y_A, x_B, y_B) from the binary orbital phase ω_b·t mod 2π."""
    c = jnp.cos(phase_binary)
    s = jnp.sin(phase_binary)
    return R_A * c, R_A * s, -R_B * c, -R_B * s


def planet_position_from_phase(phase_planet):
    return const.A_PLANET * jnp.cos(phase_planet), const.A_PLANET * jnp.sin(phase_planet)


def stellar_positions(t):
    """(x_A, y_A, x_B, y_B) barycentric coordinates at time t (s)."""
    return stellar_positions_from_phase(OMEGA_BINARY * t)


def planet_position(t):
    return planet_position_from_phase(OMEGA_PLANET * t)


def total_flux(t):
    """Total stellar flux S_A + S_B at the planet (W/m^2)."""
    x_A, y_A, x_B, y_B = stellar_positions(t)
    x_p, y_p = planet_position(t)
    d_A2 = (x_p - x_A) ** 2 + (y_p - y_A) ** 2
    d_B2 = (x_p - x_B) ** 2 + (y_p - y_B) ** 2
    S_A = const.L_A / (4.0 * math.pi * d_A2)
    S_B = const.L_B / (4.0 * math.pi * d_B2)
    return S_A + S_B
