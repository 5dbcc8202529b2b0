"""Single-layer specific humidity q and E–P–LH coupling (P008).

Pure jnp re-expression of /root/reference/pygcm/humidity.py:85-183.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import HumidityConfig
from ..ops import safegrad

EPSILON = 0.622  # Mw/Md


def q_sat(T, p=1.0e5):
    """Tetens saturation specific humidity over liquid water (humidity.py:85-101)."""
    T_c = jnp.clip(T - 273.15, -80.0, 60.0)
    e_s = 610.94 * jnp.exp(17.625 * T_c / (T_c + 243.04))
    denom = jnp.maximum(p - (1.0 - EPSILON) * e_s, 1.0)
    return jnp.clip(EPSILON * e_s / denom, 0.0, 0.5)


def q_init(Ts, RH0=0.5, p0=1.0e5):
    return jnp.clip(RH0, 0.0, 1.0) * q_sat(Ts, p=p0)


def surface_evaporation_factor(land_mask, h_ice, cfg: HumidityConfig,
                               ice_threshold=1e-6):
    """Per-grid evaporation factor: ocean / sea-ice / land (humidity.py:116-142)."""
    land = (land_mask == 1)
    ice = (h_ice > ice_threshold) & (~land)
    return jnp.where(land, cfg.land_evap_scale,
                     jnp.where(ice, cfg.ice_evap_scale, cfg.ocean_evap_scale))


def evaporation_flux(Ts, q, u, v, surface_factor, cfg: HumidityConfig):
    """E = ρ_a C_E |V| (q_sat(Ts) − q)+ · S_type (humidity.py:145-159)."""
    V = safegrad.speed(u, v)
    deficit = jnp.maximum(0.0, q_sat(Ts, p=cfg.p0) - q)
    return cfg.rho_a * cfg.C_E * V * deficit * surface_factor


def condensation(q, T_a, dt, cfg: HumidityConfig):
    """Supersaturation relaxation → (P_cond_flux, q_next) (humidity.py:162-183)."""
    qsat_air = q_sat(T_a, p=cfg.p0)
    excess = jnp.maximum(0.0, q - qsat_air)
    M_col = max(1e-6, float(cfg.rho_a * cfg.h_mbl))
    # tau_cond may be a TRACED scalar (adjoint parameter injection,
    # adjoint.PARAM_ALIASES) — jnp.maximum keeps it differentiable where
    # the old host-side float() clamp broke the trace
    P_cond = (excess / jnp.maximum(1e-6, cfg.tau_cond)) * M_col
    q_next = jnp.clip(q - (P_cond / M_col) * dt, 0.0, 0.5)
    return P_cond, q_next


def humidity_block(T_s, q, u, v, h, h_ice, land_mask, dt, cfg: HumidityConfig,
                   g: float):
    """The one humidity sequence both the step and the restart bootstrap run
    (reference dynamics.py:274-297): T_a proxy from h, bulk evaporation,
    column uptake over M_col, supersaturation condensation.

    Returns (T_a, E_flux, M_col, P_cond, q_next). Keeping this in one place
    guarantees world._bootstrap_flux_caches recomputes exactly the fluxes
    the next dynamics step would — the whole point of the warm-cache restart
    (a divergent reimplementation would re-open the reference's one-step
    restart deluge)."""
    T_a = 288.0 + (g / 1004.0) * h
    surf_factor = surface_evaporation_factor(land_mask, h_ice, cfg)
    E_flux = evaporation_flux(T_s, q, u, v, surf_factor, cfg)
    M_col = max(1e-6, float(cfg.rho_a * cfg.h_mbl))
    q_evap = q + (E_flux / M_col) * dt
    P_cond, q_next = condensation(q_evap, T_a, dt, cfg)
    return T_a, E_flux, M_col, P_cond, q_next
