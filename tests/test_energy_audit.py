"""QD_ENERGY_AUDIT: the per-step non-conservative-energy attribution must
close against the actual tracked-reservoir drift.

The audit (dynamics.py audit block, model.AUDIT_KEYS) claims, per step,

    TOA_net − aud_part − aud_uncoupled + Σ(internal injections) = dE/dt

where E is the model's own tracked energy: surface C_eff·T_s − ρ_i·L_f·h_ice,
atmosphere κ·h (κ = ρ_a·g·H_atm, the inverse of
integrate_atmos_energy_height), latent L_v·M_col·q. These tests verify the
identity numerically over multi-day tiny-grid runs by measuring E from state
snapshots — so every clamp, filter, advection and damping term must be
correctly measured, with nothing missing.

This is the machinery behind the spin-up acceptance criterion
TOA_attribution_residual_lt_2 (scripts/spinup.py), which replaces the former
self-chosen "TOA net of q-damping < 30 W/m²" bound
(reference criterion: /root/reference/docs/11-spin-up-and-restarts.md:49).
"""

import numpy as np
import jax
import pytest

from qingdai_tpu import model as M
from tests.test_model_e2e import _build


def _energy_mean(mdl, state):
    """Area-mean tracked energy (J/m², f64 on host) per the audit's
    reservoir conventions."""
    cfg = mdl.cfg
    land = np.asarray(mdl.static.land_mask) == 1
    T_s = np.asarray(state.atmos.T_s, np.float64)
    h = np.asarray(state.atmos.h, np.float64)
    q = np.asarray(state.atmos.q, np.float64)
    h_ice = np.asarray(state.atmos.h_ice, np.float64)
    if cfg.dynamics.seaice_enabled:
        Cs_ocean = cfg.ocean.rho_w * cfg.ocean.cp_w * cfg.run.mld_m
        Cs = np.where(land, cfg.run.cs_land,
                      np.where(h_ice > 0.0, cfg.run.cs_ice, Cs_ocean))
    else:
        Cs = np.asarray(mdl.static.C_s_map, np.float64)
        Cs = np.where(np.isfinite(Cs) & (Cs > 1e3), Cs, 1e3)
    H_atm = (cfg.dynamics.atm_h if cfg.dynamics.atm_h is not None
             else cfg.humidity.h_mbl)
    kappa = max(1e-6, cfg.humidity.rho_a) * max(1.0, H_atm) * cfg.dynamics.g
    M_col = max(1e-6, cfg.humidity.rho_a * cfg.humidity.h_mbl)
    E = (Cs * T_s - cfg.dynamics.rho_ice * cfg.dynamics.L_f * h_ice
         + kappa * h + cfg.humidity.L_v * M_col * q)
    w = np.asarray(mdl.grid.area_w, np.float64)
    return float((E * w).sum() / w.sum())


def _run_and_close(mdl, n_steps):
    st = M.init_world(mdl)
    # one throwaway chunk so the closure window starts from evolved fields
    # (the first steps from the analytic init have zero caches)
    warm = jax.jit(M.make_chunk_fn(mdl, 24, day_aligned=False))
    st, _ = warm(st)
    chunk = jax.jit(M.make_chunk_fn(mdl, n_steps, day_aligned=False))
    E0 = _energy_mean(mdl, jax.device_get(st))
    st, diag = chunk(st)
    host = jax.device_get((st, diag))
    st_h, d = host
    E1 = _energy_mean(mdl, st_h)
    dEdt = (E1 - E0) / (n_steps * mdl.dt)
    internal = sum(float(np.mean(d[k])) for k in M.AUDIT_KEYS
                   if k not in ("aud_part", "aud_uncoupled"))
    claimed = (float(np.mean(d["TOA_net"])) - float(np.mean(d["aud_part"]))
               - float(np.mean(d["aud_uncoupled"])) + internal)
    return claimed, dEdt, d


def test_audit_closes_against_reservoirs_no_ocean():
    """Strict closure with the ocean off (no SST-overwrite / under-ice slab
    bookkeeping): the audit must equal the measured reservoir drift to well
    under a W/m² (residual noise = f32 state quantization only)."""
    mdl = _build(QD_ENERGY_AUDIT=1, QD_ENERGY_W=1, QD_USE_OCEAN=0,
                 QD_ECO_ENABLE=0, QD_PHYTO_ENABLE=0, QD_HYDRO_ENABLE=0)
    claimed, dEdt, d = _run_and_close(mdl, 96)
    for k in M.AUDIT_KEYS:
        assert np.isfinite(np.asarray(d[k])).all(), k
    # terms are O(1–100 W/m²); the identity must close far below that
    assert abs(claimed - dEdt) < 0.7, (claimed, dEdt)


def test_audit_closes_full_coupled():
    """Full coupling (slab ocean + SST overwrite + hydrology + ecology +
    phyto). The only untracked store is the slab SST under sea ice (heated at
    ice_qfac but invisible to T_s until the ice opens), so the tolerance is
    looser but still a small fraction of the O(100 W/m²) terms."""
    mdl = _build(QD_ENERGY_AUDIT=1, QD_ENERGY_W=1)
    claimed, dEdt, d = _run_and_close(mdl, 96)
    # the run is a violent cold-start transient (|dE/dt| can be hundreds of
    # W/m² on this tiny grid); the *identity* must still close to a few W/m²
    # — in equilibrium (where dE/dt→0) this same closure becomes the spin-up
    # acceptance criterion TOA ≈ attributed
    assert abs(claimed - dEdt) < 5.0, (claimed, dEdt)
    # the dominant known sinks must be present with the right signs:
    # q-damping destroys ~L_v·CWV·(1−df)/dt (negative injection)
    assert float(np.mean(d["aud_qdamp"])) < 0.0
    assert np.isfinite(float(np.mean(d["aud_overwrite"])))


def test_audit_off_by_default_keys_absent():
    mdl = _build(QD_USE_OCEAN=0, QD_ECO_ENABLE=0, QD_PHYTO_ENABLE=0,
                 QD_HYDRO_ENABLE=0)
    st = M.init_world(mdl)
    step = M.make_step_fn(mdl)
    _, diag = jax.jit(step)(st)
    assert "aud_part" not in diag
