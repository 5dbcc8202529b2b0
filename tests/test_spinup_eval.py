"""Spin-up evaluation machinery on synthetic series: partial-edge-year
exclusion in the annual-trend OLS, SE-aware estimator selection in the
criteria, and the offline --reeval path (scripts/spinup.py). These guard the
two measured failure modes of 2026-08-17: a 2-chunk edge "year" of the
~50 W/m² seasonal TOA cycle faking a −0.34 W/m²/decade trend, and a 15-yr
window's annual slope (SE ≈ 0.55, 5× the criterion) flipping a passing
record."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "spinup_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "spinup.py"))
sp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sp)


def _synthetic_series(years=30.0, chunks_per_year=50, seasonal_amp=25.0,
                      slope_per_decade=0.0, seed=0):
    """Equilibrated series: strong seasonal cycle, zero/known trend, closed
    water budget (E = P + R + CWV·(1−df)/dt with df=0.998, dt=300)."""
    rng = np.random.default_rng(seed)
    n = int(years * chunks_per_year)
    t = (np.arange(n) + 0.5) / chunks_per_year
    cwv, df, dt = 6.85, 0.998, 300.0
    sink = cwv * (1.0 - df) / dt
    e = 6.8e-5
    p = e - sink - 1e-7
    s = {k: np.full(n, v) for k, v in {
        "E_mean": e, "P_mean": p, "R_mean": 1e-7, "CWV_mean": cwv,
        "ICE_mean": 10.0, "W_land_mean": 20.0, "S_snow_mean": 1e6,
        "total_reservoir_mean": 1e6 + 36.85, "LH_mean": 170.0,
        "LH_release_mean": 170.0 - 2.5e6 * sink,
        "SFC_net": -11.0, "ATM_net": -74.0,
    }.items()}
    s["Ts_mean"] = 284.7 + rng.normal(0, 0.05, n)
    s["TOA_net"] = (-85.0 + seasonal_amp * np.sin(2 * np.pi * t)
                    + (slope_per_decade / 10.0) * t
                    + rng.normal(0, 0.5, n))
    for k in sp.OPT_KEYS:
        s[k] = np.full(n, np.nan)
    s["t_years"] = t
    s["_consts"] = np.asarray([df, dt, 2.5e6])
    return s


def test_partial_edge_year_excluded_from_annual_trend():
    s = _synthetic_series(years=30.0)
    m_full = sp.acceptance_metrics(s, 20.0)
    # a 20-yr trailing window whose edge clips a year mid-season: shift the
    # window so the leading year holds only 2 chunks of the seasonal peak
    m_clip = sp.acceptance_metrics(s, 20.04)
    for m in (m_full, m_clip):
        assert abs(m["dTOA_dt_annual_Wm2_per_decade"]) < 0.1, m
    # without the exclusion the clipped window measured ~0.3+ W/m²/decade
    assert abs(m_clip["dTOA_dt_annual_Wm2_per_decade"]
               - m_full["dTOA_dt_annual_Wm2_per_decade"]) < 0.05


def test_real_trend_is_detected():
    s = _synthetic_series(years=30.0, slope_per_decade=0.5)
    m = sp.acceptance_metrics(s, 20.0)
    assert m["dTOA_dt_annual_Wm2_per_decade"] > 0.3
    crit = sp.build_criteria(m)
    assert crit["dTOA_dt_lt_0.1_Wm2_decade"] is False


def test_estimator_selection_prefers_informative_annual():
    assert sp._pick_trend(0.05, 0.08, 9.9, 0.1) == 0.05      # SE fine → annual
    assert sp._pick_trend(0.5, 0.55, 0.01, 0.1) == 0.01      # SE 5×thr → chunk
    assert sp._pick_trend(float("nan"), float("nan"), 0.02, 0.1) == 0.02


def test_water_closure_net_of_sink():
    m = sp.acceptance_metrics(_synthetic_series(), 20.0)
    assert abs(m["water_residual_minus_qdamping_rel"]) < 0.05
    crit = sp.build_criteria(m)
    assert crit["water_closure_net_of_qdamping_lt_5pct"]


def test_transient_chunks_flagged_and_gated():
    """A fallback-precip deluge chunk (P ~1000× physical) inside the eval
    window must be detected and fail the window-cleanliness criterion; one
    outside the window is reported but does not gate."""
    s = _synthetic_series(years=30.0)
    s["P_mean"] = s["P_mean"].copy()
    s["P_mean"][10] = 0.03          # t ≈ 0.21 yr — outside a 20-yr window
    m = sp.acceptance_metrics(s, 20.0)
    assert m["transient_chunks_total"] == 1
    assert m["transient_chunks_in_window_t_years"] == []
    assert sp.build_criteria(m)["eval_window_free_of_transients"]

    s["P_mean"][-100] = 0.03        # inside the window
    m2 = sp.acceptance_metrics(s, 20.0)
    assert len(m2["transient_chunks_in_window_t_years"]) == 1
    assert not sp.build_criteria(m2)["eval_window_free_of_transients"]


def test_reeval_rewrites_record(tmp_path, monkeypatch):
    s = _synthetic_series(years=30.0)
    npz = tmp_path / "series.npz"
    np.savez(npz, **s)
    out = tmp_path / "REC.json"
    out.write_text(json.dumps(
        {"phase1": {"skipped": True}, "phase2": {"years": 30.0},
         "accepted": False}))
    monkeypatch.setattr(sys, "argv",
                        ["spinup", "--reeval", str(npz), "--out", str(out),
                         "--eval-years", "20", "--cpu"])
    sp.main()
    rec = json.loads(out.read_text())
    assert rec["phase2"]["reevaluated"]["eval_years"] == 20
    assert "dTOA_dt_annual_Wm2_per_decade" in rec["phase2"]["metrics"]
    # the synthetic series closes water/trends; the audit criteria are NaN
    # (no QD_ENERGY_AUDIT columns) — acceptance must be False, not crash
    assert isinstance(rec["accepted"], bool)
