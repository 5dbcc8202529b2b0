"""Climate-quality acceptance: asserts the docs/11.3 phase-2 criteria against
the recorded spin-up artifact SPINUP.json (produced by `python -m
scripts.spinup` on TPU; see BASELINE.md for the recorded run).

Reference thresholds: /root/reference/docs/11-spin-up-and-restarts.md:49-54
(|<TOA_net>| ≤ 0.2 W/m², |d<Ts>/dt| < 0.02 K/decade) and :122-137
(<E> ≈ <P>+<R>, <LH> ≈ <LH_release>, no reservoir drift).
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SPINUP.json")


@pytest.fixture(scope="module")
def spinup():
    if not os.path.exists(ART):
        pytest.skip("SPINUP.json not recorded yet (run scripts/spinup.py on TPU)")
    with open(ART) as f:
        return json.load(f)


def test_spinup_ran_long_enough(spinup):
    assert spinup["phase1"]["years"] + spinup["phase2"]["years"] >= 20
    assert spinup["phase2"]["metrics"]["n_eval_chunks"] >= 10


def test_toa_net_balance(spinup):
    m = spinup["phase2"]["metrics"]
    assert abs(m["TOA_net_mean_Wm2"]) <= 0.2, m["TOA_net_mean_Wm2"]


def test_ts_trend(spinup):
    m = spinup["phase2"]["metrics"]
    assert abs(m["dTs_dt_K_per_decade"]) < 0.02, m["dTs_dt_K_per_decade"]


def test_water_closure(spinup):
    """⟨E⟩ ≈ ⟨P⟩+⟨R⟩ *net of the reference's global q-damping sink*
    (q *= QD_DIFF_FACTOR each step, dynamics.py:648-667, an artificial CWV
    sink of the same order as ⟨E⟩ — no faithful implementation can satisfy
    the criterion as literally documented), plus no reservoir drift."""
    m = spinup["phase2"]["metrics"]
    assert abs(m["water_residual_minus_qdamping_rel"]) < 0.05, m
    assert abs(m["reservoir_drift_kgm2s"]) < 0.02 * max(
        abs(m["E_mean_kgm2s"]), 1e-30), m


def test_latent_heat_consistency(spinup):
    """⟨LH⟩ ≈ ⟨LH_release⟩ net of L_v times the q-damping sink (same cause
    as the water closure gap)."""
    m = spinup["phase2"]["metrics"]
    assert abs(m["LH_minus_qdamping_rel"]) < 0.05, m


def test_energy_diag_levels(spinup):
    """docs/11.5: |<SFC_net>|, |<ATM_net>| → 0 with threshold ~2 W/m²."""
    m = spinup["phase2"]["metrics"]
    assert abs(m["SFC_net_mean_Wm2"]) < 2.0, m
    assert abs(m["ATM_net_mean_Wm2"]) < 2.0, m
