"""Benchmark: full coupled planet at 181×360 on the available accelerator.

Prints ONE JSON line:
  {"metric": "sim_years_per_hour", "value": N, "unit": "sim-years/hour",
   "vs_baseline": N}

Baseline = reference NumPy implementation measured on this machine's CPU at
181×360 with the ocean enabled (atmosphere+energy+ocean only; see BASELINE.md):
117.0 ms/step → 0.253 sim-years/hour. This benchmark runs the strictly larger
FULL coupled workload (plus hydrology, D8 routing, 16-band ecology, individual
pool, phytoplankton).
"""

import json
import sys
import time

import numpy as np

REF_CPU_SIM_YEARS_PER_HOUR = 0.2527  # 117.043 ms/step, BASELINE.md


def _measure(extra_env=None, n_chunks=5, chunk_steps=240, repeats=1,
             n_lat=181, n_lon=360):
    """Build one world config, time a warmed scan; returns (per_step_s,
    state, dt). ``repeats`` re-times the same compiled chunk and keeps the
    best sample (chip/session noise is ±15 µs/step, perf-notes "Session
    variance"; one sample is only ~0.4 s)."""
    import jax
    from __graft_entry__ import _build_world
    from qingdai_tpu import model as M

    mdl, state = _build_world(n_lat, n_lon, extra_env=extra_env)
    chunk = jax.jit(M.make_chunk_fn(mdl, chunk_steps))
    state, _ = chunk(state)          # compile + warm-up day
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.time()
        for _ in range(n_chunks):
            state, _ = chunk(state)
        jax.block_until_ready(state)
        best = min(best, (time.time() - t0) / (n_chunks * chunk_steps))
    return best, state, mdl.dt


def ablate():
    """--ablate: per-subsystem step-time attribution. Each row disables ONE
    subsystem from the full coupled model; delta = its cost in the full build
    (fusion effects included, so deltas need not sum to the total)."""
    rows = [
        ("full", {}),
        ("-phyto", {"QD_PHYTO_ENABLE": "0"}),
        ("-ecology", {"QD_ECO_ENABLE": "0"}),
        ("-individuals", {"QD_ECO_INDIV_ENABLE": "0"}),
        ("-routing", {"QD_HYDRO_ENABLE": "0"}),
        ("-ocean", {"QD_USE_OCEAN": "0"}),
        ("-cloud_advect", {"QD_CLOUD_ADVECT": "0"}),
        ("-filters", {"QD_DIFF_ENABLE": "0", "QD_SHAPIRO_EVERY": "0"}),
        # VMEM megakernel attributions: each row falls back to the jnp form
        # (pallas_ocean defaults OFF since the 2026-08-18 A/B, so its
        # attribution row ENABLES the kernel instead)
        ("+pallas_ocean", {"QD_PALLAS_OCEAN": "1"}),
        ("-pallas_advect", {"QD_PALLAS_ADVECT": "0"}),
        ("-pallas_hyper4", {"QD_PALLAS_HYPER4": "0"}),
        ("-pallas_median", {"QD_PALLAS_MEDIAN": "0"}),
    ]
    out = []
    base = None
    for name, env in rows:
        # best-of-3 like main(): compile dominates each row's wall time, so
        # the extra timed repeats are nearly free, and a single noisy 'full'
        # sample would shift EVERY subsystem_cost_us row by the same ±15 µs
        per_step, _, _ = _measure(extra_env=env, n_chunks=3, repeats=3)
        if name == "full":
            base = per_step
        # cost of the removed subsystem = full − without (positive when the
        # subsystem costs time; negative means removing it is slower)
        out.append({"config": name, "ms_per_step": round(per_step * 1e3, 4),
                    "subsystem_cost_us": None if name == "full" else
                    round((base - per_step) * 1e6, 1)})
        print(json.dumps(out[-1]), flush=True)
    return out


def _watchdog(seconds=1500):
    """The axon tunnel can die in a way that hangs backend init forever
    (even bare jax.devices(); the relay process is host-wired and cannot be
    restarted from inside). Bound the benchmark so a dead tunnel yields an
    error line instead of a hung process."""
    import os
    import threading

    def fire():
        print(json.dumps({"metric": "sim_years_per_hour", "value": 0.0,
                          "unit": "sim-years/hour", "vs_baseline": 0.0,
                          "error": f"watchdog: no result in {seconds}s "
                                   "(TPU tunnel hung/dead?)",
                          "last_measured_on_hardware":
                              "88-99 sim-years/hour across round-3 TPU "
                              "sessions (BASELINE.md)"}), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    wd = _watchdog()
    import jax  # noqa: F401  (backend init)
    from qingdai_tpu.compile_cache import setup_from_env as _cache_setup
    _cache_setup()
    from qingdai_tpu.physics.orbital import T_PLANET

    if "--ablate" in sys.argv:
        wd.cancel()
        _watchdog(5400)     # 12 builds; slow sessions run ~15-20 min
        ablate()
        return

    if "--grid" in sys.argv:
        # scale rows (VERDICT r4 item 9): one JSON line per requested grid,
        # e.g. `python bench.py --grid 361x720 [--grid 721x1440]`. Each row
        # reports the default-config number AND the QD_DIAG_EVERY=24 tuned
        # number (diag emission at the reference's print cadence; state
        # trajectory bit-identical — tests/test_model_e2e.py).
        wd.cancel()
        _watchdog(5400)
        grids = [sys.argv[i + 1] for i, a in enumerate(sys.argv)
                 if a == "--grid"]
        for g in grids:
            nlat, nlon = (int(x) for x in g.lower().split("x"))
            row = {"metric": "sim_years_per_hour", "grid": g,
                   "unit": "sim-years/hour"}
            for tag, env in (("value", None),
                             ("value_diag24", {"QD_DIAG_EVERY": "24"})):
                per_step, state, dt = _measure(extra_env=env, n_chunks=3,
                                               repeats=3, n_lat=nlat,
                                               n_lon=nlon)
                if not bool(np.isfinite(np.asarray(state.atmos.T_s)).all()):
                    row["error"] = "non-finite state"
                    break
                row[tag] = round(3600.0 / per_step * dt / T_PLANET, 3)
                row[tag.replace("value", "ms_per_step")] = round(
                    per_step * 1e3, 4)
            print(json.dumps(row), flush=True)
        return

    per_step, state, dt = _measure(n_chunks=5, chunk_steps=240, repeats=3)
    wd.cancel()
    sim_years_per_hour = 3600.0 / per_step * dt / T_PLANET

    # sanity: the simulated state must remain finite for the number to count
    ts = np.asarray(state.atmos.T_s)
    ok = bool(np.isfinite(ts).all())
    if not ok:
        print(json.dumps({"metric": "sim_years_per_hour", "value": 0.0,
                          "unit": "sim-years/hour", "vs_baseline": 0.0,
                          "error": "non-finite state"}))
        sys.exit(1)

    print(json.dumps({
        "metric": "sim_years_per_hour",
        "value": round(sim_years_per_hour, 3),
        "unit": "sim-years/hour",
        "vs_baseline": round(sim_years_per_hour / REF_CPU_SIM_YEARS_PER_HOUR, 2),
    }))


if __name__ == "__main__":
    main()
