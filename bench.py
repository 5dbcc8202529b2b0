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


def main():
    import jax
    from __graft_entry__ import _build_world
    from qingdai_tpu import model as M
    from qingdai_tpu.physics.orbital import T_PLANET

    mdl, state = _build_world(181, 360)
    dt = mdl.dt
    chunk_steps = 240
    chunk = jax.jit(M.make_chunk_fn(mdl, chunk_steps))

    # compile + warm-up day
    state, _ = chunk(state)
    jax.block_until_ready(state)

    n_chunks = 5
    t0 = time.time()
    for _ in range(n_chunks):
        state, diags = chunk(state)
    jax.block_until_ready(state)
    wall = time.time() - t0

    steps = n_chunks * chunk_steps
    per_step = wall / steps
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
