"""Mid-day restart equivalence: save at a non-day-aligned step, reload into a
fresh world, continue, and compare against the uninterrupted run (VERDICT r1
next-round item 6). Exercises the step_chunk day-alignment path selection
(world.py) and the full-pytree sidecar that carries the clock accumulators,
humidity caches, routing buffer and RNG key the reference restart schema
drops (io/checkpoint.py)."""

import os

import numpy as np
import jax
import pytest


@pytest.fixture
def tiny_env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("QD_N_LAT", "13")
    monkeypatch.setenv("QD_N_LON", "24")
    monkeypatch.setenv("QD_CHUNK_STEPS", "4")
    monkeypatch.setenv("QD_ECO_NS", "3")
    monkeypatch.setenv("QD_PHYTO_NSPECIES", "3")
    monkeypatch.setenv("QD_ECO_INDIV_PER_CELL", "10")
    return tmp_path


def _leaves_with_paths(state):
    return jax.tree_util.tree_flatten_with_path(jax.device_get(state))[0]


def test_midday_save_resume_equivalence(tiny_env):
    from qingdai_tpu.world import QingdaiWorld

    # Uninterrupted run: 10 steps (mid-day: day = 240 steps), save, 14 more.
    wA = QingdaiWorld.create_default()
    wA.verbose = False
    wA.step_chunk(10)
    assert wA._day_aligned is False  # 10 % 240 != 0 → cond-mode selected
    wA.autosave()
    t_save = wA.t_seconds
    wA.step_chunk(14)
    ref = {jax.tree_util.keystr(p): np.asarray(l)
           for p, l in _leaves_with_paths(wA.state)}

    # Resumed run: fresh world loads the autosave set + full-pytree sidecar.
    assert os.path.exists(os.path.join("data", "world_ckpt.npz")) or \
        os.path.exists(os.path.join("data", "world_ckpt"))
    wB = QingdaiWorld.create_default()
    wB.verbose = False
    assert abs(wB.t0_seconds - t_save) < 1.0
    # resumed mid-day: accumulator is non-zero → cond-mode chunk required
    acc = float(jax.device_get(wB.state.clock.accum_t_day))
    assert acc > 0.0
    wB.step_chunk(14)
    assert wB._day_aligned is False

    for path, leaf in _leaves_with_paths(wB.state):
        key = jax.tree_util.keystr(path)
        a, b = ref[key], np.asarray(leaf)
        assert a.shape == b.shape, key
        if a.dtype.kind in "fiub":
            np.testing.assert_array_equal(a, b, err_msg=key)


def test_midday_resume_without_sidecar_still_loads(tiny_env):
    """Deleting the sidecar falls back to the reference NetCDF fields
    (approximate resume), preserving reference-schema interoperability."""
    from qingdai_tpu.world import QingdaiWorld
    wA = QingdaiWorld.create_default()
    wA.verbose = False
    wA.step_chunk(10)
    wA.autosave()
    for f in ("world_ckpt", "world_ckpt.npz"):
        p = os.path.join("data", f)
        if os.path.exists(p):
            os.remove(p) if os.path.isfile(p) else __import__("shutil").rmtree(p)
    wB = QingdaiWorld.create_default()
    wB.verbose = False
    np.testing.assert_allclose(np.asarray(wB.state.atmos.T_s),
                               np.asarray(wA.state.atmos.T_s), atol=1e-3)
    # NetCDF-only resume loses the day accumulator (reference behavior)
    assert float(jax.device_get(wB.state.clock.accum_t_day)) == 0.0
