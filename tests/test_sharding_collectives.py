"""Regression lock on the halo-bounded SPMD property: the compiled sharded
step must contain NO full-field all-gather except inside the routing event
(the D8 river DAG is global by nature). See scripts/analyze_sharding.py and
docs/perf-notes.md 'Multi-chip lowering'."""

import re

import jax
import pytest


@pytest.fixture
def tiny_sharded_hlo(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_world
    from qingdai_tpu import model as M
    from qingdai_tpu.parallel import mesh as pmesh

    n_lat, n_lon = 19, 48
    mdl, state = _build_world(n_lat, n_lon,
                              extra_env={"QD_HYDRO_ENABLE": "0"})
    m = pmesh.make_mesh(8)
    mdl_s = pmesh.shard_model_statics(mdl, m)
    state_s = pmesh.shard_state(state, m, n_lon)
    chunk = jax.jit(M.make_chunk_fn(mdl_s, 1))
    return chunk.lower(state_s).compile().as_text(), (n_lat, n_lon)


def test_no_full_field_all_gather(tiny_sharded_hlo):
    hlo, (H, W) = tiny_sharded_hlo
    full = re.compile(rf"=\s*\S*\[(?:\d+,)*{H},{W}\]\S*\s+all-gather")
    offenders = [ln.strip()[:160] for ln in hlo.splitlines()
                 if full.search(ln)]
    assert not offenders, "\n".join(offenders)


def test_halos_lower_to_collective_permute(tiny_sharded_hlo):
    hlo, _ = tiny_sharded_hlo
    n_cp = len(re.findall(r"\bcollective-permute(?:-start)?\(", hlo))
    assert n_cp > 50, f"expected roll halos as collective-permutes, got {n_cp}"
