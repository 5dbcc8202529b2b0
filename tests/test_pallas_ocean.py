"""The ocean-substep VMEM megakernel (ops/pallas_ocean.py) must reproduce
the jnp substep scan of ocean.ocean_step — verified end-to-end through
ocean_step itself (interpret mode on CPU), so the input-stack plumbing is
covered too, not just the kernel body."""

import numpy as np
import jax.numpy as jnp
import pytest

from qingdai_tpu import flags
from qingdai_tpu.config import OceanConfig
from qingdai_tpu.grid import make_grid
from qingdai_tpu.ocean import ocean_step, static_substeps
from qingdai_tpu.ops.advect import make_advect_plan
from qingdai_tpu.state import OceanState


@pytest.fixture(autouse=True)
def _refreeze_flags():
    """The gates read flags' frozen snapshot, not the live env; refreeze
    after each monkeypatch.setenv and restore the defaults on teardown."""
    yield
    import os
    os.environ.pop("QD_PALLAS_OCEAN", None)
    flags.refresh()


def _setup(seed, n_lat=19, n_lon=36, n_tracers=0):
    rng = np.random.default_rng(seed)
    grid = make_grid(n_lat, n_lon)
    land = jnp.asarray((rng.random((n_lat, n_lon)) < 0.3).astype(np.int32))
    ocn = OceanState(
        uo=jnp.asarray(rng.normal(0, 0.5, (n_lat, n_lon)), jnp.float32),
        vo=jnp.asarray(rng.normal(0, 0.5, (n_lat, n_lon)), jnp.float32),
        eta=jnp.asarray(rng.normal(0, 0.2, (n_lat, n_lon)), jnp.float32),
        sst=jnp.asarray(rng.normal(288, 8, (n_lat, n_lon)), jnp.float32))
    u_atm = jnp.asarray(rng.normal(0, 8, (n_lat, n_lon)), jnp.float32)
    v_atm = jnp.asarray(rng.normal(0, 4, (n_lat, n_lon)), jnp.float32)
    Q_net = jnp.asarray(rng.normal(0, 40, (n_lat, n_lon)), jnp.float32)
    ice = jnp.asarray(rng.random((n_lat, n_lon)) < 0.1)
    tracers = (jnp.asarray(rng.uniform(0, 1, (n_tracers, n_lat, n_lon)),
                           jnp.float32) if n_tracers else None)
    return grid, land, ocn, u_atm, v_atm, Q_net, ice, tracers


def _run(monkeypatch, mode, cfg, setup, dt=300.0):
    grid, land, ocn, u_atm, v_atm, Q_net, ice, tracers = setup
    monkeypatch.setenv("QD_PALLAS_OCEAN", mode)
    flags.refresh()
    n_sub = static_substeps(grid, cfg, dt)
    plan = make_advect_plan(
        grid.n_lat, grid.dlat_rad, grid.dlon_rad, dt / n_sub,
        6.371e6, np.asarray(grid.coslat_cap_05)[:, 0], cfg.max_u_cap)
    assert plan.exact_rows == ()   # the capped ocean metric bounds offsets
    out, trc = ocean_step(grid, cfg, land, ocn, u_atm, v_atm, Q_net, ice,
                          jnp.asarray(0), dt, n_sub, tracers=tracers,
                          adv_plan=plan)
    return out, trc


@pytest.mark.parametrize("n_tracers,n_substeps", [(0, 1), (3, 1), (0, 2)])
def test_pallas_ocean_substep_matches_jnp(monkeypatch, n_tracers, n_substeps):
    cfg = OceanConfig(n_substeps=n_substeps)
    if n_tracers and n_substeps != 1:
        pytest.skip("tracers require n_sub == 1")
    setup = _setup(11, n_tracers=n_tracers)
    ref, ref_trc = _run(monkeypatch, "0", cfg, setup)
    got, got_trc = _run(monkeypatch, "interpret", cfg, setup)
    for name in ("uo", "vo", "eta", "sst"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=2e-5, atol=1e-4, err_msg=name)
    if n_tracers:
        np.testing.assert_allclose(np.asarray(got_trc), np.asarray(ref_trc),
                                   rtol=2e-5, atol=1e-5)
    else:
        assert got_trc is None and ref_trc is None


def test_pallas_ocean_gate_respects_nondefault_cadence(monkeypatch):
    """Non-default Shapiro cadence must fall back to the jnp path (the
    kernel does not implement the cadenced filter)."""
    from qingdai_tpu.ops.pallas_ocean import use_pallas_ocean
    monkeypatch.setenv("QD_PALLAS_OCEAN", "interpret")
    flags.refresh()
    plan = make_advect_plan(19, 0.17, 0.17, 300.0, 6.371e6,
                            np.maximum(np.cos(np.linspace(-1.5, 1.5, 19)),
                                       0.5), 3.0)
    ok, _ = use_pallas_ocean(OceanConfig(), plan, (19, 36), jnp.float32, 1, 1)
    assert ok
    ok, _ = use_pallas_ocean(OceanConfig(shapiro_n=2), plan, (19, 36),
                             jnp.float32, 1, 1)
    assert not ok
    ok, _ = use_pallas_ocean(OceanConfig(diff_every=4), plan, (19, 36),
                             jnp.float32, 1, 1)
    assert not ok
