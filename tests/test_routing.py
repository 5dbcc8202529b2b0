"""Routing: network construction + on-device mass-closure, mirroring the
reference validation (scripts/validate_hydro_routing.py: ocean-sink encoding,
synthetic constant runoff → positive ocean inflow, ≈0 mass-closure error)."""

import numpy as np
import jax.numpy as jnp

from qingdai_tpu import hydro_network as hn
from qingdai_tpu.config import HydrologyConfig
from qingdai_tpu.grid import make_grid
from qingdai_tpu.routing import (build_routing_static, init_routing_state,
                                 routing_step)


def _toy_world(n_lat=12, n_lon=24, seed=0):
    rng = np.random.default_rng(seed)
    lat = np.linspace(-90, 90, n_lat)
    lon = np.linspace(0, 360, n_lon)
    elev = rng.standard_normal((n_lat, n_lon)).cumsum(axis=0) * 100.0
    land = np.zeros((n_lat, n_lon), np.uint8)
    land[3:9, 4:16] = 1  # a continent
    return lat, lon, elev, land


def test_network_invariants():
    lat, lon, elev, land = _toy_world()
    net = hn.build_network(lat, lon, elev, land)
    flow_to = net["flow_to_index"]
    level = net["flow_level"].reshape(land.shape)
    n_lon = land.shape[1]
    # every land cell has flow_to either -1 or a land cell
    for j, i in np.argwhere(land == 1):
        dn = flow_to[j, i]
        if dn >= 0:
            jj, ii = dn // n_lon, dn % n_lon
            assert land[jj, ii] == 1
            # downstream has strictly greater level (the level-parallel invariant)
            assert level[jj, ii] > level[j, i]
    # ocean cells: level == -1, flow_to == -1
    assert np.all(flow_to[land == 0] == -1)
    assert np.all(level[land == 0] == -1)
    # flow_order covers all land cells exactly once
    order = net["flow_order"]
    assert sorted(order.tolist()) == sorted(np.flatnonzero(land.ravel() == 1).tolist())


def test_routing_mass_closure():
    lat, lon, elev, land = _toy_world()
    net = hn.build_network(lat, lon, elev, land)
    grid = make_grid(*land.shape)
    rs = build_routing_static(net, grid)
    cfg = HydrologyConfig(dt_hydro_hours=1.0)
    state = init_routing_state(rs)

    R = jnp.where(jnp.asarray(land) == 1, 1e-5, 0.0)  # kg/m^2/s constant runoff
    zeros = jnp.zeros(land.shape)
    dt = 1800.0
    # two accumulation steps: second reaches 1h → event fires
    state = routing_step(rs, state, cfg, R, dt, zeros, zeros)
    assert float(state.t_accum) == 1800.0
    assert float(state.ocean_inflow_kgps) == 0.0
    state = routing_step(rs, state, cfg, R, dt, zeros, zeros)
    assert float(state.t_accum) == 0.0

    # total input mass over the event window
    cell_area = np.asarray(grid.cell_area)
    mass_in = float((np.asarray(R) * cell_area * 3600.0).sum())
    ocean_out = float(state.ocean_inflow_kgps) * 3600.0
    lakes = float(np.asarray(state.lake_volume_kg).sum())
    err = float(state.mass_error_kg)
    # closure: input = ocean + lakes + residual (+err≈0)
    assert ocean_out > 0.0
    assert abs(err) < 1e-6 * mass_in + 1e-3
    # flow accumulation is at least the local mass everywhere on land
    fa = np.asarray(state.flow_accum_kgps).reshape(land.shape)
    assert np.all(fa[land == 1] >= 0)


def test_roundtrip_netcdf(tmp_path):
    lat, lon, elev, land = _toy_world()
    net = hn.build_network(lat, lon, elev, land)
    p = str(tmp_path / "hydrology.nc")
    hn.save_network_netcdf(p, net)
    loaded = hn.load_network_netcdf(p)
    np.testing.assert_array_equal(loaded["flow_to_index"], net["flow_to_index"])
    np.testing.assert_array_equal(loaded["land_mask"], net["land_mask"])
    assert loaded["n_levels"] == net["n_levels"]
