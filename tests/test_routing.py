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

    # decomposition scalars (RoutingState): routed mass matches the window
    # input; mass_error = store_out − lake_delta exactly; the input splits
    # exactly into ocean + stored + stranded (stranded = the
    # reference-shared lake-outlet-ordering artifact, see RoutingState)
    routed = float(state.routed_mass_kg)
    stranded = float(state.stranded_kg)
    store = float(state.store_out_kg)
    lake_d = float(state.lake_delta_kg)
    assert abs(routed - mass_in) < 1e-5 * mass_in + 1e-3
    assert abs(err - (store - lake_d)) < 1e-6 * max(abs(err), 1.0) + 1e-3
    assert abs(routed - (ocean_out + store + stranded)) < 1e-6 * routed + 1e-3
    assert stranded >= 0.0


def test_roundtrip_netcdf(tmp_path):
    lat, lon, elev, land = _toy_world()
    net = hn.build_network(lat, lon, elev, land)
    p = str(tmp_path / "hydrology.nc")
    hn.save_network_netcdf(p, net)
    loaded = hn.load_network_netcdf(p)
    np.testing.assert_array_equal(loaded["flow_to_index"], net["flow_to_index"])
    np.testing.assert_array_equal(loaded["land_mask"], net["land_mask"])
    assert loaded["n_levels"] == net["n_levels"]


def _reference_route_oracle(net, acc0, land_shape):
    """NumPy oracle of the reference's sequential event loop
    (/root/reference/pygcm/routing.py:261-301): iterate flow_order, lakes
    pass through to their outlet (`acc[outlet] += m` even when the outlet's
    turn has already passed — the stranding artifact), endorheic lakes store,
    leftover acc = residual_cells_mass. Returns
    (flow_accum, ocean_out, stored_by_lake, leftover)."""
    acc = acc0.copy()
    land_flat = net["land_mask"].ravel().astype(bool)
    lake_mask = net["lake_mask"].ravel().astype(bool)
    lake_ids = net["lake_id"].ravel()
    outlets = np.asarray(net["lake_outlet_index"])
    n_lakes = int(net["n_lakes"])
    flow_to = net["flow_to_index"].ravel()
    n_cells = land_flat.size
    flow_accum = np.zeros(n_cells)
    ocean_out = 0.0
    stored = np.zeros(max(n_lakes, 1))
    for idx in net["flow_order"]:
        m = acc[idx]
        if m <= 0.0:
            continue
        flow_accum[idx] += m
        if lake_mask[idx]:
            lid = int(lake_ids[idx])
            if lid > 0 and lid <= outlets.shape[0]:
                o = int(outlets[lid - 1])
                if o < 0:
                    ocean_out += m
                elif 0 <= o < n_cells and land_flat[o]:
                    acc[o] += m
                else:
                    ocean_out += m
            else:
                if lid > 0:
                    stored[lid - 1] += m
            acc[idx] = 0.0
            continue
        dn = int(flow_to[idx])
        if dn < 0 or not land_flat[dn]:
            ocean_out += m
            acc[idx] = 0.0
        else:
            acc[dn] += m
            acc[idx] = 0.0
    return flow_accum, ocean_out, stored, float(acc.sum())


def test_event_parity_vs_reference_loop():
    """The level-pass event must reproduce the reference's sequential loop
    bit-for-semantics: same ocean outflow, same endorheic storage, and the
    same STRANDED mass (the reference's residual_cells_mass — lake outlets
    sitting upstream of their lake in flow_order park mass on
    already-processed cells; see RoutingState docstring)."""
    lat, lon, elev, land = _toy_world()
    net = hn.build_network(lat, lon, elev, land)
    grid = make_grid(*land.shape)
    rs = build_routing_static(net, grid)
    cfg = HydrologyConfig(dt_hydro_hours=1.0)
    state = init_routing_state(rs)

    R = jnp.where(jnp.asarray(land) == 1, 1e-5, 0.0)
    zeros = jnp.zeros(land.shape)
    state = routing_step(rs, state, cfg, R, 3600.0, zeros, zeros)
    assert float(state.t_accum) == 0.0  # event fired

    acc0 = np.where(land.ravel() == 1,
                    1e-5 * np.asarray(grid.cell_area).ravel() * 3600.0, 0.0)
    fa_ref, ocean_ref, stored_ref, leftover_ref = _reference_route_oracle(
        net, acc0, land.shape)

    ocean_out = float(state.ocean_inflow_kgps) * 3600.0
    scale = max(acc0.sum(), 1.0)
    assert abs(ocean_out - ocean_ref) < 1e-5 * scale
    assert abs(float(state.stranded_kg) - leftover_ref) < 1e-5 * scale
    # per-cell throughput matches the sequential loop (late backward-edge
    # arrivals are excluded from both, via the static backward mask here)
    fa = np.asarray(state.flow_accum_kgps) * 3600.0
    np.testing.assert_allclose(fa, fa_ref, rtol=1e-4,
                               atol=1e-6 * scale)
    # endorheic storage went into lake_volume (zero lake P−E here)
    np.testing.assert_allclose(np.asarray(state.lake_volume_kg)[:len(stored_ref)]
                               if rs.n_lakes else [0.0],
                               stored_ref if rs.n_lakes else [0.0],
                               rtol=1e-5, atol=1.0)


def test_kahn_order_lake_outlet_not_level_forward():
    """A lake→outlet edge that is FORWARD in a Kahn-style flow_order can
    still point at an equal-or-lower raw-D8 level (Kahn pop position is not
    level-monotone). The reference's sequential loop propagates that mass;
    a level pass built on raw levels would silently strand it. The kernel
    must route it to the ocean exactly like the sequential oracle."""
    H, W = 4, 6
    n = H * W
    land = np.zeros((H, W), np.uint8)

    def idx(j, i):
        return j * W + i

    # chain u1 -> u2 -> L (lake pit); a separate low-level chain o -> p ->
    # ocean; the lake outlet is o. The outlet must forward DOWNSTREAM to
    # another land cell (p) — a direct-to-ocean outlet is rescued by the
    # kernel's end-of-pass terminal sums even when its level is low, but an
    # intermediate outlet whose level segment already processed would
    # strand the late-scattered lake mass.
    u1, u2, L, o, p = idx(1, 1), idx(1, 2), idx(1, 3), idx(2, 1), idx(2, 2)
    for c in (u1, u2, L, o, p):
        land.ravel()[c] = 1
    flow_to = np.full(n, -1, np.int64)
    flow_to[u1] = u2
    flow_to[u2] = L
    flow_to[o] = p
    # L is a pit -> lake; p drains to ocean
    raw_level, _ = hn.topo_levels(flow_to, land)
    assert raw_level[L] == 2 and raw_level[o] == 0  # o BELOW the lake's level
    assert raw_level[p] == 1
    lake_mask = np.zeros(n, np.uint8)
    lake_mask[L] = 1
    lake_id = np.zeros(n, np.int32)
    lake_id[L] = 1
    # Kahn-style order that pops o/p AFTER the lake (valid for the raw DAG:
    # the o→p chain has no raw-DAG relation to the u-chain) → the redirect
    # edge L→o is forward-in-order, so the reference loop PROPAGATES the
    # lake mass through o and p to the ocean
    fo = np.array([u1, u2, L, o, p], np.int64)
    net = {
        "land_mask": land,
        "flow_to_index": flow_to.reshape(H, W),
        "flow_level": raw_level.reshape(H, W),
        "n_levels": int(raw_level.max()) + 1,
        "lake_mask": lake_mask.reshape(H, W),
        "lake_id": lake_id.reshape(H, W),
        "n_lakes": 1,
        "lake_outlet_index": np.array([o], np.int32),
        "flow_order": fo,
    }
    grid = make_grid(H, W)
    rs = build_routing_static(net, grid)
    cfg = HydrologyConfig(dt_hydro_hours=1.0)
    state = init_routing_state(rs)
    R = jnp.where(jnp.asarray(land.reshape(H, W)) == 1, 1e-5, 0.0)
    zeros = jnp.zeros((H, W))
    state = routing_step(rs, state, cfg, R, 3600.0, zeros, zeros)

    # sequential oracle along flow_order with lake redirection
    area = np.asarray(grid.cell_area).ravel()
    acc = np.where(land.ravel() == 1, 1e-5 * area * 3600.0, 0.0)
    ocean_out = 0.0
    for c in fo:
        m = acc[c]
        if lake_mask[c]:
            acc[o] += m          # redirect; o is later in fo → propagates
        elif flow_to[c] >= 0:
            acc[flow_to[c]] += m
        else:
            ocean_out += m
    got = float(state.ocean_inflow_kgps) * 3600.0
    np.testing.assert_allclose(got, ocean_out, rtol=1e-6)
    # nothing strands: the whole input reaches the ocean (stranded is a
    # difference of f32 sums → allow rounding at the total-mass scale)
    total_in = float((1e-5 * area * 3600.0 * (land.ravel() == 1)).sum())
    np.testing.assert_allclose(got, total_in, rtol=1e-6)
    assert abs(float(state.stranded_kg)) < 1e-6 * total_in
