#!/usr/bin/env python3
"""Routing validation CLI (counterpart of the reference's
scripts/validate_hydro_routing.py): checks ocean-sink encoding, runs synthetic
constant runoff through the network, and reports ocean inflow + mass-closure
error."""

import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from qingdai_tpu import hydro_network as hn, topography as topo
    from qingdai_tpu.config import HydrologyConfig
    from qingdai_tpu.grid import make_grid
    from qingdai_tpu.routing import (build_routing_static, init_routing_state,
                                     routing_step)

    n_lat, n_lon = int(os.getenv("QD_N_LAT", "61")), int(os.getenv("QD_N_LON", "120"))
    path = os.getenv("QD_HYDRO_NETCDF", "")
    lat = np.linspace(-90, 90, n_lat)
    lon = np.linspace(0, 360, n_lon)
    if path and os.path.exists(path):
        net = hn.load_network_netcdf(path)
        land = net["land_mask"]
        n_lat, n_lon = land.shape
        lat = np.linspace(-90, 90, n_lat)
        lon = np.linspace(0, 360, n_lon)
        print(f"[Validate] Loaded network '{path}'")
    else:
        lon_mesh, lat_mesh = np.meshgrid(lon, lat)
        land, elev = topo.create_land_sea_mask(lat_mesh, lon_mesh, seed=42)
        net = hn.build_network(lat, lon, elev, land)
        print("[Validate] Built procedural network")

    # 1) ocean-sink encoding: flow_to of every land cell is -1 or a land cell
    flow_to = np.asarray(net["flow_to_index"]).reshape(land.shape)
    bad = 0
    landb = land == 1
    for j, i in np.argwhere(landb):
        dn = flow_to[j, i]
        if dn >= 0 and not landb.ravel()[dn]:
            bad += 1
    print(f"[Validate] ocean-sink encoding: {bad} violations")

    # 2) synthetic constant runoff → positive ocean inflow, closure ≈ 0
    grid = make_grid(n_lat, n_lon)
    rs = build_routing_static(net, grid)
    cfg = HydrologyConfig(dt_hydro_hours=1.0)
    st = init_routing_state(rs)
    R = jnp.where(jnp.asarray(landb), 1e-5, 0.0)
    zeros = jnp.zeros(land.shape)
    st = routing_step(rs, st, cfg, R, 1800.0, zeros, zeros)
    st = routing_step(rs, st, cfg, R, 1800.0, zeros, zeros)
    cell_area = np.asarray(grid.cell_area)
    mass_in = float((np.asarray(R) * cell_area * 3600.0).sum())
    rel_err = abs(float(st.mass_error_kg)) / max(mass_in, 1e-30)
    print(f"[Validate] ocean_inflow={float(st.ocean_inflow_kgps):.3e} kg/s "
          f"(must be > 0): {'OK' if float(st.ocean_inflow_kgps) > 0 else 'FAIL'}")
    print(f"[Validate] mass closure relative error={rel_err:.3e} "
          f"(must be ≈ 0): {'OK' if rel_err < 1e-4 else 'FAIL'}")
    ok = bad == 0 and float(st.ocean_inflow_kgps) > 0 and rel_err < 1e-4
    print(f"[Validate] {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
