#!/usr/bin/env python3
"""Offline D8 hydrology network generator (P014 CLI).

Same artifact schema as the reference tool (scripts/generate_hydrology_maps.py)
plus the flow_level map used by the on-device levelized routing kernel.
"""

import argparse
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qingdai_tpu import hydro_network as hn
from qingdai_tpu import topography as topo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topo", type=str, default=os.getenv("QD_TOPO_NC", ""))
    ap.add_argument("--out", type=str, default="data/hydrology_network.nc")
    ap.add_argument("--nlat", type=int, default=181)
    ap.add_argument("--nlon", type=int, default=360)
    ap.add_argument("--pit-eps", type=float, default=1e-3)
    ap.add_argument("--pit-iters", type=int, default=200)
    args = ap.parse_args()

    lat = np.linspace(-90, 90, args.nlat)
    lon = np.linspace(0, 360, args.nlon)
    lon_mesh, lat_mesh = np.meshgrid(lon, lat)

    if args.topo and os.path.exists(args.topo):
        elevation, land_mask, _a, _f = topo.load_topography_from_netcdf(
            args.topo, lat, lon)
        print(f"[HydroNet] Loaded topography from '{args.topo}'.")
    else:
        print("[HydroNet] No topography specified; procedural fallback.")
        land_mask, elevation = topo.create_land_sea_mask(lat_mesh, lon_mesh)

    net = hn.build_network(lat, lon, elevation, land_mask,
                           pit_iters=args.pit_iters, pit_eps=args.pit_eps)
    print(f"[HydroNet] land={int((land_mask == 1).sum())} cells, "
          f"n_lakes={net['n_lakes']}, n_levels={net['n_levels']}")
    hn.save_network_netcdf(args.out, net)
    print(f"[HydroNet] Wrote {args.out}")


if __name__ == "__main__":
    main()
