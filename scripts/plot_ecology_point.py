#!/usr/bin/env python3
"""Point-level ecology plot CLI (counterpart of scripts/plot_ecology_point.py):
renders top-3 species + individual-pool distributions at a lat/lon point from
the current autosave state."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lat", type=float, default=0.0)
    ap.add_argument("--lon", type=float, default=180.0)
    ap.add_argument("--out", type=str, default="output")
    args = ap.parse_args()

    from qingdai_tpu.world import QingdaiWorld
    from qingdai_tpu.viz.ploter import plot_top3_species_distributions

    world = QingdaiWorld.create_default()
    if world.state.eco is None:
        print("[EcologyPoint] ecology disabled (QD_ECO_ENABLE=0); nothing to plot.")
        return
    path = plot_top3_species_distributions(
        world.state.eco, world.model.indiv_static, world.state.indiv,
        world.land_mask, args.lat, args.lon, world.lat, world.lon,
        args.out, t_days=world.t_seconds / world.day_seconds)
    print(f"[EcologyPoint] wrote {path}")


if __name__ == "__main__":
    main()
