#!/usr/bin/env python3
"""Orbit figures (counterpart of scripts/generate_orbit_plots.py): binary star
trajectories, planet orbit, total flux over a planetary year."""

import argparse
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="output")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from qingdai_tpu import constants as const
    from qingdai_tpu.physics import orbital

    ts = np.linspace(0, orbital.T_PLANET, 2000)
    xA, yA, xB, yB = (np.asarray(v) for v in orbital.stellar_positions(ts))
    xp, yp = (np.asarray(v) for v in orbital.planet_position(ts))
    S = np.asarray(orbital.total_flux(ts))

    os.makedirs(args.out, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    au = const.AU
    axes[0].plot(xA / au, yA / au, label="Star A", lw=0.8)
    axes[0].plot(xB / au, yB / au, label="Star B", lw=0.8)
    axes[0].plot(xp / au, yp / au, label="Qingdai", lw=0.8)
    axes[0].set_aspect("equal")
    axes[0].legend()
    axes[0].set_title("Harmony system orbits (AU)")
    axes[1].plot(ts / const.DAY_SECONDS, S)
    axes[1].set_xlabel("planetary days")
    axes[1].set_ylabel("total flux (W/m²)")
    axes[1].set_title(f"Flux over one orbit: {S.min():.1f}–{S.max():.1f} W/m²")
    path = os.path.join(args.out, "orbits.png")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    print(f"[Orbits] T_binary={orbital.T_BINARY/86400:.2f} Earth-days | "
          f"T_planet={orbital.T_PLANET/86400:.2f} Earth-days "
          f"({orbital.T_PLANET/const.DAY_SECONDS:.1f} Qingdai days)")
    print(f"[Orbits] wrote {path}")


if __name__ == "__main__":
    main()
