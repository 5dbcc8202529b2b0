#!/usr/bin/env python3
"""Quick dual-star shortwave diagnostics (counterpart of scripts/diag_isr.py):
per-star ISR component maps + subsolar-point separation over time."""

import argparse
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-days", type=float, default=0.0)
    ap.add_argument("--nlat", type=int, default=91)
    ap.add_argument("--nlon", type=int, default=180)
    ap.add_argument("--out", type=str, default="output")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from qingdai_tpu import constants as const
    from qingdai_tpu.grid import make_grid
    from qingdai_tpu.physics import forcing

    g = make_grid(args.nlat, args.nlon)
    t = args.t_days * const.DAY_SECONDS
    insA, insB = forcing.insolation_components(g, t)
    insA, insB = np.asarray(insA), np.asarray(insB)

    # subsolar points = argmax of each component
    jA, iA = np.unravel_index(np.argmax(insA), insA.shape)
    jB, iB = np.unravel_index(np.argmax(insB), insB.shape)
    lat, lon = np.asarray(g.lat), np.asarray(g.lon)
    sep = np.rad2deg(np.arccos(np.clip(
        np.sin(np.deg2rad(lat[jA])) * np.sin(np.deg2rad(lat[jB]))
        + np.cos(np.deg2rad(lat[jA])) * np.cos(np.deg2rad(lat[jB]))
        * np.cos(np.deg2rad(lon[iA] - lon[iB])), -1, 1)))
    print(f"[ISR] t={args.t_days:.2f} d | max A={insA.max():.1f} W/m2 "
          f"@({lat[jA]:.1f},{lon[iA]:.1f}) | max B={insB.max():.1f} "
          f"@({lat[jB]:.1f},{lon[iB]:.1f}) | subsolar separation={sep:.2f}°")

    os.makedirs(args.out, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    for ax, data, title in [(axes[0], insA, "ISR A"), (axes[1], insB, "ISR B"),
                            (axes[2], insA + insB, "ISR total")]:
        im = ax.imshow(data, origin="lower", aspect="auto",
                       extent=[0, 360, -90, 90], cmap="inferno")
        ax.set_title(f"{title} (W/m²)")
        plt.colorbar(im, ax=ax, fraction=0.04)
    path = os.path.join(args.out, f"diag_isr_day_{args.t_days:06.1f}.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"[ISR] wrote {path}")


if __name__ == "__main__":
    main()
