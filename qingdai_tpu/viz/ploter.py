"""Point-level ecology plotting: per-cell species composition and the
individual-pool distributions (counterpart of /root/reference/pygcm/ploter.py).
"""

from __future__ import annotations

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def species_height_maps(eco_state, es, cfg):
    """Per-species canopy-height proxies from layered LAI (ploter.py:57-121)."""
    L_s = np.asarray(eco_state.LAI_SK).sum(axis=1)  # [S,H,W]
    return L_s


def nearest_sampled_cell(indiv_static, j, i):
    """Index of the sampled individual-pool cell closest to (j, i)."""
    jj = np.asarray(indiv_static.sample_j)
    ii = np.asarray(indiv_static.sample_i)
    d2 = (jj - j) ** 2 + (ii - i) ** 2
    return int(np.argmin(d2))


def plot_top3_species_distributions(eco_state, indiv_static, indiv_state,
                                    land_mask, lat_deg, lon_deg, lat, lon,
                                    out_dir, t_days=0.0):
    """Top-3 species at the cell nearest (lat_deg, lon_deg): LAI shares plus
    per-individual energy and stress distributions (ploter.py:124-260)."""
    j = int(np.argmin(np.abs(np.asarray(lat) - lat_deg)))
    i = int(np.argmin(np.abs(np.asarray(lon) - lon_deg)))
    L_s = np.asarray(eco_state.LAI_SK).sum(axis=1)  # [S,H,W]
    col = L_s[:, j, i]
    order = np.argsort(col)[::-1][:3]

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].bar([f"sp{s}" for s in order], col[order], color="seagreen")
    axes[0].set_title(f"Top-3 species LAI @ ({lat_deg:.1f}°, {lon_deg:.1f}°)")
    axes[0].set_ylabel("LAI")

    if indiv_static is not None and indiv_state is not None:
        ci = nearest_sampled_cell(indiv_static, j, i)
        cell_idx = np.asarray(indiv_static.cell_index)
        sel = cell_idx == ci
        E = np.asarray(indiv_state.E_day)[sel]
        stress = np.asarray(indiv_state.water_stress_days)[sel]
        sp = np.asarray(indiv_static.species_id)[sel]
        axes[1].hist([E[sp == s] for s in order], bins=20, stacked=True,
                     label=[f"sp{s}" for s in order])
        axes[1].set_title("Individual daily energy")
        axes[1].legend(fontsize=7)
        axes[2].hist(stress, bins=20, color="firebrick")
        axes[2].set_title("Water-stress days")
    else:
        axes[1].axis("off")
        axes[2].axis("off")

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir,
                        f"point_ecology_{lat_deg:+05.1f}_{lon_deg:06.1f}_day_{t_days:05.1f}.png")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
