"""Diagnostic imagery: state panels, TrueColor, ocean, ecology, plankton.

Host-side rendering from device snapshots, matching the reference's output
set (run_simulation.py:330-1061): multi-panel state plot, TrueColor composite
with sea-ice/snow/vegetation/ocean-color/cloud overlays, ocean panel,
ecology panel, plankton maps, per-star ISR components. Rendering never blocks
the jitted loop — the world runner calls this between scan chunks.
"""

from __future__ import annotations

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _imshow(ax, data, title, cmap="viridis", vmin=None, vmax=None, land=None):
    im = ax.imshow(np.asarray(data), origin="lower", aspect="auto", cmap=cmap,
                   vmin=vmin, vmax=vmax, extent=[0, 360, -90, 90])
    ax.set_title(title, fontsize=8)
    ax.tick_params(labelsize=6)
    plt.colorbar(im, ax=ax, fraction=0.035, pad=0.02)
    if land is not None:
        ax.contour(np.asarray(land), levels=[0.5], colors="k",
                   linewidths=0.4, extent=[0, 360, -90, 90], origin="lower")


def plot_state(world, t_days: float, out_dir: str) -> str:
    """Multi-panel instantaneous state (run_simulation.py:330-537)."""
    st = world.state
    land = np.asarray(world.land_mask)
    atmos = st.atmos
    fig, axes = plt.subplots(4, 4, figsize=(20, 12))
    ax = axes.ravel()
    _imshow(ax[0], atmos.T_s, "T_s (K)", "RdBu_r", land=land)
    spd = np.hypot(np.asarray(atmos.u), np.asarray(atmos.v))
    _imshow(ax[1], spd, "|V| wind (m/s)", "magma", land=land)
    _imshow(ax[2], atmos.h, "h (m)", "viridis", land=land)
    _imshow(ax[3], atmos.cloud_cover, "cloud cover", "Greys_r", 0, 1, land=land)
    _imshow(ax[4], np.asarray(st.clock.precip_day_last), "precip (last day, mm)",
            "Blues", land=land)
    _imshow(ax[5], atmos.q * 1000, "q (g/kg)", "BuGn", land=land)
    _imshow(ax[6], atmos.h_ice, "h_ice (m)", "cool", land=land)
    _imshow(ax[7], atmos.olr, "OLR (W/m²)", "inferno", land=land)
    ocn = st.ocean
    _imshow(ax[8], ocn.sst, "SST (K)", "RdBu_r", land=land)
    ospd = np.hypot(np.asarray(ocn.uo), np.asarray(ocn.vo))
    _imshow(ax[9], ospd, "|V| ocean (m/s)", "magma", land=land)
    _imshow(ax[10], ocn.eta, "η (m)", "RdBu", land=land)
    _imshow(ax[11], st.land.W_land, "W_land (mm)", "YlGnBu", land=land)
    _imshow(ax[12], st.land.S_snow, "SWE (mm)", "PuBu", land=land)
    if st.eco is not None:
        lai = np.asarray(st.eco.LAI_SK).sum(axis=(0, 1))
        _imshow(ax[13], np.where(land == 1, lai, np.nan), "LAI", "YlGn", land=land)
    else:
        ax[13].axis("off")
    if st.routing is not None:
        fa = np.asarray(st.routing.flow_accum_kgps).reshape(land.shape)
        _imshow(ax[14], np.log10(np.maximum(fa, 1.0)),
                "log10 river flow (kg/s)", "Blues", land=land)
    else:
        ax[14].axis("off")
    if st.phyto is not None:
        chl = np.asarray(st.phyto.C_phyto).sum(axis=0)
        _imshow(ax[15], np.where(land == 0, chl, np.nan), "Chl (mg/m³)",
                "viridis", land=land)
    else:
        ax[15].axis("off")
    fig.suptitle(f"Qingdai state — day {t_days:.1f}", fontsize=12)
    fig.tight_layout()
    path = os.path.join(out_dir, f"state_day_{t_days:07.1f}.png")
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def plot_true_color(world, t_days: float, out_dir: str) -> str:
    """TrueColor composite with ice/snow/vegetation/ocean-color/cloud overlays
    (run_simulation.py:539-778)."""
    st = world.state
    land = np.asarray(world.land_mask) == 1
    H, W = land.shape
    rgb = np.zeros((H, W, 3))

    # base: deep ocean blue / land tan by elevation
    rgb[~land] = (0.05, 0.15, 0.35)
    elev = np.asarray(world.elevation) if world.elevation is not None else np.zeros((H, W))
    e = np.clip(np.maximum(elev, 0) / 4000.0, 0, 1)
    land_col = np.stack([0.45 + 0.3 * e, 0.38 + 0.2 * e, 0.26 + 0.2 * e], -1)
    rgb[land] = land_col[land]

    # spectral color machinery (run_simulation.py:600-720): per-band surface
    # reflectance → RGB via Gaussian color-matching weights, modulated by the
    # irradiance-relative band weights of the two suns at this instant —
    # vegetation color literally follows the evolved genes' reflectance
    es = getattr(world.model, "eco_static", None)
    w_rel = None
    if es is not None:
        from ..physics import forcing
        from ..ecology.spectral import dual_star_insolation_to_bands
        insA, insB = forcing.insolation_components_from_phases(
            world.model.grid, st.clock.phase_rot, st.clock.phase_binary,
            st.clock.phase_planet)
        I_b = np.asarray(dual_star_insolation_to_bands(
            insA, insB, es.specA, es.specB, es.T_ray))      # [NB,H,W]
        I_tot = np.maximum(np.asarray(insA) + np.asarray(insB), 0.0)
        # night side keeps zero weights → reflected color goes dark, which is
        # what draws the terminator (run_simulation.py:616-621)
        w_rel = np.where(I_tot[None] > 1e-12, I_b / (I_tot[None] + 1e-12), 0.0)
        lam = np.asarray(es.lambda_centers)

        def _cw(mu, sig):
            w = np.exp(-((lam - mu) ** 2) / (2.0 * sig ** 2))
            return w / (w.sum() + 1e-12)
        wr, wg, wb = _cw(610.0, 50.0), _cw(550.0, 40.0), _cw(460.0, 40.0)
        gamma = float(os.getenv("QD_ECO_TRUECOLOR_GAMMA", "1.8"))

        def _bands_to_rgb(A):
            chans = [np.nansum(A * (w[:, None, None] * w_rel), axis=0)
                     for w in (wr, wg, wb)]
            out = np.clip(np.stack(chans, -1), 0.0, 1.0)
            if gamma > 0:
                out = out ** (1.0 / gamma)
            return out

    # vegetation: banded surface albedo where ecology is active
    if st.eco is not None and es is not None:
        from ..ecology import population as pop_mod
        lai = np.asarray(st.eco.LAI_SK).sum(axis=(0, 1))
        f = 1.0 - np.exp(-0.5 * np.maximum(lai, 0))
        A_veg = np.asarray(pop_mod.surface_albedo_bands(es, st.eco,
                                                        world.cfg.ecology))
        veg = _bands_to_rgb(np.nan_to_num(A_veg))
        m = land & (f > 0.02)
        a = f[..., None]
        rgb[m] = ((1 - a) * rgb + a * veg)[m]
    elif st.eco is not None:
        lai = np.asarray(st.eco.LAI_SK).sum(axis=(0, 1))
        f = 1.0 - np.exp(-0.5 * np.maximum(lai, 0))
        veg = np.stack([0.10 + 0 * f, 0.35 + 0.25 * f, 0.10 + 0 * f], -1)
        m = land & (f > 0.02)
        a = f[..., None]
        rgb[m] = ((1 - a) * rgb + a * veg)[m]

    # ocean color from the phyto banded reflectance (falls back to a
    # chlorophyll-keyed tint when the band machinery is off)
    if st.phyto is not None and es is not None:
        water = _bands_to_rgb(np.asarray(st.phyto.alpha_bands))
        m = ~land
        rgb[m] = (0.6 * rgb + 0.4 * water)[m]
    elif st.phyto is not None:
        chl = np.asarray(st.phyto.C_phyto).sum(axis=0)
        g = np.clip(chl / 2.0, 0, 1)
        oc = np.stack([0.05 + 0.05 * g, 0.15 + 0.45 * g, 0.35 - 0.1 * g], -1)
        m = ~land
        rgb[m] = (0.6 * rgb + 0.4 * oc)[m]

    # sea ice
    ice_frac = 1.0 - np.exp(-np.maximum(np.asarray(st.atmos.h_ice), 0) / 0.5)
    m = (~land) & (ice_frac > 0.05)
    a = ice_frac[..., None]
    rgb = np.where(m[..., None], (1 - a) * rgb + a * np.array([0.85, 0.88, 0.92]), rgb)

    # snow on land
    C_snow = np.asarray(st.land.C_snow)
    m = land & (C_snow > 0.05)
    a = C_snow[..., None]
    rgb = np.where(m[..., None], (1 - a) * rgb + a * np.array([0.92, 0.93, 0.95]), rgb)

    # rivers
    if st.routing is not None:
        fa = np.asarray(st.routing.flow_accum_kgps).reshape(H, W)
        thresh = float(os.getenv("QD_RIVER_MIN_KGPS", "1e6"))
        m = land & (fa > thresh)
        rgb[m] = (0.15, 0.3, 0.55)

    # clouds
    cloud = np.clip(np.asarray(st.atmos.cloud_cover), 0, 1)
    a = (0.75 * cloud)[..., None]
    rgb = (1 - a) * rgb + a * np.array([0.95, 0.95, 0.97])

    # day/night from current insolation phase (approximate: use isr proxy via Ts? skip shading)
    fig, axp = plt.subplots(figsize=(12, 6))
    axp.imshow(np.clip(rgb, 0, 1), origin="lower", aspect="auto",
               extent=[0, 360, -90, 90])
    axp.set_title(f"Qingdai TrueColor — day {t_days:.1f}")
    path = os.path.join(out_dir, f"truecolor_day_{t_days:07.1f}.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)

    # console echo consistent with the [SeaIce] logs (run_simulation.py:771-777)
    w = np.maximum(np.cos(np.deg2rad(np.asarray(world.model.grid.lat_mesh))), 0.0)
    h_ice = np.asarray(st.atmos.h_ice)
    ice_m = (~land) & (ice_frac > 0.05)
    area = float((w * ice_m).sum() / (w.sum() + 1e-15))
    mean_h = float(h_ice[ice_m].mean()) if ice_m.any() else 0.0
    print(f"[TrueColor] sea_ice_area≈{area:.3f}, mean_h_ice={mean_h:.3f} m")
    return path


def plot_isr_components(world, t_days: float, out_dir: str) -> str:
    """Per-star shortwave components (diag_isr / run_simulation.py:1012-1061)."""
    from ..physics import forcing
    st = world.state
    insA, insB = forcing.insolation_components_from_phases(
        world.model.grid, st.clock.phase_rot, st.clock.phase_binary,
        st.clock.phase_planet)
    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    _imshow(axes[0], insA, "ISR star A (W/m²)", "inferno")
    _imshow(axes[1], insB, "ISR star B (W/m²)", "inferno")
    _imshow(axes[2], np.asarray(insA) + np.asarray(insB), "ISR total", "inferno")
    path = os.path.join(out_dir, f"isr_day_{t_days:07.1f}.png")
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_ecology(world, t_days: float, out_dir: str) -> str:
    """Ecology panel: LAI, ecological albedo, species dominance, seed bank
    (run_simulation.py:2437-2477)."""
    st = world.state
    if st.eco is None:
        return ""
    land = np.asarray(world.land_mask) == 1
    eco = st.eco
    lai_s = np.asarray(eco.LAI_SK).sum(axis=1)       # [S,H,W]
    lai = lai_s.sum(axis=0)
    dom = np.argmax(lai_s, axis=0).astype(float)
    dom[~land] = np.nan
    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    _imshow(axes[0, 0], np.where(land, lai, np.nan), "total LAI", "YlGn")
    _imshow(axes[0, 1], np.asarray(st.albedo.alpha_ecology_last),
            "ecology albedo", "pink")
    _imshow(axes[1, 0], dom, "dominant species id", "tab20")
    _imshow(axes[1, 1], np.where(land, np.asarray(eco.seed_bank), np.nan),
            "seed bank", "YlOrBr")
    fig.suptitle(f"Ecology — day {t_days:.1f}")
    path = os.path.join(out_dir, f"ecology_day_{t_days:07.1f}.png")
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_plankton(world, t_days: float, out_dir: str) -> str:
    """Plankton species maps + Kd490 + ocean albedo (ploter/plot_plankton_species)."""
    st = world.state
    if st.phyto is None:
        return ""
    land = np.asarray(world.land_mask) == 1
    C = np.asarray(st.phyto.C_phyto)
    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    _imshow(axes[0, 0], np.where(~land, C.sum(0), np.nan), "total Chl (mg/m³)", "viridis")
    _imshow(axes[0, 1], np.where(~land, C[0], np.nan), "species 0 Chl", "viridis")
    _imshow(axes[1, 0], np.where(~land, np.asarray(st.phyto.Kd_490), np.nan),
            "Kd(490) (1/m)", "plasma")
    _imshow(axes[1, 1], np.where(~land, np.asarray(st.phyto.alpha_scalar), np.nan),
            "ocean-color albedo", "cividis")
    fig.suptitle(f"Plankton — day {t_days:.1f}")
    path = os.path.join(out_dir, f"plankton_day_{t_days:07.1f}.png")
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_all(world, t_days: float, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    cfg = world.cfg
    plot_state(world, t_days, out_dir)
    plot_true_color(world, t_days, out_dir)
    if cfg.run.eco_plot and world.state.eco is not None:
        plot_ecology(world, t_days, out_dir)
    if cfg.run.plot_phyto and world.state.phyto is not None:
        plot_plankton(world, t_days, out_dir)
    if cfg.run.plot_isr:
        plot_isr_components(world, t_days, out_dir)
