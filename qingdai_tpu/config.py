"""Frozen runtime configuration for the TPU-native Qingdai engine.

The reference model reads ~280 ``QD_*`` environment variables ad hoc at call
sites, many of them *inside the hot loop* (see e.g.
/root/reference/pygcm/dynamics.py:534-577, /root/reference/pygcm/ocean.py:380-399).
On TPU everything under ``jit`` is traced once, so the whole env surface is
materialized here, once, into immutable (hashable) dataclasses that are passed
as static trace-time constants. Env names and defaults are preserved from the
reference (catalog: /root/reference/docs/04-runtime-config.md).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

from . import constants as const


def _f(name: str, default: float) -> float:
    v = os.getenv(name)
    if v is None or v == "":
        return float(default)
    try:
        return float(v)
    except ValueError:
        return float(default)


def _i(name: str, default: int) -> int:
    v = os.getenv(name)
    if v is None or v == "":
        return int(default)
    try:
        return int(v)
    except ValueError:
        return int(default)


def _b(name: str, default: bool) -> bool:
    v = os.getenv(name)
    if v is None or v == "":
        return bool(default)
    try:
        return bool(int(v))
    except ValueError:
        return bool(default)


def _s(name: str, default: str) -> str:
    v = os.getenv(name)
    return v.strip() if v else default


def _opt_f(name: str) -> Optional[float]:
    v = os.getenv(name, "")
    if v in ("", "None", "none", "null"):
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _flist(name: str) -> Optional[Tuple[float, ...]]:
    v = os.getenv(name)
    if not v:
        return None
    try:
        out = tuple(float(p.strip()) for p in v.split(",") if p.strip() != "")
        return out if out else None
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Per-subsystem configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EnergyConfig:
    """Reference: /root/reference/pygcm/energy.py:44-74, gh-lock :118-135."""
    sw_a0: float = 0.06
    sw_kc: float = 0.20
    lw_eps0: float = 0.70
    lw_kc: float = 0.20
    t_floor: float = 150.0
    c_sfc: float = 2.0e7
    diag: bool = True
    gh_lock: bool = True
    gh_factor: float = 0.40      # reference driver default (run_simulation.py:1260)
    lw_v2: bool = True
    lw_tau0: float = 6.0
    lw_ktau: float = 1.0
    eps_ocean: float = 0.98
    eps_land: float = 0.96
    eps_ice: float = 0.99
    eps_default: float = 0.97
    # boundary-layer fluxes
    C_H: float = 1.5e-3
    cp_air: float = 1004.0
    bowen_land: float = 0.7
    bowen_ocean: float = 0.3
    # autotune
    autotune: bool = False
    tune_every: int = 50
    tune_rate_eps: float = 5e-5
    tune_rate_kc: float = 2e-5
    autotune_diag: bool = True
    # QD_ENERGY_AUDIT: per-step on-device attribution of every
    # non-conservative energy term (nudge, q/h damping, clamps, advection,
    # filters, flux-partition inconsistency, ocean SST overwrite) so the
    # spin-up can close TOA_net against the measured sum instead of an
    # asserted bound. ~12 extra area-means per step; off by default.
    audit: bool = False

    @staticmethod
    def from_env() -> "EnergyConfig":
        gh_lock = _b("QD_GH_LOCK", True)
        return EnergyConfig(
            sw_a0=_f("QD_SW_A0", 0.06),
            sw_kc=_f("QD_SW_KC", 0.20),
            lw_eps0=_f("QD_LW_EPS0", 0.70),
            lw_kc=_f("QD_LW_KC", 0.20),
            t_floor=_f("QD_T_FLOOR", 150.0),
            c_sfc=_f("QD_CS", 2.0e7),
            diag=_b("QD_ENERGY_DIAG", True),
            gh_lock=gh_lock,
            gh_factor=_f("QD_GH_FACTOR", 0.40),
            lw_v2=_b("QD_LW_V2", True),
            lw_tau0=_f("QD_LW_TAU0", 6.0),
            lw_ktau=_f("QD_LW_KTAU", 1.0),
            eps_ocean=_f("QD_EPS_OCEAN", 0.98),
            eps_land=_f("QD_EPS_LAND", 0.96),
            eps_ice=_f("QD_EPS_ICE", 0.99),
            eps_default=_f("QD_EPS_DEFAULT", 0.97),
            C_H=_f("QD_CH", 1.5e-3),
            cp_air=_f("QD_CP_A", 1004.0),
            bowen_land=_f("QD_BOWEN_LAND", 0.7),
            bowen_ocean=_f("QD_BOWEN_OCEAN", 0.3),
            autotune=(not gh_lock) and _b("QD_ENERGY_AUTOTUNE", False),
            tune_every=_i("QD_ENERGY_TUNE_EVERY", 50),
            tune_rate_eps=_f("QD_TUNE_RATE_EPS", 5e-5),
            tune_rate_kc=_f("QD_TUNE_RATE_KC", 2e-5),
            autotune_diag=_b("QD_ENERGY_AUTOTUNE_DIAG", True),
            audit=_b("QD_ENERGY_AUDIT", False),
        )


@dataclass(frozen=True)
class HumidityConfig:
    """Reference: /root/reference/pygcm/humidity.py:38-82."""
    C_E: float = 1.3e-3
    rho_a: float = 1.2
    h_mbl: float = 800.0
    L_v: float = 2.5e6
    p0: float = 1.0e5
    ocean_evap_scale: float = 1.0
    land_evap_scale: float = 0.5
    ice_evap_scale: float = 0.05
    tau_cond: float = 1800.0
    diag: bool = True
    q_init_rh: float = 0.5

    @staticmethod
    def from_env() -> "HumidityConfig":
        return HumidityConfig(
            C_E=_f("QD_CE", 1.3e-3),
            rho_a=_f("QD_RHO_A", 1.2),
            h_mbl=_f("QD_MBL_H", 800.0),
            L_v=_f("QD_LV", 2.5e6),
            p0=_f("QD_P0", 1.0e5),
            ocean_evap_scale=_f("QD_OCEAN_EVAP_SCALE", 1.0),
            land_evap_scale=_f("QD_LAND_EVAP_SCALE", 0.5),
            ice_evap_scale=_f("QD_ICE_EVAP_SCALE", 0.05),
            tau_cond=_f("QD_TAU_COND", 1800.0),
            diag=_b("QD_HUMIDITY_DIAG", True),
            q_init_rh=_f("QD_Q_INIT_RH", 0.5),
        )


@dataclass(frozen=True)
class DynamicsConfig:
    """Reference: /root/reference/pygcm/dynamics.py:260-667 env reads."""
    g: float = 9.81
    H: float = 8000.0
    tau_rad: float = 10.0 * 24 * 3600.0
    mom_scheme: str = "geos"       # "geos" | "primitive"
    max_wind: float = 200.0
    energy_w: float = 0.0          # QD_ENERGY_W blend weight
    # anti-noise filters
    diff_enable: bool = True
    filter_type: str = "combo"     # hyper4|shapiro|spectral|combo
    diff_every: int = 1
    sigma4: float = 0.02
    k4_nsub: int = 1
    k4_u: Optional[float] = None   # explicit scalar overrides (QD_K4_U etc.)
    k4_v: Optional[float] = None
    k4_h: Optional[float] = None
    k4_q: Optional[float] = None
    k4_cloud: Optional[float] = None
    diff_q: bool = False
    diff_cloud: bool = False
    shapiro_every: int = 6
    shapiro_n: int = 2
    spec_every: int = 0
    spec_cutoff: float = 0.75
    spec_damp: float = 0.5
    diff_factor: float = 0.998
    dyn_diag: bool = False         # QD_DYN_DIAG: filter variance diagnostics
    adv_alpha: float = 0.2         # Ts/q semi-Lagrangian blend
    adv_kmax: int = 4              # QD_ADV_KMAX: advection roll-window bound
    adv_polar_k2: int = 16         # QD_ADV_POLAR_K2: two-tier polar band
    #                                window bound (0 = off; ops/advect.py
    #                                AdvectPlan.k2 — rows with offset bound
    #                                in (k_lon, k2] take one wide Pallas
    #                                band pass instead of the gather)
    # cloud microstep
    cloud_couple: bool = True
    rh0: float = 0.6
    k_q: float = 0.3
    k_p: float = 0.4
    pcond_ref: Optional[float] = None
    # sea ice
    seaice_enabled: bool = True
    t_freeze: float = 271.35
    rho_ice: float = 917.0
    L_f: float = 3.34e5
    polar_freeze_fix_s: bool = True
    polar_freeze_fix_n: bool = True
    atm_h: Optional[float] = None  # QD_ATM_H, defaults to h_mbl

    @staticmethod
    def from_env() -> "DynamicsConfig":
        return DynamicsConfig(
            mom_scheme=_s("QD_MOM_SCHEME", "geos").lower(),
            energy_w=_f("QD_ENERGY_W", 0.0),
            diff_enable=_b("QD_DIFF_ENABLE", True),
            filter_type=_s("QD_FILTER_TYPE", "combo").lower(),
            diff_every=_i("QD_DIFF_EVERY", 1),
            sigma4=_f("QD_SIGMA4", 0.02),
            k4_nsub=_i("QD_K4_NSUB", 1),
            k4_u=_opt_f("QD_K4_U"),
            k4_v=_opt_f("QD_K4_V"),
            k4_h=_opt_f("QD_K4_H"),
            k4_q=_opt_f("QD_K4_Q"),
            k4_cloud=_opt_f("QD_K4_CLOUD"),
            diff_q=_b("QD_DIFF_Q", False),
            diff_cloud=_b("QD_DIFF_CLOUD", False),
            shapiro_every=_i("QD_SHAPIRO_EVERY", 6),
            shapiro_n=_i("QD_SHAPIRO_N", 2),
            spec_every=_i("QD_SPEC_EVERY", 0),
            spec_cutoff=_f("QD_SPEC_CUTOFF", 0.75),
            spec_damp=_f("QD_SPEC_DAMP", 0.5),
            diff_factor=_f("QD_DIFF_FACTOR", 0.998),
            dyn_diag=_b("QD_DYN_DIAG", False),
            adv_kmax=_i("QD_ADV_KMAX", 4),
            adv_polar_k2=_i("QD_ADV_POLAR_K2", 16),
            cloud_couple=_b("QD_CLOUD_COUPLE", True),
            rh0=_f("QD_RH0", 0.6),
            k_q=_f("QD_K_Q", 0.3),
            k_p=_f("QD_K_P", 0.4),
            pcond_ref=_opt_f("QD_PCOND_REF"),
            seaice_enabled=_b("QD_USE_SEAICE", True),
            t_freeze=_f("QD_T_FREEZE", 271.35),
            rho_ice=_f("QD_RHO_ICE", 917.0),
            L_f=_f("QD_LF", 3.34e5),
            polar_freeze_fix_s=_b("QD_POLAR_FREEZE_FIX", True),
            polar_freeze_fix_n=_b("QD_POLAR_FREEZE_FIX_N", True),
            atm_h=_opt_f("QD_ATM_H"),
        )


@dataclass(frozen=True)
class OceanConfig:
    """Reference: /root/reference/pygcm/ocean.py:44-98 env reads."""
    enabled: bool = True
    H_m: float = 50.0
    rho_w: float = 1000.0
    cp_w: float = 4200.0
    CD: float = 1.5e-3
    r_bot: float = 2.0e-5
    rho_a: float = 1.2
    vcap: float = 15.0
    tau_scale: float = 0.2
    polar_lat0: float = 70.0
    polar_gain: float = 5.0e-5
    K_h: float = 5.0e3
    sigma4: float = 0.02
    k4_nsub: int = 1
    diff_every: int = 1
    shapiro_n: int = 0
    shapiro_every: int = 8
    cfl_target: float = 0.5
    max_u_cap: float = 3.0
    outlier_method: str = "mean4"   # mean4|clamp
    adv_alpha: float = 0.7
    use_qnet: bool = True
    ice_qfac: float = 0.2
    eta_cap: float = 5.0
    ts_min: float = 150.0
    ts_max: float = 340.0
    polar_fix: bool = True
    k4_u: Optional[float] = None
    k4_v: Optional[float] = None
    k4_eta: Optional[float] = None
    energy_diag: bool = True
    diag: bool = True           # QD_OCEAN_DIAG: [OceanDiag] KE/Umax print gate
    diag_every: int = 200
    polar_lat_diag: float = 60.0
    # TPU-native: static substep count (replaces reference's dynamic CFL loop,
    # ocean.py:293-303). 0 = derive a conservative bound at model build time.
    n_substeps: int = 0

    @staticmethod
    def from_env(h_mld_default: float = 50.0) -> "OceanConfig":
        return OceanConfig(
            enabled=_b("QD_USE_OCEAN", True),
            H_m=_f("QD_OCEAN_H_M", h_mld_default),
            rho_w=_f("QD_RHO_W", 1000.0),
            cp_w=_f("QD_CP_W", 4200.0),
            CD=_f("QD_CD", 1.5e-3),
            r_bot=_f("QD_R_BOT", 2.0e-5),
            rho_a=_f("QD_RHO_A", 1.2),
            vcap=_f("QD_WIND_STRESS_VCAP", 15.0),
            tau_scale=_f("QD_TAU_SCALE", 0.2),
            polar_lat0=_f("QD_POLAR_SPONGE_LAT", 70.0),
            polar_gain=_f("QD_POLAR_SPONGE_GAIN", 5.0e-5),
            K_h=_f("QD_KH_OCEAN", 5.0e3),
            sigma4=_f("QD_SIGMA4_OCEAN", 0.02),
            k4_nsub=_i("QD_OCEAN_K4_NSUB", 1),
            diff_every=_i("QD_OCEAN_DIFF_EVERY", 1),
            shapiro_n=_i("QD_OCEAN_SHAPIRO_N", 0),
            shapiro_every=_i("QD_OCEAN_SHAPIRO_EVERY", 8),
            cfl_target=_f("QD_OCEAN_CFL", 0.5),
            max_u_cap=_f("QD_OCEAN_MAX_U", 3.0),
            outlier_method=_s("QD_OCEAN_OUTLIER", "mean4").lower(),
            adv_alpha=_f("QD_OCEAN_ADV_ALPHA", 0.7),
            use_qnet=_b("QD_OCEAN_USE_QNET", True),
            ice_qfac=_f("QD_OCEAN_ICE_QFAC", 0.2),
            eta_cap=_f("QD_ETA_CAP", 5.0),
            ts_min=_f("QD_TS_MIN", 150.0),
            ts_max=_f("QD_TS_MAX", 340.0),
            polar_fix=_b("QD_OCEAN_POLAR_FIX", True),
            k4_u=_opt_f("QD_OCEAN_K4_U"),
            k4_v=_opt_f("QD_OCEAN_K4_V"),
            k4_eta=_opt_f("QD_OCEAN_K4_ETA"),
            energy_diag=_b("QD_OCEAN_ENERGY_DIAG", True),
            diag=_b("QD_OCEAN_DIAG", True),
            diag_every=_i("QD_OCEAN_DIAG_EVERY", 200),
            polar_lat_diag=_f("QD_OCEAN_POLAR_LAT", 60.0),
            n_substeps=_i("QD_OCEAN_NSUB", 0),
        )


@dataclass(frozen=True)
class HydrologyConfig:
    """Reference: /root/reference/pygcm/hydrology.py:28-80 + P019 driver vars."""
    runoff_tau_days: float = 10.0
    wland_cap_mm: Optional[float] = None
    snow_thresh_K: float = 273.15
    snow_melt_rate_mm_day: float = 5.0
    rho_w: float = 1000.0
    snow_t_band_K: float = 1.5
    snow_melt_mode: str = "degree_day"
    snow_ddf_mm_per_k_day: float = 3.0
    snow_melt_tref_K: float = 273.15
    swe_enable: bool = True
    swe_ref_mm: float = 15.0
    swe_max_mm: Optional[float] = None
    diag: bool = True
    snow_albedo_fresh: float = 0.70
    # P019 lapse & geometry (run_simulation.py:1618-1627)
    lapse_enable: bool = True
    gamma_kpm: float = 6.5
    gamma_s_kpm: float = 6.5
    land_elev_max_m: float = 10000.0
    polar_ice_thick_max_m: float = 4500.0
    polar_lat_thresh: float = 60.0
    rho_snow: float = 300.0
    glacier_frac: float = 0.60
    glacier_swe_mm: float = 50.0
    # routing
    routing_enable: bool = True
    network_path: str = "data/hydrology.nc"
    dt_hydro_hours: float = 6.0
    treat_lake_as_water: bool = True
    alpha_lake: Optional[float] = None
    routing_diag: bool = True

    @staticmethod
    def from_env() -> "HydrologyConfig":
        gamma = _f("QD_LAPSE_K_KPM", 6.5)
        return HydrologyConfig(
            runoff_tau_days=_f("QD_RUNOFF_TAU_DAYS", 10.0),
            wland_cap_mm=_opt_f("QD_WLAND_CAP"),
            snow_thresh_K=_f("QD_SNOW_THRESH", 273.15),
            snow_melt_rate_mm_day=_f("QD_SNOW_MELT_RATE", 5.0),
            rho_w=_f("QD_RHO_W", 1000.0),
            snow_t_band_K=_f("QD_SNOW_T_BAND", 1.5),
            snow_melt_mode=_s("QD_SNOW_MELT_MODE", "degree_day").lower(),
            snow_ddf_mm_per_k_day=_f("QD_SNOW_DDF_MM_PER_K_DAY", 3.0),
            snow_melt_tref_K=_f("QD_SNOW_MELT_TREF", 273.15),
            swe_enable=_b("QD_SWE_ENABLE", True),
            swe_ref_mm=_f("QD_SWE_REF_MM", 15.0),
            swe_max_mm=_opt_f("QD_SWE_MAX_MM"),
            diag=_b("QD_WATER_DIAG", True),
            snow_albedo_fresh=_f("QD_SNOW_ALBEDO_FRESH", 0.70),
            lapse_enable=_b("QD_LAPSE_ENABLE", True),
            gamma_kpm=gamma,
            gamma_s_kpm=_f("QD_LAPSE_KS_KPM", gamma),
            land_elev_max_m=_f("QD_LAND_ELEV_MAX_M", 10000.0),
            polar_ice_thick_max_m=_f("QD_POLAR_ICE_THICK_MAX_M", 4500.0),
            polar_lat_thresh=_f("QD_POLAR_LAT_THRESH", 60.0),
            rho_snow=_f("QD_RHO_SNOW", 300.0),
            glacier_frac=_f("QD_GLACIER_FRAC", 0.60),
            glacier_swe_mm=_f("QD_GLACIER_SWE_MM", 50.0),
            routing_enable=_b("QD_HYDRO_ENABLE", True),
            network_path=_s("QD_HYDRO_NETCDF", "data/hydrology.nc"),
            dt_hydro_hours=_f("QD_HYDRO_DT_HOURS", 6.0),
            treat_lake_as_water=_b("QD_TREAT_LAKE_AS_WATER", True),
            alpha_lake=_opt_f("QD_ALPHA_LAKE"),
            routing_diag=_b("QD_HYDRO_DIAG", True),
        )


@dataclass(frozen=True)
class PhysicsConfig:
    """Cloud/precip/albedo parameters (driver run_simulation.py:1603-1627, 1866-1913)."""
    D_crit: float = -1e-7
    k_precip: float = 1e5
    alpha_water: float = 0.1
    alpha_ice: float = 0.6
    alpha_cloud: float = 0.5
    use_topo_albedo: bool = True
    orog_enable: bool = False
    k_orog: float = 7e-4
    beta_div: float = 0.4
    p_hybrid_fallback: bool = True
    pq_min: float = 1e-8
    p_blend: float = 0.6
    # cloud blending
    c_max: float = 0.95
    p_ref: Optional[float] = None   # QD_PREF; None → on-device median of positives
    w_mem: float = 0.4
    w_p: float = 0.4
    w_src: float = 0.2
    cloud_floor: float = 0.8
    cloud_advect: bool = True
    cloud_adv_alpha: float = 0.7
    cloud_smooth_sigma: float = 0.2
    h_ice_ref: float = 0.5

    @staticmethod
    def from_env() -> "PhysicsConfig":
        return PhysicsConfig(
            use_topo_albedo=_b("QD_USE_TOPO_ALBEDO", True),
            orog_enable=_b("QD_OROG", False),
            k_orog=_f("QD_OROG_K", 7e-4),
            beta_div=_f("QD_P_BETADIV", 0.4),
            p_hybrid_fallback=_b("QD_P_HYBRID_FALLBACK", True),
            pq_min=_f("QD_PQ_MIN", 1e-8),
            p_blend=_f("QD_P_BLEND", 0.6),
            c_max=_f("QD_CMAX", 0.95),
            p_ref=_opt_f("QD_PREF"),
            w_mem=_f("QD_W_MEM", 0.4),
            w_p=_f("QD_W_P", 0.4),
            w_src=_f("QD_W_SRC", 0.2),
            cloud_floor=_f("QD_CLOUD_FROM_P_FLOOR", 0.8),
            cloud_advect=_b("QD_CLOUD_ADVECT", True),
            cloud_adv_alpha=_f("QD_CLOUD_ADV_ALPHA", 0.7),
            cloud_smooth_sigma=_f("QD_CLOUD_SMOOTH_SIGMA", 0.2),
            h_ice_ref=_f("QD_HICE_REF", 0.5),
        )


@dataclass(frozen=True)
class EcologyConfig:
    """Reference: pygcm/ecology/{adapter,population,spectral}.py env surface.

    On TPU the species axis must be static: the reference grows
    ``LAI_layers_SK`` dynamically on mutation (adapter.py:438-466); here the
    array is allocated at ``species_max`` and species are switched on via an
    active mask.
    """
    enabled: bool = True
    subdaily_enable: bool = True
    albedo_couple: bool = True
    # parsed for QD_* surface parity but inert, exactly like the reference:
    # adapter.py:20,39 parse couple_freq and only ever echo it at :75
    albedo_couple_freq: str = "subdaily"
    bands_couple: bool = False
    use_lai: bool = True
    nbands: int = 16
    lam0_nm: float = 380.0
    lam1_nm: float = 780.0
    toa_mode: str = "simple"      # simple|rayleigh
    rayleigh_t0: float = 0.9
    rayleigh_lref_nm: float = 550.0
    rayleigh_eta: float = 4.0
    substep_every_nphys: int = 1
    lai_albedo_weight: float = 1.0
    feedback_mode: str = "instant"
    soil_reflect: float = 0.20
    soil_water_cap: float = 50.0
    # LAI params (population.py:10-33)
    lai_max: float = 5.0
    k_canopy: float = 0.5
    growth_per_j: float = 2.0e-5
    senesce_per_day: float = 0.01
    stress_thresh: float = 0.3
    stress_strength: float = 1.0
    lai_init: float = 0.2
    light_update_every_hours: float = 6.0
    lai_recompute_delta: float = 0.05
    cohort_K: int = 1
    ns: int = 20                    # default species count (QD_ECO_NS)
    species_weights: Optional[Tuple[float, ...]] = None
    species_max: int = 8            # mutation cap (adapter.py:51)
    layer_upfrac: float = 0.1
    height_scale_m: float = 10.0
    # spread
    spread_enable: bool = False
    spread_rate: float = 0.0
    spread_neighbors: str = "vonneumann"
    spread_mode: str = "diffusion"
    repro_fraction: float = 0.2
    seed_energy: float = 1.0
    seed_scale: float = 1.0
    seedling_lai: float = 0.02
    spread_dlai_max: float = 0.02
    seed_dlai_max: float = 0.01
    seed_germinate_frac: float = 0.10
    seed_bank_decay: float = 0.02
    seed_bank_retain: float = 0.2
    seed_bank_max: float = 1000.0
    spread_gate_soil: bool = True
    spread_soil_exp: float = 1.0
    rand_seed: Optional[int] = None
    # mutation
    mut_rate: float = 0.0
    mut_eps: float = 0.02
    mut_lambda_drift: float = 0.1
    # individuals pool
    indiv_enable: bool = True
    indiv_sample_frac: float = 0.02
    indiv_per_cell: int = 150
    indiv_substeps_per_day: int = 10
    indiv_stress_penalty: float = 0.2
    indiv_stress_decay: float = 0.5
    indiv_seed_couple: bool = True
    # the reference's soil gate on seed coupling is dead code (individuals.py
    # :322 checks locals() before soil_idx is bound at :344); default matches
    # the as-run behavior (ungated), the knob opts into the intended gate
    indiv_seed_soil_gate: bool = False
    lai_growth_rate: float = 0.002
    lai_decay_rate: float = 0.001
    lai_recruit_frac: float = 0.2
    # star spectra
    star_a_j: float = 0.8
    star_b_j: float = 0.8
    star_a_teff: Optional[float] = None
    star_b_teff: Optional[float] = None
    # diversity diagnostics
    diversity_enable: bool = False
    diversity_every_days: float = 10.0
    diag: bool = True

    @staticmethod
    def from_env() -> "EcologyConfig":
        rng = _s("QD_ECO_SPECTRAL_RANGE_NM", "380,780")
        try:
            lam0, lam1 = (float(x.strip()) for x in rng.split(","))
        except ValueError:
            lam0, lam1 = 380.0, 780.0
        if lam1 <= lam0:
            lam0, lam1 = 380.0, 780.0
        seed_env = os.getenv("QD_ECO_RAND_SEED")
        return EcologyConfig(
            enabled=_b("QD_ECO_ENABLE", True),
            subdaily_enable=_b("QD_ECO_SUBDAILY_ENABLE", True),
            albedo_couple=_b("QD_ECO_ALBEDO_COUPLE", True),
            albedo_couple_freq=_s("QD_ECO_ALBEDO_COUPLE_FREQ", "subdaily").lower(),
            bands_couple=_b("QD_ECO_BANDS_COUPLE", False),
            use_lai=_b("QD_ECO_USE_LAI", True),
            nbands=max(1, _i("QD_ECO_SPECTRAL_BANDS", 16)),
            lam0_nm=lam0, lam1_nm=lam1,
            toa_mode=_s("QD_ECO_TOA_TO_SURF_MODE", "simple").lower(),
            rayleigh_t0=_f("QD_ECO_RAYLEIGH_T0", 0.9),
            rayleigh_lref_nm=_f("QD_ECO_RAYLEIGH_LREF_NM", 550.0),
            rayleigh_eta=_f("QD_ECO_RAYLEIGH_ETA", 4.0),
            substep_every_nphys=_i("QD_ECO_SUBSTEP_EVERY_NPHYS", 1),
            lai_albedo_weight=_f("QD_ECO_LAI_ALBEDO_WEIGHT", 1.0),
            feedback_mode=_s("QD_ECO_FEEDBACK_MODE", "instant").lower(),
            soil_reflect=_f("QD_ECO_SOIL_REFLECT", 0.20),
            soil_water_cap=_f("QD_ECO_SOIL_WATER_CAP", 50.0),
            lai_max=_f("QD_ECO_LAI_MAX", 5.0),
            k_canopy=_f("QD_ECO_LAI_K", 0.5),
            growth_per_j=_f("QD_ECO_LAI_GROWTH", 2.0e-5),
            senesce_per_day=_f("QD_ECO_LAI_SENESCENCE", 0.01),
            stress_thresh=_f("QD_ECO_SOIL_STRESS_THRESH", 0.3),
            stress_strength=_f("QD_ECO_SOIL_STRESS_GAIN", 1.0),
            lai_init=_f("QD_ECO_LAI_INIT", 0.2),
            light_update_every_hours=_f("QD_ECO_LIGHT_UPDATE_EVERY_HOURS", 6.0),
            lai_recompute_delta=_f("QD_ECO_LIGHT_RECOMPUTE_LAI_DELTA", 0.05),
            cohort_K=max(1, _i("QD_ECO_COHORT_K", 1)),
            ns=max(1, _i("QD_ECO_NS", 20)),
            species_weights=_flist("QD_ECO_SPECIES_WEIGHTS"),
            species_max=_i("QD_ECO_SPECIES_MAX", 8),
            layer_upfrac=_f("QD_ECO_LAYER_UPFRAC", 0.1),
            height_scale_m=_f("QD_ECO_HEIGHT_SCALE_M", 10.0),
            spread_enable=_b("QD_ECO_SPREAD_ENABLE", False),
            spread_rate=_f("QD_ECO_SPREAD_RATE", 0.0),
            spread_neighbors=_s("QD_ECO_SPREAD_NEIGHBORS", "vonNeumann").lower(),
            spread_mode=_s("QD_ECO_SPREAD_MODE", "diffusion").lower(),
            repro_fraction=_f("QD_ECO_REPRO_FRACTION", 0.2),
            seed_energy=_f("QD_ECO_SEED_ENERGY", 1.0),
            seed_scale=_f("QD_ECO_SEED_SCALE", 1.0),
            seedling_lai=_f("QD_ECO_SEEDLING_LAI", 0.02),
            spread_dlai_max=_f("QD_ECO_SPREAD_DLAI_MAX", 0.02),
            seed_dlai_max=_f("QD_ECO_SEED_DLAI_MAX", 0.01),
            seed_germinate_frac=_f("QD_ECO_SEED_GERMINATE_FRAC", 0.10),
            seed_bank_decay=_f("QD_ECO_SEED_BANK_DECAY", 0.02),
            seed_bank_retain=_f("QD_ECO_SEED_BANK_RETAIN", 0.2),
            seed_bank_max=_f("QD_ECO_SEED_BANK_MAX", 1000.0),
            spread_gate_soil=_b("QD_ECO_SPREAD_GATE_SOIL", True),
            spread_soil_exp=_f("QD_ECO_SPREAD_SOIL_EXP", 1.0),
            rand_seed=(int(seed_env) if seed_env not in (None, "") else None),
            mut_rate=_f("QD_ECO_MUT_RATE", 0.0),
            mut_eps=_f("QD_ECO_MUT_EPS", 0.02),
            mut_lambda_drift=_f("QD_ECO_MUT_LAMBDA_DRIFT", 0.1),
            indiv_enable=_b("QD_ECO_INDIV_ENABLE", True),
            indiv_sample_frac=_f("QD_ECO_INDIV_SAMPLE_FRAC", 0.02),
            indiv_per_cell=_i("QD_ECO_INDIV_PER_CELL", 150),
            indiv_substeps_per_day=max(1, _i("QD_ECO_INDIV_SUBSTEPS_PER_DAY", 10)),
            indiv_stress_penalty=_f("QD_ECO_INDIV_STRESS_PENALTY", 0.2),
            indiv_stress_decay=_f("QD_ECO_INDIV_STRESS_DECAY", 0.5),
            indiv_seed_couple=_b("QD_ECO_INDIV_SEED_COUPLE", True),
            indiv_seed_soil_gate=_b("QD_ECO_INDIV_SEED_SOIL_GATE", False),
            lai_growth_rate=_f("QD_ECO_LAI_GROWTH_RATE", 0.002),
            lai_decay_rate=_f("QD_ECO_LAI_DECAY_RATE", 0.001),
            lai_recruit_frac=_f("QD_ECO_LAI_RECRUIT_FRAC", 0.2),
            star_a_j=_f("QD_STAR_A_J", 0.8),
            star_b_j=_f("QD_STAR_B_J", 0.8),
            star_a_teff=_opt_f("QD_STAR_A_TEFF_K"),
            star_b_teff=_opt_f("QD_STAR_B_TEFF_K"),
            diversity_enable=_b("QD_ECO_DIVERSITY_ENABLE", False),
            diversity_every_days=_f("QD_ECO_DIVERSITY_EVERY_DAYS", 10.0),
            diag=_b("QD_ECO_DIAG", True),
        )


@dataclass(frozen=True)
class PhytoConfig:
    """Reference: pygcm/ecology/phyto.py:21-280 env surface."""
    enabled: bool = True
    albedo_couple: bool = True
    feedback_mode: str = "daily"
    advection: bool = True
    n_species: int = 10
    mu_max: float = 1.5
    alpha_P: float = 0.04
    Q10: float = 2.0
    T_ref: float = 293.15
    m0: float = 0.05
    lambda_sink: float = 0.0
    kd_exp_m: float = 0.5
    chl0: float = 0.05
    kd0_default: float = 0.04
    kd_chl_default: float = 0.02
    apure_default: float = 0.06
    kd0: Optional[Tuple[float, ...]] = None
    kd_chl: Optional[Tuple[float, ...]] = None
    apure: Optional[Tuple[float, ...]] = None
    spec_mu_nm: Optional[Tuple[float, ...]] = None
    spec_sigma_nm: Optional[Tuple[float, ...]] = None
    spec_c_reflect: Optional[Tuple[float, ...]] = None
    spec_p_reflect: Optional[Tuple[float, ...]] = None
    spec_mu_max: Optional[Tuple[float, ...]] = None
    spec_m0: Optional[Tuple[float, ...]] = None
    shape_mu_nm: float = 550.0
    shape_sigma_nm: float = 70.0
    reflect_c: float = 0.02
    reflect_p: float = 0.5
    alpha_min: float = 0.0
    alpha_max: float = 1.0
    enable_N: bool = True
    KN: Optional[Tuple[float, ...]] = None
    yield_s: Optional[Tuple[float, ...]] = None
    remin: float = 0.01
    N_init: float = 1.0
    init_frac: Optional[Tuple[float, ...]] = None
    init_random: bool = False      # QD_PHYTO_INIT_RANDOM (phyto.py:654-670)
    dist_on_mismatch: str = "keep"  # QD_PLANKTON_DIST_ON_MISMATCH: keep|reset|random ('default'→reset)
    K_h: float = 5.0e3
    adv_alpha: float = 0.7
    diag: bool = True

    @staticmethod
    def from_env() -> "PhytoConfig":
        return PhytoConfig(
            enabled=_b("QD_PHYTO_ENABLE", True),
            albedo_couple=_b("QD_PHYTO_ALBEDO_COUPLE", True),
            feedback_mode=_s("QD_PHYTO_FEEDBACK_MODE", "daily").lower(),
            advection=_b("QD_PHYTO_ADVECTION", True),
            n_species=max(1, _i("QD_PHYTO_NSPECIES", 10)),
            mu_max=_f("QD_PHYTO_MU_MAX", 1.5),
            alpha_P=_f("QD_PHYTO_ALPHA_P", 0.04),
            Q10=_f("QD_PHYTO_Q10", 2.0),
            T_ref=_f("QD_PHYTO_T_REF", 293.15),
            m0=_f("QD_PHYTO_M_LOSS", 0.05),
            lambda_sink=_f("QD_PHYTO_LAMBDA_SINK", 0.0),
            kd_exp_m=_f("QD_PHYTO_KD_EXP_M", 0.5),
            chl0=_f("QD_PHYTO_CHL0", 0.05),
            kd0_default=_f("QD_PHYTO_KD0_DEFAULT", 0.04),
            kd_chl_default=_f("QD_PHYTO_KD_CHL_DEFAULT", 0.02),
            apure_default=_f("QD_PHYTO_APURE_DEFAULT", 0.06),
            kd0=_flist("QD_PHYTO_KD0"),
            kd_chl=_flist("QD_PHYTO_KD_CHL"),
            apure=_flist("QD_PHYTO_APURE"),
            spec_mu_nm=_flist("QD_PHYTO_SPEC_MU_NM"),
            spec_sigma_nm=_flist("QD_PHYTO_SPEC_SIGMA_NM"),
            spec_c_reflect=_flist("QD_PHYTO_SPEC_C_REFLECT"),
            spec_p_reflect=_flist("QD_PHYTO_SPEC_P_REFLECT"),
            spec_mu_max=_flist("QD_PHYTO_SPEC_MU_MAX"),
            spec_m0=_flist("QD_PHYTO_SPEC_M0"),
            shape_mu_nm=_f("QD_PHYTO_SHAPE_MU_NM", 550.0),
            shape_sigma_nm=_f("QD_PHYTO_SHAPE_SIGMA_NM", 70.0),
            reflect_c=_f("QD_PHYTO_REFLECT_C", 0.02),
            reflect_p=_f("QD_PHYTO_REFLECT_P", 0.5),
            alpha_min=_f("QD_PHYTO_ALPHA_MIN", 0.0),
            alpha_max=_f("QD_PHYTO_ALPHA_MAX", 1.0),
            enable_N=_b("QD_PHYTO_ENABLE_N", True),
            KN=_flist("QD_PHYTO_KN"),
            yield_s=_flist("QD_PHYTO_YIELD"),
            remin=_f("QD_PHYTO_REMIN", 0.01),
            N_init=_f("QD_PHYTO_N_INIT", 1.0),
            init_frac=_flist("QD_PHYTO_INIT_FRAC"),
            init_random=_b("QD_PHYTO_INIT_RANDOM", False),
            # reference load_distribution_nc accepts keep|reset
            # (phyto.py:672-681); 'default' is tolerated as an alias for
            # reset (the vocabulary of the reference's NPZ-autosave path,
            # phyto.py:589-649, which users may reach for)
            dist_on_mismatch={"default": "reset"}.get(
                _s("QD_PLANKTON_DIST_ON_MISMATCH", "keep").lower(),
                _s("QD_PLANKTON_DIST_ON_MISMATCH", "keep").lower()),
            K_h=_f("QD_PHYTO_KH", _f("QD_KH_OCEAN", 5.0e3)),
            adv_alpha=_f("QD_PHYTO_ADV_ALPHA", 0.7),
            diag=_b("QD_PHYTO_DIAG", True),
        )


@dataclass(frozen=True)
class VizConfig:
    """Host-side rendering knobs (run_simulation.py:330-1061, ploter.py).

    These only affect imagery; none are traced. Names and defaults follow the
    reference driver's plotting blocks exactly."""
    # TrueColor (run_simulation.py:539-778)
    truecolor_ice_frac: float = 0.15       # QD_TRUECOLOR_ICE_FRAC (:562)
    truecolor_snow_by_swe: bool = True     # QD_TRUECOLOR_SNOW_BY_SWE (:568)
    truecolor_snow_by_ts: bool = False     # QD_TRUECOLOR_SNOW_BY_TS (:723)
    snow_cover_frac: float = 0.20          # QD_SNOW_COVER_FRAC (:570)
    snow_vis_alpha: float = 0.60           # QD_SNOW_VIS_ALPHA (:571)
    truecolor_cloud_alpha: float = 0.60    # QD_TRUECOLOR_CLOUD_ALPHA (:730)
    truecolor_cloud_white: float = 0.95    # QD_TRUECOLOR_CLOUD_WHITE (:731)
    eco_truecolor_veg: bool = True         # QD_ECO_TRUECOLOR_VEG (:583)
    eco_truecolor_gamma: float = 1.8       # QD_ECO_TRUECOLOR_GAMMA (:634)
    eco_truecolor_sat: float = 1.35        # QD_ECO_TRUECOLOR_SAT (:641)
    plot_oceancolor: bool = True           # QD_PLOT_OCEANCOLOR (:657)
    oc_gamma: float = 2.2                  # QD_OC_GAMMA (:703)
    oc_blend: float = 0.85                 # QD_OC_BLEND (:711)
    plot_rivers: bool = True               # QD_PLOT_RIVERS (:737)
    river_min_kgps: float = 1e6            # QD_RIVER_MIN_KGPS (:741)
    river_alpha: float = 0.45              # QD_RIVER_ALPHA (:743)
    lake_alpha: float = 0.40               # QD_LAKE_ALPHA (:750)
    # state panel (run_simulation.py:369-380)
    ps_mode: str = "anom"                  # QD_PLOT_PS_MODE: "anom" | "abs"
    # ocean panel (run_simulation.py:780-826; never dispatched by the
    # reference driver — here gated by QD_PLOT_OCEAN, default on)
    plot_ocean: bool = True
    # plankton species maps (run_simulation.py:828-906)
    phyto_vmax: Optional[float] = None     # QD_PHYTO_VMAX (:858)
    # point-ecology panels (ploter.py:201)
    eco_height_scale_m: float = 10.0       # QD_ECO_HEIGHT_SCALE_M
    # macOS auto-open of the first ecology panel (run_simulation.py:2480)
    eco_open: bool = False                 # QD_ECO_OPEN

    @staticmethod
    def from_env() -> "VizConfig":
        return VizConfig(
            truecolor_ice_frac=_f("QD_TRUECOLOR_ICE_FRAC", 0.15),
            truecolor_snow_by_swe=_b("QD_TRUECOLOR_SNOW_BY_SWE", True),
            truecolor_snow_by_ts=_b("QD_TRUECOLOR_SNOW_BY_TS", False),
            snow_cover_frac=_f("QD_SNOW_COVER_FRAC", 0.20),
            snow_vis_alpha=_f("QD_SNOW_VIS_ALPHA", 0.60),
            truecolor_cloud_alpha=_f("QD_TRUECOLOR_CLOUD_ALPHA", 0.60),
            truecolor_cloud_white=_f("QD_TRUECOLOR_CLOUD_WHITE", 0.95),
            eco_truecolor_veg=_b("QD_ECO_TRUECOLOR_VEG", True),
            eco_truecolor_gamma=_f("QD_ECO_TRUECOLOR_GAMMA", 1.8),
            eco_truecolor_sat=_f("QD_ECO_TRUECOLOR_SAT", 1.35),
            plot_oceancolor=_b("QD_PLOT_OCEANCOLOR", True),
            oc_gamma=_f("QD_OC_GAMMA", _f("QD_ECO_TRUECOLOR_GAMMA", 2.2)),
            oc_blend=_f("QD_OC_BLEND", 0.85),
            plot_rivers=_b("QD_PLOT_RIVERS", True),
            river_min_kgps=_f("QD_RIVER_MIN_KGPS", 1e6),
            river_alpha=_f("QD_RIVER_ALPHA", 0.45),
            lake_alpha=_f("QD_LAKE_ALPHA", 0.40),
            ps_mode=_s("QD_PLOT_PS_MODE", "anom").lower(),
            plot_ocean=_b("QD_PLOT_OCEAN", True),
            phyto_vmax=_opt_f("QD_PHYTO_VMAX"),
            eco_height_scale_m=_f("QD_ECO_HEIGHT_SCALE_M", 10.0),
            eco_open=_b("QD_ECO_OPEN", False),
        )


@dataclass(frozen=True)
class RunConfig:
    """Driver-level settings (run_simulation.py:1193-1658)."""
    n_lat: int = 181
    n_lon: int = 360
    dt_seconds: float = 300.0
    total_years: Optional[float] = None
    sim_days: Optional[float] = None
    mld_m: float = 50.0
    cs_land: float = 3.0e6
    cs_ice: float = 5.0e6
    topo_nc: Optional[str] = None
    init_banded: bool = False
    init_t_eq: float = 295.0
    init_t_pole: float = 265.0
    orbit_epoch_seconds: Optional[float] = None
    orbit_epoch_days: Optional[float] = None
    restart_in: Optional[str] = None
    restart_out: Optional[str] = None
    autosave_enable: bool = True
    autosave_load: bool = True
    # QD_RESTART_WARM_CACHES: on a NetCDF-only restore (no full-pytree
    # sidecar), bootstrap the humidity caches (E_flux/P_cond) from the
    # restored fields. The reference's restart leaves P_cond_flux_last = 0
    # (run_simulation.py getattr default; not in the restart schema), so its
    # first post-restart step blends the legacy convergence-precip fallback
    # at cold-start violence (one-step deluge, ~1e4 kg/m2 of SWE on peaks).
    # Default on — set 0 to emulate the reference's restart deluge exactly.
    restart_warm_caches: bool = True
    nancheck: bool = False          # QD_DEBUG_NANCHECK: per-chunk finite check
    autosave_every_hours: float = 6.0
    load_ocean: bool = True
    load_plankton: bool = True
    plot_every_days: float = 10.0
    plot_isr: bool = False
    plot_phyto: bool = True
    eco_plot: bool = True
    seed: int = 42
    target_land_frac: float = 0.29
    dtype: str = "float32"
    # scan chunking: host sync cadence (steps per jitted scan call)
    chunk_steps: int = 240
    # diag-fetch batching: tunnel device_get costs ~0.4 s per CALL regardless
    # of size, so diag stacks are fetched once per this many steps
    diag_fetch_steps: int = 2400
    # minimum wall seconds between periodic autosaves (the reference's
    # 6-sim-hour cadence recurs every ~0.4 wall s at TPU speed)
    autosave_min_wall_s: float = 30.0
    # lax.scan unroll of the inner step loop: >1 lets XLA fuse across steps
    # (the step is op-overhead-bound, ~600 small fusions) at the cost of
    # proportionally longer compiles
    scan_unroll: int = 1
    pack_diags: bool = False    # QD_PACK_DIAGS: stack diag scalars into one
                                # [D] vector per step (measured slower; A/B)
    # QD_DIAG_EVERY: emit the per-step diag scalars every Nth step of the
    # scan; steps in between skip the ~20 diag-only reductions AND the
    # per-leaf dynamic-update-slice stacking (both measured hot at 361×720,
    # perf-notes roofline — VERDICT r4 item 2). N=1 (default) is the full
    # per-step surface; the reference itself only computes diagnostics at
    # print time (run_simulation.py main loop), so N>1 is still a superset.
    # Spin-up acceptance and the energy audit require N=1 (per-step
    # attribution integrals); scripts/spinup.py forces it.
    diag_every: int = 1

    @staticmethod
    def from_env() -> "RunConfig":
        return RunConfig(
            n_lat=_i("QD_N_LAT", 181),
            n_lon=_i("QD_N_LON", 360),
            dt_seconds=_f("QD_DT_SECONDS", 300.0),
            total_years=_opt_f("QD_TOTAL_YEARS"),
            sim_days=_opt_f("QD_SIM_DAYS"),
            mld_m=_f("QD_MLD_M", 50.0),
            cs_land=_f("QD_CS_LAND", 3.0e6),
            cs_ice=_f("QD_CS_ICE", 5.0e6),
            topo_nc=os.getenv("QD_TOPO_NC") or None,
            init_banded=_b("QD_INIT_BANDED", False),
            init_t_eq=_f("QD_INIT_T_EQ", 295.0),
            init_t_pole=_f("QD_INIT_T_POLE", 265.0),
            orbit_epoch_seconds=_opt_f("QD_ORBIT_EPOCH_SECONDS"),
            orbit_epoch_days=_opt_f("QD_ORBIT_EPOCH_DAYS"),
            restart_in=os.getenv("QD_RESTART_IN") or None,
            restart_out=os.getenv("QD_RESTART_OUT") or None,
            autosave_enable=_b("QD_AUTOSAVE_ENABLE", True),
            autosave_load=_b("QD_AUTOSAVE_LOAD", True),
            restart_warm_caches=_b("QD_RESTART_WARM_CACHES", True),
            nancheck=_b("QD_DEBUG_NANCHECK", False),
            autosave_every_hours=_f("QD_ECO_AUTOSAVE_EVERY_HOURS", 6.0),
            load_ocean=_b("QD_LOAD_OCEAN", True),
            load_plankton=_b("QD_LOAD_PLANKTON", True),
            plot_every_days=_f("QD_PLOT_EVERY_DAYS", 10.0),
            plot_isr=_b("QD_PLOT_ISR", False),
            plot_phyto=_b("QD_PLOT_PHYTO", True),
            eco_plot=_b("QD_ECO_PLOT", True),
            seed=_i("QD_SEED", 42),
            target_land_frac=_f("QD_TARGET_LAND_FRAC", 0.29),
            dtype=_s("QD_DTYPE", "float32"),
            chunk_steps=_i("QD_CHUNK_STEPS", 240),
            diag_fetch_steps=_i("QD_DIAG_FETCH_STEPS", 2400),
            autosave_min_wall_s=_f("QD_AUTOSAVE_MIN_WALL_S", 30.0),
            scan_unroll=_i("QD_SCAN_UNROLL", 1),
            pack_diags=_b("QD_PACK_DIAGS", False),
            diag_every=max(1, _i("QD_DIAG_EVERY", 1)),
        )


@dataclass(frozen=True)
class SimConfig:
    """Top-level immutable configuration pytree (static under jit)."""
    run: RunConfig = field(default_factory=RunConfig)
    energy: EnergyConfig = field(default_factory=EnergyConfig)
    humidity: HumidityConfig = field(default_factory=HumidityConfig)
    dynamics: DynamicsConfig = field(default_factory=DynamicsConfig)
    ocean: OceanConfig = field(default_factory=OceanConfig)
    hydrology: HydrologyConfig = field(default_factory=HydrologyConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)
    ecology: EcologyConfig = field(default_factory=EcologyConfig)
    phyto: PhytoConfig = field(default_factory=PhytoConfig)
    viz: VizConfig = field(default_factory=VizConfig)

    @staticmethod
    def from_env() -> "SimConfig":
        # refreeze the trace-time feature gates (QD_PALLAS_*, QD_SPMD_HALO,
        # QD_FF_SUMS, ...) so they capture the env as it stands NOW — jit
        # tracing happens after set-and-restore harnesses restore the env
        from . import flags
        flags.refresh()
        run = RunConfig.from_env()
        energy = EnergyConfig.from_env()
        if energy.audit and run.diag_every != 1:
            # the audit's attribution closure integrates per-step terms
            # against per-step reservoir deltas — sampled terms would break
            # the |TOA − Σterms| identity, so the audit forces diag_every=1
            import dataclasses as _dc
            run = _dc.replace(run, diag_every=1)
        return SimConfig(
            run=run,
            energy=energy,
            humidity=HumidityConfig.from_env(),
            dynamics=DynamicsConfig.from_env(),
            ocean=OceanConfig.from_env(h_mld_default=run.mld_m),
            hydrology=HydrologyConfig.from_env(),
            physics=PhysicsConfig.from_env(),
            ecology=EcologyConfig.from_env(),
            phyto=PhytoConfig.from_env(),
            viz=VizConfig.from_env(),
        )
