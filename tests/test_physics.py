"""Physics-formula parity: energy partition, humidity, hydrology, clouds vs
independent NumPy oracles of the reference's documented formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from qingdai_tpu import constants as const
from qingdai_tpu.config import (EnergyConfig, HumidityConfig, HydrologyConfig,
                                PhysicsConfig)
from qingdai_tpu.physics import energy as en
from qingdai_tpu.physics import humidity as hum
from qingdai_tpu.physics import hydrology as hyd
from qingdai_tpu.physics import clouds as cl
from qingdai_tpu.grid import make_grid

SIGMA = const.SIGMA


@pytest.fixture
def fields(rng):
    Ts = 288.0 + 20 * rng.standard_normal((10, 20))
    Ta = 285.0 + 15 * rng.standard_normal((10, 20))
    cloud = rng.uniform(0, 1, (10, 20))
    I = np.maximum(0, 1000 * rng.uniform(0, 1, (10, 20)))
    return Ts, Ta, cloud, I


def test_shortwave_partition(fields):
    Ts, Ta, cloud, I = fields
    cfg = EnergyConfig()
    SW_atm, SW_sfc, R = en.shortwave_radiation(jnp.asarray(I), 0.3,
                                               jnp.asarray(cloud), cfg)
    # conservation: R + SW_atm + SW_sfc == I where SW_sfc not clipped
    total = np.asarray(R) + np.asarray(SW_atm) + np.asarray(SW_sfc)
    np.testing.assert_allclose(total, I, rtol=1e-6)
    # partition formulas
    np.testing.assert_allclose(np.asarray(R), I * 0.3, rtol=1e-6)
    A_sw = np.clip(0.06 + 0.20 * np.clip(cloud, 0, 1), 0, 0.95)
    np.testing.assert_allclose(np.asarray(SW_atm), I * A_sw, rtol=1e-6)


def test_longwave_gh_lock(fields):
    Ts, Ta, cloud, _ = fields
    cfg = EnergyConfig(gh_lock=True, gh_factor=0.40)
    LW_atm, LW_sfc, OLR, DLR, eps = en.longwave_radiation(
        jnp.asarray(Ts), jnp.asarray(Ta), jnp.asarray(cloud), cfg)
    Ts4 = np.maximum(Ts, 0) ** 4
    np.testing.assert_allclose(np.asarray(OLR), 0.6 * SIGMA * Ts4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(DLR), 0.4 * SIGMA * Ts4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(LW_sfc), (0.4 - 1.0) * SIGMA * Ts4,
                               rtol=1e-5)


def test_longwave_unlocked(fields):
    Ts, Ta, cloud, _ = fields
    cfg = EnergyConfig(gh_lock=False)
    LW_atm, LW_sfc, OLR, DLR, eps = en.longwave_radiation(
        jnp.asarray(Ts), jnp.asarray(Ta), jnp.asarray(cloud), cfg)
    eps_ref = np.clip(0.70 + 0.20 * np.clip(cloud, 0, 1), 0, 1)
    Ts4, Ta4 = np.maximum(Ts, 0) ** 4, np.maximum(Ta, 0) ** 4
    np.testing.assert_allclose(np.asarray(OLR),
                               eps_ref * SIGMA * Ta4 + (1 - eps_ref) * SIGMA * Ts4,
                               rtol=1e-5)


def test_seaice_melt_freeze():
    cfg = EnergyConfig()
    shape = (4, 6)
    Ts = np.full(shape, 270.0)
    land = np.zeros(shape, int)
    h_ice = np.full(shape, 1.0)
    # strong heating melts ice
    Ts2, h2 = en.integrate_surface_energy_with_seaice(
        jnp.asarray(Ts), jnp.full(shape, 500.0), jnp.zeros(shape),
        jnp.zeros(shape), jnp.zeros(shape), 3600.0, jnp.asarray(land),
        jnp.asarray(h_ice), 4.2e8, 3e6, 5e6)
    dh_expect = 500.0 * 3600.0 / (917.0 * 3.34e5)
    np.testing.assert_allclose(np.asarray(h2), 1.0 - dh_expect, rtol=1e-4)
    # strong cooling at freezing grows ice, Ts pinned <= t_freeze
    Ts3, h3 = en.integrate_surface_energy_with_seaice(
        jnp.asarray(Ts), jnp.zeros(shape), jnp.full(shape, 400.0),
        jnp.zeros(shape), jnp.zeros(shape), 3600.0, jnp.asarray(land),
        jnp.zeros(shape), 4.2e8, 3e6, 5e6)
    assert np.all(np.asarray(h3) > 0)
    assert np.all(np.asarray(Ts3) <= 271.35 + 1e-3)


def test_qsat_tetens():
    T = np.array([250.0, 273.15, 300.0, 320.0])
    got = np.asarray(hum.q_sat(jnp.asarray(T), p=1e5))
    T_c = np.clip(T - 273.15, -80, 60)
    e_s = 610.94 * np.exp(17.625 * T_c / (T_c + 243.04))
    ref = np.clip(0.622 * e_s / np.maximum(1e5 - (1 - 0.622) * e_s, 1.0), 0, 0.5)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_evaporation_condensation(rng):
    cfg = HumidityConfig()
    shape = (8, 12)
    Ts = 290 + 5 * rng.standard_normal(shape)
    q = np.full(shape, 0.005)
    u = 5 * rng.standard_normal(shape)
    v = 5 * rng.standard_normal(shape)
    E = np.asarray(hum.evaporation_flux(jnp.asarray(Ts), jnp.asarray(q),
                                        jnp.asarray(u), jnp.asarray(v),
                                        1.0, cfg))
    V = np.hypot(u, v)
    qs = np.asarray(hum.q_sat(jnp.asarray(Ts)))
    ref = 1.2 * 1.3e-3 * V * np.maximum(0, qs - q)
    np.testing.assert_allclose(E, ref, rtol=1e-5)

    # condensation removes supersaturation over tau
    T_a = np.full(shape, 280.0)
    q_super = np.asarray(hum.q_sat(jnp.asarray(T_a))) * 1.5
    P, q_next = hum.condensation(jnp.asarray(q_super), jnp.asarray(T_a), 300.0, cfg)
    assert np.all(np.asarray(P) > 0)
    assert np.all(np.asarray(q_next) < q_super)


def test_snowpack_degree_day():
    cfg = HydrologyConfig()
    shape = (4, 6)
    S = np.full(shape, 10.0)
    T_hat = np.full(shape, 275.15)  # 2 K above melt ref
    S2, melt, C_snow, alpha = hyd.snowpack_step(
        jnp.asarray(S), jnp.zeros(shape), jnp.asarray(T_hat), cfg, 86400.0)
    # DDF 3 mm/K/day × 2 K × 1 day = 6 mm melted
    np.testing.assert_allclose(np.asarray(melt) * 86400.0, 6.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(S2), 4.0, rtol=1e-4)
    ref_c = 1 - np.exp(-4.0 / 15.0)
    np.testing.assert_allclose(np.asarray(C_snow), ref_c, rtol=1e-4)


def test_land_bucket_linear_runoff():
    cfg = HydrologyConfig(runoff_tau_days=10.0)
    shape = (4, 6)
    W = np.full(shape, 100.0)
    W2, R = hyd.update_land_bucket(jnp.asarray(W), jnp.zeros(shape),
                                   jnp.zeros(shape), cfg, 86400.0)
    np.testing.assert_allclose(np.asarray(R), 100.0 / (10 * 86400), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(W2), 100.0 * (1 - 0.1), rtol=1e-5)


def test_phase_partition_smooth():
    P = np.full((4, 6), 1e-5)
    T = np.linspace(263, 283, 24).reshape(4, 6)
    rain, snow, f = hyd.partition_precip_phase_smooth(jnp.asarray(P), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(rain) + np.asarray(snow), P, rtol=1e-6)
    # cold end mostly snow, warm end mostly rain
    assert float(np.asarray(f)[0, 0]) > 0.95
    assert float(np.asarray(f)[-1, -1]) < 0.05


def test_dynamic_albedo():
    g = make_grid(10, 20)
    cloud = jnp.full(g.shape, 0.5)
    albedo = cl.calculate_dynamic_albedo(cloud, 288.0, 0.1, 0.6, 0.5,
                                         ice_frac=jnp.zeros(g.shape))
    # no ice: α = 0.1·0.5 + 0.5·0.5 = 0.30
    np.testing.assert_allclose(np.asarray(albedo), 0.30, rtol=1e-5)
    albedo_ice = cl.calculate_dynamic_albedo(cloud, 288.0, 0.1, 0.6, 0.5,
                                             ice_frac=jnp.ones(g.shape))
    np.testing.assert_allclose(np.asarray(albedo_ice), 0.6 * 0.5 + 0.5 * 0.5,
                               rtol=1e-5)


def test_hybrid_precip_conserves_total(rng):
    g = make_grid(19, 36)
    cfg = PhysicsConfig(p_hybrid_fallback=False)
    u = 10 * rng.standard_normal(g.shape)
    v = 10 * rng.standard_normal(g.shape)
    P_cond = np.abs(rng.standard_normal(g.shape)) * 1e-5
    P = cl.diagnose_precipitation_hybrid(g, jnp.asarray(u), jnp.asarray(v),
                                         jnp.zeros(g.shape), jnp.asarray(P_cond),
                                         cfg, smooth_sigma=0.0)
    w = np.asarray(g.area_w)
    # renormalization keeps area-weighted total equal to <P_cond>
    np.testing.assert_allclose(float((np.asarray(P) * w).sum()),
                               float((P_cond * w).sum()), rtol=1e-3)
