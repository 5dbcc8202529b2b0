"""Parity vs the reference ecology: spectral bands, population
subdaily/daily LAI dynamics, and the phytoplankton daily step."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_path():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    os.environ["QD_USE_JAX"] = "0"
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def test_spectral_parity(ref_path):
    from pygcm.ecology import spectral as ref_spec
    from qingdai_tpu.config import EcologyConfig
    from qingdai_tpu.ecology import spectral as spec
    import jax.numpy as jnp

    cfg = EcologyConfig(nbands=16)
    bands = spec.make_bands(cfg)
    ref_bands = ref_spec.make_bands(16)
    np.testing.assert_allclose(bands.lambda_centers, ref_bands.lambda_centers)
    np.testing.assert_allclose(spec.band_weights(bands, cfg),
                               ref_spec.band_weights_from_mode(ref_bands))
    np.testing.assert_allclose(spec.default_leaf_reflectance(bands),
                               ref_spec.default_leaf_reflectance(ref_bands))
    # blackbody band weights for both stars
    for T in (5000.0, 5778.0, 4500.0):
        np.testing.assert_allclose(spec.blackbody_band_weights(T, bands),
                                   ref_spec.blackbody_band_weights(T, ref_bands),
                                   rtol=1e-10)
    # dual-star per-pixel band intensities
    rng = np.random.default_rng(0)
    insA = np.abs(rng.standard_normal((10, 20))) * 500
    insB = np.abs(rng.standard_normal((10, 20))) * 150
    ref_Ib = ref_spec.dual_star_insolation_to_bands(insA, insB, ref_bands)
    specA, specB, T_ray = spec.star_band_spectra(bands, cfg)
    got = np.asarray(spec.dual_star_insolation_to_bands(
        jnp.asarray(insA), jnp.asarray(insB),
        jnp.asarray(specA), jnp.asarray(specB), jnp.asarray(T_ray)))
    np.testing.assert_allclose(got, ref_Ib, rtol=1e-6, atol=1e-8)


def test_population_daily_parity(ref_path, monkeypatch):
    """PopulationManager subdaily energy + daily germination vs the static-S
    TPU population (spread disabled, K=1: the reference's as-run path)."""
    import jax
    import jax.numpy as jnp
    from pygcm.ecology.population import PopulationManager
    from qingdai_tpu.config import EcologyConfig
    from qingdai_tpu.ecology import population as pop

    monkeypatch.setenv("QD_ECO_NS", "4")
    monkeypatch.setenv("QD_ECO_RAND_SEED", "3")
    rng = np.random.default_rng(1)
    H, W = 12, 24
    land = (rng.random((H, W)) < 0.4).astype(int)

    ref_pop = PopulationManager(land, diag=False)
    cfg = EcologyConfig(ns=4, species_max=4, rand_seed=3)
    es, st, bands, _ = pop.build_eco((H, W), land, cfg, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(pop.total_LAI(st)), ref_pop.total_LAI(),
                               rtol=1e-6)

    isr = np.abs(rng.standard_normal((H, W))) * 400
    soil = rng.uniform(0, 1, (H, W))
    # one day of subdaily accumulation (4 substeps)
    for _ in range(4):
        ref_pop.step_subdaily(isr, 18000.0)
        st, _alpha = pop.eco_step_subdaily(es, st, cfg, jnp.asarray(isr), 18000.0)
    np.testing.assert_allclose(np.asarray(st.E_day), ref_pop.E_day, rtol=1e-6)

    # canopy reflectance factor parity
    f_ref = ref_pop.canopy_reflectance_factor()
    f_got = np.asarray(st.canopy_f)
    landb = land == 1
    np.testing.assert_allclose(f_got[landb], f_ref[landb], rtol=1e-6)

    # daily: seed germination path with a seeded bank
    ref_pop.seed_bank = np.where(land == 1, 5.0, 0.0).astype(float)
    import dataclasses
    st = dataclasses.replace(st, seed_bank=jnp.asarray(ref_pop.seed_bank))
    ref_pop.step_daily(soil)
    st, _ = pop.eco_step_daily(es, st, cfg, jnp.asarray(soil),
                               jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(pop.total_LAI(st)),
                               ref_pop.total_LAI(), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.seed_bank), ref_pop.seed_bank,
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.age_days), ref_pop.age_days,
                               rtol=1e-6)


def test_phyto_daily_parity(ref_path, monkeypatch):
    from pygcm.ecology.phyto import PhytoManager
    from pygcm.grid import SphericalGrid
    import jax.numpy as jnp
    from qingdai_tpu.config import EcologyConfig, PhytoConfig
    from qingdai_tpu.ecology import phyto as ph

    monkeypatch.setenv("QD_PHYTO_NSPECIES", "5")
    rng = np.random.default_rng(2)
    H, W = 12, 24
    land = (rng.random((H, W)) < 0.4).astype(int)
    ref_grid = SphericalGrid(n_lat=H, n_lon=W)
    ref = PhytoManager(ref_grid, land, H_mld_m=50.0, diag=False)

    cfg = PhytoConfig(n_species=5)
    eco_cfg = EcologyConfig()
    ps, st, bands = ph.build_phyto((H, W), land, cfg, eco_cfg, 50.0,
                                   dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(st.C_phyto), ref.C_phyto_s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps.shape_sb), ref.shape_sb, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps.mu_max_s), ref.mu_max_s, rtol=1e-8)

    insA = np.abs(rng.standard_normal((H, W))) * 500
    insB = np.abs(rng.standard_normal((H, W))) * 150
    T_w = 285 + 10 * rng.random((H, W))
    for _ in range(3):
        ref_ab, ref_as = ref.step_daily(insA, insB, T_w, dt_days=1.0)
        st = ph.phyto_step_daily(ps, st, cfg, jnp.asarray(insA),
                                 jnp.asarray(insB), jnp.asarray(T_w))
    np.testing.assert_allclose(np.asarray(st.C_phyto), ref.C_phyto_s,
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.N), ref.N, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.alpha_scalar),
                               ref.alpha_water_scalar, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.Kd_490), ref.Kd_490, rtol=1e-6)
