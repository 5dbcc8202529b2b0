"""Ecology unit tests mirroring the reference's milestone smoke tests
(scripts/test_ecology_m1_m2.py / _m3.py / _m3_plus.py / smoke_genes_export.py):
absorbance cache, banded albedo, seed bank/germination/spread, individual-pool
coupling, genes export schema, plant FSM, diversity metrics."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qingdai_tpu.config import EcologyConfig
from qingdai_tpu.ecology import genes as gmod
from qingdai_tpu.ecology import population as pop
from qingdai_tpu.ecology import individuals as ind
from qingdai_tpu.ecology import spectral as spec
from qingdai_tpu.ecology import diversity as div
from qingdai_tpu.ecology.plant import (Plant, PlantState, init_plant_pool,
                                       pool_step_daily)


@pytest.fixture
def eco_world():
    H, W = 12, 24
    land = np.zeros((H, W), np.uint8)
    land[3:9, 4:16] = 1
    cfg = EcologyConfig(ns=4, species_max=6, rand_seed=7)
    es, state, bands, genes_list = pop.build_eco((H, W), land, cfg)
    return es, state, bands, genes_list, cfg, land


def test_bands_and_weights():
    cfg = EcologyConfig(nbands=16)
    bands = spec.make_bands(cfg)
    assert bands.nbands == 16
    assert bands.lambda_edges[0] == 380.0 and bands.lambda_edges[-1] == 780.0
    w = spec.band_weights(bands, cfg)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    # rayleigh mode weights increase with wavelength (λ^4)
    cfg_r = EcologyConfig(nbands=16, toa_mode="rayleigh")
    wr = spec.band_weights(bands, cfg_r)
    assert wr[-1] > wr[0]


def test_absorbance_from_genes_matches_gaussian():
    g = gmod.Genes.from_env()
    bands = spec.make_bands(EcologyConfig())
    A = gmod.absorbance_from_genes(bands.lambda_centers, g)
    lam = bands.lambda_centers
    ref = np.zeros_like(lam)
    for pk in g.absorption_peaks:
        ref += pk.height * np.exp(-((lam - pk.center_nm) ** 2) / (2 * pk.width_nm ** 2))
    np.testing.assert_allclose(A, np.clip(ref, 0, 1), rtol=1e-6)
    # device path matches host path
    packed = gmod.pack_genes([g], 1)
    A_dev = np.asarray(spec.absorbance_from_peaks(
        jnp.asarray(bands.lambda_centers), jnp.asarray(packed["peaks"][0])))
    np.testing.assert_allclose(A_dev, A, rtol=1e-5)


def test_dual_star_bands_sum_to_total(eco_world, rng):
    es, state, bands, _, cfg, land = eco_world
    insA = np.abs(rng.standard_normal(land.shape)) * 400
    insB = np.abs(rng.standard_normal(land.shape)) * 100
    I_b = np.asarray(spec.dual_star_insolation_to_bands(
        jnp.asarray(insA, jnp.float32), jnp.asarray(insB, jnp.float32),
        es.specA, es.specB, es.T_ray))
    np.testing.assert_allclose(I_b.sum(axis=0), insA + insB, rtol=1e-3)


def test_surface_albedo_bands(eco_world):
    es, state, bands, _, cfg, land = eco_world
    A = np.asarray(pop.surface_albedo_bands(es, state, cfg))
    assert A.shape == (es.NB,) + land.shape
    landb = land == 1
    assert np.isnan(A[:, ~landb]).all()
    assert np.isfinite(A[:, landb]).all()
    assert (A[:, landb] >= 0).all() and (A[:, landb] <= 1).all()


def test_subdaily_accumulates_and_albedo(eco_world):
    es, state, bands, _, cfg, land = eco_world
    isr = jnp.full(land.shape, 500.0)
    state2, alpha = pop.eco_step_subdaily(es, state, cfg, isr, 3600.0)
    np.testing.assert_allclose(np.asarray(state2.E_day), 500.0 * 3600.0, rtol=1e-5)
    a = np.asarray(alpha)
    landb = land == 1
    assert np.isfinite(a[landb]).all() and np.isnan(a[~landb]).all()


def test_seed_bank_germination(eco_world):
    es, state, bands, _, cfg, land = eco_world
    import dataclasses
    state = dataclasses.replace(state, seed_bank=jnp.where(jnp.asarray(land) == 1,
                                                           10.0, 0.0))
    lai_before = float(pop.total_LAI(state).sum())
    key = jax.random.PRNGKey(0)
    state2, _ = pop.eco_step_daily(es, state, cfg, jnp.ones(land.shape), key)
    lai_after = float(pop.total_LAI(state2).sum())
    assert lai_after > lai_before  # germination adds seedling LAI
    assert float(state2.seed_bank.sum()) < float(state.seed_bank.sum())


def test_mutation_activates_slot(eco_world):
    es, state, bands, _, cfg_base, land = eco_world
    cfg = EcologyConfig(ns=4, species_max=6, mut_rate=1.0, rand_seed=7)
    key = jax.random.PRNGKey(3)
    n0 = int(state.n_active)
    state2, _ = pop.eco_step_daily(es, state, cfg, jnp.ones(land.shape), key)
    assert int(state2.n_active) == n0 + 1
    assert bool(state2.active[n0])
    # conservation: total LAI unchanged by the split
    np.testing.assert_allclose(float(pop.total_LAI(state2).sum()),
                               float(pop.total_LAI(state).sum()), rtol=2e-3)


def test_individual_pool_coupling(eco_world):
    es, state, bands, _, cfg, land = eco_world
    cfg2 = EcologyConfig(ns=4, species_max=6, indiv_sample_frac=0.3,
                         indiv_per_cell=20, rand_seed=7)
    ist, ipool = ind.build_individuals(land.shape, land, es, state, cfg2)
    isr = jnp.full(land.shape, 400.0, jnp.float32)
    soil = jnp.full(land.shape, 0.8, jnp.float32)
    # one full day of substeps
    ipool2 = ipool
    for _ in range(12):
        ipool2 = ind.indiv_try_substep(ist, ipool2, es, cfg2, isr * 0.5, isr * 0.5,
                                       soil, 7200.0, 72000.0)
    assert float(ipool2.J_cells.sum()) > 0           # cell energy accumulated
    E_mid, _ = ind.materialize_day(ist, ipool2)
    assert float(E_mid.sum()) > 0
    sb_before = float(state.seed_bank.sum())
    ipool3, eco2 = ind.indiv_step_daily(ist, ipool2, es, state, cfg2, soil)
    assert float(ipool3.E_day.sum()) > 0             # completed-day energy kept
    assert float(ipool3.J_cells.sum()) == 0.0        # cell buffers reset
    assert int(ipool3.fire_idx) == 0
    assert float(eco2.seed_bank.sum()) > sb_before   # seed coupling fed the bank
    # species weights renormalized
    np.testing.assert_allclose(float(eco2.species_weights.sum()), 1.0, rtol=1e-3)


def test_genes_json_roundtrip(tmp_path, eco_world):
    from qingdai_tpu.io import netcdf as ncio
    es, state, bands, genes_list, cfg, land = eco_world
    w_b = spec.band_weights(bands, cfg)
    p = str(tmp_path / "genes.json")
    assert ncio.save_genes_json(p, genes_list[:4], bands, w_b,
                                species_weights=[0.25] * 4, day_value=1.0)
    doc = json.load(open(p))
    assert doc["schema_version"] == 3
    assert len(doc["genes"]) == 4
    assert doc["genes"][0]["peaks_model"] == "gaussian"
    loaded = ncio.load_genes_json(p)
    assert len(loaded) == 4
    np.testing.assert_allclose(loaded[0].alloc_root, genes_list[0].alloc_root,
                               rtol=1e-6)


def test_ecology_autosave_roundtrip(tmp_path, eco_world):
    from qingdai_tpu.io import netcdf as ncio
    es, state, bands, _, cfg, land = eco_world
    w_b = spec.band_weights(bands, cfg)
    lat = np.linspace(-90, 90, land.shape[0])
    lon = np.linspace(0, 360, land.shape[1])
    p = str(tmp_path / "ecology.nc")
    assert ncio.save_ecology(p, lat, lon, jax.device_get(state), bands, w_b,
                             day_value=2.0, keep=2)
    state2, ok = ncio.load_ecology(p, state, es, cfg)
    assert ok
    np.testing.assert_allclose(np.asarray(pop.total_LAI(state2)),
                               np.asarray(pop.total_LAI(state)), atol=1e-5)


def test_plant_fsm():
    g = gmod.Genes.from_env()
    g.gdd_germinate = 10.0
    p = Plant(genes=g)
    assert p.state == PlantState.SEED
    # warm days germinate
    for _ in range(3):
        p.update_substep(500.0, 7200.0, soil_water_index=0.9)
        p.update_one_day(Ts_day=293.15, day_length_hours=24.0, soil_water_index=0.9)
    assert p.state in (PlantState.GROWING, PlantState.MATURE)
    assert p.leaf_area > 0
    # vectorized pool matches scalar germination behavior
    pool = init_plant_pool(8, g)
    for _ in range(3):
        pool, seeds = pool_step_daily(pool, 293.15, 24.0, 0.9)
    assert int((np.asarray(pool.state) >= int(PlantState.GROWING)).sum()) == 8


def test_diversity_metrics(eco_world):
    es, state, bands, _, cfg, land = eco_world
    L_s = jnp.sum(jnp.maximum(state.LAI_SK, 0.0), axis=1)
    alpha = np.asarray(div.compute_alpha_eff_map(L_s, land))
    landb = land == 1
    # 4 equal species → α_eff ≈ 4 on vegetated land
    np.testing.assert_allclose(alpha[landb], 4.0, rtol=1e-3)
    lat_mesh = np.tile(np.linspace(-90, 90, land.shape[0])[:, None],
                       (1, land.shape[1]))
    wh = div.compute_whittaker_beta(L_s, land, lat_mesh)
    np.testing.assert_allclose(float(wh["beta_whittaker"]), 1.0, rtol=1e-3)
    bc = np.asarray(div.compute_local_bray_curtis(L_s, land))
    # uniform community → zero dissimilarity
    np.testing.assert_allclose(bc[landb], 0.0, atol=1e-5)


def test_phyto_growth_and_transport(rng):
    from qingdai_tpu.config import PhytoConfig
    from qingdai_tpu.ecology import phyto as ph
    from qingdai_tpu.grid import make_grid
    H, W = 12, 24
    land = np.zeros((H, W), np.uint8)
    land[3:9, 4:10] = 1
    cfg = PhytoConfig(n_species=4)
    eco_cfg = EcologyConfig()
    ps, st, bands = ph.build_phyto((H, W), land, cfg, eco_cfg, 50.0)
    insA = jnp.full((H, W), 300.0)
    insB = jnp.full((H, W), 100.0)
    T_w = jnp.full((H, W), 293.15)
    st2 = ph.phyto_step_daily(ps, st, cfg, insA, insB, T_w)
    ocean = land == 0
    # light+warmth → growth over ocean
    assert float(np.asarray(st2.C_phyto).sum()) > float(np.asarray(st.C_phyto).sum())
    assert np.all(np.asarray(st2.C_phyto)[:, ~ocean] == 0)
    # nutrient drawn down
    assert float(np.asarray(st2.N)[ocean].mean()) < float(np.asarray(st.N)[ocean].mean())
    # transport keeps mass non-negative and land at zero
    g = make_grid(H, W)
    uo = jnp.asarray(0.5 * rng.standard_normal((H, W)), jnp.float32)
    vo = jnp.asarray(0.5 * rng.standard_normal((H, W)), jnp.float32)
    st3 = ph.phyto_advect_diffuse(ps, st2, cfg, g, uo, vo, 300.0)
    assert np.all(np.asarray(st3.C_phyto) >= 0)
    assert np.all(np.asarray(st3.C_phyto)[:, ~ocean] == 0)


def test_indiv_deferred_energy_matches_per_fire(eco_world):
    """materialize_day must equal the naive per-fire per-individual
    accumulation (the reference's substep semantics, individuals.py:168-191)."""
    es, state, bands, _, cfg, land = eco_world
    cfg2 = EcologyConfig(ns=4, species_max=6, indiv_sample_frac=0.3,
                         indiv_per_cell=10, indiv_substeps_per_day=10,
                         rand_seed=7)
    ist, ipool = ind.build_individuals(land.shape, land, es, state, cfg2)
    rng = np.random.default_rng(1)
    H, W = land.shape
    period = 72000.0 / 10
    E_ref = np.zeros(ipool.E_day.shape)
    wsd_ref = np.zeros(ipool.E_day.shape)
    st = ipool
    for _ in range(10):
        isrA = jnp.asarray(rng.uniform(0, 500, (H, W)), jnp.float32)
        isrB = jnp.asarray(rng.uniform(0, 300, (H, W)), jnp.float32)
        soil = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
        st = ind.indiv_try_substep(ist, st, es, cfg2, isrA, isrB, soil,
                                   7200.0, 72000.0)
        # naive reference accumulation
        from qingdai_tpu.ecology.spectral import dual_star_insolation_to_bands
        I_b = dual_star_insolation_to_bands(isrA, isrB, es.specA, es.specB,
                                            es.T_ray)
        I_c = np.asarray(I_b)[:, np.asarray(ist.sample_j),
                              np.asarray(ist.sample_i)].T
        I_i = I_c[np.asarray(ist.cell_index), :]
        E_ref += np.maximum(0.0, (np.asarray(st.Ab) * I_i).sum(1) * period)
        s_i = np.asarray(soil)[np.asarray(ist.sample_j),
                               np.asarray(ist.sample_i)][np.asarray(ist.cell_index)]
        wsd_ref += (s_i < np.asarray(st.tol)) * (period / 72000.0)
    E_day, add_wsd = ind.materialize_day(ist, st)
    np.testing.assert_allclose(np.asarray(E_day), E_ref, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(add_wsd), wsd_ref, rtol=1e-6)
