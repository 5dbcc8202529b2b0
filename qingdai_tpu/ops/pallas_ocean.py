"""Pallas VMEM megakernel for the full slab-ocean substep chain.

The jnp substep (ocean.ocean_step) is ~40 small XLA ops per substep — PGF
rolls, momentum, sponge, the ∇⁴ stack, divergence/continuity, the SST+tracer
advection window, heating, mean4 outlier repair — and the step is
per-op-overhead-bound (docs/perf-notes.md "Known cost structure"). The ∇⁴
chain and the advection window already have VMEM kernels
(ops/pallas_stencil.py, ops/pallas_advect.py), but they are separate
pallas_calls with the connecting ops still in HBM. This kernel runs the
ENTIRE substep loop with every operand resident in VMEM: one HBM read of
(momentum stack, SST+tracer stack, forcing stack, static-geometry stack) and
one write of the updated state.

Numerics mirror ocean.ocean_step's substep exactly (same formulas, same
order, same masking), reference /root/reference/pygcm/ocean.py:305-443. The
polar ring fills and final SST clamp (ocean.py:519-533) stay outside — they
run once per outer step and involve per-row ring reductions that are cheap
at that cadence. Single-chip only (the multi-chip path keeps the shard_map
halo forms); gated by QD_PALLAS_OCEAN (default OFF since the 2026-08-18
interleaved A/B measured the jnp substep chain ~18 µs/step faster in 8/8
rounds — XLA fuses the chain well and pipelines HBM traffic the monolithic
kernel serializes; kept for the record and for "interpret"-mode parity
tests, and as the VMEM-residency pattern the winning advect/median kernels
grew from).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_stencil import _lap_batched

# geometry-stack plane indices (static operands, trace-time constants)
GEO_F = 0          # Coriolis parameter
GEO_COS05 = 1      # max(cosφ, 0.5) — ocean metric cap (ocean.py:82)
GEO_COS = 2        # raw cosφ (divergence φ-term)
GEO_COS_TINY = 3   # max(cosφ, 1e-6) (divergence divisor, grid.py:52)
GEO_R_EXTRA = 4    # polar sponge extra drag profile
GEO_LAND = 5       # land mask as float (1 on land)
GEO_OPEN = 6       # open-ocean mask (ocean & not ice)
GEO_UNDER = 7      # under-ice ocean mask
GEO_W_OCEAN = 8    # area weights × ocean mask (η mean removal)
GEO_K4_U = 9
GEO_K4_V = 10
GEO_K4_ETA = 11
N_GEO = 12


def _n2n(x):
    """jnp.nan_to_num without the lax.nan_to_num convenience: NaN→0,
    ±inf→±f32max (identical semantics, Mosaic-safe primitives)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    return jnp.clip(jnp.where(jnp.isnan(x), jnp.zeros_like(x), x), -big, big)


def _roll2(F, m, k):
    """roll(F, (−m, −k), axes (1, 2)) with zero shifts elided (Mosaic emits a
    zero-width slice for a 0 shift)."""
    out = F
    if m:
        out = jnp.roll(out, -m, axis=1)
    if k:
        out = jnp.roll(out, -k, axis=2)
    return out


def _ocean_kernel(ms, ks, n_sub, k4_nsub, sub_dt, H_m, r_bot, g, a, dlat,
                  dlon, K_h, adv_alpha, use_qnet, ice_qfac, cap, mean4,
                  eta_cap, mom_ref, st_ref, forc_ref, geo_ref,
                  mom_out, st_out):
    geo = geo_ref[:]
    f = geo[GEO_F]
    cos05 = geo[GEO_COS05]
    cos_raw = geo[GEO_COS]
    cos_tiny = geo[GEO_COS_TINY]
    r_extra = geo[GEO_R_EXTRA]
    on_land = geo[GEO_LAND] > 0.5
    open_m = geo[GEO_OPEN] > 0.5
    under_m = geo[GEO_UNDER] > 0.5
    w_ocean = geo[GEO_W_OCEAN]
    k4S = geo[GEO_K4_U:GEO_K4_ETA + 1]

    mom = mom_ref[:]
    uo, vo, eta = mom[0], mom[1], mom[2]
    st = st_ref[:]                      # [1+T, H, W]: SST + tracers
    forc = forc_ref[:]
    ax, ay, heat = forc[0], forc[1], forc[2]

    H, W = uo.shape
    dtype = uo.dtype
    zero = jnp.zeros_like(uo)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = rows.astype(dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(dtype)
    one = jnp.asarray(1.0, dtype)
    cos3 = cos05[None]
    w_sum = jnp.sum(w_ocean)

    for _ in range(n_sub):
        # pressure gradient (ocean.py:306-310)
        deta_dlam = (jnp.roll(eta, -1, axis=1)
                     - jnp.roll(eta, 1, axis=1)) / (2.0 * dlon)
        deta_dphi = (jnp.roll(eta, -1, axis=0)
                     - jnp.roll(eta, 1, axis=0)) / (2.0 * dlat)
        gx = deta_dlam / (a * cos05)
        gy = deta_dphi / a
        du = f * vo - g * gx + ax - r_bot * uo
        dv = -f * uo - g * gy + ay - r_bot * vo
        uo = uo + sub_dt * du
        vo = vo + sub_dt * dv
        uo = jnp.where(on_land, zero, uo)
        vo = jnp.where(on_land, zero, vo)
        uo = uo - sub_dt * r_extra * uo
        vo = vo - sub_dt * r_extra * vo

        # ∇⁴ hyperdiffusion of (uo, vo, η), cadence diff_every==1
        S = jnp.stack([uo, vo, eta])
        k4_dt = sub_dt / k4_nsub
        for _ in range(k4_nsub):
            L = _lap_batched(S, dlat, dlon, cos3, a)
            L2 = _lap_batched(L, dlat, dlon, cos3, a)
            S = S - k4S * L2 * k4_dt
        uo, vo, eta = S[0], S[1], S[2]

        # continuity (ocean.py:364-377); divergence mirrors grid.divergence
        du_dlon = (jnp.roll(uo, -1, axis=1)
                   - jnp.roll(uo, 1, axis=1)) / (2.0 * dlon)
        v_cos = vo * cos_raw
        dv_dlat = (jnp.roll(v_cos, -1, axis=0)
                   - jnp.roll(v_cos, 1, axis=0)) / (2.0 * dlat)
        interior = (rows > 0) & (rows < H - 1)
        dv_dlat = jnp.where(interior, dv_dlat, zero)
        div = (du_dlon + dv_dlat) / (a * cos_tiny)
        eta = eta - sub_dt * H_m * div
        eta = jnp.where(on_land, zero, eta)
        eta = eta - jnp.sum(eta * w_ocean) / (w_sum + 1e-15)

        # SST (+tracer) windowed semi-Lagrangian advection — same weights
        # and (m, k) order as ops/advect._advect_windowed / pallas_advect
        dep_j = jj - (vo * sub_dt / a) / dlat
        dep_i = ii - (uo * sub_dt / (a * cos05)) / dlon
        j0 = jnp.floor(dep_j)
        i0 = jnp.floor(dep_i)
        fj = (dep_j - j0).astype(dtype)
        fi = (dep_i - i0).astype(dtype)
        oj = j0.astype(jnp.int32) - rows
        oi = i0.astype(jnp.int32) - jax.lax.broadcasted_iota(
            jnp.int32, (H, W), 1)
        adv = jnp.zeros_like(st)
        for m in ms:
            Wm = (jnp.where(oj == m, one - fj, 0.0)
                  + jnp.where(oj == m - 1, fj, 0.0))
            for k in ks:
                Wk = (jnp.where(oi == k, one - fi, 0.0)
                      + jnp.where(oi == k - 1, fi, 0.0))
                adv = adv + (Wm * Wk)[None] * _roll2(st, m, k)
        sst = (1.0 - adv_alpha) * st[0] + adv_alpha * adv[0]
        if K_h > 0.0:
            sst = sst + sub_dt * K_h * _lap_batched(sst[None], dlat, dlon,
                                                    cos3, a)[0]
        # Q_net heating (ocean.py:388-406)
        if use_qnet:
            sst = jnp.where(open_m, sst + sub_dt * heat, sst)
            if ice_qfac > 0.0:
                sst = jnp.where(under_m, sst + sub_dt * ice_qfac * heat, sst)

        # outlier repair (ocean.py:408-434)
        uo = _n2n(uo)
        vo = _n2n(vo)
        speed = jnp.sqrt(uo * uo + vo * vo)
        if mean4:
            u_m4 = 0.25 * (jnp.roll(uo, -1, 0) + jnp.roll(uo, 1, 0)
                           + jnp.roll(uo, -1, 1) + jnp.roll(uo, 1, 1))
            v_m4 = 0.25 * (jnp.roll(vo, -1, 0) + jnp.roll(vo, 1, 0)
                           + jnp.roll(vo, -1, 1) + jnp.roll(vo, 1, 1))
            fast = speed > cap
            uo = jnp.where(fast, u_m4, uo)
            vo = jnp.where(fast, v_m4, vo)
            speed2 = jnp.sqrt(uo * uo + vo * vo)
            scl = jnp.where(speed2 > cap, cap / (speed2 + 1e-12), one)
        else:
            scl = jnp.where(speed > cap, cap / (speed + 1e-12), one)
        uo = uo * scl
        vo = vo * scl

        eta = jnp.clip(_n2n(eta), -eta_cap, eta_cap)
        sst = _n2n(sst)
        # tracer-free case: adv[1:] would be a zero-size slice, which Mosaic
        # rejects ("vector types must have positive constant sizes")
        st = (jnp.concatenate([sst[None], adv[1:]], axis=0)
              if st.shape[0] > 1 else sst[None])

    mom_out[:] = jnp.stack([uo, vo, eta])
    st_out[:] = st


def ocean_substeps_pallas(mom, st, forc, geo, *, ms, ks, n_sub, k4_nsub,
                          sub_dt, H_m, r_bot, g, a, dlat, dlon, K_h,
                          adv_alpha, use_qnet, ice_qfac, cap, mean4, eta_cap,
                          interpret=False):
    """Run ``n_sub`` fused ocean substeps. ``mom``=[uo,vo,η], ``st``=[SST]+
    tracers, ``forc``=[τx/(ρH), τy/(ρH), Q/(ρc_pH)], ``geo``=the N_GEO static
    plane stack. Returns (mom', st')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    kern = functools.partial(
        _ocean_kernel, tuple(ms), tuple(ks), int(n_sub),
        max(1, int(k4_nsub)), float(sub_dt), float(H_m), float(r_bot),
        float(g), float(a), float(dlat), float(dlon), float(K_h),
        float(adv_alpha), bool(use_qnet), float(ice_qfac), float(cap),
        bool(mean4), float(eta_cap))
    # the window accumulation + two-Laplacian temporaries exceed Mosaic's
    # default 16 MiB scoped budget at 181x360 with the 10-species tracer
    # stack (cf. ops/pallas_advect.py); v5e has 128 MiB VMEM/core
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(mom.shape, mom.dtype),
                   jax.ShapeDtypeStruct(st.shape, st.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=params,
        interpret=interpret,
    )(mom, st, forc, geo)


def use_pallas_ocean(cfg, plan, shape, dtype, n_sub, n_st):
    """(engage, interpret): single-chip TPU f32 with the default substep
    structure — ∇⁴ every substep, Shapiro off, a windowed advection plan
    with no exact polar rows — and a VMEM-fitting working set.
    QD_PALLAS_OCEAN=interpret engages the interpreter on any backend (CPU
    parity tests)."""
    from .. import flags
    env = flags.pallas_ocean_mode()
    if env in ("0", "false", "no", "off"):
        return False, False
    interpret = env == "interpret"
    if not interpret:
        if dtype != jnp.float32:
            return False, False
        try:
            if jax.default_backend() != "tpu" or jax.device_count() != 1:
                return False, False
        except Exception:
            return False, False
    if plan is None or plan.exact_rows or plan.b_lon is None:
        return False, False
    if cfg.shapiro_n > 0 and cfg.shapiro_every > 0:
        return False, False
    if cfg.diff_every != 1:
        return False, False
    if n_sub > 8:
        return False, False
    import math
    H, W = shape
    Wp = math.ceil(W / 128) * 128
    Hp = math.ceil(H / 8) * 8
    # in (3 + n_st + 3 + N_GEO) + out (3 + n_st) planes; temporaries are
    # bounded by the same order (window shifts + Laplacian stages)
    n_planes = 2 * (3 + n_st) + 3 + N_GEO
    if 3 * n_planes * Hp * Wp * 4 > 80 * 1024 * 1024:
        return False, False
    return True, interpret
