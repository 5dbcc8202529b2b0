"""Pallas VMEM megakernel for the windowed semi-Lagrangian advection.

The jnp windowed path (ops/advect.py _advect_windowed) accumulates
Σ_{m,k} Wm·Wk·roll(F, (−m,−k)) — ~40 shifted HBM passes per call that XLA
only partially fuses (each lon roll is its own data-movement op). The step
is per-op-overhead-bound (docs/perf-notes.md), so this kernel computes the
whole window with the operands resident in VMEM: one HBM read of the field
stack + departure indices, one HBM write of the result. The shift loop runs
on VMEM rotates (VPU), where the 40 passes cost ~nothing compared to their
HBM-pass form.

Same numerics as the jnp path: identical mask weights, identical (m, k)
accumulation order. Polar exact rows are corrected by the caller exactly as
in the jnp path. Single-chip only (the multi-chip path uses the shard_map
halo form); gated by QD_PALLAS_ADVECT (default on, like QD_PALLAS_MEDIAN).

Pattern reference: the VMEM bisection median (ops/reductions.py:186-241).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _roll2(F, m, k):
    """roll(F, (−m, −k), axis=(1, 2)) with zero shifts elided — Mosaic's
    roll decomposition emits a zero-width slice for a 0 shift ("vector types
    must have positive constant sizes but got 1, 181, 0")."""
    out = F
    if m:
        out = jnp.roll(out, -m, axis=1)
    if k:
        out = jnp.roll(out, -k, axis=2)
    return out


def _window_kernel(ms, ks, fields_ref, dep_j_ref, dep_i_ref, out_ref):
    F = fields_ref[:]                   # [M, H, W] resident in VMEM
    dep_j = dep_j_ref[:]
    dep_i = dep_i_ref[:]
    H, W = dep_j.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    j0 = jnp.floor(dep_j)
    i0 = jnp.floor(dep_i)
    fj = (dep_j - j0).astype(F.dtype)
    fi = (dep_i - i0).astype(F.dtype)
    oj = j0.astype(jnp.int32) - jj
    oi = i0.astype(jnp.int32) - ii
    one = jnp.asarray(1.0, F.dtype)
    out = jnp.zeros_like(F)
    for m in ms:
        Wm = (jnp.where(oj == m, one - fj, 0.0)
              + jnp.where(oj == m - 1, fj, 0.0))
        for k in ks:
            Wk = (jnp.where(oi == k, one - fi, 0.0)
                  + jnp.where(oi == k - 1, fi, 0.0))
            out = out + (Wm * Wk)[None] * _roll2(F, m, k)
    out_ref[:] = out


def advect_windowed_pallas(fields, dep_j, dep_i, ms, ks, interpret=False):
    """Windowed accumulation on a VMEM-resident stack. ``ms``/``ks`` are the
    static shift windows from the AdvectPlan."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    kern = functools.partial(_window_kernel, tuple(ms), tuple(ks))
    # Mosaic's default 16 MiB scoped-VMEM budget is too small for the
    # unrolled window accumulation's rotate temporaries at 181x360x11
    # (~22 MiB measured); the stack itself is ~3 MiB, so 64 MiB leaves
    # ample headroom on v5e (128 MiB VMEM/core) while still fitting
    # alongside XLA's own buffers.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(fields.shape, fields.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )(fields, dep_j, dep_i)


def use_pallas_advect(fields_shape, dtype, n_passes: int = 55) -> bool:
    """Single-chip TPU, f32, and the working set fits VMEM comfortably.

    ``n_passes`` = |ms|·|ks| of the shift window: Mosaic's scoped-VMEM need
    for the unrolled rotate accumulation grows with the window (measured
    78 MiB for a 95-pass window on one 361×720 field vs ~22 MiB for the
    55-pass default on eleven 181×360 fields), so wide windows must fall
    back to the jnp form rather than compile-fail on the scoped limit."""
    from .. import flags
    if not flags.enabled("QD_PALLAS_ADVECT"):
        return False
    if dtype != jnp.float32:
        return False
    if n_passes > 60:
        return False
    try:
        if jax.default_backend() != "tpu" or jax.device_count() != 1:
            return False
    except Exception:
        return False
    M, H, W = fields_shape
    # in + out + a few VMEM temporaries (padded to lane multiples)
    import math
    Wp = math.ceil(W / 128) * 128
    Hp = math.ceil(H / 8) * 8
    bytes_est = (2 * M + 6) * Hp * Wp * 4
    # 24 MiB admits the 361x720 [T_s, q] stack (11.3 MiB est) whose jnp
    # fallback was the #2 hotspot of the 361x720 step (135 us/step device,
    # docs/perf-notes roofline section); Mosaic's scoped need for the
    # 55-pass window on that stack fits the raised 100 MiB limit.
    return bytes_est < 24 * 1024 * 1024
