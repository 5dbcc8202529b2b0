"""Pallas VMEM kernel for the fused ∇⁴ hyperdiffusion chain.

The jnp form (ops/stencil.py hyperdiffuse_multi) runs two spherical
Laplacians per substep — ~10 partially-fused HBM passes over the [M, H, W]
stack. Here the stack, the cosφ metric and the k4 map are loaded into VMEM
once and the whole chain (all substeps) runs on VPU rotates/slices: 3 HBM
reads + 1 write per call. Same numerics (identical formulas, same
accumulation order). Single-chip only — the multi-chip path uses the
shard_map halo form; gated by QD_PALLAS_HYPER4 (default on).

Pattern reference: ops/pallas_advect.py and the VMEM bisection median
(ops/reductions.py:186-241).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lap_batched(F, dlat, dlon, cos3, a):
    """Mirror of ops/stencil._laplacian_sphere_batched on VMEM arrays."""
    n = F.shape[1]
    sl = lambda s, e: jax.lax.slice_in_dim(F, s, e, axis=1)

    def grad_lat(X):
        interior = (jax.lax.slice_in_dim(X, 2, n, axis=1)
                    - jax.lax.slice_in_dim(X, 0, n - 2, axis=1)) / (2.0 * dlat)
        first = (jax.lax.slice_in_dim(X, 1, 2, axis=1)
                 - jax.lax.slice_in_dim(X, 0, 1, axis=1)) / dlat
        last = (jax.lax.slice_in_dim(X, n - 1, n, axis=1)
                - jax.lax.slice_in_dim(X, n - 2, n - 1, axis=1)) / dlat
        return jnp.concatenate([first, interior, last], axis=1)

    dF_dphi = grad_lat(F)
    term_phi = grad_lat(cos3 * dF_dphi) / cos3
    d2 = (jnp.roll(F, -1, axis=2) - 2.0 * F + jnp.roll(F, 1, axis=2)) / (dlon * dlon)
    return (term_phi + d2 / (cos3 * cos3)) / (a * a)


def _hyper4_kernel(dlat, dlon, a, sub_dt, n_sub, f_ref, cos_ref, k4_ref,
                   out_ref):
    F = f_ref[:]
    cos3 = cos_ref[:][None]
    k4 = k4_ref[:]
    out = F
    for _ in range(n_sub):
        L = _lap_batched(out, dlat, dlon, cos3, a)
        L2 = _lap_batched(L, dlat, dlon, cos3, a)
        out = out - k4 * L2 * sub_dt
    out_ref[:] = out


def hyperdiffuse_pallas(F, k4_stack, dt, n_substeps, dlat, dlon, coslat, a,
                        interpret=False):
    """VMEM-fused hyperdiffuse_multi. ``k4_stack`` must broadcast to F's
    shape; it is materialized once (still one HBM read)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = max(1, int(n_substeps))
    k4_full = jnp.broadcast_to(k4_stack, F.shape).astype(F.dtype)
    kern = functools.partial(_hyper4_kernel, float(dlat), float(dlon),
                             float(a), float(dt) / n, n)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(F.shape, F.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(F, coslat.astype(F.dtype), k4_full)


def use_pallas_hyper4(shape, dtype) -> bool:
    from .. import flags
    if not flags.enabled("QD_PALLAS_HYPER4"):
        return False
    if dtype != jnp.float32:
        return False
    try:
        if jax.default_backend() != "tpu" or jax.device_count() != 1:
            return False
    except Exception:
        return False
    import math
    M, H, W = shape
    Wp = math.ceil(W / 128) * 128
    Hp = math.ceil(H / 8) * 8
    return (3 * M + 6) * Hp * Wp * 4 < 10 * 1024 * 1024
