"""Semi-Lagrangian advection: bilinear gather at departure points.

TPU-native equivalent of the reference's map_coordinates-based scheme
(/root/reference/pygcm/jax_compat.py:190-216, dynamics.py:90-118,
ocean.py:166-194). Departure indices wrap periodically on both axes (period N,
matching jax.scipy.ndimage.map_coordinates mode='wrap', which is the
reference's accelerated path). Implemented as an explicit 4-corner gather so
XLA lowers it to vectorized dynamic-gathers rather than a generic interpolator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_wrap_gather(field: jax.Array, dep_j: jax.Array, dep_i: jax.Array) -> jax.Array:
    """Bilinear interpolation of ``field`` at fractional indices (dep_j, dep_i),
    periodic wrap on both axes."""
    return bilinear_wrap_gather_multi(field[None], dep_j, dep_i)[0]


def bilinear_wrap_gather_multi(fields: jax.Array, dep_j: jax.Array,
                               dep_i: jax.Array) -> jax.Array:
    """Bilinear wrap interpolation of stacked ``fields`` [M, H, W] at shared
    fractional departure indices.

    TPU note: XLA gather cost scales with the number of *index rows*, not the
    gathered volume (a batch-8 gather costs the same as batch-1). So the four
    bilinear corners are fetched in ONE gather from a [4·M, H, W] stack of
    rolled copies (roll is a cheap lane/sublane rotation), and any number of
    fields advected by the same wind share that single gather. This is ~4–8×
    faster per field than four per-corner jnp.take calls.
    """
    M, H, W = fields.shape
    out_shape = dep_j.shape  # departure points may cover a row subset
    j0f = jnp.floor(dep_j)
    i0f = jnp.floor(dep_i)
    fj = (dep_j - j0f).astype(fields.dtype)
    fi = (dep_i - i0f).astype(fields.dtype)
    j0 = jnp.mod(j0f.astype(jnp.int32), H)
    i0 = jnp.mod(i0f.astype(jnp.int32), W)

    # corner stack: [M,4,H,W] where corner c of field m sits at G[m,c,j0,i0]
    right = jnp.roll(fields, -1, axis=2)
    down = jnp.roll(fields, -1, axis=1)
    diag = jnp.roll(right, -1, axis=1)
    G = jnp.stack([fields, right, down, diag], axis=1)      # [M,4,H,W]
    Gf = G.reshape(M * 4, H * W)

    flat_idx = (j0 * W + i0).ravel()
    gathered = jnp.take(Gf, flat_idx, axis=1)                # [M*4, n_idx]
    gathered = gathered.reshape((M, 4) + out_shape)

    w00 = (1.0 - fj) * (1.0 - fi)
    w01 = (1.0 - fj) * fi
    w10 = fj * (1.0 - fi)
    w11 = fj * fi
    out = (gathered[:, 0] * w00 + gathered[:, 1] * w01
           + gathered[:, 2] * w10 + gathered[:, 3] * w11)
    return out


def departure_indices(shape, u, v, dt, a, dlat, dlon, coslat, dtype):
    """Upstream departure-point fractional indices for semi-Lagrangian advection."""
    H, W = shape
    dlam = u * dt / (a * coslat)
    dphi = v * dt / a
    dx = dlam / dlon
    dy = dphi / dlat
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(dtype)
    return jj - dy, ii - dx


def advect_semilag(field: jax.Array, u: jax.Array, v: jax.Array, dt: float,
                   a: float, dlat: float, dlon: float, coslat: jax.Array) -> jax.Array:
    """Advect a scalar by (u, v) over dt: gather at upstream departure points."""
    dep_j, dep_i = departure_indices(field.shape, u, v, dt, a, dlat, dlon,
                                     coslat, field.dtype)
    return bilinear_wrap_gather_multi(field[None], dep_j, dep_i)[0]


def advect_semilag_multi(fields: jax.Array, u: jax.Array, v: jax.Array, dt: float,
                         a: float, dlat: float, dlon: float,
                         coslat: jax.Array) -> jax.Array:
    """Advect stacked fields [M, H, W] by the same wind in one shared gather."""
    dep_j, dep_i = departure_indices(fields.shape[1:], u, v, dt, a, dlat, dlon,
                                     coslat, fields.dtype)
    return bilinear_wrap_gather_multi(fields, dep_j, dep_i)
