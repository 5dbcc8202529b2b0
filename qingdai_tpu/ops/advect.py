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
    H, W = field.shape
    j0 = jnp.floor(dep_j)
    i0 = jnp.floor(dep_i)
    fj = dep_j - j0
    fi = dep_i - i0
    j0 = j0.astype(jnp.int32)
    i0 = i0.astype(jnp.int32)
    j1 = j0 + 1
    i1 = i0 + 1
    j0 = jnp.mod(j0, H)
    j1 = jnp.mod(j1, H)
    i0 = jnp.mod(i0, W)
    i1 = jnp.mod(i1, W)

    flat = field.ravel()
    def gat(jj, ii):
        return jnp.take(flat, jj * W + ii, axis=0)

    f00 = gat(j0, i0)
    f01 = gat(j0, i1)
    f10 = gat(j1, i0)
    f11 = gat(j1, i1)
    top = f00 * (1.0 - fi) + f01 * fi
    bot = f10 * (1.0 - fi) + f11 * fi
    return top * (1.0 - fj) + bot * fj


def advect_semilag(field: jax.Array, u: jax.Array, v: jax.Array, dt: float,
                   a: float, dlat: float, dlon: float, coslat: jax.Array) -> jax.Array:
    """Advect a scalar by (u, v) over dt: gather at upstream departure points."""
    H, W = field.shape
    dlam = u * dt / (a * coslat)
    dphi = v * dt / a
    dx = dlam / dlon
    dy = dphi / dlat
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(field.dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(field.dtype)
    dep_j = jj - dy
    dep_i = ii - dx
    return bilinear_wrap_gather(field, dep_j, dep_i)
