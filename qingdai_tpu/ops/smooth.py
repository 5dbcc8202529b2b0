"""Separable Gaussian smoothing matching scipy.ndimage.gaussian_filter.

The reference smooths precip/cloud fields with gaussian_filter(σ=1.0)
(/root/reference/pygcm/physics.py:44,69,111,159,330). scipy uses a truncated
discrete Gaussian (truncate=4.0) applied separably; boundary mode is 'reflect'
by default, with 'wrap'/'nearest' used in a few call sites. All three modes are
implemented here via static padding + depthwise 1-D convolution, which XLA maps
to a couple of fused vector passes.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _gauss_kernel(sigma: float, truncate: float = 4.0) -> tuple:
    """scipy-compatible discrete Gaussian kernel (tuple for hashability)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    k /= k.sum()
    return tuple(k.tolist())


def _pad1d(F: jax.Array, r: int, axis: int, mode: str) -> jax.Array:
    if r == 0:
        return F
    if mode == "wrap":
        lo = jax.lax.slice_in_dim(F, F.shape[axis] - r, F.shape[axis], axis=axis)
        hi = jax.lax.slice_in_dim(F, 0, r, axis=axis)
    elif mode == "nearest":
        lo_edge = jax.lax.slice_in_dim(F, 0, 1, axis=axis)
        hi_edge = jax.lax.slice_in_dim(F, F.shape[axis] - 1, F.shape[axis], axis=axis)
        reps = [1, 1]
        reps[axis] = r
        lo = jnp.tile(lo_edge, reps)
        hi = jnp.tile(hi_edge, reps)
    elif mode == "reflect":  # scipy 'reflect' == symmetric (edge value repeated)
        lo = jnp.flip(jax.lax.slice_in_dim(F, 0, r, axis=axis), axis=axis)
        hi = jnp.flip(jax.lax.slice_in_dim(F, F.shape[axis] - r, F.shape[axis], axis=axis), axis=axis)
    else:
        raise ValueError(f"unknown pad mode {mode}")
    return jnp.concatenate([lo, F, hi], axis=axis)


def _conv1d(F: jax.Array, kernel: tuple, axis: int, mode: str) -> jax.Array:
    r = (len(kernel) - 1) // 2
    Fp = _pad1d(F, r, axis, mode)
    out = jnp.zeros_like(F)
    n = F.shape[axis]
    for t, w in enumerate(kernel):
        out = out + jnp.asarray(w, F.dtype) * jax.lax.slice_in_dim(Fp, t, t + n, axis=axis)
    return out


def gaussian_filter(F: jax.Array, sigma: float, mode_lat: str = "reflect",
                    mode_lon: str = "reflect", truncate: float = 4.0) -> jax.Array:
    """Separable Gaussian blur. sigma==0 returns F unchanged."""
    if sigma is None or sigma <= 0.0:
        return F
    k = _gauss_kernel(float(sigma), truncate)
    out = _conv1d(F, k, axis=0, mode=mode_lat)
    out = _conv1d(out, k, axis=1, mode=mode_lon)
    return out
