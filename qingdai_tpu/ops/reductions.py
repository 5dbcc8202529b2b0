"""Area-weighted reductions and robust statistics used by the physics.

The reference's global renormalizations and diagnostics are cos(lat)-weighted
means (e.g. /root/reference/pygcm/energy.py:518-526, physics.py:318-324,
ocean.py:369-377). Median-of-positives appears in the cloud/precip scaling
(physics.py:299-303, run_simulation.py:1867-1875) and must run on device to
keep the step sync-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def area_mean(x: jax.Array, w: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Σ x·w / (Σ w + 1e-15); optional boolean mask folds into the weights."""
    if mask is not None:
        w = w * mask
    return jnp.sum(x * w) / (jnp.sum(w) + 1e-15)


def masked_median_of_positive(x: jax.Array, fallback: float = 1e-6) -> jax.Array:
    """Median over strictly positive entries of x; ``fallback`` if none.

    On-device re-expression of ``np.median(x[x > 0])`` (physics.py:299-303).
    Instead of a full sort (O(N log N) and ~0.1 ms for the 181×360 grid every
    step), the two middle order statistics are found by fixed-count bisection
    on the value range: each iteration is one fused compare+count pass over x,
    so the whole median is ~30 cheap HBM passes. The interval shrinks to
    max·2⁻ⁱᵗᵉʳˢ, below one ulp of the data type, so the result matches the
    sort-based median to roundoff (asserted in tests/test_ops.py).
    """
    flat = x.ravel()
    pos = flat > 0.0
    n = jnp.sum(pos)
    # order statistics (0-indexed): numpy median averages k1=(n-1)//2, k2=n//2
    k = n.astype(jnp.int32)
    k12 = jnp.stack([jnp.maximum((k - 1) // 2, 0), jnp.maximum(k // 2, 0)])
    neg_inf = jnp.asarray(-jnp.inf, flat.dtype)
    hi0 = jnp.maximum(jnp.max(jnp.where(pos, flat, neg_inf)), 0.0)
    lo0 = jnp.zeros((2,), flat.dtype)
    hi0 = jnp.broadcast_to(hi0, (2,)).astype(flat.dtype)
    iters = 62 if flat.dtype == jnp.float64 else 34

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        # count of positives <= mid, per target: smallest v with
        # count >= k+1 is the k-th order statistic (0-indexed)
        cnt = jnp.sum(pos[None, :] & (flat[None, :] <= mid[:, None]), axis=1)
        ge = cnt >= (k12 + 1)
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    med = 0.5 * (hi[0] + hi[1])
    return jnp.where(n > 0, med, jnp.asarray(fallback, x.dtype))


def masked_median_of_positive_sort(x: jax.Array, fallback: float = 1e-6) -> jax.Array:
    """Sort-based exact reference implementation (kept for tests/fallback)."""
    flat = x.ravel()
    pos = flat > 0.0
    n = jnp.sum(pos)
    vals = jnp.where(pos, flat, jnp.inf)
    s = jnp.sort(vals)
    # numpy median of k elements: k odd -> s[(k-1)//2]; k even -> mean of the two middles
    k = n.astype(jnp.int32)
    lo_idx = jnp.maximum((k - 1) // 2, 0)
    hi_idx = jnp.maximum(k // 2, 0)
    lo = s[lo_idx]
    hi = s[hi_idx]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, jnp.asarray(fallback, x.dtype))
