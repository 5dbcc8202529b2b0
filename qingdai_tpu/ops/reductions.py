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

    On-device re-expression of ``np.median(x[x > 0])``: positives are sorted to
    the front via where(+inf) trick and the middle of the valid prefix taken,
    matching numpy's (lower+upper)/2 convention for even counts.
    """
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
