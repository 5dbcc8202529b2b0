"""Control-flow helpers for state-pytree branches."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cond_keep_dtypes(pred, true_fn, false_fn, operand):
    """lax.cond whose true branch is cast leaf-by-leaf to the false branch's
    dtypes. Python-scalar arithmetic inside a branch can weakly promote leaves
    (notably under x64), which lax.cond rejects; the false branch is the
    identity-on-state path here, so its dtypes are authoritative."""
    def true_cast(op):
        out = true_fn(op)
        ref = false_fn(op)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(a, jnp.asarray(b).dtype), out, ref)
    return jax.lax.cond(pred, true_cast, false_fn, operand)
