"""Fast-path full-pytree checkpointing via Orbax.

The NetCDF files (io/netcdf.py) are the interchange format matching the
reference's schemas; this module is the internal fast path that snapshots the
*entire* WorldState pytree (including ecology tensors, individual pool,
routing buffers, RNG key) so a resumed run is bit-identical, which the
reference's field-subset restart cannot guarantee (SURVEY.md §5.4).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    """Orbax single-snapshot save (falls back to NPZ-of-leaves if orbax is
    unavailable)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
    except ImportError:
        leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path + ".npz", *[np.asarray(l) for l in leaves])


def load_checkpoint(path: str, template):
    """Restore into the shape/dtype structure of ``template``."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(template))
        return jax.tree_util.tree_map(
            lambda t, r: jax.numpy.asarray(np.asarray(r),
                                           jax.numpy.asarray(t).dtype),
            template, restored)
    except ImportError:
        data = np.load(path + ".npz")
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = [jax.numpy.asarray(data[f"arr_{i}"],
                                        jax.numpy.asarray(l).dtype)
                      for i, l in enumerate(leaves)]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
