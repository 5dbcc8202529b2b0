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
    """Orbax single-snapshot save; falls back to NPZ-of-leaves if orbax is
    unavailable OR cannot run (its async machinery needs live executors, so
    the atexit/signal autosave path lands here — observed
    'cannot schedule new futures after interpreter shutdown')."""
    path = os.path.abspath(path)
    host = jax.device_get(state)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, host, force=True)
        return
    except Exception:
        pass
    leaves, treedef = jax.tree_util.tree_flatten(host)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".npz", *[np.asarray(l) for l in leaves])


def load_checkpoint(path: str, template):
    """Restore into the shape/dtype structure of ``template``. When both the
    orbax directory and the NPZ fallback exist (a shutdown save falls back
    to NPZ beside an older orbax snapshot), the newer artifact wins."""
    path = os.path.abspath(path)

    def mtime(p):
        try:
            return os.path.getmtime(p)
        except OSError:
            return -1.0

    use_npz = mtime(path + ".npz") > mtime(path)
    if not use_npz:
        try:
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(path, item=jax.device_get(template))
            return jax.tree_util.tree_map(
                lambda t, r: jax.numpy.asarray(np.asarray(r),
                                               jax.numpy.asarray(t).dtype),
                template, restored)
        except ImportError:
            pass
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [jax.numpy.asarray(data[f"arr_{i}"],
                                    jax.numpy.asarray(l).dtype)
                  for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
