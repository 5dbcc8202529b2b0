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


def save_checkpoint_meta(path: str, t_seconds: float) -> None:
    """Stamp the exact host-side epoch next to the snapshot (atomic).

    The in-state device clock (ClockState.t_seconds) is f32 bookkeeping that
    accumulates t+dt per step — at epoch ~1e9 s its spacing is 64 s and the
    per-step rounding drifts by ~1e4 s per simulated day, so it cannot serve
    as the staleness guard against atmosphere.nc's exact f64 t_seconds. This
    f64 stamp is written from the same host value the NetCDF set records."""
    import json
    meta = path + ".meta.json"
    tmp = meta + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"t_seconds": float(t_seconds)}, f)
    os.replace(tmp, meta)


def load_checkpoint_meta(path: str):
    """Return the stamped host epoch (float) or None for pre-stamp sidecars."""
    import json
    try:
        with open(path + ".meta.json") as f:
            return float(json.load(f)["t_seconds"])
    except (OSError, ValueError, KeyError):
        return None


def save_checkpoint(path: str, state) -> None:
    """Orbax single-snapshot save; falls back to NPZ-of-leaves if orbax is
    unavailable OR cannot run (its async machinery needs live executors, so
    the atexit/signal autosave path lands here — observed
    'cannot schedule new futures after interpreter shutdown').

    Both forms are written to a temp name and atomically swapped in, and the
    superseded other-form artifact is removed on success: a failed or killed
    save must leave either the previous coherent snapshot or clean absence —
    never a torn write or a stale same-named lie beside newer NetCDF files
    (the staleness guard in world._init_state then falls back safely)."""
    import shutil
    path = os.path.abspath(path)
    host = jax.device_get(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    try:
        import orbax.checkpoint as ocp
        shutil.rmtree(tmp, ignore_errors=True)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(tmp, host, force=True)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        try:
            os.remove(path + ".npz")
        except OSError:
            pass
        return
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
    leaves, treedef = jax.tree_util.tree_flatten(host)
    np.savez(tmp + ".npz", *[np.asarray(l) for l in leaves])
    os.replace(tmp + ".npz", path + ".npz")
    shutil.rmtree(path, ignore_errors=True)


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
