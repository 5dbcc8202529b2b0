"""Multi-chip SPMD: device mesh + sharding layout for the world state.

The reference is strictly single-process (SURVEY.md §2.5); the TPU-native
scaling axis is the spatial grid. The longitude axis is sharded across the
mesh ("lon" axis): all stencils reach neighbors through jnp.roll, which the
XLA SPMD partitioner turns into ICI collective-permutes of one halo column,
and the global area-weighted reductions become psums. Latitude stays
unsharded so the pole-row special cases (polar ring averaging, freeze fix)
remain local to every shard.

Semi-Lagrangian advection gathers are globally indexed, which under SPMD
all-gathers the (small) advected field stacks — acceptable at this state size
(a 181×360 field is 260 KB); a halo-bounded gather is the known follow-up for
large multi-chip grids.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "lon") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def _spec_for_leaf(leaf, n_lon: int, axis_name: str):
    """Shard any array whose trailing axis is the longitude axis; everything
    else (scalars, per-species vectors, flat routing buffers, individual
    pools) is replicated."""
    arr = jnp.asarray(leaf)
    if arr.ndim >= 2 and arr.shape[-1] == n_lon:
        return P(*([None] * (arr.ndim - 1) + [axis_name]))
    return P()


def shard_state(state, mesh: Mesh, n_lon: int, axis_name: str = "lon"):
    """device_put the world-state pytree with lon-sharded 2-D+ fields."""
    def put(leaf):
        spec = _spec_for_leaf(leaf, n_lon, axis_name)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, state)


def shard_model_statics(model, mesh: Mesh, axis_name: str = "lon"):
    """Place the static field pytrees (grid metrics, topography maps, network
    arrays) with the same lon sharding so no resharding happens at trace."""
    n_lon = model.grid.n_lon

    def put(leaf):
        spec = _spec_for_leaf(leaf, n_lon, axis_name)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    import dataclasses as dc
    grid = jax.tree_util.tree_map(put, model.grid)
    static = jax.tree_util.tree_map(put, model.static)
    return dc.replace(model, grid=grid, static=static)
