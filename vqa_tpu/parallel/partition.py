"""Tensor-parallel parameter sharding over the mesh 'model' axis
(SURVEY.md section 2.3: the reference has no TP — model dims are small —
but the mesh keeps a 'model' axis as the design seam; this module makes the
seam real).

Heuristic GSPMD-style rule: 2-D parameters above a size threshold shard on
their largest divisible dimension over 'model'; everything else replicates.
Semantics are unchanged under any sharding — XLA inserts the all-gathers /
reduce-scatters — so this is purely a memory/throughput layout choice, and
optimizer state inherits the same layout leaf-for-leaf.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_sharding(leaf, mesh: Mesh, min_size: int) -> NamedSharding:
    n_model = mesh.shape.get("model", 1)
    if (
        n_model > 1
        and hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and leaf.size >= min_size
    ):
        axis = int(np.argmax(leaf.shape))
        if leaf.shape[axis] % n_model == 0:
            parts = [None, None]
            parts[axis] = "model"
            return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def tp_shardings(tree, mesh: Mesh, min_size: int = 1 << 16):
    """A sharding pytree matching ``tree`` (params, or a whole TrainState —
    adam moments mirror their parameters and land on the same layout)."""
    return jax.tree.map(lambda leaf: _leaf_sharding(leaf, mesh, min_size), tree)


def shard_state_tp(state, mesh: Mesh, min_size: int = 1 << 16):
    """Place a TrainState: big 2-D leaves sharded over 'model', rest replicated."""
    return jax.device_put(state, tp_shardings(state, mesh, min_size))
