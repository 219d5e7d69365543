"""Device meshes + data-parallel sharding for training and generation.

The reference has no parallelism (single Keras GPU process, SURVEY.md §2
bottom rows).  TPU-native scaling plan: a 1-D ``data`` mesh over all chips;
batches (label maps, GMM params, real images) are sharded over ``data`` while
parameters/optimizer state are replicated — XLA inserts the psum gradient
all-reduce over ICI.  Multi-host: each process feeds its addressable shard
via ``host_local_batch_to_global``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with its leading axis sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated on the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_local_batch_to_global(mesh: Mesh, tree):
    """Multi-host: assemble a global sharded batch from this process's local
    shard (single-host: identical to shard_batch)."""
    if jax.process_count() == 1:
        return shard_batch(mesh, tree)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P("data"))


def host_local_stacked_to_global(mesh: Mesh, tree):
    """Like host_local_batch_to_global for K-stacked batches (K, B, ...):
    the leading scan axis stays unsharded, the batch axis shards over
    ``data`` (feed for the scanned critic inner loop)."""
    spec = P(None, "data")
    if jax.process_count() == 1:
        sh = NamedSharding(mesh, spec)
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, spec)
