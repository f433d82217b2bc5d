"""Device mesh & sharding helpers.

The reference scales with one-process-per-GPU DDP + NCCL
(/root/reference/main_tip_finetune.py:328-332, pocket distributed engine).
TPU-native replacement: a single SPMD program over a ``jax.sharding.Mesh``
with a ``data`` axis — batches shard over it, parameters replicate, and
XLA inserts the gradient psum; the focal-loss normalizer n_p needs no
explicit barrier+all_reduce (upt...py:1337-1343) because global sums under
pjit are already global.

A ``model`` axis is exposed for tensor-sharding the cache matmuls
(pairs x 512 @ 512 x C*shot) if ever needed; all current models fit
per-chip so the default mesh is 1 x data.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in a batch pytree with its batch axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree)
