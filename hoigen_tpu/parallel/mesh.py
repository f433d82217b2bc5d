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


# Cache-branch leaves and the axis that spans the (class x num_shot) cache
# rows. With the rows sharded over 'model', each device scores pairs
# against its cache slice and the (phi @ one_hots) contraction becomes a
# psum that GSPMD inserts automatically — the scaling-book recipe: pick a
# mesh, annotate the shardings, let XLA place the collectives.
_CACHE_ROW_LEAVES = {
    # trainable: (rows, 512) weights + (rows,) biases
    "adapter_H_w": 0, "adapter_H_b": 0, "adapter_O_w": 0, "adapter_O_b": 0,
    "adapter_U_w": 0, "adapter_U_b": 0, "adapter_HO_w": 0, "adapter_HO_b": 0,
    # global/DINO caches: keys are (feat_dim, rows), biases/values rows-first
    "global_cache": 1, "global_cache_bias": 0,
    "dino_cache": 1, "dino_cache_bias": 0,
    # buffers: (rows, C) value matrices
    "one_hots_H": 0, "one_hots_O": 0, "one_hots_U": 0, "one_hots_HO": 0,
    "global_values": 0, "dino_values": 0,
}


def shard_cache_rows(mesh: Mesh, tree):
    """Tensor-shard the cache matmuls over the 'model' axis.

    Returns ``tree`` with every known cache leaf whose row axis divides the
    model-axis size placed with that axis sharded; everything else is
    replicated. A no-op (pure replication) on a 1-sized model axis.
    """
    n_model = mesh.shape["model"]

    def place(path, x):
        if x is None:
            return x
        name = next((getattr(k, "key") for k in reversed(path)
                     if hasattr(k, "key")), None)
        axis = _CACHE_ROW_LEAVES.get(name)
        if (n_model > 1 and axis is not None and np.ndim(x) > axis
                and x.shape[axis] % n_model == 0):
            spec = [None] * np.ndim(x)
            spec[axis] = "model"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, tree)
