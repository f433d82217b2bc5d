"""Multi-host (multi-process) scaffolding.

The reference scales across hosts with one-process-per-GPU DDP over NCCL
plus explicit host-side gathers for metrics
(/root/reference/main_tip_finetune.py:328-332,
/root/reference/pocket/pocket/utils/distributed.py:17-143: all_gather /
synchronize / reduce_dict). TPU-native replacement:

  * ``init_distributed`` wraps ``jax.distributed.initialize`` — after it,
    ``jax.devices()`` spans every host and one jitted SPMD program runs on
    all of them; there is no DDP wrapper and no rank-conditional code in
    the step function.
  * ``global_batch_from_local`` turns each process's local shard of a
    batch into one global jax.Array over the mesh's data axis
    (``jax.make_array_from_process_local_data``) — the DistributedSampler
    analog is just "each process loads indices i % num_processes == pid".
  * ``process_allgather`` gathers per-host numpy pytrees (eval meter
    inputs) across processes — the all_gather of
    pocket/utils/distributed.py:17-64, without pickle framing.

Collectives between chips on one host ride ICI; XLA routes cross-host
traffic over DCN. Shardings here only name the mesh axes — the layout
rules live in mesh.py.
"""
import os
from typing import Optional

import jax
import numpy as np

from .mesh import data_sharding, make_mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Initialize the JAX runtime for multi-process execution.

    With no arguments, reads COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID from the environment (the reference reads MASTER_ADDR/PORT,
    main_tip_finetune.py:328-332) and no-ops when absent — single-process
    runs need no setup. Returns True when a multi-process runtime is live.
    """
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    if jax.distributed.is_initialized():      # idempotent: main() may be
        return jax.process_count() > 1        # invoked more than once
    num_processes = int(num_processes or os.environ["NUM_PROCESSES"])
    process_id = int(process_id if process_id is not None
                     else os.environ["PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return num_processes > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_indices(n: int, global_batch_size: int, shuffle: bool,
                        seed: int = 0, pad_tail: bool = False,
                        return_global: bool = False):
    """Per-process slice of each global batch.

    Under multi-process JAX every process executes the SAME step on the
    SAME global batch, contributing its local shard — so the sampler is:
    all processes compute the identical global batch stream (same seed)
    and process k loads rows [k*B/p, (k+1)*B/p) of every batch. This is
    the DistributedSampler role (reference main_tip_finetune.py:374-380)
    transposed from "different batches per rank" to "different rows per
    process", which is what ``make_array_from_process_local_data`` expects.

    Returns (local_idx, global_n_real) pairs — or, with ``return_global``,
    (global_idx, local_idx, global_n_real) triples (callers that must
    compute batch-global properties, e.g. the padded image shape, need the
    rows every other process owns). Sequential ragged tails are always
    padded (a short global batch can't split evenly); callers drop the
    padding via ``global_n_real`` exactly as in the single-process
    pad_tail path.
    """
    from ..data.loader import batch_indices
    p, k = jax.process_count(), jax.process_index()
    assert global_batch_size % p == 0, (
        f"global batch {global_batch_size} must divide over {p} processes")
    batches = batch_indices(n, global_batch_size, shuffle, seed,
                            pad_tail=pad_tail or not shuffle)
    per = global_batch_size // p
    if return_global:
        return [(idx, idx[k * per:(k + 1) * per], n_real)
                for idx, n_real in batches]
    return [(idx[k * per:(k + 1) * per], n_real) for idx, n_real in batches]


def global_batch_from_local(mesh, local_tree):
    """Per-process local arrays -> one global jax.Array pytree sharded over
    the mesh's data axis. On a single process this degrades to the plain
    sharded device_put (mesh.shard_batch)."""
    def put(x):
        x = np.asarray(x)
        sharding = data_sharding(mesh, x.ndim)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(put, local_tree)


def process_allgather(tree):
    """Gather a numpy pytree from every process; returns stacked arrays
    with a leading process axis. Single-process: adds the axis and returns.

    Reference analog: pocket/pocket/utils/distributed.py:17-64 (pickle +
    dist.all_gather); here jax.experimental.multihost_utils runs the
    gather over the same fabric the training step uses.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(np.asarray,
                        multihost_utils.process_allgather(tree))


def process_allgather_ragged(tree):
    """Gather numpy arrays with per-process leading dims and concatenate
    along axis 0 (eval detections: each process scored a different number
    of pairs). Trailing shapes and dtypes must match across processes.
    Single-process: returns the tree unchanged."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils as mh

    def gather(a):
        a = np.asarray(a)
        ns = np.asarray(mh.process_allgather(
            np.asarray(a.shape[0], np.int32)))
        m = int(ns.max())
        padded = np.concatenate(
            [a, np.zeros((m - a.shape[0],) + a.shape[1:], a.dtype)], 0)
        g = np.asarray(mh.process_allgather(padded))     # (p, m, ...)
        return np.concatenate([g[i, :ns[i]] for i in range(len(ns))], 0)

    return jax.tree.map(gather, tree)


def gather_pyobj(obj):
    """All-gather one arbitrary pickleable object per process; returns a
    list with process_count entries in process order (single-process:
    ``[obj]``). Used by the official-format caching paths, whose per-image
    results are ragged dicts/object arrays rather than rectangular tensors.

    Reference analog: pocket/pocket/utils/distributed.py:103-143
    (all_gather of pickled byte tensors over NCCL); here the pickled bytes
    ride the same allgather fabric the eval metrics use.
    """
    import pickle
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mh
    a = np.frombuffer(pickle.dumps(obj, protocol=4), np.uint8)
    ns = np.asarray(mh.process_allgather(np.asarray(a.shape[0], np.int64)))
    m = int(ns.max())
    padded = np.concatenate([a, np.zeros(m - a.shape[0], np.uint8)])
    g = np.asarray(mh.process_allgather(padded))         # (p, m)
    return [pickle.loads(g[i, :ns[i]].tobytes()) for i in range(len(ns))]


def host_local_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded global jax.Array, in batch
    order. On fully-addressable arrays this is just np.asarray."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def local_n_real(global_n_real: int, global_batch_size: int) -> int:
    """How many of this process's rows are non-padding, given the global
    count (padding lives at the end of the global batch)."""
    per = global_batch_size // jax.process_count()
    lo = jax.process_index() * per
    return int(np.clip(global_n_real - lo, 0, per))


def global_mesh(n_model: int = 1):
    """Mesh over every device on every host (data x model)."""
    return make_mesh(n_model=n_model, devices=jax.devices())
