"""Worker process for tests/test_distributed.py: joins a 2-process CPU
cluster, checks the multi-host primitives, prints one JSON result line."""
import json
import sys

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hoigen_tpu.parallel import (global_batch_from_local, global_mesh,
                                     init_distributed, local_batch_indices,
                                     process_allgather)

    assert init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc and jax.process_index() == pid
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    mesh = global_mesh()                      # data axis = all devices
    assert mesh.shape["data"] == 2 * nproc

    # sampler: every process sees the same global stream, owns its rows
    batches = local_batch_indices(10, 4, shuffle=False, seed=0,
                                  pad_tail=True)
    local_rows = [idx.tolist() for idx, _ in batches]
    n_reals = [n for _, n in batches]

    # one jitted global computation per batch: sum over the GLOBAL batch —
    # includes rows this process never loaded, so a broken sharding story
    # cannot produce the right numbers
    data = np.arange(40, dtype=np.float32).reshape(10, 4)
    results = []
    with mesh:
        w = jax.device_put(np.arange(4, dtype=np.float32),
                           NamedSharding(mesh, P()))
        step = jax.jit(lambda x, ww: jnp.sum(x @ ww))
        for idx, _ in batches:
            gx = global_batch_from_local(mesh, data[idx])
            assert gx.shape == (4, 4), gx.shape
            results.append(float(step(gx, w)))

    # host-metric gather (eval meters): distinct payload per process
    g = process_allgather({"v": np.full(3, pid, np.int64),
                           "s": np.asarray(float(pid) + 0.5)})
    assert g["v"].shape == (nproc, 3)
    for k in range(nproc):
        assert (g["v"][k] == k).all()
        assert g["s"][k] == k + 0.5

    # ragged gather (per-process detection triplets of different lengths)
    from hoigen_tpu.parallel import process_allgather_ragged
    r = process_allgather_ragged(
        {"scores": np.arange(2 + pid, dtype=np.float64) + 10 * pid})
    exp = np.concatenate([np.arange(2 + k, dtype=np.float64) + 10 * k
                          for k in range(nproc)])
    np.testing.assert_array_equal(r["scores"], exp)

    # pickled-object gather (official-format caching: ragged per-image
    # result dicts) — distinct structure AND length per process
    from hoigen_tpu.parallel import gather_pyobj
    parts = gather_pyobj([{"pid": pid, "rows": np.arange(pid + 1)}] * (
        pid + 2))
    assert len(parts) == nproc
    for k, part in enumerate(parts):
        assert len(part) == k + 2 and part[0]["pid"] == k
        np.testing.assert_array_equal(part[0]["rows"], np.arange(k + 1))

    # a real optimizer step on the global mesh: grads implicitly psum over
    # rows held by BOTH processes
    import optax
    from hoigen_tpu.parallel import replicate
    w0 = np.asarray([0.5, -0.25, 1.0, 2.0], np.float32)
    y = np.arange(10, dtype=np.float32)
    opt = optax.sgd(0.1)
    with mesh:
        params = jax.device_put(jnp.asarray(w0), replicate(mesh))
        opt_state = jax.device_put(opt.init(params), replicate(mesh))

        @jax.jit
        def train_step(p, s, x, t):
            def loss_fn(pp):
                return jnp.mean((x @ pp - t) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(grads, s, p)
            return optax.apply_updates(p, up), s, loss

        losses, final = [], None
        for idx, _ in batches:
            gx = global_batch_from_local(mesh, data[idx])
            gy = global_batch_from_local(mesh, y[idx])
            params, opt_state, loss = train_step(params, opt_state, gx, gy)
            losses.append(float(loss))
        final = np.asarray(params).tolist()

    print(json.dumps({"pid": pid, "local_rows": local_rows,
                      "n_reals": n_reals, "results": results,
                      "losses": losses, "final_params": final}))


if __name__ == "__main__":
    main()
