"""Multi-host scaffolding: a real 2-process CPU cluster (2 local devices
each -> 4 global) runs the sampler, global-batch assembly, a jitted global
computation, and the host-metric allgather. Reference analog:
pocket/pocket/utils/distributed.py:17-143 + mp.spawn DDP."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_cpu_cluster():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and ".axon_site" not in p and p != REPO])
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=2"])
    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}

    # global stream over 10 samples, B=4, padded tail:
    # [0,1,2,3], [4,5,6,7], [8,9,9,9]; proc k owns rows [2k, 2k+2)
    assert by_pid[0]["local_rows"] == [[0, 1], [4, 5], [8, 9]]
    assert by_pid[1]["local_rows"] == [[2, 3], [6, 7], [9, 9]]
    assert by_pid[0]["n_reals"] == [4, 4, 2]

    # the jitted sum ran over the GLOBAL batch on both processes
    data = np.arange(40, dtype=np.float64).reshape(10, 4)
    w = np.arange(4, dtype=np.float64)
    expected = [float((data[idx] @ w).sum())
                for idx in ([0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 9, 9])]
    for pid in (0, 1):
        np.testing.assert_allclose(by_pid[pid]["results"], expected)

    # SGD over the cluster == single-process SGD over the global batches
    w0 = np.asarray([0.5, -0.25, 1.0, 2.0], np.float64)
    y = np.arange(10, dtype=np.float64)
    params = w0.copy()
    exp_losses = []
    for idx in ([0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 9, 9]):
        x, t = data[idx], y[list(idx)]
        err = x @ params - t
        exp_losses.append(float(np.mean(err ** 2)))
        params = params - 0.1 * (2.0 / len(idx)) * (x.T @ err)
    for pid in (0, 1):
        np.testing.assert_allclose(by_pid[pid]["losses"], exp_losses,
                                   rtol=1e-5)
        np.testing.assert_allclose(by_pid[pid]["final_params"], params,
                                   rtol=1e-5)


def test_single_process_degenerates():
    """Without a coordinator the API runs single-process: init no-ops,
    sampler returns full batches, gather adds the process axis."""
    import jax
    from hoigen_tpu.parallel import (global_batch_from_local,
                                     init_distributed, local_batch_indices,
                                     make_mesh, process_allgather)
    assert init_distributed() is False      # no COORDINATOR_ADDRESS set
    batches = local_batch_indices(10, 4, shuffle=False, pad_tail=True)
    assert [i.tolist() for i, _ in batches] == \
        [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 9, 9]]
    mesh = make_mesh(n_data=4)
    with mesh:
        g = global_batch_from_local(mesh, np.ones((4, 3), np.float32))
        assert g.shape == (4, 3)
        assert len(g.sharding.device_set) == 4
    got = process_allgather({"a": np.arange(3)})
    np.testing.assert_array_equal(got["a"], np.arange(3)[None])
