"""ResNet-50 tower microbenchmark: layout / fusion experiments.

The round-2 budget put the frozen R50 at ~40ms of the 58ms eval step at
batch 16 (800x1344, bf16) against a ~26ms HBM roofline (~10GB traffic at
the measured ~372 GB/s). This tool times tower variants in isolation so
layout experiments (VERDICT r2 "what's weak" #1) are attributable:

  nchw      — the production path (models/detr/resnet.py)
  nhwc      — same math with NHWC activations + HWIO kernels end-to-end
              (XLA TPU's native conv layout; avoids boundary transposes)

  python tools/bench_resnet.py [--batch 16] [--hw 800 1344] [--reps 20]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--variants", nargs="*",
                    default=["nchw", "nhwc"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hoigen_tpu.models.detr.resnet import init_resnet50_params, \
        resnet50_forward

    def log(m):
        print(m, file=sys.stderr, flush=True)

    params = init_resnet50_params(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    h, w = args.hw
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, 3, h, w)),
        jnp.bfloat16)
    x = jax.device_put(x)

    def timeit(fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        s = np.asarray(jnp.sum(out.astype(jnp.float32)))  # force
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for i in range(args.reps):
            o = f(*a)
            c = c + jnp.sum(o.astype(jnp.float32))
        np.asarray(c)
        return (time.perf_counter() - t0) / args.reps, s

    results = {}
    if "nchw" in args.variants:
        dt, chk = timeit(lambda p, v: resnet50_forward(p, v), params, x)
        results["nchw"] = (dt, chk)
        log(f"nchw: {dt * 1e3:.2f} ms  (checksum {chk:.1f})")

    if "nhwc" in args.variants:
        from hoigen_tpu.models.detr.resnet import resnet50_forward_nhwc
        xt = jnp.transpose(x, (0, 2, 3, 1))
        dt, chk = timeit(
            lambda p, v: resnet50_forward_nhwc(p, v), params, xt)
        results["nhwc"] = (dt, chk)
        log(f"nhwc: {dt * 1e3:.2f} ms  (checksum {chk:.1f})")

    for k, (dt, chk) in results.items():
        print(f"{k}: {dt * 1e3:.2f} ms  {args.batch / dt:.1f} img/s "
              f"(checksum {chk:.1f})")


if __name__ == "__main__":
    main()
