"""Fused bottleneck-chain kernel vs XLA, per residual layer, on-chip.

Times the stride-1 tail chain of each R50 layer (the part
ops/fused_resnet.py fuses) against the same chain run block-by-block
through models/detr/resnet.py::_bottleneck_nhwc under one jit.

  python tools/bench_fused_chain.py [--batch 16] [--hw 800 1344]
         [--layers 1 2 3 4] [--row-tile 8] [--check]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (C2..C5) plane geometry for 800x1344 inputs: /32 etc. handled below
LAYER_CHANNELS = {1: (256, 64), 2: (512, 128), 3: (1024, 256), 4: (2048, 512)}
LAYER_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}
LAYER_STRIDE_DOWN = {1: 4, 2: 8, 3: 16, 4: 32}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--layers", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--row-tile", type=int, default=8)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--check", action="store_true",
                    help="compare numerics (f32) before timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hoigen_tpu.models.detr.resnet import _bottleneck_nhwc
    from hoigen_tpu.ops.fused_resnet import fused_bottleneck_chain

    rng = np.random.default_rng(0)

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def make_block(C, M):
        def cb(o, i, k):
            return {
                "w": jnp.asarray(
                    rng.normal(size=(o, i, k, k), scale=(i * k * k) ** -0.5),
                    jnp.float32),
                "scale": jnp.asarray(rng.normal(size=(o,), scale=0.1) + 1.0,
                                     jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(o,), scale=0.1),
                                    jnp.float32),
            }
        return {"conv1": cb(M, C, 1), "conv2": cb(M, M, 3),
                "conv3": cb(C, M, 1)}

    def timeit(f, *a):
        o = f(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = f(*a)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / args.reps

    H0, W0 = args.hw
    for li in args.layers:
        C, M = LAYER_CHANNELS[li]
        K = LAYER_BLOCKS[li] - 1
        s = LAYER_STRIDE_DOWN[li]
        H, W = -(-H0 // s), -(-W0 // s)
        blocks = [make_block(C, M) for _ in range(K)]
        x = jnp.asarray(rng.normal(size=(args.batch, H, W, C)), jnp.bfloat16)
        x = jax.device_put(x)

        def xla_chain(v, bs=tuple(range(K))):
            for k in bs:
                v = _bottleneck_nhwc(v, blocks[k], 1)
            return v

        if args.check:
            xf = x.astype(jnp.float32)
            a = np.asarray(jax.jit(xla_chain)(xf))
            b = np.asarray(jax.jit(
                lambda v: fused_bottleneck_chain(v, blocks, args.row_tile))(xf))
            d = np.abs(a - b)
            rel = d.max() / (np.abs(a).max() + 1e-9)
            log(f"L{li}: f32 maxdiff {d.max():.3e} rel {rel:.3e}")

        t_x = timeit(jax.jit(xla_chain), x)
        t_f = timeit(jax.jit(
            lambda v: fused_bottleneck_chain(v, blocks, args.row_tile)), x)
        gb = 2 * x.size * x.dtype.itemsize / 1e9
        flops = 2 * K * args.batch * H * W * (2 * C * M + 9 * M * M)
        print(f"L{li} (K={K}, {H}x{W}x{C}, M={M}): "
              f"xla {t_x*1e3:.2f} ms | fused {t_f*1e3:.2f} ms "
              f"({t_x/t_f:.2f}x) | dma {gb/0.372:.2f} ms "
              f"mxu {flops/103e12*1e3:.2f} ms")


if __name__ == "__main__":
    main()
