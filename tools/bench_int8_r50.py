"""Micro-benchmark: can int8 beat bf16 on the frozen R50 tower's
bandwidth-bound layers? (round-5 VERDICT item 3).

STATUS round-2 budget: the R50 tower runs ~40 ms at batch 16 against a
~26 ms HBM roofline — activations dominate the traffic (weights are only
~50 MB bf16). Candidate levers, measured standalone here before any
production wiring:

  bf16      — the production layout (baseline)
  int8conv  — int8 MXU convs: quantized weights AND activations, int32
              accumulation, static scales folded into the BN epilogue
              (requantize fused: conv reads 1 B/elem and writes 1 B/elem)
  int8store — bf16 MXU convs, but inter-block activations STORED int8
              (dequant at the consumer; tests whether XLA fuses the
              convert into the conv operand or pays an extra pass)

Usage (on the chip):
    python tools/bench_int8_r50.py [--batch 16] [--hw 800 1344] [--k 20]
Measures layer1 (the bandwidth-bound stride-4 plane) and the full tower.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(fn, args, k, chains=3):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    # force one host transfer per chain (axon relay acks optimistically) —
    # of a device-side SCALAR slice, not the full output (a 551 MB
    # activation through the ~60 MB/s tunnel would dominate the timing)
    def probe(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.ravel()[:1].astype(jnp.float32))

    def chain():
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jfn(*args)
        probe(o)
        return (time.perf_counter() - t0) / k
    dts = [chain() for _ in range(chains)]
    return float(np.median(dts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hoigen_tpu.models.detr.resnet import (init_resnet50_params,
                                               resnet50_forward_nhwc,
                                               _bottleneck_nhwc)

    H, W = args.hw[0] // 4, args.hw[1] // 4      # layer1 plane (stride 4)
    B = args.batch
    rng = np.random.default_rng(0)
    params = init_resnet50_params(jax.random.PRNGKey(0))
    l1 = params["layers"][0]                      # 3 bottlenecks, C=256 M=64

    x = jnp.asarray(rng.normal(size=(B, H, W, 256)) * 0.5,
                    jnp.bfloat16)
    print(f"layer1 tail plane: ({B}, {H}, {W}, 256) "
          f"[{B*H*W*256*2/1e6:.0f} MB bf16]", file=sys.stderr)

    # ---- A: bf16 production blocks (tail = blocks 1..2, stride 1) ----
    def tail_bf16(x_):
        for bp in l1[1:]:
            x_ = _bottleneck_nhwc(x_, bp, 1)
        return x_

    # ---- B: int8 convs with static scales --------------------------------
    # weights: per-output-channel symmetric int8; activations: per-tensor
    # symmetric int8 with a static scale (frozen tower -> calibratable).
    # BN scale/bias and all dequant factors fold into one f32 epilogue.
    def _qw(w_oihw):                              # -> (w_q HWIO int8, scale)
        w = np.transpose(np.asarray(w_oihw, np.float32), (2, 3, 1, 0))
        s = np.abs(w).max(axis=(0, 1, 2), keepdims=True) / 127.0
        s = np.maximum(s, 1e-8)
        return (jnp.asarray(np.rint(w / s).clip(-127, 127), jnp.int8),
                jnp.asarray(s[0, 0, 0], jnp.float32))

    DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv_i8(xq, wq, stride, pad):
        return jax.lax.conv_general_dilated(
            xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=DN, preferred_element_type=jnp.int32)

    def make_tail_int8(blocks, a_scale=0.05):
        """a_scale: static per-tensor activation scale (placeholder
        calibration; timing is scale-independent)."""
        prep = []
        for bp in blocks:
            d = {}
            for name in ("conv1", "conv2", "conv3"):
                wq, ws = _qw(bp[name]["w"])
                d[name] = (wq, ws, jnp.asarray(bp[name]["scale"],
                                               jnp.float32),
                           jnp.asarray(bp[name]["bias"], jnp.float32))
            prep.append(d)

        inv_a = 1.0 / a_scale

        def q(x_):                                # bf16 -> int8
            return jnp.clip(jnp.round(x_.astype(jnp.float32) * inv_a),
                            -127, 127).astype(jnp.int8)

        def run(x_):
            xq = q(x_)
            for d in prep:
                wq, ws, bs, bb = d["conv1"]
                y = conv_i8(xq, wq, 1, 0).astype(jnp.float32)
                y = y * (ws * bs * a_scale) + bb
                yq = q(jnp.maximum(y, 0.0))
                wq, ws, bs, bb = d["conv2"]
                y = conv_i8(yq, wq, 1, 1).astype(jnp.float32)
                y = y * (ws * bs * a_scale) + bb
                yq = q(jnp.maximum(y, 0.0))
                wq, ws, bs, bb = d["conv3"]
                y = conv_i8(yq, wq, 1, 0).astype(jnp.float32)
                y = y * (ws * bs * a_scale) + bb
                xq = q(jnp.maximum(y + xq.astype(jnp.float32) * a_scale,
                                   0.0))
            return xq
        return run

    # ---- C: bf16 convs, int8-stored inter-block activations --------------
    def make_tail_int8store(blocks, a_scale=0.05):
        inv_a = 1.0 / a_scale

        def run(x_):
            xq = jnp.clip(jnp.round(x_.astype(jnp.float32) * inv_a),
                          -127, 127).astype(jnp.int8)
            for bp in blocks:
                xb = (xq.astype(jnp.bfloat16)
                      * jnp.bfloat16(a_scale))      # dequant at consumer
                y = _bottleneck_nhwc(xb, bp, 1)
                xq = jnp.clip(jnp.round(y.astype(jnp.float32) * inv_a),
                              -127, 127).astype(jnp.int8)
            return xq
        return run

    results = {}
    results["layer1_bf16"] = _time_fn(tail_bf16, (x,), args.k)
    print(f"layer1 bf16:      {results['layer1_bf16']*1e3:8.2f} ms")
    try:
        results["layer1_int8conv"] = _time_fn(
            make_tail_int8(l1[1:]), (x,), args.k)
        print(f"layer1 int8conv:  {results['layer1_int8conv']*1e3:8.2f} ms")
    except Exception as e:
        print(f"layer1 int8conv:  FAILED ({type(e).__name__}: "
              f"{str(e)[:300]})")
    try:
        results["layer1_int8store"] = _time_fn(
            make_tail_int8store(l1[1:]), (x,), args.k)
        print(f"layer1 int8store: {results['layer1_int8store']*1e3:8.2f} ms")
    except Exception as e:
        print(f"layer1 int8store: FAILED ({type(e).__name__}: "
              f"{str(e)[:300]})")

    # full tower bf16 for context
    xin = jnp.asarray(rng.normal(size=(B, args.hw[0], args.hw[1], 3)),
                      jnp.bfloat16)
    results["tower_bf16"] = _time_fn(
        functools.partial(resnet50_forward_nhwc, params), (xin,),
        max(args.k // 2, 5))
    print(f"tower bf16:       {results['tower_bf16']*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
