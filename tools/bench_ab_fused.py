"""A/B the full eval step with the fused R50 layer1 tail on vs off.

Same timing methodology as bench.py (carry-chained steps, one host
transfer), both variants in one process so the relay/compile environment
is shared.  Usage: python tools/bench_ab_fused.py [--batch 16] [--k 10]
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
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--stream-ab", action="store_true",
                    help="A/B device-derived vs host-shipped CLIP stream "
                         "instead of the fused-tail A/B")
    ap.add_argument("--mode", default=None,
                    choices=["tail", "stream", "clipattn", "detrattn",
                             "layout"],
                    help="which A/B to run (overrides --stream-ab)")
    args = ap.parse_args()

    import jax
    from hoigen_tpu.engine.hoi_model import HOIModelConfig, init_hoi_model, \
        make_eval_step, make_example_batch
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.detr import DETRConfig
    from hoigen_tpu.models.upt import UPTConfig

    def log(m):
        print(m, file=sys.stderr, flush=True)

    caches = random_caches(600, 2, num_objects=80)

    def measure(tail, dev_stream=True, clip_fused=True, detr_fused=True,
                nchw=False):
        import dataclasses
        from hoigen_tpu.models.clip.config import VIT_B16
        cfg = HOIModelConfig(upt=UPTConfig(num_classes=600, num_shot=2,
                                           cache_model="gen_feat",
                                           use_pallas_cache=True),
                             detr=DETRConfig(
                                 fused_resnet_tail=tail,
                                 fused_encoder_attention=detr_fused,
                                 nchw_backbone=nchw),
                             clip=dataclasses.replace(
                                 VIT_B16, fused_attention=clip_fused),
                             dtype="bfloat16")
        init = jax.jit(lambda r: init_hoi_model(r, cfg, caches))
        trainable, frozen, buffers = jax.block_until_ready(
            init(jax.random.PRNGKey(0)))
        batch = make_example_batch(cfg, batch_size=args.batch,
                                   detr_hw=(800, 1344),
                                   device_clip_stream=dev_stream)
        batch = jax.block_until_ready(jax.device_put(batch))
        base_step = make_eval_step(cfg)

        carry_key = "image_sizes" if "image_sizes" in batch else "clip_sizes"

        @jax.jit
        def step(tr, fz, bf, b, c):
            b = dict(b)
            b[carry_key] = b[carry_key] + c
            out = base_step(tr, fz, bf, b)
            return out["detection_scores"].sum()

        carry = step(trainable, frozen, buffers, batch, np.float32(0))
        _ = np.asarray(carry)

        def run_chain(c0):
            c = c0 * 1e-9
            t0 = time.perf_counter()
            for _ in range(args.k):
                c = step(trainable, frozen, buffers, batch, c)
            np.asarray(c)
            return (time.perf_counter() - t0) / args.k

        dts = [run_chain(np.float32(i)) for i in range(args.chains)]
        return [args.batch / d for d in dts]

    mode = args.mode or ("stream" if args.stream_ab else "tail")
    variants = {
        "tail": [("tail=() dev", {}), ("tail=(0,) dev", {"tail": (0,)}),
                 ("tail=(0,1) dev", {"tail": (0, 1)})],
        "stream": [("dev stream", {}), ("host stream", {"dev_stream": False})],
        "clipattn": [("clip fused", {}),
                     ("clip xla", {"clip_fused": False})],
        "detrattn": [("detr fused", {}),
                     ("detr xla", {"detr_fused": False})],
        "layout": [("nhwc towers", {}), ("nchw towers", {"nchw": True})],
    }[mode]
    for name, kw in variants:
        kw = {"tail": (), "dev_stream": True} | kw
        ips = measure(kw.pop("tail"), **kw)
        log(f"{name}: " + " ".join(f"{v:.1f}" for v in ips)
            + f"  median {np.median(ips):.1f} img/s")


if __name__ == "__main__":
    main()
