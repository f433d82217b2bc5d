"""Train-step throughput bench: HICO-DET training images/sec/chip.

Companion to the repo-root eval bench (bench.py): runs the full jitted
train step — frozen DETR-R50 at the 800x1344 bucket + adapter-CLIP +
DINO forward, masked focal loss, backward through the CLIP adapters and
UPT head, AdamW update — at the reference's effective runtime config
(gen_feat; main_tip_finetune.py:444-445). The reference trains batch 4
per GPU with a synchronous per-image Python loop
(/root/reference/main_tip_finetune.py:374-388, train_hico.sh).

Prints one JSON line like bench.py. Run: python tools/bench_train.py
"""
import json
import sys
import time

import jax
import numpy as np

BATCH = 16


def main():
    sys.path.insert(0, ".")
    from hoigen_tpu.engine.hoi_model import HOIModelConfig, init_hoi_model, \
        make_eval_step, make_example_batch, make_optimizer, make_train_step
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.upt import UPTConfig

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    cfg = HOIModelConfig(upt=UPTConfig(num_classes=600, num_shot=2,
                                       cache_model="gen_feat",
                                       use_pallas_cache=True,
                                       generate_feature=True),
                         dtype="bfloat16")
    caches = random_caches(600, 2, num_objects=80)
    init = jax.jit(lambda r: init_hoi_model(r, cfg, caches))
    trainable, frozen, buffers = jax.block_until_ready(
        init(jax.random.PRNGKey(0)))
    log("bench_train: init done")

    batch = make_example_batch(cfg, batch_size=BATCH, detr_hw=(800, 1344))
    batch = jax.block_until_ready(jax.device_put(batch))
    opt = make_optimizer(lr_drop_step=10)(trainable)
    base_step = make_train_step(cfg, opt)
    opt_state = jax.jit(opt.init)(trainable)

    # chain steps through the evolving params (a real data dependency);
    # one host transfer at the end (same methodology as bench.py)
    @jax.jit
    def step(tr, os_, fz, bu, b, r):
        tr, os_, metrics = base_step(tr, os_, fz, bu, b, r)
        return tr, os_, metrics["loss"]

    rng = jax.random.PRNGKey(1)
    log("bench_train: compiling train step...")
    tr, os_, loss = step(trainable, opt_state, frozen, buffers, batch, rng)
    _ = np.asarray(loss)
    log("bench_train: timing...")

    K = 10

    def run_chain(tr, os_):
        t0 = time.perf_counter()
        loss = None
        for i in range(K):
            tr, os_, loss = step(tr, os_, frozen, buffers, batch,
                                 jax.random.fold_in(rng, i))
        np.asarray(loss)
        return (time.perf_counter() - t0) / K, tr, os_

    dts = []
    for _ in range(4):
        dt, tr, os_ = run_chain(tr, os_)
        dts.append(dt)
    ips = BATCH / float(np.median(dts))

    print(json.dumps({
        "metric": "hicodet_train_images_per_sec_per_chip",
        "value": round(float(ips), 2),
        "unit": "images/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
