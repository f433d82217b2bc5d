"""Fine-tune the DETR detector on HICO-DET boxes (offline detector prep).

Equivalent of /root/reference/hicodet/detections/main_detr.py:204 (the DDP
loop that adapts the COCO-pretrained DETR to HICO-DET's 80 classes): device
computes matching costs and losses under jit; the Hungarian assignment runs
on host between the two (the standard JAX DETR recipe).

  python -m hoigen_tpu.cli.train_detr --data-root ./datasets --epochs 10
"""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.factory import DataFactory, collate_batch
from ..engine.checkpoint import save_checkpoint
from ..models.detr import DETRConfig, detr_forward, init_detr_params
from ..ops.matching import detr_matching_cost, detr_set_criterion, \
    hungarian_assign


def detr_train_step_fns(cfg: DETRConfig, optimizer):
    from ..ops.pixels import device_normalize

    @jax.jit
    def forward_and_cost(params, images, mask, gt_labels, gt_boxes):
        out = detr_forward(params, device_normalize(images), mask, cfg)
        costs = jax.vmap(
            lambda lg, bx, gl, gb: detr_matching_cost(lg, bx, gl, gb))(
            out["pred_logits"], out["pred_boxes"], gt_labels, gt_boxes)
        return out, costs

    @jax.jit
    def loss_and_update(params, opt_state, images, mask, gt_labels, gt_boxes,
                        gt_valid, rows, cols, mvalid):
        def loss_fn(p):
            out = detr_forward(p, device_normalize(images), mask, cfg)
            losses = detr_set_criterion(
                out["pred_logits"], out["pred_boxes"], gt_labels, gt_boxes,
                gt_valid, rows, cols, mvalid, cfg.num_classes - 1)
            return losses["total"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return forward_and_cost, loss_and_update


def run_epoch(params, opt_state, factory, cfg, fns, batch_size, max_gt,
              log=print, log_every=50):
    forward_and_cost, loss_and_update = fns
    rng = np.random.default_rng(0)
    order = rng.permutation(len(factory))
    losses_seen = []
    for it, lo in enumerate(range(0, len(order) - batch_size + 1,
                                  batch_size)):
        samples = [factory[int(i)] for i in order[lo:lo + batch_size]]
        b = collate_batch(samples, max_gt)
        gt_labels = b.objects.astype(np.int32)   # detector learns objects
        _, costs = forward_and_cost(params, b.images, b.image_mask,
                                    jnp.asarray(gt_labels),
                                    jnp.asarray(b.boxes_o))
        costs = np.asarray(costs)
        rows = np.zeros((batch_size, max_gt), np.int32)
        cols = np.zeros((batch_size, max_gt), np.int32)
        mvalid = np.zeros((batch_size, max_gt), bool)
        for i in range(batch_size):
            n = int(b.gt_valid[i].sum())
            r, c = hungarian_assign(costs[i], n)
            rows[i, :len(r)] = r
            cols[i, :len(c)] = c
            mvalid[i, :len(r)] = True
        params, opt_state, losses = loss_and_update(
            params, opt_state, b.images, b.image_mask,
            jnp.asarray(gt_labels), jnp.asarray(b.boxes_o),
            jnp.asarray(b.gt_valid), jnp.asarray(rows), jnp.asarray(cols),
            jnp.asarray(mvalid))
        losses_seen.append(float(losses["total"]))
        if (it + 1) % log_every == 0:
            log(f"iter {it + 1}: loss {np.mean(losses_seen[-log_every:]):.4f}")
    return params, opt_state, float(np.mean(losses_seen)) if losses_seen \
        else float("nan")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--dataset", default="hicodet")
    p.add_argument("--partition", default="train2015")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-backbone", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--pretrained", default="")
    p.add_argument("--output-dir", default="outputs/detr")
    args = p.parse_args(argv)

    # fused encoder attention is inference-only (no VJP); training
    # differentiates through the encoder, so keep the XLA path
    cfg = DETRConfig(num_classes=81, fused_encoder_attention=False)
    if args.pretrained and os.path.exists(args.pretrained):
        import dataclasses
        import torch
        from ..models.detr.convert import torch_detr_state_dict_to_params
        ckpt = torch.load(args.pretrained, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("model_state_dict", ckpt))
        params, cfg = torch_detr_state_dict_to_params(sd)
        cfg = dataclasses.replace(cfg, fused_encoder_attention=False)
        print(f"[load] {args.pretrained}")
    else:
        params = init_detr_params(jax.random.PRNGKey(0), cfg)
        print("[warn] training DETR from scratch (no --pretrained)")

    factory = DataFactory(args.dataset, args.partition, args.data_root,
                          training=True, max_gt_pairs=args.max_gt)
    # two LR groups: backbone vs the rest (reference main_detr lr_backbone)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, x: "backbone"
        if any(getattr(k, "key", None) == "backbone" for k in path)
        else "rest", params)
    optimizer = optax.multi_transform(
        {"backbone": optax.adamw(args.lr_backbone,
                                 weight_decay=args.weight_decay),
         "rest": optax.adamw(args.lr, weight_decay=args.weight_decay)},
        labels)
    opt_state = optimizer.init(params)
    fns = detr_train_step_fns(cfg, optimizer)
    for epoch in range(args.epochs):
        params, opt_state, avg = run_epoch(params, opt_state, factory, cfg,
                                           fns, args.batch_size, args.max_gt)
        print(f"[epoch {epoch + 1}/{args.epochs}] loss {avg:.4f}")
        save_checkpoint(args.output_dir, epoch + 1, {"params": params})


if __name__ == "__main__":
    main()
