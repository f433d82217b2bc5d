"""Fine-tune the DETR detector on HICO-DET boxes (offline detector prep).

Equivalent of /root/reference/hicodet/detections/main_detr.py:204 (the DDP
loop that adapts the COCO-pretrained DETR to HICO-DET's 80 classes): device
computes matching costs and losses under jit; the Hungarian assignment runs
on host between the two (the standard JAX DETR recipe).

Auxiliary decoder-layer losses follow the reference SetCriterion
(/root/reference/detr/models/detr.py:222-247): every decoder layer gets its
own Hungarian matching and the same class/box losses, all summed.

  python -m hoigen_tpu.cli.train_detr --data-root ./datasets --epochs 10
"""
import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.factory import DataFactory, collate_batch
from ..engine.checkpoint import latest_checkpoint, restore_checkpoint, \
    save_checkpoint
from ..models.detr import DETRConfig, detr_forward, init_detr_params
from ..ops.matching import detr_matching_cost, detr_set_criterion, \
    hungarian_assign


def detr_train_step_fns(cfg: DETRConfig, optimizer, coefs, aux_loss=True):
    """coefs: dict with set_cost_class/bbox/giou, eos_coef,
    bbox_loss_coef, giou_loss_coef."""
    from ..ops.pixels import device_normalize

    cost_fn = functools.partial(detr_matching_cost,
                                cost_class=coefs["set_cost_class"],
                                cost_bbox=coefs["set_cost_bbox"],
                                cost_giou=coefs["set_cost_giou"])

    @jax.jit
    def forward_and_cost(params, images, mask, gt_labels, gt_boxes):
        out = detr_forward(params, device_normalize(images, pad_mask=mask),
                           mask, cfg)
        layers = ((out["aux_logits"], out["aux_boxes"]) if aux_loss else
                  (out["pred_logits"][None], out["pred_boxes"][None]))
        # (L, B, Q, G) costs: each decoder layer is matched separately
        # (reference SetCriterion aux_outputs loop, detr.py:240-247)
        costs = jax.vmap(jax.vmap(cost_fn))(
            layers[0], layers[1],
            jnp.broadcast_to(gt_labels, (layers[0].shape[0],
                                         *gt_labels.shape)),
            jnp.broadcast_to(gt_boxes, (layers[0].shape[0],
                                        *gt_boxes.shape)))
        return out, costs

    crit = functools.partial(detr_set_criterion,
                             eos_coef=coefs["eos_coef"],
                             bbox_loss_coef=coefs["bbox_loss_coef"],
                             giou_loss_coef=coefs["giou_loss_coef"])

    @jax.jit
    def loss_and_update(params, opt_state, images, mask, gt_labels, gt_boxes,
                        gt_valid, rows, cols, mvalid):
        """rows/cols/mvalid: (L, B, M) per-layer host matches."""
        def loss_fn(p):
            out = detr_forward(p, device_normalize(images, pad_mask=mask),
                               mask, cfg)
            layers = ((out["aux_logits"], out["aux_boxes"]) if aux_loss else
                      (out["pred_logits"][None], out["pred_boxes"][None]))

            def layer_loss(lg, bx, r, c, mv):
                return crit(lg, bx, gt_labels, gt_boxes, gt_valid, r, c, mv,
                            cfg.num_classes - 1)["total"]

            totals = jax.vmap(layer_loss)(layers[0], layers[1],
                                          rows, cols, mvalid)
            return totals.sum(), {"total": totals.sum(),
                                  "final": totals[-1]}

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return forward_and_cost, loss_and_update


def run_epoch(params, opt_state, factory, cfg, fns, batch_size, max_gt,
              log=print, log_every=50, seed=0):
    forward_and_cost, loss_and_update = fns
    rng = np.random.default_rng(seed)
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
        costs = np.asarray(costs)                # (L, B, Q, G)
        n_layers = costs.shape[0]
        rows = np.zeros((n_layers, batch_size, max_gt), np.int32)
        cols = np.zeros((n_layers, batch_size, max_gt), np.int32)
        mvalid = np.zeros((n_layers, batch_size, max_gt), bool)
        for li in range(n_layers):
            for i in range(batch_size):
                n = int(b.gt_valid[i].sum())
                r, c = hungarian_assign(costs[li, i], n)
                rows[li, i, :len(r)] = r
                cols[li, i, :len(c)] = c
                mvalid[li, i, :len(r)] = True
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
    p.add_argument("--lr-drop", type=int, default=200)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--clip-max-norm", type=float, default=0.1)
    p.add_argument("--set-cost-class", type=float, default=1.0)
    p.add_argument("--set-cost-bbox", type=float, default=5.0)
    p.add_argument("--set-cost-giou", type=float, default=2.0)
    p.add_argument("--bbox-loss-coef", type=float, default=5.0)
    p.add_argument("--giou-loss-coef", type=float, default=2.0)
    p.add_argument("--eos-coef", type=float, default=0.1)
    p.add_argument("--no-aux-loss", action="store_true",
                   help="train on the final decoder layer only")
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--pretrained", default="")
    p.add_argument("--resume", default="",
                   help="checkpoint dir to continue from")
    p.add_argument("--output-dir", default="outputs/detr")
    args = p.parse_args(argv)

    # fused encoder attention is inference-only (no VJP); training
    # differentiates through the encoder, so keep the XLA path
    cfg = DETRConfig(num_classes=81, fused_encoder_attention=False,
                     fused_resnet_tail=(), remat_backbone=True)
    if args.pretrained and os.path.exists(args.pretrained):
        import dataclasses
        import torch
        from ..models.detr.convert import torch_detr_state_dict_to_params
        ckpt = torch.load(args.pretrained, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("model_state_dict", ckpt))
        params, cfg = torch_detr_state_dict_to_params(sd)
        cfg = dataclasses.replace(cfg, fused_encoder_attention=False,
                                  fused_resnet_tail=(),
                                  remat_backbone=True)
        print(f"[load] {args.pretrained}")
    else:
        params = init_detr_params(jax.random.PRNGKey(args.seed), cfg)
        print("[warn] training DETR from scratch (no --pretrained)")

    factory = DataFactory(args.dataset, args.partition, args.data_root,
                          training=True, max_gt_pairs=args.max_gt)
    # two LR groups: backbone vs the rest (reference main_detr lr_backbone)
    # + StepLR drop and grad clip (main_detr.py:317-319)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, x: "backbone"
        if any(getattr(k, "key", None) == "backbone" for k in path)
        else "rest", params)

    # the reference StepLR(lr_drop) counts EPOCHS (main_detr.py:317-319);
    # optax schedules count optimizer updates, so convert via steps/epoch
    steps_per_epoch = max(len(factory) // args.batch_size, 1)

    def group(base):
        sched = optax.piecewise_constant_schedule(
            base, {args.lr_drop * steps_per_epoch: 0.1})
        return optax.chain(optax.clip_by_global_norm(args.clip_max_norm),
                           optax.adamw(sched,
                                       weight_decay=args.weight_decay))

    optimizer = optax.multi_transform(
        {"backbone": group(args.lr_backbone), "rest": group(args.lr)},
        labels)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if args.resume:
        path = latest_checkpoint(args.resume) or args.resume
        state = restore_checkpoint(
            path, {"params": params, "opt_state": opt_state, "epoch": 0},
            partial=True)
        params = state["params"]
        if state.get("opt_state") is not None:
            opt_state = state["opt_state"]
        start_epoch = int(state.get("epoch") or 0)
        print(f"[load] resumed from {path} (epoch {start_epoch})")

    coefs = {k: getattr(args, k) for k in
             ("set_cost_class", "set_cost_bbox", "set_cost_giou",
              "eos_coef", "bbox_loss_coef", "giou_loss_coef")}
    fns = detr_train_step_fns(cfg, optimizer, coefs,
                              aux_loss=not args.no_aux_loss)
    for epoch in range(start_epoch, args.epochs):
        params, opt_state, avg = run_epoch(params, opt_state, factory, cfg,
                                           fns, args.batch_size, args.max_gt,
                                           seed=args.seed + epoch)
        print(f"[epoch {epoch + 1}/{args.epochs}] loss {avg:.4f}")
        save_checkpoint(args.output_dir, epoch + 1,
                        {"params": params, "opt_state": opt_state,
                         "epoch": epoch + 1})


if __name__ == "__main__":
    main()
