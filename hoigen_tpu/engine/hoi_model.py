"""Full HOI model assembly: frozen DETR + frozen DINO + adapter-CLIP + UPT
head, with jittable train/eval steps.

Replaces the torch module graph of build_detector + CustomisedDLE
(/root/reference/upt_tip_cache_model_free_finetune_distill3.py:1712-1759,
/root/reference/utils_tip_cache_and_union_finetune.py:328-346) with pure
step functions designed for pjit over a data mesh: one traced program per
step, no per-image Python, global loss normalization via global sums.
"""
import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip.config import CLIPConfig, VIT_B16
from ..models.clip.model import init_clip_params
from ..models.detr import DETRConfig, detr_forward, init_detr_params, \
    postprocess
from ..models.dino import dino_forward, init_dino_params
from ..models.upt import UPTConfig, init_upt_params, upt_forward
from ..ops.pixels import device_normalize, pad_mask_from_sizes
from .partition import merge_params, split_params, trainable_predicate, \
    label_tree, lr_group


@dataclasses.dataclass(frozen=True)
class HOIModelConfig:
    clip: CLIPConfig = VIT_B16
    detr: DETRConfig = DETRConfig()
    upt: UPTConfig = UPTConfig()
    dtype: str = "float32"       # activation dtype for the heavy towers


def init_hoi_model(rng, cfg: HOIModelConfig, caches,
                   clip_params=None, detr_params=None, dino_params=None):
    """Random init (converters can replace the subtrees afterwards).
    Returns (trainable, frozen, buffers)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if clip_params is None:
        clip_params = init_clip_params(k1, cfg.clip)
    if detr_params is None:
        detr_params = init_detr_params(k2, cfg.detr)
    if dino_params is None and cfg.upt.use_dino:
        dino_params = init_dino_params(k3)
    params, buffers = init_upt_params(k4, cfg.upt, caches, clip_params)
    trainable, frozen_clip = split_params(params, trainable_predicate)
    frozen = {"upt": frozen_clip, "detr": detr_params, "dino": dino_params}
    return trainable, frozen, buffers


def _forward(trainable, frozen, buffers, batch, cfg: HOIModelConfig,
             training, rng=None):
    params = merge_params(trainable, frozen["upt"])
    dtype = jnp.dtype(cfg.dtype)
    clip_cfg = cfg.clip
    if clip_cfg.fused_attention and not training:
        # the Pallas attention kernel's value in the CLIP tower is its
        # flash-style VJP (no (B, H, L, L) backward materialization); at
        # eval the score tensor is tiny (L=197) and XLA's fusion wins —
        # measured 265.6 vs 261.3 img/s full-step A/B at batch 16
        # (tools/bench_ab_fused.py --mode clipattn)
        clip_cfg = dataclasses.replace(clip_cfg, fused_attention=False)
    # feeds ship uint8 pixels + (h, w) sizes; normalization and the padding
    # plane are reconstructed on-device (ops/pixels). Float feeds (synthetic
    # benches, parity tests) pass through unchanged.
    if "image_mask" in batch:
        image_mask = batch["image_mask"]
    else:
        image_mask = pad_mask_from_sizes(batch["image_sizes"],
                                         batch["images"].shape[2],
                                         batch["images"].shape[3])
    images = device_normalize(batch["images"], dtype, pad_mask=image_mask)
    detr_out = detr_forward(frozen["detr"], images, image_mask, cfg.detr)
    detr_out = jax.lax.stop_gradient(detr_out)
    pred_logits = detr_out["pred_logits"].astype(jnp.float32)
    if pred_logits.shape[-1] == 92:
        # COCO-pretrained V-COCO detector: gather the 91-slot logits down
        # to 80 real classes (person first) + no-object BEFORE the softmax
        # (reserve_indices, upt_tip...py:575-581,1600-1602)
        from ..labels.vcoco import VCOCO_LABELS
        pred_logits = pred_logits[
            ..., np.asarray(VCOCO_LABELS.detr_reserve_indices)]
    # postprocess at the CLIP-stream frame (reference uses the CLIP image
    # sizes throughout, main path :1585-1605)
    post = postprocess(pred_logits,
                       detr_out["pred_boxes"].astype(jnp.float32),
                       batch["clip_sizes"])
    dino_apply = None
    if cfg.upt.use_dino and frozen["dino"] is not None:
        dino_apply = lambda im: jax.lax.stop_gradient(  # noqa: E731
            dino_forward(frozen["dino"], im.astype(dtype),
                         nchw=cfg.detr.nchw_backbone).astype(jnp.float32))
    targets = None
    if training:
        targets = {"boxes_h": batch["boxes_h"], "boxes_o": batch["boxes_o"],
                   "labels": batch["labels"], "valid": batch["gt_valid"]}
    gen_sample = None
    if training and cfg.upt.generate_feature and "gen_hum" in batch:
        gen_sample = {"hum": batch["gen_hum"], "obj": batch["gen_obj"],
                      "uni": batch["gen_uni"],
                      "obj_cls": batch["gen_obj_cls"],
                      "verb_multihot": batch["gen_verb_multihot"]}
    if "images_clip" in batch:
        images_clip = device_normalize(batch["images_clip"], jnp.float32)
    else:
        # device-derived 224 stream: the host ships only the DETR stream;
        # IResize-after-DETR-resize semantics with PIL uint8 rounding
        # (ops/resize) — removes the second host PIL pass per image
        from ..ops.resize import batch_resize_normalize
        images_clip = batch_resize_normalize(
            batch["images"], batch["image_sizes"].astype(jnp.float32),
            cfg.upt.clip_resolution)
    return upt_forward(params, buffers, post,
                       images_clip,
                       batch["clip_sizes"], clip_cfg, cfg.upt,
                       dino_apply=dino_apply, targets=targets,
                       training=training, rng=rng, gen_sample=gen_sample)


def make_optimizer(lr_vit=1e-3, lr_head=1e-3, weight_decay=1e-4,
                   lr_drop_step: Optional[int] = None, max_norm=0.1):
    """AdamW with two LR groups + StepLR(x0.1 at lr_drop_step) + grad-clip
    (main_tip_finetune.py:1008-1012, CustomisedDLE max_norm=0.1)."""
    def sched(base):
        if lr_drop_step is None:
            return base
        return optax.piecewise_constant_schedule(base,
                                                 {lr_drop_step: 0.1})

    def group(base):
        return optax.chain(optax.clip_by_global_norm(max_norm),
                           optax.adamw(sched(base),
                                       weight_decay=weight_decay))

    def make(trainable):
        labels = label_tree(trainable, lr_group)
        return optax.multi_transform(
            {"vit": group(lr_vit), "head": group(lr_head)}, labels)
    return make


def make_train_step(cfg: HOIModelConfig, optimizer):
    """-> jittable (trainable, opt_state, frozen, buffers, batch, rng) ->
    (trainable, opt_state, metrics)."""

    def step(trainable, opt_state, frozen, buffers, batch, rng):
        def loss_fn(tr):
            loss, aux = _forward(tr, frozen, buffers, batch, cfg,
                                 training=True, rng=rng)
            # global normalization: loss_sum and n_p are global sums under
            # pjit; equivalent to DDP grad-mean + all-reduced n_p
            total = aux["loss_sum"] / jnp.maximum(aux["n_p"], 1.0)
            if cfg.upt.LA:
                # language-aware regularizer added post-normalization,
                # matching the reference's loss_dict sum
                # (upt_tip...py:1653-1658)
                from ..models.upt import language_aware_loss
                params = merge_params(tr, frozen["upt"])
                total = total + language_aware_loss(
                    params, buffers["origin_text_embeddings"],
                    cfg.upt.LA_weight)
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss, "n_p": aux["n_p"]}
        return trainable, opt_state, metrics

    return step


def make_eval_step(cfg: HOIModelConfig):
    """-> jittable (trainable, frozen, buffers, batch) -> detections dict.

    Ships the COMPACT form: detection_scores (B, P, Vmax) gathered through
    the per-object verb LUT + detection_verbs (B, P, Vmax) ids — lossless
    (everything outside a pair's object-class verb set is zeroed by the
    prior mask) and ~17x less D2H than the dense (B, P, 600) matrix."""

    def step(trainable, frozen, buffers, batch):
        out = _forward(trainable, frozen, buffers, batch, cfg,
                       training=False)
        return {"detection_scores": out["detection_scores_cmp"],
                "detection_verbs": out["detection_verbs"],
                "boxes": out["boxes"], "objects": out["objects"],
                "pair_valid": out["pair_valid"]}

    return step


def make_example_batch(cfg: HOIModelConfig, batch_size=2, detr_hw=(256, 256),
                       seed=0, max_gt=8, device_clip_stream=False,
                       object_class_multihot=None):
    """Synthetic batch with the right static shapes (tests/bench/dryrun).

    ``device_clip_stream``: ship the production feed — uint8 DETR pixels +
    (h, w) sizes, no host 224 stream (it is derived on-device, ops/resize).
    ``object_class_multihot``: optional (O, C) table; when given, the
    synthetic gen-pair's verb label is drawn from its object's valid verb
    set, so the positive survives the prior mask and the train loss is
    non-trivial even with random detector weights.
    """
    rng = np.random.default_rng(seed)
    h, w = detr_hw
    r = cfg.upt.clip_resolution
    mask = np.zeros((batch_size, h, w), bool)
    mask[:, :, w - w // 8:] = True
    if device_clip_stream:
        pixels = {
            "images": rng.integers(0, 256, (batch_size, 3, h, w))
            .astype(np.uint8),
            "image_sizes": np.tile(np.asarray([h, w - w // 8], np.float32),
                                   (batch_size, 1)),
        }
    else:
        pixels = {
            "images": rng.normal(size=(batch_size, 3, h, w))
            .astype(np.float32),
            "image_mask": mask,
            "images_clip": rng.normal(size=(batch_size, 3, r, r))
            .astype(np.float32),
        }
    return pixels | {
        "clip_sizes": np.full((batch_size, 2), float(r), np.float32),
        "boxes_h": (rng.random((batch_size, max_gt, 4)) * 0.4 + 0.2)
        .astype(np.float32),
        "boxes_o": (rng.random((batch_size, max_gt, 4)) * 0.4 + 0.2)
        .astype(np.float32),
        "labels": rng.integers(0, cfg.upt.num_classes,
                               (batch_size, max_gt)).astype(np.int32),
        "gt_valid": np.tile(np.arange(max_gt) < 3, (batch_size, 1)),
    } | ({} if not cfg.upt.generate_feature else _example_gen_sample(
        rng, batch_size, cfg.upt, object_class_multihot))


def _example_gen_sample(rng, batch_size, upt_cfg, object_class_multihot=None):
    d = upt_cfg.visual_output_dim
    if object_class_multihot is not None:
        table = np.asarray(object_class_multihot) > 0
        objs = rng.integers(0, table.shape[0], batch_size)
        verbs = np.asarray([rng.choice(np.flatnonzero(table[o]))
                            for o in objs], np.int64)
    else:
        objs = rng.integers(0, 2, batch_size)
        verbs = rng.integers(0, upt_cfg.num_classes, batch_size)
    mh = np.zeros((batch_size, upt_cfg.num_classes), np.float32)
    mh[np.arange(batch_size), verbs] = 1.0
    return {
        "gen_hum": rng.normal(size=(batch_size, d)).astype(np.float32),
        "gen_obj": rng.normal(size=(batch_size, d)).astype(np.float32),
        "gen_uni": rng.normal(size=(batch_size, d)).astype(np.float32),
        "gen_obj_cls": objs.astype(np.int32),
        "gen_verb_multihot": mh,
    }
