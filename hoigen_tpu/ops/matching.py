"""Set matching and detection criteria (DETR fine-tuning + legacy pair ops).

Covers the reference's matching machinery:
  * DETR-level Hungarian matcher + SetCriterion
    (/root/reference/detr/models/matcher.py:12-86,
    /root/reference/detr/models/detr.py:84-250) used for the offline
    detector fine-tuning on HICO-DET
    (/root/reference/hicodet/detections/main_detr.py)
  * pair-level HungarianMatcher costs (max of human/object L1 and GIoU,
    verb/object score costs; /root/reference/ops.py:148-247)
  * BoxPairCoder (/root/reference/ops.py:56-146) and BalancedBoxSampler
    (pair regression / sampling utilities of the legacy head)

TPU split: cost matrices are computed on device (jittable); the Hungarian
assignment itself runs on host (scipy) between steps — the standard JAX
DETR recipe — and the loss is a jittable function of padded matched indices.
"""
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import box_cxcywh_to_xyxy, box_iou


def generalized_box_iou(a, b):
    """GIoU on xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    iou = box_iou(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    inter = iou * (area_a[..., :, None] + area_b[..., None, :]) \
        / jnp.clip(1 + iou, 1e-9, None)  # recover inter from iou
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return iou - (hull - union) / jnp.clip(hull, 1e-9, None)


def detr_matching_cost(pred_logits, pred_boxes, gt_labels, gt_boxes,
                       cost_class=1.0, cost_bbox=5.0, cost_giou=2.0):
    """Per-image DETR matching cost (matcher.py:35-81): -prob[gt] + L1 +
    GIoU on cxcywh/xyxy. pred (Q, C+1)/(Q, 4); gt (G,)/(G, 4 cxcywh).
    Returns (Q, G) cost."""
    prob = jax.nn.softmax(pred_logits, -1)
    c_class = -prob[:, gt_labels]
    c_bbox = jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]).sum(-1)
    c_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pred_boxes),
                                  box_cxcywh_to_xyxy(gt_boxes))
    return cost_class * c_class + cost_bbox * c_bbox + cost_giou * c_giou


def hungarian_assign(cost: np.ndarray, n_valid: int):
    """Host-side assignment over the first n_valid columns.
    Returns (row_idx, col_idx) numpy arrays."""
    from scipy.optimize import linear_sum_assignment
    if n_valid == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    r, c = linear_sum_assignment(np.asarray(cost)[:, :n_valid])
    return r.astype(np.int64), c.astype(np.int64)


def detr_set_criterion(pred_logits, pred_boxes, gt_labels, gt_boxes,
                       gt_valid, match_rows, match_cols, match_valid,
                       num_classes: int, eos_coef: float = 0.1,
                       bbox_loss_coef: float = 5.0,
                       giou_loss_coef: float = 2.0):
    """Jittable DETR losses given padded host-side matches
    (detr.py SetCriterion loss_labels/loss_boxes :126-180).

    Shapes (per batch): pred (B, Q, C+1)/(B, Q, 4); gt (B, G) / (B, G, 4);
    matches (B, M) row/col indices with validity mask. num_boxes is the
    global valid-GT count (psum-free under pjit — global sums are global).
    Returns dict of scalar losses.
    """
    b, q, _ = pred_logits.shape
    no_object = num_classes  # last class id = no-object

    # classification: every query defaults to no-object; matched queries get
    # their GT class; CE weighted by eos_coef on the no-object class
    target = jnp.full((b, q), no_object, jnp.int32)
    batch_idx = jnp.arange(b)[:, None]
    gt_cls = jnp.take_along_axis(gt_labels, match_cols, axis=1)
    upd = jnp.where(match_valid, gt_cls, no_object)
    target = target.at[batch_idx, match_rows].set(upd)
    logp = jax.nn.log_softmax(pred_logits, -1)
    weights = jnp.where(target == no_object, eos_coef, 1.0)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    loss_ce = (ce * weights).sum() / weights.sum()

    # boxes: L1 + GIoU over matched pairs, normalized by num_boxes
    num_boxes = jnp.maximum(gt_valid.sum(), 1.0)
    pb = jnp.take_along_axis(pred_boxes, match_rows[..., None], axis=1)
    gb = jnp.take_along_axis(gt_boxes, match_cols[..., None], axis=1)
    mv = match_valid[..., None]
    l1 = (jnp.abs(pb - gb) * mv).sum() / num_boxes
    giou_mat = generalized_box_iou(box_cxcywh_to_xyxy(pb),
                                   box_cxcywh_to_xyxy(gb))
    diag = jnp.diagonal(giou_mat, axis1=-2, axis2=-1)
    loss_giou = ((1 - diag) * match_valid).sum() / num_boxes

    return {"loss_ce": loss_ce, "loss_bbox": bbox_loss_coef * l1,
            "loss_giou": giou_loss_coef * loss_giou,
            "total": loss_ce + bbox_loss_coef * l1
            + giou_loss_coef * loss_giou}


def pair_matching_cost(verb_scores, object_scores, boxes_h, boxes_o,
                       gt_verbs, gt_objects, gt_bh, gt_bo,
                       cost_object=1.0, cost_verb=1.0, cost_bbox=1.0,
                       cost_giou=1.0):
    """Pair-level matching cost (ops.py HungarianMatcher :148-247): verb
    focal-style score cost + object prob cost + max-over-(h,o) of L1 and
    GIoU. boxes in normalized cxcywh. Returns (N, G)."""
    c_verb = -(gt_verbs @ jnp.log(jnp.clip(verb_scores, 1e-8, 1)).T
               + (1 - gt_verbs) @ jnp.log(jnp.clip(1 - verb_scores,
                                                   1e-8, 1)).T).T \
        / jnp.clip(gt_verbs.sum(-1), 1, None)
    c_obj = -object_scores[:, gt_objects]
    l1 = jnp.maximum(
        jnp.abs(boxes_h[:, None] - gt_bh[None]).sum(-1),
        jnp.abs(boxes_o[:, None] - gt_bo[None]).sum(-1))
    giou = jnp.maximum(
        -generalized_box_iou(box_cxcywh_to_xyxy(boxes_h),
                             box_cxcywh_to_xyxy(gt_bh)),
        -generalized_box_iou(box_cxcywh_to_xyxy(boxes_o),
                             box_cxcywh_to_xyxy(gt_bo)))
    return cost_verb * c_verb + cost_object * c_obj + cost_bbox * l1 \
        + cost_giou * giou


class BoxPairCoder:
    """Box-pair regression encode/decode (ops.py:56-146), jnp."""

    def __init__(self, weights=(10.0, 10.0, 5.0, 5.0),
                 bbox_xform_clip=math.log(1000.0 / 16)):
        self.weights = jnp.asarray(weights)
        self.clip = bbox_xform_clip

    def encode(self, props_h, props_o, target_h, target_o):
        def enc(p, t):
            wx, wy, ww, wh = self.weights
            return jnp.stack([wx * (t[:, 0] - p[:, 0]),
                              wy * (t[:, 1] - p[:, 1]),
                              ww * jnp.log(t[:, 2] / p[:, 2]),
                              wh * jnp.log(t[:, 3] / p[:, 3])], 1)
        return jnp.concatenate([enc(props_h, target_h),
                                enc(props_o, target_o)], 1)

    def decode(self, props_h, props_o, deltas):
        w = jnp.tile(self.weights, 2)
        d = deltas / w

        def dec(p, dx, dy, dw, dh):
            dw = jnp.clip(dw, None, self.clip)
            dh = jnp.clip(dh, None, self.clip)
            return jnp.stack([p[:, 0] + dx, p[:, 1] + dy,
                              p[:, 2] * jnp.exp(dw),
                              p[:, 3] * jnp.exp(dh)], 1)
        return (dec(props_h, d[:, 0], d[:, 1], d[:, 2], d[:, 3]),
                dec(props_o, d[:, 4], d[:, 5], d[:, 6], d[:, 7]))


def balanced_box_sample(labels_binary, num_samples: int,
                        positive_fraction: float, rng):
    """Balanced positive/negative sampling over binary pair labels
    (pocket BalancedBoxSampler semantics): returns index arrays."""
    pos = np.nonzero(labels_binary > 0)[0]
    neg = np.nonzero(labels_binary == 0)[0]
    n_pos = min(len(pos), int(num_samples * positive_fraction))
    n_neg = min(len(neg), num_samples - n_pos)
    return (rng.permutation(pos)[:n_pos], rng.permutation(neg)[:n_neg])
