"""Static-shape class-aware NMS.

Replaces torchvision batched_nms as used by prepare_region_proposals
(/root/reference/upt_tip_cache_model_free_finetune_distill3.py:1366) with a
fixed-capacity masked formulation: no index gathers with dynamic length —
the result is a keep mask over the input slots, XLA/TPU friendly (O(N^2)
elementwise over N=100 DETR queries).

Semantics match torchvision: boxes of different classes never suppress each
other; a box is suppressed by any higher-scoring kept box of the same class
with IoU strictly greater than ``iou_threshold``. Ties in score are broken
by input order (earlier index wins), matching torch.argsort stability.
"""
import jax
import jax.numpy as jnp

from .boxes import box_iou


def batched_nms_mask(boxes, scores, classes, iou_threshold: float,
                     valid=None):
    """boxes (N,4), scores (N,), classes (N,) int -> bool keep mask (N,).

    ``valid`` optionally marks input slots as real (padding slots are
    neither kept nor suppress anything).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    # order by descending score with index tie-break
    order = jnp.argsort(-scores, stable=True)
    boxes_s = boxes[order]
    valid_s = valid[order]
    same_class = classes[order][:, None] == classes[order][None, :]
    iou = box_iou(boxes_s, boxes_s)
    suppress = (iou > iou_threshold) & same_class \
        & valid_s[:, None] & valid_s[None, :]

    def body(i, keep):
        # if slot i (in score order) is kept, drop all later overlapping slots
        row = suppress[i] & (jnp.arange(n) > i) & keep[i]
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_s)
    # scatter back to input order
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
