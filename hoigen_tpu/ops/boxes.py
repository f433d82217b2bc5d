"""Box primitives (jnp, static shapes).

Reference semantics: /root/reference/ops.py:365-376 (format conversions),
torchvision box_iou ('coord' encoding),
/root/reference/upt_tip_cache_model_free_finetune_distill3.py:1019-1023
(union boxes), :1269-1274 (recover_boxes).
"""
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a, b):
    """Pairwise IoU: a (..., N, 4), b (..., M, 4) -> (..., N, M)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def union_boxes(boxes_h, boxes_o):
    """Tight union of paired boxes (upt...py:1021-1023)."""
    lt = jnp.minimum(boxes_h[..., :2], boxes_o[..., :2])
    rb = jnp.maximum(boxes_h[..., 2:], boxes_o[..., 2:])
    return jnp.concatenate([lt, rb], axis=-1)


def recover_boxes(boxes, size):
    """Normalized cxcywh -> absolute xyxy for an (h, w) image size
    (upt...py:1269-1274)."""
    b = box_cxcywh_to_xyxy(boxes)
    h, w = size[..., 0], size[..., 1]
    scale = jnp.stack([w, h, w, h], axis=-1)
    return b * scale[..., None, :] if b.ndim > scale.ndim else b * scale
