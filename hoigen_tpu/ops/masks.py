"""Anti-aliased box mask rasterization (the reference's sole native op).

Reference: /root/reference/pocket/csrc/masks.cpp:13-67 (GenerateMasks).
The coverage of a pixel (r, c) by a box is separable:
    w_y(r) = clip(min(r + 1, y2) - max(r, y1), 0, 1)
    mask[r, c] = w_y(r) * w_x(c)
which reproduces the C++ floor/ceil boundary-fraction logic exactly
(interior rows -> 1, boundary rows -> partial coverage, single-row boxes ->
y2 - y1). A C++ CPU reference lives in hoigen_tpu/native/masks.cpp for
cross-checking.
"""
import jax.numpy as jnp


def generate_masks(boxes, h: int, w: int):
    """boxes: (N, 4) float xyxy -> (N, h, w) fractional-coverage masks."""
    rows = jnp.arange(h, dtype=boxes.dtype)
    cols = jnp.arange(w, dtype=boxes.dtype)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w_y = jnp.clip(jnp.minimum(rows[None, :] + 1, y2[:, None])
                   - jnp.maximum(rows[None, :], y1[:, None]), 0, 1)
    w_x = jnp.clip(jnp.minimum(cols[None, :] + 1, x2[:, None])
                   - jnp.maximum(cols[None, :], x1[:, None]), 0, 1)
    return w_y[:, :, None] * w_x[:, None, :]
