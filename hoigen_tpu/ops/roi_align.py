"""ROI-Align (aligned=True) as separable einsums — TPU-native formulation.

Numerically matches torchvision.ops.roi_align as used on the 14x14 CLIP
local feature map (/root/reference/upt_tip_cache_model_free_finetune_
distill3.py:1027-1029: output 7x7, aligned=True, adaptive sampling ratio).

Bilinear sampling is linear in the feature map, so instead of gathers we
build per-ROI interpolation weight matrices W_y (N, ph, H) and W_x (N, pw, W)
and contract:  out[n,c,p,q] = sum_{h,w} W_y[n,p,h] * F[c,h,w] * W_x[n,q,w]
— two MXU matmuls, no dynamic shapes. The mean-pooled variant used by the
UPT head (featmap mean over the 7x7 grid, upt...py:1032-1037) collapses the
bin axis before the contraction: a single (N,H)x(C,H,W)x(N,W) contraction.

Adaptive sampling ratio (torchvision's ceil(roi/out) when sampling_ratio<0)
is supported with a static ``max_samples`` bound: sample positions for all
``max_samples`` slots are computed and masked by the per-ROI dynamic grid
count. On a 14x14 map with 7x7 output the true count never exceeds 2.
"""
from functools import partial

import jax.numpy as jnp


def _axis_weights(start, roi_len, pooled, grid, length, max_samples):
    """Per-ROI interpolation weights for one axis.

    start: (N,) roi start in feature coords (already aligned/-0.5 shifted)
    roi_len: (N,) roi extent; grid: (N,) dynamic samples-per-bin (<= max_samples)
    Returns (N, pooled, length) weights incorporating the 1/grid averaging.
    """
    n = start.shape[0]
    bin_size = roi_len / pooled                                   # (N,)
    pb = jnp.arange(pooled, dtype=start.dtype)                    # (P,)
    iy = jnp.arange(max_samples, dtype=start.dtype)               # (S,)
    # sample position: start + pb*bin + (iy+.5)*bin/grid  -> (N, P, S)
    pos = (start[:, None, None] + pb[None, :, None] * bin_size[:, None, None]
           + (iy[None, None, :] + 0.5)
           * (bin_size / grid)[:, None, None])
    in_range = (pos >= -1.0) & (pos <= length)                    # torchvision bounds
    sample_valid = (iy[None, None, :] < grid[:, None, None]) & in_range
    pos = jnp.clip(pos, 0.0, length - 1.0)
    grid_pts = jnp.arange(length, dtype=start.dtype)              # (L,)
    # hat function = bilinear weight to the two adjacent integer rows
    hat = jnp.clip(1.0 - jnp.abs(pos[..., None] - grid_pts), 0.0, 1.0)
    hat = hat * sample_valid[..., None]
    # average over samples (count = grid per axis)
    return hat.sum(axis=2) / grid[:, None, None]                  # (N, P, L)


def _grids(roi_len, pooled, sampling_ratio, max_samples, dtype):
    if sampling_ratio > 0:
        return jnp.full(roi_len.shape, float(sampling_ratio), dtype)
    g = jnp.ceil(roi_len / pooled)
    return jnp.clip(g, 1.0, float(max_samples))


@partial(jnp.vectorize, excluded=(2, 3, 4, 5),
         signature="(c,h,w),(n,r)->(n,c,p,q)")
def _roi_align_impl(features, rois, output_size, spatial_scale,
                    sampling_ratio, max_samples):
    ph, pw = output_size
    height, width = features.shape[1], features.shape[2]
    dtype = features.dtype
    rois = rois.astype(dtype)
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    roi_w, roi_h = x2 - x1, y2 - y1
    gy = _grids(roi_h, ph, sampling_ratio, max_samples, dtype)
    gx = _grids(roi_w, pw, sampling_ratio, max_samples, dtype)
    w_y = _axis_weights(y1, roi_h, ph, gy, height, max_samples)   # (N,P,H)
    w_x = _axis_weights(x1, roi_w, pw, gx, width, max_samples)    # (N,Q,W)
    tmp = jnp.einsum("nph,chw->npcw", w_y, features)
    return jnp.einsum("npcw,nqw->ncpq", tmp, w_x)


def roi_align(features, rois, output_size, spatial_scale: float,
              sampling_ratio: int = -1, max_samples: int = 2):
    """features (..., C, H, W), rois (..., N, 4) xyxy in image coords ->
    (..., N, C, ph, pw). aligned=True semantics."""
    return _roi_align_impl(features, rois, tuple(output_size),
                           float(spatial_scale), int(sampling_ratio),
                           int(max_samples))


@partial(jnp.vectorize, excluded=(2, 3, 4, 5),
         signature="(c,h,w),(n,r)->(n,c)")
def _roi_align_mean_impl(features, rois, output_size, spatial_scale,
                         sampling_ratio, max_samples):
    ph, pw = output_size
    height, width = features.shape[1], features.shape[2]
    dtype = features.dtype
    rois = rois.astype(dtype)
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    roi_w, roi_h = x2 - x1, y2 - y1
    gy = _grids(roi_h, ph, sampling_ratio, max_samples, dtype)
    gx = _grids(roi_w, pw, sampling_ratio, max_samples, dtype)
    # mean over output bins commutes into the weights (separable)
    w_y = _axis_weights(y1, roi_h, ph, gy, height, max_samples).mean(1)
    w_x = _axis_weights(x1, roi_w, pw, gx, width, max_samples).mean(1)
    tmp = jnp.einsum("nh,chw->ncw", w_y, features)
    return jnp.einsum("ncw,nw->nc", tmp, w_x)


def roi_align_mean(features, rois, output_size, spatial_scale: float,
                   sampling_ratio: int = -1, max_samples: int = 2):
    """Fused roi_align + mean over the pooled grid: (..., N, C).
    Exactly equals roi_align(...).mean((-2, -1)) but with one fused
    contraction — the UPT head's pooling (upt...py:1032-1037)."""
    return _roi_align_mean_impl(features, rois, tuple(output_size),
                                float(spatial_scale), int(sampling_ratio),
                                int(max_samples))
