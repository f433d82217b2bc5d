"""Device-side bicubic resize/crop with PIL semantics.

The reference produces its CLIP-resolution stream with a second host-side
PIL pass over every image (IResize 224 bicubic,
/root/reference/detr/datasets/transforms_clip.py:279-289, applied in
/root/reference/utils_tip_cache_and_union_finetune.py:86-114) and extracts
human/object/union crops with PIL crop+resize
(/root/reference/pre_images/crop_images.py:206-229). On TPU both are
separable dense matmuls: ``out = Wh^T @ img @ Ww`` where the weight
matrices implement exactly PIL's convention —

  * sample centers at ``(i + 0.5) * scale`` in source coordinates,
  * Keys bicubic kernel with a = -0.5,
  * antialiasing: kernel support scaled by ``max(scale, 1)``,
  * the tap window clipped to the source extent and weights renormalized
    over the clipped window (PIL ImagingResampleHorizontal).

This lets the host ship only the (uint8) DETR stream; the 224 stream and
square-padded crop features are computed on device from it, removing the
second PIL resize + the crop PIL passes from the input pipeline
(BASELINE.json north-star: "union-box crop+resize+normalize preprocessing
fused on device"). Parity with PIL is float-exact in the weights; PIL's
fixed-point per-pass uint8 rounding leaves residual differences of ~1/255
per channel (tested in tests/test_resize.py at mAP-safe tolerance).
"""
import jax
import jax.numpy as jnp

from .pixels import IMAGENET_MEAN, IMAGENET_STD

_EPS = 1e-8

# TPU matmul precision for the resample einsums. HIGH (bf16x3) keeps
# absolute error ~1e-3 at the [0, 255] pixel scale — two orders below the
# 1-ulp uint8 quantization the PIL-emulation path rounds through and the
# ±1/255 tolerance tests/test_resize.py asserts — at half the MXU passes
# of HIGHEST (6-pass f32 emulation). On CPU (where the parity tests run)
# precision is ignored and the math is exact f32 either way.
_PREC = jax.lax.Precision.HIGH


def _keys_cubic(x):
    """Keys bicubic kernel, a = -0.5 (PIL's BICUBIC filter)."""
    ax = jnp.abs(x)
    return jnp.where(
        ax < 1.0, (1.5 * ax - 2.5) * ax * ax + 1.0,
        jnp.where(ax < 2.0, ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0, 0.0))


def resize_weights(in_size: int, out_size: int, window,
                   win_lo=0.0, valid_lo=None, valid_hi=None,
                   norm_len: int = None):
    """(in_size, out_size) PIL-bicubic weight matrix.

    Maps the virtual source window ``[win_lo, win_lo + window)`` (in tap
    units along the static ``in_size`` axis) onto ``out_size`` output
    pixels. Real pixels exist in ``[valid_lo, valid_hi)`` (default: the
    whole window); virtual taps outside it contribute zero *value* but
    keep their kernel weight in the normalizer — exactly PIL resizing a
    zero-padded window. Range arguments may be traced scalars.

    ``norm_len``: static upper bound on ``ceil(window) + 1`` (defaults to
    ``in_size + 2``; pass a larger bound when a square crop's virtual side
    can exceed this axis' extent).
    """
    window = jnp.asarray(window, jnp.float32)
    win_lo = jnp.asarray(win_lo, jnp.float32)
    valid_lo = win_lo if valid_lo is None else jnp.asarray(valid_lo,
                                                           jnp.float32)
    valid_hi = win_lo + window if valid_hi is None else jnp.asarray(
        valid_hi, jnp.float32)
    scale = window / out_size
    fscale = jnp.maximum(scale, 1.0)           # antialias when downsampling
    centers = win_lo + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale
    taps = jnp.arange(in_size, dtype=jnp.float32) + 0.5
    w = _keys_cubic((taps[:, None] - centers[None, :]) / fscale)
    # normalizer: kernel mass of every virtual tap inside the window
    # (incl. zero fill and taps overhanging the static array) — its own
    # iota, shifted to the window start, so both under- and overhang count
    if norm_len is None:
        norm_len = in_size + 2
    vtaps = jnp.floor(win_lo) + 0.5 + jnp.arange(norm_len,
                                                 dtype=jnp.float32)
    vw = _keys_cubic((vtaps[:, None] - centers[None, :]) / fscale)
    in_window = (vtaps >= win_lo) & (vtaps < win_lo + window)
    norm = jnp.where(in_window[:, None], vw, 0.0).sum(0, keepdims=True)
    keep = (taps >= valid_lo) & (taps < valid_hi) & \
        (taps >= win_lo) & (taps < win_lo + window)
    w = jnp.where(keep[:, None], w, 0.0)
    return w / jnp.maximum(norm, _EPS)


def resize_image(image, size_hw, out_hw):
    """(C, H, W) float image, valid extent (h, w) -> (C, oh, ow), PIL
    bicubic. Padded pixels beyond (h, w) never contribute."""
    c, hb, wb = image.shape
    oh, ow = out_hw
    wy = resize_weights(hb, oh, size_hw[0])
    wx = resize_weights(wb, ow, size_hw[1])
    return jnp.einsum("chw,hy,wx->cyx", image, wy, wx,
                      precision=_PREC)


def _quant_u8(x):
    """PIL's per-pass fixed-point store: round half up, clamp to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_image_pil_u8(image, size_hw, out_hw):
    """(C, H, W) float image in [0, 255], valid extent (h, w) ->
    (C, oh, ow) emulating PIL's *uint8* bicubic resize.

    PIL resamples in two fixed-point passes (horizontal then vertical,
    Pillow src/libImaging/Resample.c ImagingResampleInner), rounding and
    clamping to uint8 between passes — which clips bicubic ringing at hard
    edges. Emulating both passes keeps the device stream within 1/255 of
    the host PIL path (tests/test_resize.py)."""
    c, hb, wb = image.shape
    oh, ow = out_hw
    wy = resize_weights(hb, oh, size_hw[0])
    wx = resize_weights(wb, ow, size_hw[1])
    tmp = jnp.einsum("chw,wx->chx", image, wx,
                     precision=_PREC)
    tmp = _quant_u8(tmp)
    out = jnp.einsum("chx,hy->cyx", tmp, wy,
                     precision=_PREC)
    return _quant_u8(out)


def batch_resize_normalize(images_u8, sizes, resolution: int,
                           mean=IMAGENET_MEAN, std=IMAGENET_STD,
                           dtype=jnp.float32, pil_rounding: bool = True):
    """(B, 3, Hb, Wb) uint8 padded batch + (B, 2) valid (h, w) ->
    (B, 3, r, r) normalized CLIP stream.

    Device-side replacement for the reference's host PIL 224 pass
    (IResize, detr/datasets/transforms_clip.py:279-289, applied AFTER the
    DETR resize — utils_tip_cache_and_union_finetune.py:193-196 — so
    deriving it from the shipped DETR stream is the reference semantics,
    not an approximation). ``pil_rounding`` emulates PIL's per-pass uint8
    quantization for ≤1/255 parity with the host path."""
    x = images_u8.astype(jnp.float32)
    if not jnp.issubdtype(images_u8.dtype, jnp.integer):
        x = x * 255.0
    fn = resize_image_pil_u8 if pil_rounding else resize_image
    out = jax.vmap(lambda im, s: fn(im, s, (resolution,
                                            resolution)))(x, sizes) / 255.0
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1)
    return ((out - mean) / std).astype(dtype)


def crop_resize_square(image, box, resolution: int):
    """(C, H, W) float image + xyxy ``box`` (float; round at the caller for
    PIL-crop parity) -> (C, r, r): crop, zero-pad to square (centered on
    the short side), bicubic resize.

    Mirrors expand2square + PIL resize
    (/root/reference/utils_tip_cache_and_union_finetune.py:203-214 as
    reproduced in data/crops.py): the normalizer runs over the virtual
    square window, so zero-fill taps dilute edge pixels exactly like PIL
    resizing the physically padded crop.
    """
    c, hb, wb = image.shape
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    bw, bh = x1 - x0, y1 - y0
    side = jnp.maximum(bw, bh)
    # expand2square pastes at x_off=(side-w)//2 when h > w, y_off=(side-h)//2
    # when w > h; the virtual window therefore starts pad before the crop
    pad_x = jnp.where(bh > bw, jnp.floor((side - bw) / 2.0), 0.0)
    pad_y = jnp.where(bw > bh, jnp.floor((side - bh) / 2.0), 0.0)
    n = max(hb, wb) + 2   # virtual side can exceed either axis' extent
    wy = resize_weights(hb, resolution, side, win_lo=y0 - pad_y,
                        valid_lo=y0, valid_hi=y1, norm_len=n)
    wx = resize_weights(wb, resolution, side, win_lo=x0 - pad_x,
                        valid_lo=x0, valid_hi=x1, norm_len=n)
    return jnp.einsum("chw,hy,wx->cyx", image, wy, wx,
                      precision=_PREC)


def crop_resize_square_pil_u8(image, box, resolution: int):
    """Like :func:`crop_resize_square` but on a [0, 255] image, emulating
    PIL's per-pass uint8 quantization (the host path quantizes the crop,
    the square paste, and each resample pass — see resize_image_pil_u8).
    Returns (C, r, r) in [0, 255]."""
    c, hb, wb = image.shape
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    bw, bh = x1 - x0, y1 - y0
    side = jnp.maximum(bw, bh)
    pad_x = jnp.where(bh > bw, jnp.floor((side - bw) / 2.0), 0.0)
    pad_y = jnp.where(bw > bh, jnp.floor((side - bh) / 2.0), 0.0)
    n = max(hb, wb) + 2
    wy = resize_weights(hb, resolution, side, win_lo=y0 - pad_y,
                        valid_lo=y0, valid_hi=y1, norm_len=n)
    wx = resize_weights(wb, resolution, side, win_lo=x0 - pad_x,
                        valid_lo=x0, valid_hi=x1, norm_len=n)
    tmp = _quant_u8(jnp.einsum("chw,wx->chx", image, wx,
                               precision=_PREC))
    return _quant_u8(jnp.einsum("chx,hy->cyx", tmp, wy,
                                precision=_PREC))
