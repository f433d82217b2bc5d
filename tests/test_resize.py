"""PIL-parity tests for the device-side bicubic resize/crop (ops/resize.py).

Oracle: PIL itself. Float-mode PIL ('F' per channel) removes PIL's uint8
fixed-point rounding and must match the weight math almost exactly; the
uint8 path bounds the end-to-end difference the pipelines will actually
see (reference host path: /root/reference/detr/datasets/
transforms_clip.py:279-289, /root/reference/pre_images/crop_images.py).
"""
import numpy as np
import pytest
from PIL import Image

from hoigen_tpu.data.crops import CLIP_MEAN, CLIP_STD, clip_preprocess_crop
from hoigen_tpu.ops.resize import (batch_resize_normalize, crop_resize_square,
                                   crop_resize_square_pil_u8, resize_image,
                                   resize_image_pil_u8)


def _rand_image(rng, h, w):
    # smooth-ish content: random low-res upsampled + noise, more realistic
    # for interpolation than white noise
    base = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3))
    img = np.asarray(
        Image.fromarray(base.astype(np.uint8)).resize((w, h), Image.BILINEAR))
    noise = rng.integers(-12, 13, img.shape)
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def _pil_resize_float(arr_u8, out_wh):
    """PIL bicubic in float mode (no fixed-point rounding), per channel."""
    chans = []
    for c in range(3):
        im = Image.fromarray(arr_u8[:, :, c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize(out_wh, Image.BICUBIC)))
    return np.stack(chans, -1)


@pytest.mark.parametrize("hw,out", [((37, 53), 224), ((310, 475), 224),
                                    ((100, 60), 224), ((224, 224), 224),
                                    ((480, 640), 96)])
def test_resize_matches_pil_float(hw, out):
    rng = np.random.default_rng(0)
    arr = _rand_image(rng, *hw)
    ours = np.asarray(resize_image(
        arr.transpose(2, 0, 1).astype(np.float32),
        np.asarray(hw, np.float32), (out, out)))
    ref = _pil_resize_float(arr, (out, out)).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=0)


@pytest.mark.parametrize("hw", [(287, 431), (37, 53), (480, 640)])
def test_resize_pil_u8_emulation(hw):
    """Two-pass quantized path tracks PIL's uint8 resize to <=1/255."""
    rng = np.random.default_rng(1)
    arr = _rand_image(rng, *hw)
    ours = np.asarray(resize_image_pil_u8(
        arr.transpose(2, 0, 1).astype(np.float32),
        np.asarray(hw, np.float32), (224, 224)))
    ref = np.asarray(Image.fromarray(arr).resize((224, 224), Image.BICUBIC))
    diff = np.abs(ours - ref.transpose(2, 0, 1).astype(np.float64))
    # residual: PIL's int16 coefficient quantization vs our float weights
    # occasionally flips round-half boundaries by one level
    assert diff.max() <= 1.0 + 1e-6
    assert (diff > 0.5).mean() < 0.01


def test_padded_batch_ignores_padding():
    rng = np.random.default_rng(2)
    h1, w1, h2, w2 = 120, 180, 160, 90
    a = _rand_image(rng, h1, w1)
    b = _rand_image(rng, h2, w2)
    batch = np.zeros((2, 3, 200, 200), np.uint8)
    batch[0, :, :h1, :w1] = a.transpose(2, 0, 1)
    batch[1, :, :h2, :w2] = b.transpose(2, 0, 1)
    # poison the padding: must not affect the output
    batch[0, :, h1:, :] = 255
    batch[1, :, :, w2:] = 255
    sizes = np.asarray([[h1, w1], [h2, w2]], np.float32)
    out = np.asarray(batch_resize_normalize(batch, sizes, 64))
    ref0 = _pil_resize_float(a, (64, 64)).transpose(2, 0, 1) / 255.0
    ref1 = _pil_resize_float(b, (64, 64)).transpose(2, 0, 1) / 255.0
    from hoigen_tpu.ops.pixels import IMAGENET_MEAN, IMAGENET_STD
    mean, std = IMAGENET_MEAN.reshape(3, 1, 1), IMAGENET_STD.reshape(3, 1, 1)
    np.testing.assert_allclose(out[0], (ref0 - mean) / std, atol=2e-2)
    np.testing.assert_allclose(out[1], (ref1 - mean) / std, atol=2e-2)


@pytest.mark.parametrize("box", [
    (10, 20, 110, 60),     # wide box -> vertical zero pad
    (30, 5, 70, 160),      # tall box -> horizontal zero pad
    (0, 0, 50, 50),        # square at origin
    (100, 120, 180, 176),  # near bottom-right edge
])
def test_crop_resize_square_matches_pil(box):
    rng = np.random.default_rng(3)
    arr = _rand_image(rng, 180, 200)
    img = Image.fromarray(arr)
    ref = clip_preprocess_crop(img.crop(box), 224)   # PIL oracle path
    ours = np.asarray(crop_resize_square_pil_u8(
        arr.transpose(2, 0, 1).astype(np.float32),
        np.asarray(box, np.float32), 224)) / 255.0
    ours = (ours - CLIP_MEAN.reshape(3, 1, 1)) / CLIP_STD.reshape(3, 1, 1)
    # <=1/255 residual (PIL int16 coefficients), /std in normalized space
    np.testing.assert_allclose(ours, ref, atol=1.01 / 255 / CLIP_STD.min(),
                               rtol=0)
    assert np.abs(ours - ref).mean() < 8e-3


def test_crop_overhanging_image_edge():
    """PIL crop beyond the image zero-fills; the device path must agree."""
    rng = np.random.default_rng(4)
    arr = _rand_image(rng, 90, 120)
    box = (80, 40, 140, 80)   # right edge 20px past the image
    ref = clip_preprocess_crop(Image.fromarray(arr).crop(box), 64)
    ours = np.asarray(crop_resize_square_pil_u8(
        arr.transpose(2, 0, 1).astype(np.float32),
        np.asarray(box, np.float32), 64)) / 255.0
    ours = (ours - CLIP_MEAN.reshape(3, 1, 1)) / CLIP_STD.reshape(3, 1, 1)
    np.testing.assert_allclose(ours, ref, atol=1.01 / 255 / CLIP_STD.min(),
                               rtol=0)


def test_float_crop_path_tracks_u8_path():
    """The fused single-einsum float path stays within PIL-rounding
    distance of the quantized path (documents what the fast path trades)."""
    rng = np.random.default_rng(5)
    arr = _rand_image(rng, 180, 200)
    box = np.asarray((10, 20, 110, 60), np.float32)
    q = np.asarray(crop_resize_square_pil_u8(
        arr.transpose(2, 0, 1).astype(np.float32), box, 64)) / 255.0
    f = np.asarray(crop_resize_square(
        arr.transpose(2, 0, 1).astype(np.float32) / 255.0, box, 64))
    assert np.abs(q - f).max() < 16.0 / 255   # clamped ringing at pad edges
    assert np.abs(q - f).mean() < 1.0 / 255
