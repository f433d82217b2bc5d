"""Train-time augmentation math oracles (round-4 VERDICT weak #8).

The stochastic train transforms were previously tested for shapes only;
these tests pin their MATH against independently-written numpy oracles of
the documented semantics the reference relies on:

  * ColorJitter's three PIL enhancers (reference chain:
    utils_tip_cache_and_union_finetune.py:93 ``T.ColorJitter(.4,.4,.4)``;
    torchvision's PIL backend delegates to ImageEnhance.{Brightness,
    Contrast, Color}). The oracle re-implements the documented blend
    formula out = degenerate + factor * (img - degenerate) with PIL's
    ITU-R 601-2 luma and mean-gray degenerates, in float numpy.
  * RandomSizeCrop draw ranges (detr/datasets/transforms_clip.py
    ``RandomSizeCrop(384, 600)``: w,h ~ randint[min, min(img, max)]
    INCLUSIVE; offsets ~ randint[0, img-crop] inclusive — torchvision
    RandomCrop.get_params).
  * ColorJitter.get_params factor range [1-s, 1+s] and uniform op order;
    hflip / RandomSelect branch probabilities 0.5
    (transforms_clip.py RandomHorizontalFlip/RandomSelect defaults).
  * The DETR aspect-ratio resize rule (transforms_clip.py
    get_size_with_aspect_ratio): min side == size unless the max side
    would exceed max_size, in which case size is rescaled by
    round(max_size * min/max); aspect preserved within integer rounding.
  * hflip / crop box algebra (translate, clip, drop-degenerate).
"""
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from hoigen_tpu.data.transforms import (JITTER_OPS, JITTER_STRENGTH,
                                        DualStreamTransform, _aspect_size,
                                        _crop_draws, crop_apply, hflip)


def _rand_image(rng, w=23, h=17):
    return Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# ColorJitter kernels vs the documented blend math
# ---------------------------------------------------------------------------

def _luma(arr):
    """PIL convert('L'): ITU-R 601-2 integer luma
    L = (R*19595 + G*38470 + B*7471 + 2^15) >> 16."""
    a = arr.astype(np.int64)
    return (a[..., 0] * 19595 + a[..., 1] * 38470 + a[..., 2] * 7471
            + 0x8000) >> 16


def _blend(degenerate, img, factor):
    """PIL Image.blend / ImageEnhance._Enhance.enhance: linear
    interpolation (extrapolation for factor > 1), clipped to u8."""
    out = degenerate + factor * (img.astype(np.float64) - degenerate)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def oracle_brightness(arr, factor):
    return _blend(np.zeros_like(arr, np.float64), arr, factor)


def oracle_contrast(arr, factor):
    mean = int(_luma(arr).mean() + 0.5)
    return _blend(np.full(arr.shape, float(mean)), arr, factor)


def oracle_saturation(arr, factor):
    gray = _luma(arr)[..., None].astype(np.float64)
    return _blend(np.broadcast_to(gray, arr.shape), arr, factor)


ORACLES = {"Brightness": oracle_brightness, "Contrast": oracle_contrast,
           "Color": oracle_saturation}


@pytest.mark.parametrize("factor", [0.6, 0.8, 1.0, 1.2, 1.4])
@pytest.mark.parametrize("op", JITTER_OPS, ids=lambda o: o.__name__)
def test_jitter_kernels_match_documented_blend(op, factor):
    rng = np.random.default_rng(0)
    img = _rand_image(rng)
    got = np.asarray(op(img).enhance(factor))
    want = ORACLES[op.__name__](np.asarray(img), factor)
    # PIL's fixed-point blend can differ from float-exact by 1 LSB
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_jitter_factor_one_is_identity():
    rng = np.random.default_rng(1)
    img = _rand_image(rng)
    for op in JITTER_OPS:
        np.testing.assert_array_equal(np.asarray(op(img).enhance(1.0)),
                                      np.asarray(img))


# ---------------------------------------------------------------------------
# Stochastic draw ranges / distributions (plan() vs the reference chain)
# ---------------------------------------------------------------------------

def test_plan_jitter_draws_match_colorjitter_get_params():
    t = DualStreamTransform(training=True)
    factors, orders, flips, branches = [], set(), [], []
    for i in range(4000):
        p = t.plan(640, 480, rng=np.random.default_rng(i))
        factors.extend(p["jitter_factors"])
        orders.add(tuple(p["jitter_order"]))
        flips.append(p["flip"])
        branches.append(len(p["steps"]) == 1)
    f = np.asarray(factors)
    lo, hi = 1 - JITTER_STRENGTH, 1 + JITTER_STRENGTH
    assert f.min() >= lo and f.max() <= hi
    # uniform on [0.6, 1.4]: mean 1.0, both ends approached
    assert abs(f.mean() - 1.0) < 0.01
    assert f.min() < lo + 0.01 and f.max() > hi - 0.01
    # all 3! op orders occur (torch.randperm over the 3 enhancers)
    assert len(orders) == 6
    # hflip and RandomSelect are fair coins
    assert 0.45 < np.mean(flips) < 0.55
    assert 0.45 < np.mean(branches) < 0.55


def test_crop_draws_match_randomsizecrop_ranges():
    rng = np.random.default_rng(7)
    w, h, mn, mx = 500, 420, 384, 600
    cws, chs, cis, cjs = [], [], [], []
    for _ in range(3000):
        cw, ch, ci, cj = _crop_draws(w, h, rng, mn, mx)
        assert mn <= cw <= min(w, mx) and mn <= ch <= min(h, mx)
        assert 0 <= cj <= w - cw and 0 <= ci <= h - ch
        cws.append(cw); chs.append(ch); cis.append(ci); cjs.append(cj)
    # randint is INCLUSIVE of both ends in the reference — both extremes
    # must be attainable
    assert min(cws) == mn and max(cws) == min(w, mx)
    assert min(chs) == mn and max(chs) == min(h, mx)
    assert min(cjs) == 0 and min(cis) == 0
    # offset upper bound w-cw is per-draw; check it's hit at least once
    assert any(cj == w - cw for cj, cw in zip(cjs, cws))
    assert any(ci == h - ch for ci, ch in zip(cis, chs))


def test_crop_draws_degenerate_side_passthrough():
    # side <= min_size: the whole side is kept (the reference never hits
    # this — it resizes to >=400 first — but the guard must not crash)
    rng = np.random.default_rng(1)
    cw, ch, ci, cj = _crop_draws(300, 420, rng, 384, 600)
    assert cw == 300 and cj == 0


# ---------------------------------------------------------------------------
# Aspect-ratio resize rule
# ---------------------------------------------------------------------------

def _detr_size_oracle(w, h, size, max_size):
    """Transcription of the documented get_size_with_aspect_ratio rule."""
    if max_size is not None:
        mn, mx = float(min(w, h)), float(max(w, h))
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def test_aspect_size_rule():
    rng = np.random.default_rng(11)
    for _ in range(500):
        w = int(rng.integers(40, 2000))
        h = int(rng.integers(40, 2000))
        size = int(rng.choice([480, 600, 800]))
        max_size = int(rng.choice([1000, 1333]))
        oh, ow = _aspect_size(w, h, size, max_size)
        assert (oh, ow) == _detr_size_oracle(w, h, size, max_size)
        # invariants: max side bounded within the rule's own rounding slack
        # (round(max_size*mn/mx) can round UP, overshooting by ~mx/(2*mn) —
        # real DETR behavior for extreme aspect ratios, not a bug here)
        slack = max(w, h) / (2 * min(w, h)) + 1
        assert max(oh, ow) <= max_size + slack
        if max(w, h) / min(w, h) * size <= max_size:   # unclamped
            assert min(oh, ow) == size
        assert abs(ow / oh - w / h) * min(oh, ow) < 2


# ---------------------------------------------------------------------------
# Box algebra
# ---------------------------------------------------------------------------

def test_hflip_box_algebra():
    rng = np.random.default_rng(3)
    img = _rand_image(rng, w=40, h=30)
    boxes = np.asarray([[5, 4, 20, 25], [0, 0, 40, 30]], np.float32)
    tgt = {"boxes_h": boxes.copy(), "boxes_o": boxes[::-1].copy()}
    img1, t1 = hflip(img, tgt)
    np.testing.assert_allclose(
        t1["boxes_h"], [[40 - 20, 4, 40 - 5, 25], [0, 0, 40, 30]])
    # involution: flipping twice restores boxes and pixels
    img2, t2 = hflip(img1, t1)
    np.testing.assert_allclose(t2["boxes_h"], tgt["boxes_h"])
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img))


def test_crop_apply_box_algebra():
    rng = np.random.default_rng(4)
    img = _rand_image(rng, w=50, h=40)
    # one box fully inside the crop, one partially, one fully outside
    tgt = {"boxes_h": np.asarray([[12, 12, 20, 20], [2, 2, 15, 15],
                                  [0, 0, 5, 5]], np.float32),
           "boxes_o": np.asarray([[14, 14, 22, 22], [12, 12, 30, 30],
                                  [1, 1, 6, 6]], np.float32),
           "hoi": np.asarray([7, 8, 9]),
           "verb": np.asarray([1, 2, 3]),
           "object": np.asarray([4, 5, 6])}
    out_img, out = crop_apply(img, tgt, j=10, i=10, w=25, h=20)
    assert out_img.size == (25, 20)
    np.testing.assert_array_equal(
        np.asarray(out_img), np.asarray(img)[10:30, 10:35])
    # pair 0: translated intact; pair 1: human box clipped to crop edge;
    # pair 2 dropped (human box degenerate after clip)
    np.testing.assert_allclose(out["boxes_h"],
                               [[2, 2, 10, 10], [0, 0, 5, 5]])
    np.testing.assert_allclose(out["boxes_o"],
                               [[4, 4, 12, 12], [2, 2, 20, 20]])
    np.testing.assert_array_equal(out["hoi"], [7, 8])
    np.testing.assert_array_equal(out["verb"], [1, 2])


def test_plan_replays_call_geometry():
    """plan() must predict __call__'s DETR-frame size exactly — the
    multi-process padded-batch agreement (factory.padded_hw) depends on
    replaying the rng draws in the same order without touching pixels."""
    t = DualStreamTransform(training=True, crop_range=(8, 30),
                            train_scales=(32, 48), crop_resize_choices=(40,))
    base = np.random.default_rng(5)
    img = _rand_image(base, w=60, h=44)
    tgt = {"boxes_h": np.asarray([[5., 5., 30., 30.]], np.float32),
           "boxes_o": np.asarray([[10., 10., 40., 40.]], np.float32),
           "hoi": np.asarray([3]), "verb": np.asarray([1]),
           "object": np.asarray([2])}
    for i in range(30):
        p = t.plan(*img.size, rng=np.random.default_rng(100 + i))
        detr_img, _, _ = t(img, dict(tgt),
                           rng=np.random.default_rng(100 + i))
        assert tuple(detr_img.shape[1:]) == tuple(p["out_hw"]), i
