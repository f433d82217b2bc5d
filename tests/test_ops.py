"""ops package tests: parity with torch/reference oracles and invariants."""
import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from hoigen_tpu import ops

torch = pytest.importorskip("torch")


def _rand_boxes(rng, n, lim=100.0):
    xy = rng.random((n, 2)) * lim
    wh = rng.random((n, 2)) * lim / 2 + 1
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


# ---------------------------------------------------------------- boxes ----
def test_box_conversions_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_boxes(rng, 40)
    out = np.asarray(ops.box_xyxy_to_cxcywh(ops.box_cxcywh_to_xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-4)


def test_box_iou_matches_host_reference():
    from hoigen_tpu.eval.association import box_iou as np_iou
    rng = np.random.default_rng(1)
    a, b = _rand_boxes(rng, 20), _rand_boxes(rng, 30)
    np.testing.assert_allclose(
        np.asarray(ops.box_iou(jnp.asarray(a), jnp.asarray(b))),
        np_iou(a, b), atol=1e-5)


# ---------------------------------------------------------------- focal ----
@pytest.fixture(scope="module")
def ref_ops():
    """Load /root/reference/ops.py standalone with torchvision/util stubs."""
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")

    def t_box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def t_box_iou(a, b):
        area_a, area_b = t_box_area(a), t_box_area(b)
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None, :] - inter)

    tv_boxes.box_area = t_box_area
    tv_boxes.box_iou = t_box_iou
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    util = types.ModuleType("util")
    util_box_ops = types.ModuleType("util.box_ops")
    util_box_ops.generalized_box_iou = t_box_iou  # unused by tested fns
    util.box_ops = util_box_ops
    for k, v in {"torchvision": tv, "torchvision.ops": tv_ops,
                 "torchvision.ops.boxes": tv_boxes, "util": util,
                 "util.box_ops": util_box_ops}.items():
        sys.modules[k] = v
    spec = importlib.util.spec_from_file_location("ref_ops",
                                                  "/root/reference/ops.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_focal_loss_parity(ref_ops):
    rng = np.random.default_rng(2)
    x = rng.normal(0, 3, (64, 17)).astype(np.float32)
    y = (rng.random((64, 17)) < 0.3).astype(np.float32)
    for red in ("mean", "sum"):
        ours = float(ops.binary_focal_loss_with_logits(
            jnp.asarray(x), jnp.asarray(y), alpha=0.5, gamma=0.2,
            reduction=red))
        ref = float(ref_ops.binary_focal_loss_with_logits(
            torch.from_numpy(x), torch.from_numpy(y), alpha=0.5, gamma=0.2,
            reduction=red))
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref)), (red, ours, ref)


def test_spatial_encodings_parity(ref_ops):
    rng = np.random.default_rng(3)
    b1, b2 = _rand_boxes(rng, 25), _rand_boxes(rng, 25)
    shape = (480, 640)
    ours = np.asarray(ops.compute_spatial_encodings(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(shape, jnp.float32)))
    ref = ref_ops.compute_spatial_encodings(
        [torch.from_numpy(b1)], [torch.from_numpy(b2)], [shape]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_prior_modulated_logits():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(10, 5)).astype(np.float32)
    prior = rng.random((10, 5)).astype(np.float32)
    ours = np.asarray(ops.prior_modulated_logits(
        jnp.asarray(logits.astype(np.float64)),
        jnp.asarray(prior.astype(np.float64))))
    ref = np.log(prior.astype(np.float64)
                 / (1 + np.exp(-logits.astype(np.float64))
                    - prior.astype(np.float64)) + 1e-8)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


# ---------------------------------------------------------------- masks ----
def test_generate_masks_vs_native():
    from hoigen_tpu.native import generate_masks_native
    rng = np.random.default_rng(5)
    boxes = _rand_boxes(rng, 30, lim=20.0)
    h = w = 24
    ours = np.asarray(ops.generate_masks(jnp.asarray(boxes), h, w))
    native = generate_masks_native(boxes, h, w)
    np.testing.assert_allclose(ours, native, atol=1e-6)


def test_generate_masks_area():
    # total coverage equals box area (for boxes inside the canvas)
    boxes = jnp.asarray([[1.25, 2.5, 7.75, 9.0], [3.0, 3.0, 3.4, 3.2]])
    m = ops.generate_masks(boxes, 16, 16)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    np.testing.assert_allclose(np.asarray(m.sum((1, 2))), np.asarray(areas),
                               rtol=1e-5)


# ------------------------------------------------------------------ nms ----
def _torch_batched_nms(boxes, scores, classes, thresh):
    """Oracle: torchvision batched_nms semantics implemented directly."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    from hoigen_tpu.eval.association import box_iou as np_iou
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        dup = (iou[i] > thresh) & (classes == classes[i])
        dup[i] = False
        suppressed |= dup
    return np.asarray(sorted(keep))


def test_batched_nms_mask():
    rng = np.random.default_rng(6)
    for _ in range(10):
        n = 50
        boxes = _rand_boxes(rng, n, lim=40.0)
        scores = rng.random(n).astype(np.float32)
        classes = rng.integers(0, 4, n)
        mask = np.asarray(ops.batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5))
        ours = np.nonzero(mask)[0]
        ref = _torch_batched_nms(boxes, scores, classes, 0.5)
        np.testing.assert_array_equal(ours, ref)


def test_batched_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.5, 0.9])
    classes = jnp.asarray([1, 1])
    # padding slot (higher score!) must not suppress the real one
    mask = ops.batched_nms_mask(boxes, scores, classes, 0.5,
                                valid=jnp.asarray([True, False]))
    assert mask.tolist() == [True, False]


# ------------------------------------------------------------ roi_align ----
def _np_roi_align(feat, rois, out_size, scale, sampling_ratio=-1):
    """numpy oracle implementing torchvision roi_align aligned=True."""
    c, height, width = feat.shape
    ph, pw = out_size
    n = rois.shape[0]
    out = np.zeros((n, c, ph, pw), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > height or x < -1.0 or x > width:
            return np.zeros(c)
        y = min(max(y, 0.0), height - 1)
        x = min(max(x, 0.0), width - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, height - 1), min(x0 + 1, width - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat[:, y0, x0]
                + (1 - ly) * lx * feat[:, y0, x1]
                + ly * (1 - lx) * feat[:, y1, x0]
                + ly * lx * feat[:, y1, x1])

    for i in range(n):
        x1_, y1_, x2_, y2_ = rois[i] * scale - 0.5
        rw, rh = x2_ - x1_, y2_ - y1_
        bh, bw = rh / ph, rw / pw
        gy = sampling_ratio if sampling_ratio > 0 else max(int(np.ceil(rh / ph)), 1)
        gx = sampling_ratio if sampling_ratio > 0 else max(int(np.ceil(rw / pw)), 1)
        for p in range(ph):
            for q in range(pw):
                acc = np.zeros(c)
                for iy in range(gy):
                    yy = y1_ + p * bh + (iy + 0.5) * bh / gy
                    for ix in range(gx):
                        xx = x1_ + q * bw + (ix + 0.5) * bw / gx
                        acc += bilinear(yy, xx)
                out[i, :, p, q] = acc / (gy * gx)
    return out


@pytest.mark.parametrize("sampling_ratio", [-1, 1, 2])
def test_roi_align_parity(sampling_ratio):
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(8, 14, 14)).astype(np.float64)
    # rois in 224-coord space (scale 1/16), mix of sizes incl. tiny/edge
    rois = np.stack([
        np.array([10.0, 20.0, 200.0, 210.0]),
        np.array([0.0, 0.0, 224.0, 224.0]),
        np.array([50.0, 60.0, 55.0, 70.0]),
        np.array([-5.0, -5.0, 40.0, 30.0]),
        np.array([200.0, 200.0, 224.0, 224.0]),
    ]).astype(np.float64)
    ours = np.asarray(ops.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    (7, 7), 1 / 16.0, sampling_ratio))
    ref = _np_roi_align(feat, rois, (7, 7), 1 / 16.0, sampling_ratio)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_roi_align_mean_matches_full():
    rng = np.random.default_rng(8)
    feat = rng.normal(size=(16, 14, 14)).astype(np.float64)
    rois = _rand_boxes(rng, 12, lim=220.0).astype(np.float64)
    full = ops.roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7), 1 / 16.0)
    fused = ops.roi_align_mean(jnp.asarray(feat), jnp.asarray(rois), (7, 7),
                               1 / 16.0)
    np.testing.assert_allclose(np.asarray(full.mean((-2, -1))),
                               np.asarray(fused), atol=1e-10)


def test_roi_align_batched():
    rng = np.random.default_rng(9)
    feat = rng.normal(size=(3, 4, 14, 14)).astype(np.float32)
    rois = np.stack([_rand_boxes(rng, 5, 200.0) for _ in range(3)])
    out = ops.roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7), 1 / 16.0)
    assert out.shape == (3, 5, 4, 7, 7)
    single = ops.roi_align(jnp.asarray(feat[1]), jnp.asarray(rois[1]), (7, 7),
                           1 / 16.0)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single),
                               atol=1e-6)


# --------------------------------------------------------- pallas cache ----
def test_fused_cache_logits_interpret():
    """Pallas fused cache scoring vs plain XLA (interpreter mode on CPU),
    forward and gradients."""
    import jax
    import functools
    from hoigen_tpu.ops.pallas_cache import (_fused_forward,
                                             cache_logits_reference)
    rng = np.random.default_rng(11)
    n, d, r, c = 70, 128, 256, 384     # deliberately non-tile-multiple N
    x = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=(r, d)).astype(np.float32) * 0.1
    b = -np.ones(r, np.float32)
    l = (rng.random((r, c)) < 0.05).astype(np.float32)
    s = l.sum(0) + 1.0
    out = np.asarray(_fused_forward(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), jnp.asarray(l),
                                    jnp.asarray(s), interpret=True))
    ref = np.asarray(cache_logits_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(l),
        jnp.asarray(s)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_cache_logits_grads():
    import jax
    from hoigen_tpu.ops.pallas_cache import (fused_cache_logits,
                                             cache_logits_reference)
    rng = np.random.default_rng(12)
    n, d, r, c = 16, 32, 24, 40
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
    l = jnp.asarray((rng.random((r, c)) < 0.2).astype(np.float32))
    s = jnp.asarray(l.sum(0) + 1.0)

    def loss_fused(x_, w_, b_):
        return (fused_cache_logits(x_, w_, b_, l, s, True) ** 2).sum()

    def loss_ref(x_, w_, b_):
        return (cache_logits_reference(x_, w_, b_, l, s) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


def test_fused_attention_parity():
    """Pallas fused attention (interpret mode) == the XLA reference math,
    including key-padding bias and non-block-multiple lengths."""
    import jax.numpy as jnp
    from hoigen_tpu.ops.attention import _xla_attention, fused_attention

    rng = np.random.default_rng(0)
    b, h, l, d = 2, 3, 70, 32
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(
        np.where(rng.random((b, l)) < 0.2, -1e9, 0.0).astype(np.float32))
    ref = _xla_attention(q, k, v, bias, 1.0 / np.sqrt(d))
    got = fused_attention(q, k, v, key_bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # no bias path
    ref = _xla_attention(q, k, v, None, 1.0 / np.sqrt(d))
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # cross-attention: Lq != Lk (decoder queries over encoder memory)
    qc = jnp.asarray(rng.normal(size=(b, h, 36, d)).astype(np.float32))
    ref = _xla_attention(qc, k, v, bias, 1.0 / np.sqrt(d))
    got = fused_attention(qc, k, v, key_bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)




def test_fused_attention_vjp():
    """The flash-style Pallas backward (interpret mode) == XLA autodiff
    grads for q/k/v AND the additive key bias, across self/cross shapes
    and non-block-multiple lengths."""
    import jax
    import jax.numpy as jnp
    from hoigen_tpu.ops.attention import _xla_attention, fused_attention

    rng = np.random.default_rng(1)
    b, h, d = 2, 3, 32
    for lq, lk, with_bias in ((70, 70, True), (70, 70, False),
                              (36, 70, True), (200, 150, False)):
        q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
        k, v = (jnp.asarray(rng.normal(size=(b, h, lk, d))
                            .astype(np.float32)) for _ in range(2))
        bias = jnp.asarray(
            np.where(rng.random((b, lk)) < 0.2, -1e9,
                     rng.normal(0, 0.3, (b, lk))).astype(np.float32)) \
            if with_bias else None
        gref = jnp.asarray(rng.normal(size=(b, h, lq, d))
                           .astype(np.float32))

        def loss_ref(q, k, v, bias):
            return jnp.sum(_xla_attention(q, k, v, bias,
                                          1.0 / np.sqrt(d)) * gref)

        def loss_fused(q, k, v, bias):
            return jnp.sum(fused_attention(q, k, v, key_bias=bias,
                                           interpret=True) * gref)

        ref = jax.grad(loss_ref, argnums=(0, 1, 2) +
                       ((3,) if with_bias else ()))(q, k, v, bias)
        got = jax.grad(loss_fused, argnums=(0, 1, 2) +
                       ((3,) if with_bias else ()))(q, k, v, bias)
        for name, r, g in zip("qkvb", ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=3e-4, rtol=1e-3,
                err_msg=f"d{name} lq={lq} lk={lk} bias={with_bias}")


def test_clip_fused_attention_matches_mha():
    """The ViT self-attention fused path (CPU fallback) == the mha path,
    values and grads, so flipping CLIPConfig.fused_attention cannot change
    the model's math."""
    import jax
    import jax.numpy as jnp
    from hoigen_tpu.models.clip.model import _mhsa_fused, mha

    rng = np.random.default_rng(2)
    b, l, e, heads = 2, 17, 64, 4
    x = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))
    p = {"w_qkv": jnp.asarray(rng.normal(size=(3 * e, e), scale=0.1)
                              .astype(np.float32)),
         "b_qkv": jnp.asarray(rng.normal(size=(3 * e,), scale=0.1)
                              .astype(np.float32)),
         "w_out": jnp.asarray(rng.normal(size=(e, e), scale=0.1)
                              .astype(np.float32)),
         "b_out": jnp.asarray(rng.normal(size=(e,), scale=0.1)
                              .astype(np.float32))}
    ref = mha(p, x, x, heads)
    got = _mhsa_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    gr = jax.grad(lambda pp: jnp.sum(mha(pp, x, x, heads) ** 2))(p)
    gf = jax.grad(lambda pp: jnp.sum(_mhsa_fused(pp, x, heads) ** 2))(p)
    for kk in p:
        np.testing.assert_allclose(np.asarray(gf[kk]), np.asarray(gr[kk]),
                                   atol=3e-4, rtol=1e-3, err_msg=kk)


def test_stem_s2d_conv_parity():
    """Space-to-depth 7x7/s2 stem conv == the strided lax conv (exact
    contraction set; fp32 tolerance only)."""
    import jax
    import jax.numpy as jnp
    from hoigen_tpu.models.detr.resnet import conv7x7_s2_s2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 64, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 3, 7, 7)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got = conv7x7_s2_s2d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_resnet_nhwc_forward_parity():
    """The NHWC tower (production path) == the NCHW reference form."""
    import jax
    from hoigen_tpu.models.detr.resnet import (init_resnet50_params,
                                               resnet50_forward,
                                               resnet50_forward_nhwc)

    rng = np.random.default_rng(2)
    p = init_resnet50_params(jax.random.PRNGKey(0))
    x = np.asarray(rng.normal(size=(2, 3, 64, 96)), np.float32)
    a = np.asarray(resnet50_forward(p, x))
    b = np.asarray(resnet50_forward_nhwc(p, x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(a, b.transpose(0, 3, 1, 2),
                               atol=1e-4, rtol=1e-5)


def test_resnet_stem_s2d_forward_parity():
    """resnet50_forward with the s2d stem == the strided-stem forward."""
    import jax
    from hoigen_tpu.models.detr.resnet import (init_resnet50_params,
                                               resnet50_forward)

    rng = np.random.default_rng(1)
    p = init_resnet50_params(jax.random.PRNGKey(0))
    x = np.asarray(rng.normal(size=(1, 3, 64, 64)), np.float32)
    a = np.asarray(resnet50_forward(p, x, stem_s2d=False))
    b = np.asarray(resnet50_forward(p, x, stem_s2d=True))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_resnet_fused_tail_parity():
    """The Pallas fused bottleneck-chain tail (interpret mode) == the
    unfused NHWC tower, all four residual layers fused."""
    import jax
    from hoigen_tpu.models.detr.resnet import (init_resnet50_params,
                                               resnet50_forward_nhwc)

    rng = np.random.default_rng(3)
    p = init_resnet50_params(jax.random.PRNGKey(0))
    x = np.asarray(rng.normal(size=(1, 64, 96, 3)), np.float32)
    a = np.asarray(resnet50_forward_nhwc(p, x))
    b = np.asarray(resnet50_forward_nhwc(p, x, fused_tail=(0, 1, 2, 3),
                                         interpret=True))
    # GEMM-order noise accumulates over 16 chained blocks; production runs
    # bf16 and mAP-level agreement is gated by the e2e parity harness
    np.testing.assert_allclose(a, b, atol=1e-2, rtol=5e-3)
