"""ResNet-50 backbone with frozen BatchNorm, functional JAX.

Matches torchvision resnet50 (v1.5: stride in the 3x3 conv) as used by DETR
(/root/reference/detr/models/backbone.py:83 with FrozenBatchNorm2d,
return layer4 only). Frozen BN is folded at conversion time into a
per-channel (scale, bias) applied after each conv — on TPU this fuses into
the convolution epilogue.
"""
import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCHW", "OIHW", "NCHW")
LAYER_BLOCKS = (3, 4, 6, 3)
BN_EPS = 1e-5


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)], dimension_numbers=_DN)


def conv7x7_s2_s2d(x, w):
    """The stem 7x7/stride-2/pad-3 conv, restructured space-to-depth:
    a 4x4/stride-1 valid conv over the four 2x2 phases of the (padded)
    input stacked on channels. Bit-identical contraction set — each output
    pixel sums exactly the taps 2i+dy, 2j+dx as the strided form; the
    even/odd kernel taps land in separate phase channels (odd phases get a
    zero 4th tap). Lifts the stem's effective input channel count 3 -> 12,
    which quadruples MXU contraction occupancy for the single most
    expensive conv in the network (800x1344 spatial).
    """
    b, c, h, wd = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (3, 5), (3, 5)))
    xs = jnp.concatenate([xp[:, :, py::2, px::2]
                          for py in (0, 1) for px in (0, 1)], axis=1)
    wp = []
    for py in (0, 1):
        for px in (0, 1):
            sub = w[:, :, py::2, px::2]
            wp.append(jnp.pad(sub, ((0, 0), (0, 0),
                                    (0, 4 - sub.shape[2]),
                                    (0, 4 - sub.shape[3]))))
    w2 = jnp.concatenate(wp, axis=1).astype(x.dtype)
    out = jax.lax.conv_general_dilated(xs, w2, (1, 1), [(0, 0), (0, 0)],
                                       dimension_numbers=_DN)
    return out[:, :, :h // 2, :wd // 2]


def _conv_bn(x, p, stride=1, padding=0, relu=True):
    y = _conv(x, p["w"], stride, padding)
    y = y * p["scale"].astype(x.dtype)[None, :, None, None] \
        + p["bias"].astype(x.dtype)[None, :, None, None]
    return jax.nn.relu(y) if relu else y


def _max_pool_3x3_s2(x):
    # reduce_window looks slow in isolation (48ms standalone at the eval
    # bucket vs 14ms for a shifted-max decomposition) but wins in-graph:
    # XLA fuses it with the stem conv (233 vs 203 img/s whole-pipeline on
    # v5e). Keep the fusable form; don't hand-schedule this one.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def _bottleneck(x, p, stride):
    out = _conv_bn(x, p["conv1"])
    out = _conv_bn(out, p["conv2"], stride=stride, padding=1)
    out = _conv_bn(out, p["conv3"], relu=False)
    identity = _conv_bn(x, p["down"], stride=stride, relu=False) \
        if "down" in p else x
    return jax.nn.relu(out + identity)


def resnet50_forward(params, x, stem_s2d=None, remat=False):
    """x: (B, 3, H, W) -> C5 features (B, 2048, H/32, W/32).

    ``remat``: wrap every bottleneck in jax.checkpoint so the backward
    pass recomputes block activations instead of storing them — required
    to fit full-DETR training (the offline finetune) in HBM at the large
    buckets; the HOI pipeline runs the backbone frozen and leaves it off.

    ``stem_s2d``: route the stem conv through the space-to-depth form
    (conv7x7_s2_s2d). Default OFF: measured on v5e at the eval bucket the
    whole-pipeline throughput HALVES (275 -> 144 img/s) — the four
    stride-2 phase slices of the padded input relayout a 0.5GB tensor and
    swamp the MXU-occupancy gain. Kept (with parity tests) as a recorded
    dead end; the strided conv + XLA's own fusion is the fast path.
    """
    if stem_s2d is None:
        stem_s2d = False
    if stem_s2d:
        p = params["stem"]
        y = conv7x7_s2_s2d(x, p["w"])
        x = jax.nn.relu(y * p["scale"].astype(x.dtype)[None, :, None, None]
                        + p["bias"].astype(x.dtype)[None, :, None, None])
    else:
        x = _conv_bn(x, params["stem"], stride=2, padding=3)
    x = _max_pool_3x3_s2(x)
    block = jax.checkpoint(_bottleneck, static_argnums=(2,)) if remat \
        else _bottleneck
    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = block(x, bp, stride if bi == 0 else 1)
    return x


# ------------------------------------------------------------- NHWC --------
_DN_NHWC = ("NHWC", "HWIO", "NHWC")


def _conv_nhwc(x, w_oihw, stride=1, padding=0):
    # OIHW -> HWIO at trace time; XLA folds the transpose into the
    # constant/frozen weight
    w = jnp.transpose(w_oihw, (2, 3, 1, 0)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=_DN_NHWC)


def _conv_bn_nhwc(x, p, stride=1, padding=0, relu=True):
    y = _conv_nhwc(x, p["w"], stride, padding)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _max_pool_3x3_s2_nhwc(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _bottleneck_nhwc(x, p, stride):
    out = _conv_bn_nhwc(x, p["conv1"])
    out = _conv_bn_nhwc(out, p["conv2"], stride=stride, padding=1)
    out = _conv_bn_nhwc(out, p["conv3"], relu=False)
    identity = _conv_bn_nhwc(x, p["down"], stride=stride, relu=False) \
        if "down" in p else x
    return jax.nn.relu(out + identity)


def resnet50_forward_nhwc(params, x, remat=False, fused_tail=(),
                          interpret=False):
    """x: (B, H, W, 3) -> C5 (B, H/32, W/32, 2048): the NCHW tower's math
    in XLA-TPU's native conv layout (channels minor = lane dimension), so
    no boundary transposes/relayouts between fused regions. Same params
    (OIHW weights transposed at trace time).

    ``fused_tail``: residual-layer indices whose stride-1 tail blocks run
    through the Pallas bottleneck-chain kernel (ops/fused_resnet.py; the
    wide activation is read/written once per chain instead of ~3x per
    block). Inference-only (no VJP; the HOI pipeline's backbone is frozen
    with no trainable params upstream, so the train step may use it too —
    cli/train_detr.py, which trains the backbone, must not). Measured on
    v5e at batch 16 / 800x1344 bf16: layer1 16.8 -> 11.4 ms; layer2 at
    parity with XLA; layers 3-4 are MXU-bound so fusion buys nothing —
    hence the default recommendation (0,) via DETRConfig."""
    x = _conv_bn_nhwc(x, params["stem"], stride=2, padding=3)
    x = _max_pool_3x3_s2_nhwc(x)
    block = jax.checkpoint(_bottleneck_nhwc, static_argnums=(2,)) if remat \
        else _bottleneck_nhwc
    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        if li in fused_tail and len(blocks) > 1 and not remat:
            from ...ops.fused_resnet import fused_bottleneck_chain
            x = block(x, blocks[0], stride)
            x = fused_bottleneck_chain(x, blocks[1:], interpret=interpret)
        else:
            for bi, bp in enumerate(blocks):
                x = block(x, bp, stride if bi == 0 else 1)
    return x


# ---------------------------------------------------------------- init -----
def _conv_bn_init(rng, out_c, in_c, k):
    fan = in_c * k * k
    w = jax.random.normal(rng, (out_c, in_c, k, k)) * np.sqrt(2.0 / fan)
    return {"w": w, "scale": jnp.ones(out_c), "bias": jnp.zeros(out_c)}


def init_resnet50_params(rng):
    widths = (256, 512, 1024, 2048)
    params = {"stem": _conv_bn_init(jax.random.fold_in(rng, 0), 64, 3, 7),
              "layers": []}
    in_c = 64
    for li, (n_blocks, out_c) in enumerate(zip(LAYER_BLOCKS, widths)):
        mid = out_c // 4
        blocks = []
        for bi in range(n_blocks):
            r = jax.random.fold_in(rng, 100 * (li + 1) + bi)
            blk = {
                "conv1": _conv_bn_init(jax.random.fold_in(r, 1), mid, in_c, 1),
                "conv2": _conv_bn_init(jax.random.fold_in(r, 2), mid, mid, 3),
                "conv3": _conv_bn_init(jax.random.fold_in(r, 3), out_c, mid, 1),
            }
            if bi == 0:
                blk["down"] = _conv_bn_init(jax.random.fold_in(r, 4),
                                            out_c, in_c, 1)
            blocks.append(blk)
            in_c = out_c
        params["layers"].append(blocks)
    return params


def fold_bn(conv_w, bn_w, bn_b, bn_mean, bn_var, eps=BN_EPS):
    """Frozen BN (y = (x-mean)/sqrt(var+eps)*w + b) -> post-conv scale/bias."""
    scale = bn_w / np.sqrt(bn_var + eps)
    return {"w": jnp.asarray(conv_w), "scale": jnp.asarray(scale),
            "bias": jnp.asarray(bn_b - bn_mean * scale)}
