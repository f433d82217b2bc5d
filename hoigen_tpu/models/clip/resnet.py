"""ModifiedResNet CLIP visual tower (RN50-variant checkpoints), functional.

Mirrors the reference ModifiedResNet + AttentionPool2d
(/root/reference/CLIP_models_adapter_prior2.py:205-420):

  * 3-conv stem (first stride 2) + 2x2 average pool instead of 7x7/maxpool.
  * Anti-aliased striding: every conv has stride 1; a stride-wide average
    pool follows the 3x3 conv (and prefixes the downsample 1x1).
  * Final pooling is a QKV attention over [mean token; spatial tokens] with
    a learned positional embedding whose spatial part is sliced [:H, :W]
    at forward time (:271-276); returns (global CLS-out, local feature map).

TPU-first shape: NHWC convolutions (channels on the lane dimension), the
attention pool as batched einsums on the MXU. BatchNorms are folded into
per-channel (scale, bias) at conversion time — the tower only ever runs
from frozen checkpoint statistics (the reference has no adapter inside
ModifiedResNet, so nothing in this tower trains; :311-420).

The local feature map is returned channels-last (B, H, W, D), matching the
ViT path in model.py (the reference returns NCHW).
"""
import math

import jax
import jax.numpy as jnp

_DN_NHWC = ("NHWC", "HWIO", "NHWC")


def _conv_bn(x, p, stride=1, padding=0, relu=True):
    w = jnp.transpose(p["w"], (2, 3, 1, 0)).astype(x.dtype)  # OIHW -> HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=_DN_NHWC)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _avg_pool(x, k):
    """nn.AvgPool2d(k): window k, stride k, no padding (floor mode)."""
    if k <= 1:
        return x
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, k, k, 1), "VALID")
    return s / (k * k)


def _bottleneck(x, p, stride):
    """Bottleneck.forward (:237-250): stride realized as a post-conv2
    average pool; downsample = avgpool + 1x1 conv."""
    out = _conv_bn(x, p["conv1"])
    out = _conv_bn(out, p["conv2"], padding=1)
    out = _avg_pool(out, stride)
    out = _conv_bn(out, p["conv3"], relu=False)
    if "down" in p:
        identity = _conv_bn(_avg_pool(x, stride), p["down"], relu=False)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(p, x, num_heads):
    """AttentionPool2d.forward (:264-306). x: (B, H, W, E) ->
    (global (B, D), local (B, H, W, D))."""
    b, h, w, e = x.shape
    tokens = x.reshape(b, h * w, e)
    t = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
    s = round(math.isqrt(p["pos"].shape[0] - 1))
    spatial = p["pos"][1:].reshape(s, s, e)[:h, :w].reshape(h * w, e)
    pos = jnp.concatenate([p["pos"][:1], spatial], axis=0)
    t = t + pos[None].astype(t.dtype)

    hd = e // num_heads
    q = (t @ p["q_w"].astype(t.dtype).T + p["q_b"].astype(t.dtype))
    k = (t @ p["k_w"].astype(t.dtype).T + p["k_b"].astype(t.dtype))
    v = (t @ p["v_w"].astype(t.dtype).T + p["v_b"].astype(t.dtype))
    lq = t.shape[1]
    q = q.reshape(b, lq, num_heads, hd)
    k = k.reshape(b, lq, num_heads, hd)
    v = v.reshape(b, lq, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(t.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, lq, e)
    out = out @ p["c_w"].astype(t.dtype).T + p["c_b"].astype(t.dtype)
    return out[:, 0], out[:, 1:].reshape(b, h, w, -1)


def modified_resnet_forward(params, images, num_heads):
    """images: (B, 3, H, W) NCHW (CLIP API convention) ->
    (global (B, embed), local (B, H/32, W/32, embed)).

    ModifiedResNet.forward (:385-410): stem -> layer1..4 -> attnpool.
    """
    x = jnp.transpose(images, (0, 2, 3, 1))  # NHWC for TPU convs
    x = _conv_bn(x, params["stem1"], stride=2, padding=1)
    x = _conv_bn(x, params["stem2"], padding=1)
    x = _conv_bn(x, params["stem3"], padding=1)
    x = _avg_pool(x, 2)
    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = _bottleneck(x, bp, stride if bi == 0 else 1)
    return attention_pool(params["attnpool"], x, num_heads)


# ---------------------------------------------------------------- init -----
def _conv_bn_init(rng, out_c, in_c, k):
    fan = in_c * k * k
    w = jax.random.normal(rng, (out_c, in_c, k, k)) * math.sqrt(2.0 / fan)
    return {"w": w, "scale": jnp.ones(out_c), "bias": jnp.zeros(out_c)}


def init_modified_resnet_params(rng, layers, width, embed_dim, spacial_dim):
    """Random init mirroring the reference's CLIP.initialize_parameters for
    the RN branch (:725-737: attnpool projections std = embed_dim^-0.5;
    bn3 weight zeroed -> folded scale 0)."""
    p = {"stem1": _conv_bn_init(jax.random.fold_in(rng, 0), width // 2, 3, 3),
         "stem2": _conv_bn_init(jax.random.fold_in(rng, 1), width // 2,
                                width // 2, 3),
         "stem3": _conv_bn_init(jax.random.fold_in(rng, 2), width,
                                width // 2, 3),
         "layers": []}
    in_c = width
    for li, n_blocks in enumerate(layers):
        planes = width * (2 ** li)
        out_c = planes * 4
        blocks = []
        for bi in range(n_blocks):
            r = jax.random.fold_in(rng, 100 * (li + 1) + bi)
            blk = {"conv1": _conv_bn_init(jax.random.fold_in(r, 1),
                                          planes, in_c, 1),
                   "conv2": _conv_bn_init(jax.random.fold_in(r, 2),
                                          planes, planes, 3),
                   "conv3": _conv_bn_init(jax.random.fold_in(r, 3),
                                          out_c, planes, 1)}
            blk["conv3"]["scale"] = jnp.zeros(out_c)  # zero-init bn3 weight
            stride = 2 if (li > 0 and bi == 0) else 1
            if stride > 1 or in_c != out_c:
                blk["down"] = _conv_bn_init(jax.random.fold_in(r, 4),
                                            out_c, in_c, 1)
            blocks.append(blk)
            in_c = out_c
        p["layers"].append(blocks)
    e = width * 32
    std = e ** -0.5
    ks = jax.random.split(jax.random.fold_in(rng, 9), 4)
    p["attnpool"] = {
        "pos": jax.random.normal(ks[0], (spacial_dim ** 2 + 1, e)) * std,
        "q_w": jax.random.normal(ks[1], (e, e)) * std,
        "q_b": jnp.zeros(e),
        "k_w": jax.random.normal(ks[2], (e, e)) * std,
        "k_b": jnp.zeros(e),
        "v_w": jax.random.normal(ks[3], (e, e)) * std,
        "v_b": jnp.zeros(e),
        "c_w": jax.random.normal(jax.random.fold_in(rng, 10),
                                 (embed_dim, e)) * std,
        "c_b": jnp.zeros(embed_dim),
    }
    return p
