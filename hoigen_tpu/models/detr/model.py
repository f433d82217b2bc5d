"""DETR detection transformer, functional JAX.

Matches the reference architecture used frozen by the HOI pipeline:
  * sine positional embedding with masked cumsum + normalize
    (/root/reference/detr/models/position_encoding.py:12-48)
  * post-norm transformer, 6 encoder + 6 decoder layers, query positional
    embeddings added at every layer, decoder intermediate outputs
    (/root/reference/detr/models/transformer.py:18-121,157-250)
  * class head (Linear -> num_classes+1 softmax) and 3-layer bbox MLP with
    sigmoid (/root/reference/detr/models/detr.py:21-75)
  * PostProcess: per-query max over real classes, cxcywh -> absolute xyxy
    (/root/reference/detr/models/detr.py:258-290)

The UPT pipeline runs DETR frozen — no dropout paths are needed at all
(dropout only ever ran during offline detector fine-tuning).
"""
import math

import jax
import jax.numpy as jnp

from ..clip.model import layer_norm, mha  # shared primitive blocks
from .config import DETRConfig
from .resnet import resnet50_forward_nhwc, init_resnet50_params
from ...ops.boxes import box_cxcywh_to_xyxy


def downsample_mask(mask, out_h, out_w):
    """bool (B, H, W) padding mask -> (B, out_h, out_w) via nearest
    interpolation (detr/models/backbone.py F.interpolate default)."""
    b, h, w = mask.shape
    ys = (jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    xs = (jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


def sine_position_embedding(mask, num_pos_feats=128, temperature=10000.0,
                            scale=2 * math.pi):
    """mask: bool (B, H, W), True = padding -> (B, H, W, 2*num_pos_feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=4).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=4).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)


def _ffn(p, x):
    # weights cast to the activation dtype — f32 weights would promote a
    # bf16 tower back to f32 (see clip.model.mha)
    h = jax.nn.relu(x @ p["lin1_w"].astype(x.dtype).T
                    + p["lin1_b"].astype(x.dtype))
    return h @ p["lin2_w"].astype(x.dtype).T + p["lin2_b"].astype(x.dtype)


def _mha_fused(p, q, kv, num_heads, key_padding_mask, kv_pos):
    """Same math as clip.model.mha but through the fused Pallas attention
    (ops/attention.py): projections and output stay XLA; the score/softmax/
    value contraction never materializes in HBM.

    The kernel runs in the tower dtype (callers gate the fused path on the
    tower running bf16 — an f32 tower would double the kernel's VMEM
    footprint past the 16MB scoped limit and silently change the precision
    class of a float32-configured pipeline); scores still accumulate in f32
    inside the kernel."""
    from ...ops.attention import fused_attention
    b, lq, e = q.shape
    hd = e // num_heads
    dt = q.dtype
    lk = kv.shape[1]
    w_q, w_k, w_v = jnp.split(p["w_qkv"].astype(dt), 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["b_qkv"].astype(dt), 3, axis=0)
    q = q.astype(dt)
    kv = kv.astype(dt)
    k_in = kv if kv_pos is None else kv + kv_pos.astype(dt)
    qh = (q @ w_q.T + b_q).reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = (k_in @ w_k.T + b_k).reshape(b, lk, num_heads, hd) \
        .transpose(0, 2, 1, 3)
    vh = (kv @ w_v.T + b_v).reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    bias = None if key_padding_mask is None else \
        jnp.where(key_padding_mask, -1e9, 0.0).astype(jnp.float32)
    o = fused_attention(qh, kh, vh, key_bias=bias)
    out = o.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, lq, e)
    return out @ p["w_out"].astype(dt).T + p["b_out"].astype(dt)


def encoder_layer(p, src, pos, key_padding_mask, num_heads, fused=False):
    q = src + pos
    if fused:
        a = _mha_fused(p["attn"], q, src, num_heads,
                       key_padding_mask=key_padding_mask, kv_pos=pos)
    else:
        a = mha(p["attn"], q, src, num_heads,
                key_padding_mask=key_padding_mask, kv_pos=pos)
    src = layer_norm(src + a, p["norm1"])
    return layer_norm(src + _ffn(p, src), p["norm2"])


def decoder_layer(p, tgt, memory, pos, query_pos, key_padding_mask,
                  num_heads, fused=False):
    q = tgt + query_pos
    tgt = layer_norm(tgt + mha(p["self_attn"], q, tgt, num_heads,
                               kv_pos=query_pos), p["norm1"])
    # cross-attention stays XLA even when the encoder is fused: with only
    # 100 queries the kernel's per-grid-step K/V DMA doesn't amortize —
    # measured 271 vs 276 img/s whole-pipeline with it fused
    del fused
    a = mha(p["cross_attn"], tgt + query_pos, memory, num_heads,
            key_padding_mask=key_padding_mask, kv_pos=pos)
    tgt = layer_norm(tgt + a, p["norm2"])
    return layer_norm(tgt + _ffn(p, tgt), p["norm3"])


def transformer_forward(params, src, mask, query_embed, pos_embed,
                        cfg: DETRConfig):
    """src: (B, L, D) flattened features; mask: (B, L) True = pad;
    pos_embed: (B, L, D). Returns (dec_layers, B, Q, D) intermediates and
    memory (B, L, D)."""
    b = src.shape[0]
    memory = src
    # keep positional/query embeddings in the tower dtype: f32 sine
    # positions otherwise promote `src + pos` and with it every encoder/
    # decoder matmul and activation to f32 (2x HBM traffic, ~4x matmul
    # cost on the MXU) when the tower runs bf16
    pos_embed = pos_embed.astype(src.dtype)
    query_embed = query_embed.astype(src.dtype)
    # fused path only when the tower actually runs bf16: the kernel's VMEM
    # budget assumes 2-byte tiles, and fusing an f32-configured pipeline
    # would silently change its precision class (advisor r2 finding)
    fused = (cfg.fused_encoder_attention and jax.default_backend() == "tpu"
             and src.dtype == jnp.bfloat16)
    for p in params["encoder"]:
        memory = encoder_layer(p, memory, pos_embed, mask, cfg.nheads,
                               fused=fused)
    tgt = jnp.zeros((b, cfg.num_queries, cfg.hidden_dim), src.dtype)
    qp = jnp.broadcast_to(query_embed, (b, *query_embed.shape))
    intermediates = []
    for p in params["decoder"]:
        tgt = decoder_layer(p, tgt, memory, pos_embed, qp, mask, cfg.nheads,
                            fused=fused)
        intermediates.append(layer_norm(tgt, params["decoder_norm"]))
    return jnp.stack(intermediates), memory


def detr_forward(params, images, image_mask, cfg: DETRConfig):
    """images: (B, 3, H, W) padded batch; image_mask: bool (B, H, W) True
    where padded. Returns dict with pred_logits (B, Q, C+1),
    pred_boxes (B, Q, 4 cxcywh in [0,1]), hs (layers, B, Q, D), memory.
    """
    # NHWC tower: channels-minor is XLA-TPU's native conv layout — measured
    # 40.7ms vs 68.4ms for the NCHW form at batch 16 / 800x1344 bf16
    # standalone (tools/bench_resnet.py); in the FULL eval graph it is
    # throughput-neutral (XLA already relayouts the NCHW form), but it is
    # the layout ops/fused_resnet.py requires, and the C5 tensor reshapes
    # straight into the (B, HW, C) sequence the transformer wants
    fused_tail = cfg.fused_resnet_tail if (
        jax.default_backend() == "tpu" and images.dtype == jnp.bfloat16
        and not cfg.remat_backbone) else ()
    if cfg.nchw_backbone:
        from .resnet import resnet50_forward
        feat = jnp.transpose(
            resnet50_forward(params["backbone"], images,
                             remat=cfg.remat_backbone), (0, 2, 3, 1))
    else:
        feat = resnet50_forward_nhwc(params["backbone"],
                                     jnp.transpose(images, (0, 2, 3, 1)),
                                     remat=cfg.remat_backbone,
                                     fused_tail=fused_tail)
    b, fh, fw, c = feat.shape
    fmask = downsample_mask(image_mask, fh, fw)
    pos = sine_position_embedding(fmask, cfg.hidden_dim // 2)
    # 1x1 input projection then flatten to (B, HW, D)
    w = params["input_proj"]["w"].astype(feat.dtype)
    src = (jnp.einsum("bhwc,dc->bhwd", feat, w[:, :, 0, 0])
           + params["input_proj"]["b"].astype(feat.dtype)
           ).reshape(b, fh * fw, cfg.hidden_dim)
    pos = pos.reshape(b, fh * fw, cfg.hidden_dim)
    mask = fmask.reshape(b, fh * fw)
    hs, memory = transformer_forward(params, src, mask,
                                     params["query_embed"], pos, cfg)
    logits = hs @ params["class_embed"]["w"].T + params["class_embed"]["b"]
    h = hs
    for i, lp in enumerate(params["bbox_embed"]):
        h = h @ lp["w"].T + lp["b"]
        if i < len(params["bbox_embed"]) - 1:
            h = jax.nn.relu(h)
    boxes = jax.nn.sigmoid(h)
    return {"pred_logits": logits[-1], "pred_boxes": boxes[-1],
            "aux_logits": logits, "aux_boxes": boxes,
            "hs": hs, "memory": memory}


def postprocess(pred_logits, pred_boxes, image_sizes):
    """PostProcess (detr.py:258-290): per-query (score, label, xyxy box).
    image_sizes: (B, 2) as (h, w). Returns dict of (B, Q) scores/labels and
    (B, Q, 4) boxes in absolute coords."""
    prob = jax.nn.softmax(pred_logits, axis=-1)
    scores = prob[..., :-1].max(-1)
    labels = prob[..., :-1].argmax(-1)
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    img_h, img_w = image_sizes[:, 0], image_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)
    return {"scores": scores, "labels": labels,
            "boxes": boxes * scale[:, None, :].astype(boxes.dtype)}


# ---------------------------------------------------------------- init -----
def _xavier(rng, shape):
    fan_in, fan_out = shape[-1], shape[-2] if len(shape) > 1 else shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -a, a)


def _attn_init(rng, d):
    ks = jax.random.split(rng, 2)
    return {"w_qkv": _xavier(ks[0], (3 * d, d)), "b_qkv": jnp.zeros(3 * d),
            "w_out": _xavier(ks[1], (d, d)), "b_out": jnp.zeros(d)}


def _ln(d):
    return {"g": jnp.ones(d), "b": jnp.zeros(d)}


def _enc_layer_init(rng, cfg):
    ks = jax.random.split(rng, 3)
    return {"attn": _attn_init(ks[0], cfg.hidden_dim),
            "lin1_w": _xavier(ks[1], (cfg.dim_feedforward, cfg.hidden_dim)),
            "lin1_b": jnp.zeros(cfg.dim_feedforward),
            "lin2_w": _xavier(ks[2], (cfg.hidden_dim, cfg.dim_feedforward)),
            "lin2_b": jnp.zeros(cfg.hidden_dim),
            "norm1": _ln(cfg.hidden_dim), "norm2": _ln(cfg.hidden_dim)}


def _dec_layer_init(rng, cfg):
    p = _enc_layer_init(rng, cfg)
    p["self_attn"] = _attn_init(jax.random.fold_in(rng, 1), cfg.hidden_dim)
    p["cross_attn"] = p.pop("attn")
    p["norm3"] = _ln(cfg.hidden_dim)
    return p


def init_detr_params(rng, cfg: DETRConfig = DETRConfig()):
    ks = jax.random.split(rng, 8)
    d = cfg.hidden_dim
    return {
        "backbone": init_resnet50_params(ks[0]),
        "input_proj": {"w": _xavier(ks[1], (d, cfg.backbone_dim, 1, 1)),
                       "b": jnp.zeros(d)},
        "query_embed": jax.random.normal(ks[2], (cfg.num_queries, d)),
        "encoder": [_enc_layer_init(jax.random.fold_in(ks[3], i), cfg)
                    for i in range(cfg.enc_layers)],
        "decoder": [_dec_layer_init(jax.random.fold_in(ks[4], i), cfg)
                    for i in range(cfg.dec_layers)],
        "decoder_norm": _ln(d),
        "class_embed": {"w": _xavier(ks[5], (cfg.num_classes, d)),
                        "b": jnp.zeros(cfg.num_classes)},
        "bbox_embed": [
            {"w": _xavier(jax.random.fold_in(ks[6], i),
                          (4 if i == 2 else d, d)),
             "b": jnp.zeros(4 if i == 2 else d)} for i in range(3)],
    }
