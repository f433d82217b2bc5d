"""Functional CLIP (ViT visual encoder with instance adapters + text encoder).

Pure functions over a parameter pytree (nested dicts, torch-shaped weights —
Linear weights are (out, in)); no module state. Numerically mirrors the
reference architecture (/root/reference/CLIP_models_adapter_prior2.py):

  * ResidualAttentionBlock (:423-459): parallel bottleneck Adapter applied to
    the raw input (x = x + adapter(x, prior)), then pre-LN MHSA and MLP with
    QuickGELU.
  * Adapter (:142-203): 768->64 down-proj + ReLU, `adapter_num_layers`
    post-norm cross-attention decoder layers (d=64, 2 heads, ff=128) whose
    queries are the ViT tokens and memory is the padded/masked per-image
    prior sequence; 64->768 up-proj scaled by a learnable per-channel scale
    (init 1e-9).
  * VisionTransformer (:471-506): returns (projected CLS, projected patch
    grid). We keep the patch grid channels-last (B, gh, gw, D) — TPU layout.
  * Text encoder (:878-891): causal transformer; features taken at the EOT
    position (argmax of token ids) and projected.

LayerNorms run in float32 regardless of activation dtype (:409-415).
Dropout only runs when an rng is provided (training).
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import CLIPConfig

LN_EPS = 1e-5


def layer_norm(x, p):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (out * p["g"] + p["b"]).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _dropout(x, rate, rng):
    if rng is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def mha(p, q, kv, num_heads, attn_mask=None, key_padding_mask=None,
        kv_pos=None):
    """torch nn.MultiheadAttention semantics, batch-first.

    q: (B, Lq, E), kv: (B, Lk, E). attn_mask: additive (Lq, Lk).
    key_padding_mask: (B, Lk) bool, True = ignore.
    kv_pos: optional positional embedding added to keys only (DETR-style
    `with_pos_embed(memory, pos)` for K while V stays raw).
    """
    b, lq, e = q.shape
    lk = kv.shape[1]
    hd = e // num_heads
    # run the projections in the activation dtype: f32 weights would
    # silently promote a bf16 tower's activations (and every downstream
    # matmul) to f32. No-op when the tower runs f32 (CLIP main path).
    w_q, w_k, w_v = jnp.split(p["w_qkv"].astype(q.dtype), 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["b_qkv"].astype(q.dtype), 3, axis=0)
    k_in = kv if kv_pos is None else kv + kv_pos
    qh = (q @ w_q.T + b_q).reshape(b, lq, num_heads, hd)
    kh = (k_in @ w_k.T + b_k).reshape(b, lk, num_heads, hd)
    vh = (kv @ w_v.T + b_v).reshape(b, lk, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
    scores = scores.astype(jnp.float32)
    if attn_mask is not None:
        scores = scores + attn_mask
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, lq, e)
    return out @ p["w_out"].astype(q.dtype).T + p["b_out"].astype(q.dtype)


def decoder_layer(p, tgt, memory, num_heads, key_padding_mask=None,
                  dropout=0.0, rng=None, pre_norm=False):
    """Cross-attention decoder layer (self-attention elided), post- or
    pre-norm (CLIP_models_adapter_prior2.py:27-108 forward_post/forward_pre).
    """
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    if pre_norm:
        q = layer_norm(tgt, p["norm1"])
        tgt2 = mha(p["attn"], q, memory, num_heads,
                   key_padding_mask=key_padding_mask)
        tgt = tgt + _dropout(tgt2, dropout, rngs[0])
        h = layer_norm(tgt, p["norm3"])
        h = _dropout(jax.nn.relu(h @ p["lin1_w"].T + p["lin1_b"]),
                     dropout, rngs[1]) @ p["lin2_w"].T + p["lin2_b"]
        return tgt + _dropout(h, dropout, rngs[2])
    tgt2 = mha(p["attn"], tgt, memory, num_heads,
               key_padding_mask=key_padding_mask)
    tgt = layer_norm(tgt + _dropout(tgt2, dropout, rngs[0]), p["norm2"])
    h = _dropout(jax.nn.relu(tgt @ p["lin1_w"].T + p["lin1_b"]),
                 dropout, rngs[1]) @ p["lin2_w"].T + p["lin2_b"]
    return layer_norm(tgt + _dropout(h, dropout, rngs[2]), p["norm3"])


def adapter_forward(p, x, prior, prior_mask, cfg: CLIPConfig, rng=None):
    """Instance adapter (Adapter.forward, :183-203). x: (B, L, E);
    prior: (B, P, bottleneck); prior_mask: (B, P) True = pad."""
    down = jax.nn.relu(x @ p["down_w"].T + p["down_b"])
    if prior is not None:
        for i, lp in enumerate(p["layers"]):
            lr = jax.random.fold_in(rng, i) if rng is not None else None
            down = decoder_layer(lp, down, prior, cfg.adapter_heads,
                                 key_padding_mask=prior_mask,
                                 dropout=cfg.adapter_dropout, rng=lr)
    else:
        down = decoder_layer(p["self_layer"], down, down, cfg.adapter_heads,
                             dropout=cfg.adapter_dropout, rng=rng)
    return (down @ p["up_w"].T + p["up_b"]) * p["scale"]


def _mhsa_fused(p, x, num_heads):
    """Unmasked self-attention through the Pallas fused kernel
    (ops/attention.py — has a flash-style VJP, so the ViT blocks may use
    it while the adapters train). Same math as mha(q=kv=x, no masks); the
    kernel falls back to identical XLA ops off-TPU."""
    from ...ops.attention import fused_attention
    b, l, e = x.shape
    hd = e // num_heads
    dt = x.dtype
    w_q, w_k, w_v = jnp.split(p["w_qkv"].astype(dt), 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["b_qkv"].astype(dt), 3, axis=0)
    qh = (x @ w_q.T + b_q).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    kh = (x @ w_k.T + b_k).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    vh = (x @ w_v.T + b_v).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    o = fused_attention(qh, kh, vh)
    out = o.astype(dt).transpose(0, 2, 1, 3).reshape(b, l, e)
    return out @ p["w_out"].astype(dt).T + p["b_out"].astype(dt)


def residual_block(p, x, prior, prior_mask, num_heads, cfg: CLIPConfig,
                   attn_mask=None, rng=None):
    if "adapter" in p:
        x = x + adapter_forward(p["adapter"], x, prior, prior_mask, cfg,
                                rng=rng)
    h = layer_norm(x, p["ln_1"])
    if attn_mask is None and cfg.fused_attention:
        x = x + _mhsa_fused(p["attn"], h, num_heads)
    else:
        x = x + mha(p["attn"], h, h, num_heads, attn_mask=attn_mask)
    h = layer_norm(x, p["ln_2"])
    h = quick_gelu(h @ p["mlp_fc_w"].T + p["mlp_fc_b"])
    return x + h @ p["mlp_proj_w"].T + p["mlp_proj_b"]


def _patch_embed(x, conv_w):
    """Non-overlapping patch conv as a pure matmul (MXU path).
    x: (B, 3, H, W); conv_w: (width, 3, p, p) -> (B, gh*gw, width)."""
    width, c, ps, _ = conv_w.shape
    b, _, h, w = x.shape
    gh, gw = h // ps, w // ps
    patches = x.reshape(b, c, gh, ps, gw, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw,
                                                          c * ps * ps)
    return patches @ conv_w.reshape(width, -1).T


def encode_image(params, images, cfg: CLIPConfig, prior=None,
                 prior_mask=None, rng=None):
    """images: (B, 3, H, W) -> (global (B, embed), local (B, gh, gw, embed)).

    VisionTransformer.forward (:489-506): ln_post and the projection are
    applied to every token; CLS is the global feature, the rest form the
    local grid.

    RN-variant checkpoints (cfg.rn_layers set) route to the ModifiedResNet
    tower instead; it has no instance adapters in the reference
    (CLIP_models_adapter_prior2.py:311-420), so priors are rejected.
    """
    if cfg.is_resnet:
        if prior is not None:
            raise ValueError(
                "ModifiedResNet CLIP towers have no instance adapters "
                "(CLIP_models_adapter_prior2.py:311-420); prior must be "
                "None")
        from .resnet import modified_resnet_forward
        return modified_resnet_forward(params["visual"], images,
                                       cfg.vision_heads)
    p = params["visual"]
    x = _patch_embed(images, p["conv1_w"])
    b, n_patch, width = x.shape
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype),
                           (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"]
    x = layer_norm(x, p["ln_pre"])
    for i, bp in enumerate(p["blocks"]):
        br = jax.random.fold_in(rng, i) if rng is not None else None
        x = residual_block(bp, x, prior, prior_mask, cfg.vision_heads, cfg,
                           rng=br)
    x = layer_norm(x, p["ln_post"])
    x = x @ p["proj"]
    gh = gw = int(math.isqrt(n_patch))
    return x[:, 0, :], x[:, 1:, :].reshape(b, gh, gw, -1)


def _causal_mask(length, dtype=jnp.float32):
    return jnp.triu(jnp.full((length, length), -jnp.inf, dtype), k=1)


def text_encoder_forward(params, token_embeds, eot_idx, cfg: CLIPConfig):
    """Shared text path for raw tokens and CoOp prompts
    (CLIP.encode_text :878-891 / TextEncoder :66-86).

    token_embeds: (N, L, width) already including any learned context;
    eot_idx: (N,) position whose feature is projected.
    """
    p = params["text"]
    x = token_embeds + p["positional_embedding"].astype(token_embeds.dtype)
    mask = _causal_mask(x.shape[1])
    for bp in p["blocks"]:
        x = residual_block(bp, x, None, None, cfg.transformer_heads, cfg,
                           attn_mask=mask)
    x = layer_norm(x, p["ln_final"])
    x = x[jnp.arange(x.shape[0]), eot_idx]
    return x @ p["text_projection"]


def encode_text(params, tokens, cfg: CLIPConfig):
    """tokens: int (N, L) -> (N, embed_dim)."""
    p = params["text"]
    embeds = p["token_embedding"][tokens]
    return text_encoder_forward(params, embeds, tokens.argmax(-1), cfg)


# --------------------------------------------------------------------------
# Initialization (matches the reference init distributions where they matter:
# CLIP.initialize_parameters :834-861, Adapter lora init :169-174)
# --------------------------------------------------------------------------
def _linear_init(rng, out_dim, in_dim, dtype):
    # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), +)
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(k1, (out_dim, in_dim), dtype, -bound, bound)
    b = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return w, b


def _ln_init(dim, dtype):
    return {"g": jnp.ones(dim, jnp.float32), "b": jnp.zeros(dim, jnp.float32)}


def _decoder_layer_init(rng, d, ff, dtype):
    ks = jax.random.split(rng, 4)
    w_qkv = jax.random.uniform(ks[0], (3 * d, d), dtype,
                               -math.sqrt(3.0 / d), math.sqrt(3.0 / d))
    w_out, b_out = _linear_init(ks[1], d, d, dtype)
    lin1_w, lin1_b = _linear_init(ks[2], ff, d, dtype)
    lin2_w, lin2_b = _linear_init(ks[3], d, ff, dtype)
    return {
        "attn": {"w_qkv": w_qkv, "b_qkv": jnp.zeros(3 * d, dtype),
                 "w_out": w_out, "b_out": b_out},
        "norm1": _ln_init(d, dtype), "norm2": _ln_init(d, dtype),
        "norm3": _ln_init(d, dtype),
        "lin1_w": lin1_w, "lin1_b": lin1_b,
        "lin2_w": lin2_w, "lin2_b": lin2_b,
    }


def init_adapter_params(rng, d_model, cfg: CLIPConfig, dtype=jnp.float32):
    ks = jax.random.split(rng, cfg.adapter_num_layers + 2)
    bn = cfg.adapter_bottleneck
    # lora init: kaiming-uniform down, zero up/biases (:169-174)
    bound = math.sqrt(6.0 / d_model) / math.sqrt(6.0)  # kaiming a=sqrt(5)
    down_w = jax.random.uniform(ks[0], (bn, d_model), dtype, -bound, bound)
    return {
        "down_w": down_w, "down_b": jnp.zeros(bn, dtype),
        "up_w": jnp.zeros((d_model, bn), dtype), "up_b": jnp.zeros(d_model, dtype),
        "scale": jnp.full(d_model, 1e-9, dtype),
        "layers": [_decoder_layer_init(ks[1 + i], bn, bn * 2, dtype)
                   for i in range(cfg.adapter_num_layers)],
        "self_layer": _decoder_layer_init(ks[-1], bn, bn * 2, dtype),
    }


def _block_init(rng, width, heads, cfg, adapter, dtype):
    ks = jax.random.split(rng, 4)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * cfg.vision_layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    p = {
        "ln_1": _ln_init(width, dtype), "ln_2": _ln_init(width, dtype),
        "attn": {
            "w_qkv": jax.random.normal(ks[0], (3 * width, width), dtype) * attn_std,
            "b_qkv": jnp.zeros(3 * width, dtype),
            "w_out": jax.random.normal(ks[1], (width, width), dtype) * proj_std,
            "b_out": jnp.zeros(width, dtype),
        },
        "mlp_fc_w": jax.random.normal(ks[2], (4 * width, width), dtype) * fc_std,
        "mlp_fc_b": jnp.zeros(4 * width, dtype),
        "mlp_proj_w": jax.random.normal(ks[3], (width, 4 * width), dtype) * proj_std,
        "mlp_proj_b": jnp.zeros(width, dtype),
    }
    if adapter:
        p["adapter"] = init_adapter_params(
            jax.random.fold_in(rng, 99), width, cfg, dtype)
    return p


def init_clip_params(rng, cfg: CLIPConfig, dtype=jnp.float32):
    kv, kt, ke, kp = jax.random.split(rng, 4)
    width = cfg.vision_width
    scale = width ** -0.5
    n_tok = cfg.grid_size ** 2 + 1
    visual = {
        "conv1_w": jax.random.normal(
            jax.random.fold_in(kv, 0),
            (width, 3, cfg.vision_patch_size, cfg.vision_patch_size),
            dtype) * scale,
        "class_embedding": jax.random.normal(
            jax.random.fold_in(kv, 1), (width,), dtype) * scale,
        "positional_embedding": jax.random.normal(
            jax.random.fold_in(kv, 2), (n_tok, width), dtype) * scale,
        "ln_pre": _ln_init(width, dtype),
        "blocks": [
            _block_init(jax.random.fold_in(kv, 10 + i), width,
                        cfg.vision_heads, cfg,
                        cfg.use_adapter and i in cfg.adapter_layers, dtype)
            for i in range(cfg.vision_layers)],
        "ln_post": _ln_init(width, dtype),
        "proj": jax.random.normal(
            jax.random.fold_in(kv, 3), (width, cfg.embed_dim), dtype) * scale,
    }
    tw = cfg.transformer_width
    text = {
        "token_embedding": jax.random.normal(
            jax.random.fold_in(kt, 0), (cfg.vocab_size, tw), dtype) * 0.02,
        "positional_embedding": jax.random.normal(
            jax.random.fold_in(kt, 1), (cfg.context_length, tw), dtype) * 0.01,
        "blocks": [
            _block_init(jax.random.fold_in(kt, 10 + i), tw,
                        cfg.transformer_heads, cfg, False, dtype)
            for i in range(cfg.transformer_layers)],
        "ln_final": _ln_init(tw, dtype),
        "text_projection": jax.random.normal(ke, (tw, cfg.embed_dim),
                                             dtype) * tw ** -0.5,
    }
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32)}
