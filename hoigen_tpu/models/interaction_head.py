"""Legacy UPT interaction head (cooperative/competitive layers), functional
JAX, static shapes.

Port of /root/reference/interaction_head.py:13-367 — the original UPT
cooperative-competitive interaction head with MultiBranchFusion. Like the
reference, it is NOT used by the main HOIGen path (which scores pairs with
the Tip-Adapter caches); it is kept as a supported alternative head.

Static-shape reformulation: per-image dynamic pair lists become the fixed
slot/pair layout from models.proposals; padded slots are masked out of the
modified-encoder attention (softmax over the instance axis) and of the
pairwise outputs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spatial import compute_spatial_encodings
from .proposals import ProposalConfig, make_pairs, pair_indices
from .upt import compute_prior_scores


@dataclasses.dataclass(frozen=True)
class InteractionHeadConfig:
    hidden_state_size: int = 256       # DETR decoder features
    representation_size: int = 512
    num_heads: int = 8
    num_coop_layers: int = 2
    num_channels: int = 2048           # global (C5) feature channels
    num_classes: int = 117
    proposals: ProposalConfig = ProposalConfig()


def _linear(rng, out_d, in_d):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_d)
    return {"w": jax.random.uniform(k1, (out_d, in_d), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(k2, (out_d,), jnp.float32,
                                    -bound, bound)}


def _apply(p, x):
    return x @ p["w"].T + p["b"]


# ---- MultiBranchFusion (:13-55) -------------------------------------------
def init_mbf(rng, appearance_size, spatial_size, hidden_size, cardinality):
    sub = hidden_size // cardinality
    return {
        "fc1": [_linear(jax.random.fold_in(rng, 3 * i), sub, appearance_size)
                for i in range(cardinality)],
        "fc2": [_linear(jax.random.fold_in(rng, 3 * i + 1), sub,
                        spatial_size) for i in range(cardinality)],
        "fc3": [_linear(jax.random.fold_in(rng, 3 * i + 2), hidden_size, sub)
                for i in range(cardinality)],
    }


def mbf_forward(p, appearance, spatial):
    out = 0.0
    for f1, f2, f3 in zip(p["fc1"], p["fc2"], p["fc3"]):
        out = out + _apply(f3, jax.nn.relu(_apply(f1, appearance)
                                           * _apply(f2, spatial)))
    return jax.nn.relu(out)


# ---- ModifiedEncoderLayer (:58-146) ----------------------------------------
def init_modified_encoder_layer(rng, cfg: InteractionHeadConfig):
    sub = cfg.representation_size // cfg.num_heads
    ks = jax.random.split(rng, 6)
    return {
        "unary": _linear(ks[0], cfg.representation_size,
                         cfg.hidden_state_size),
        "pairwise": _linear(ks[1], cfg.representation_size,
                            cfg.representation_size),
        "attn": [_linear(jax.random.fold_in(ks[2], h), 1, 3 * sub)
                 for h in range(cfg.num_heads)],
        "message": [_linear(jax.random.fold_in(ks[3], h), sub, sub)
                    for h in range(cfg.num_heads)],
        "aggregate": _linear(ks[4], cfg.hidden_state_size,
                             cfg.representation_size),
        "norm": {"g": jnp.ones(cfg.hidden_state_size),
                 "b": jnp.zeros(cfg.hidden_state_size)},
        "ffn1": _linear(ks[5], cfg.hidden_state_size * 4,
                        cfg.hidden_state_size),
        "ffn2": _linear(jax.random.fold_in(ks[5], 1), cfg.hidden_state_size,
                        cfg.hidden_state_size * 4),
        "ffn_norm": {"g": jnp.ones(cfg.hidden_state_size),
                     "b": jnp.zeros(cfg.hidden_state_size)},
    }


def _ln(p, x):
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["g"] + p["b"]


def modified_encoder_layer(p, x, y, valid, cfg: InteractionHeadConfig):
    """x: (S, hidden) unary tokens; y: (S, S, rep) pairwise features;
    valid: (S,) slot mask. Message passing with per-head attention softmax
    over the sender axis (masked for padding)."""
    s = x.shape[0]
    heads, sub = cfg.num_heads, cfg.representation_size // cfg.num_heads
    u = jax.nn.relu(_apply(p["unary"], x)).reshape(s, heads, sub)
    pw = jax.nn.relu(_apply(p["pairwise"], y)).reshape(s, s, heads, sub)
    u_i = jnp.broadcast_to(u[:, None], (s, s, heads, sub))
    u_j = jnp.broadcast_to(u[None, :], (s, s, heads, sub))
    attn_in = jnp.concatenate([u_i, u_j, pw], axis=-1)     # (S, S, H, 3sub)
    logits = jnp.stack([_apply(p["attn"][h], attn_in[:, :, h])[..., 0]
                        for h in range(heads)], axis=-1)    # (S, S, H)
    # reference softmaxes over the first (sender) axis; mask padded senders
    logits = jnp.where(valid[:, None, None], logits, -1e9)
    weights = jax.nn.softmax(logits, axis=0)
    msg = jnp.stack([_apply(p["message"][h], u_i[:, :, h] * pw[:, :, h])
                     for h in range(heads)], axis=2)        # (S, S, H, sub)
    agg = (weights[..., None] * msg).sum(axis=0)            # (S, H, sub)
    agg = _apply(p["aggregate"], jax.nn.relu(agg.reshape(s, -1)))
    x = _ln(p["norm"], x + agg)
    h = _apply(p["ffn2"], jax.nn.relu(_apply(p["ffn1"], x)))
    x = _ln(p["ffn_norm"], x + h)
    return x, weights


# ---- competitive layer (pocket TransformerEncoderLayer) --------------------
def init_comp_layer(rng, d):
    ks = jax.random.split(rng, 4)
    return {"attn": {"w_qkv": _linear(ks[0], 3 * d, d)["w"],
                     "b_qkv": jnp.zeros(3 * d),
                     "w_out": _linear(ks[1], d, d)["w"],
                     "b_out": jnp.zeros(d)},
            "norm1": {"g": jnp.ones(d), "b": jnp.zeros(d)},
            "ffn1": _linear(ks[2], d * 4, d),
            "ffn2": _linear(ks[3], d, d * 4),
            "norm2": {"g": jnp.ones(d), "b": jnp.zeros(d)}}


def comp_layer_forward(p, x, valid, num_heads=8):
    from .clip.model import mha
    out = mha(p["attn"], x[None], x[None], num_heads,
              key_padding_mask=~valid[None])[0]
    x = _ln(p["norm1"], x + out)
    h = _apply(p["ffn2"], jax.nn.relu(_apply(p["ffn1"], x)))
    return _ln(p["norm2"], x + h)


# ---- full head --------------------------------------------------------------
def init_interaction_head(rng, cfg: InteractionHeadConfig):
    ks = jax.random.split(rng, 8)
    rep = cfg.representation_size
    return {
        "spatial_head": [_linear(ks[0], 128, 36), _linear(ks[1], 256, 128),
                         _linear(ks[2], rep, 256)],
        "coop": [init_modified_encoder_layer(jax.random.fold_in(ks[3], i),
                                             cfg)
                 for i in range(cfg.num_coop_layers)],
        "mbf": init_mbf(ks[4], cfg.hidden_state_size * 2, rep, rep, 16),
        "mbf_g": init_mbf(ks[5], cfg.num_channels, rep, rep, 16),
        "comp": init_comp_layer(ks[6], rep * 2),
        "predictor": _linear(ks[7], cfg.num_classes, rep * 2),
    }


def interaction_head_forward(params, global_features, hidden_states, boxes,
                             scores, labels, valid, image_size,
                             object_class_multihot,
                             cfg: InteractionHeadConfig, training=True):
    """Single image (vmap over a batch).

    global_features: (num_channels,) pooled backbone features;
    hidden_states: (S, hidden) DETR decoder embeddings of the selected
    slots; boxes/scores/labels/valid: fixed slots from
    select_region_proposals. Returns (logits (P, C), prior (2, P, C),
    pair_valid (P,)).
    """
    p_cfg = cfg.proposals
    s = boxes.shape[0]
    x_idx, y_idx = pair_indices(p_cfg)
    bh, bo, _, pair_valid = make_pairs(boxes, valid, p_cfg)

    # (S*S, 36) -> spatial head -> (S, S, rep)
    bi = jnp.repeat(jnp.arange(s), s)
    bj = jnp.tile(jnp.arange(s), s)
    sp = compute_spatial_encodings(boxes[bi], boxes[bj], image_size)
    h = sp
    for lp in params["spatial_head"]:
        h = jax.nn.relu(_apply(lp, h))
    sp = h.reshape(s, s, -1)

    unary = hidden_states
    for lp in params["coop"]:
        unary, _ = modified_encoder_layer(lp, unary, sp, valid, cfg)

    pair_app = jnp.concatenate([unary[x_idx], unary[y_idx]], axis=-1)
    pair_sp = sp[x_idx, y_idx]
    pairwise = jnp.concatenate([
        mbf_forward(params["mbf"], pair_app, pair_sp),
        mbf_forward(params["mbf_g"],
                    jnp.broadcast_to(global_features,
                                     (pair_app.shape[0],
                                      global_features.shape[-1])), pair_sp),
    ], axis=-1)
    pairwise = comp_layer_forward(params["comp"], pairwise, pair_valid)
    logits = _apply(params["predictor"], pairwise)

    from .upt import UPTConfig
    u_cfg = UPTConfig(num_classes=cfg.num_classes, proposals=p_cfg)
    prior = compute_prior_scores(scores, labels, pair_valid,
                                 object_class_multihot, x_idx, y_idx,
                                 training, u_cfg)
    return logits, prior, pair_valid
