"""Convert a (Py)Torch CLIP state dict to the functional parameter pytree.

Handles raw OpenAI CLIP checkpoints (state dicts of torch tensors or numpy
arrays) and full reference-model state dicts that include instance-adapter
weights (``adaptermlp``). Also reproduces the positional-embedding bilinear
interpolation applied on load when the target resolution differs
(/root/reference/CLIP_models_adapter_prior2.py:508-540) and the config
inference of build_model (:934-957).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import CLIPConfig
from .model import init_adapter_params


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor without importing torch at module scope
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, np.float32)


def infer_config(sd, use_adapter=True, adapter_pos="all",
                 adapter_num_layers=1) -> CLIPConfig:
    """Infer architecture from a state dict (build_model :934-957)."""
    if "visual.proj" not in sd:  # RN variant (:937,:943-945)
        counts = tuple(
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}.")}) for b in (1, 2, 3, 4))
        out_width = round(
            (_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1)
            ** 0.5)
        tw = _np(sd["ln_final.weight"]).shape[0]
        return CLIPConfig(
            embed_dim=_np(sd["text_projection"]).shape[1],
            image_resolution=out_width * 32,
            vision_layers=sum(counts),
            vision_width=_np(sd["visual.layer1.0.conv1.weight"]).shape[0],
            vision_patch_size=32,
            rn_layers=counts,
            context_length=_np(sd["positional_embedding"]).shape[0],
            vocab_size=_np(sd["token_embedding.weight"]).shape[0],
            transformer_width=tw,
            transformer_heads=tw // 64,
            transformer_layers=len({k.split(".")[2] for k in sd
                                    if k.startswith("transformer.resblocks")}),
            use_adapter=False,  # ModifiedResNet has no adapters (:311-420)
            adapter_layers=(),
            adapter_num_layers=adapter_num_layers,
        )
    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    vision_layers = len([k for k in sd if k.startswith("visual.")
                         and k.endswith(".attn.in_proj_weight")])
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    grid = round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
    tw = _np(sd["ln_final.weight"]).shape[0]
    return CLIPConfig(
        embed_dim=_np(sd["text_projection"]).shape[1],
        image_resolution=patch * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=tw,
        transformer_heads=tw // 64,
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
        use_adapter=use_adapter,
        adapter_layers=CLIPConfig.adapter_layer_ids(adapter_pos, vision_layers),
        adapter_num_layers=adapter_num_layers,
    )


def _bilinear_resize(grid, out_h, out_w):
    """(H, W, C) -> (out_h, out_w, C); matches F.interpolate bilinear with
    align_corners=False (half-pixel centers)."""
    h, w, c = grid.shape

    def axis_weights(n_in, n_out):
        pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        pos = np.clip(pos, 0, n_in - 1)
        lo = np.floor(pos).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = pos - lo
        return lo, hi, frac

    ylo, yhi, fy = axis_weights(h, out_h)
    xlo, xhi, fx = axis_weights(w, out_w)
    top = grid[ylo][:, xlo] * (1 - fx)[None, :, None] \
        + grid[ylo][:, xhi] * fx[None, :, None]
    bot = grid[yhi][:, xlo] * (1 - fx)[None, :, None] \
        + grid[yhi][:, xhi] * fx[None, :, None]
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


def interpolate_pos_embedding(pos, target_tokens):
    """(N0+1, width) -> (target_tokens, width) via bilinear resize of the
    spatial part (CLIP_models_adapter_prior2.py:523-536)."""
    if pos.shape[0] == target_tokens:
        return pos
    cls, spatial = pos[:1], pos[1:]
    g0 = round(math.isqrt(spatial.shape[0]))
    g1 = round(math.isqrt(target_tokens - 1))
    grid = spatial.reshape(g0, g0, -1)
    out = _bilinear_resize(grid, g1, g1).reshape(g1 * g1, -1)
    return np.concatenate([cls, out], axis=0)


def _ln(sd, prefix):
    return {"g": jnp.asarray(_np(sd[prefix + ".weight"])),
            "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _attn(sd, prefix):
    return {
        "w_qkv": jnp.asarray(_np(sd[prefix + ".in_proj_weight"])),
        "b_qkv": jnp.asarray(_np(sd[prefix + ".in_proj_bias"])),
        "w_out": jnp.asarray(_np(sd[prefix + ".out_proj.weight"])),
        "b_out": jnp.asarray(_np(sd[prefix + ".out_proj.bias"])),
    }


def _decoder_layer(sd, prefix):
    return {
        "attn": _attn(sd, prefix + ".multihead_attn"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "norm3": _ln(sd, prefix + ".norm3"),
        "lin1_w": jnp.asarray(_np(sd[prefix + ".linear1.weight"])),
        "lin1_b": jnp.asarray(_np(sd[prefix + ".linear1.bias"])),
        "lin2_w": jnp.asarray(_np(sd[prefix + ".linear2.weight"])),
        "lin2_b": jnp.asarray(_np(sd[prefix + ".linear2.bias"])),
    }


def _adapter(sd, prefix, cfg, rng):
    if prefix + ".down_proj.weight" not in sd:
        # checkpoint predates adapters: fresh lora-style init
        return init_adapter_params(rng, cfg.vision_width, cfg)
    scale = _np(sd[prefix + ".scale"])
    p = {
        "down_w": jnp.asarray(_np(sd[prefix + ".down_proj.weight"])),
        "down_b": jnp.asarray(_np(sd[prefix + ".down_proj.bias"])),
        "up_w": jnp.asarray(_np(sd[prefix + ".up_proj.weight"])),
        "up_b": jnp.asarray(_np(sd[prefix + ".up_proj.bias"])),
        "scale": jnp.asarray(scale),
        "layers": [_decoder_layer(sd, f"{prefix}.mhsa_layers.{m}")
                   for m in range(cfg.adapter_num_layers)],
    }
    if prefix + ".mhsa.multihead_attn.in_proj_weight" in sd:
        p["self_layer"] = _decoder_layer(sd, prefix + ".mhsa")
    return p


def _block(sd, prefix, cfg, has_adapter, rng):
    p = {
        "ln_1": _ln(sd, prefix + ".ln_1"),
        "ln_2": _ln(sd, prefix + ".ln_2"),
        "attn": _attn(sd, prefix + ".attn"),
        "mlp_fc_w": jnp.asarray(_np(sd[prefix + ".mlp.c_fc.weight"])),
        "mlp_fc_b": jnp.asarray(_np(sd[prefix + ".mlp.c_fc.bias"])),
        "mlp_proj_w": jnp.asarray(_np(sd[prefix + ".mlp.c_proj.weight"])),
        "mlp_proj_b": jnp.asarray(_np(sd[prefix + ".mlp.c_proj.bias"])),
    }
    if has_adapter:
        p["adapter"] = _adapter(sd, prefix + ".adaptermlp", cfg, rng)
    return p


def _fold_bn(sd, conv_prefix, bn_prefix, eps=1e-5):
    """Frozen BatchNorm2d folded into a post-conv (scale, bias); the RN
    tower only ever runs from checkpoint running stats (no adapters inside
    ModifiedResNet, so nothing there trains)."""
    w = _np(sd[conv_prefix + ".weight"])
    g = _np(sd[bn_prefix + ".weight"])
    b = _np(sd[bn_prefix + ".bias"])
    mean = _np(sd[bn_prefix + ".running_mean"])
    var = _np(sd[bn_prefix + ".running_var"])
    scale = g / np.sqrt(var + eps)
    return {"w": jnp.asarray(w), "scale": jnp.asarray(scale),
            "bias": jnp.asarray(b - mean * scale)}


def _rn_visual(sd, cfg: CLIPConfig, prefix="visual."):
    """ModifiedResNet weights (:311-420) -> resnet.py pytree, BN folded.
    Reproduces the attnpool pos-embed bilinear resize applied on load when
    the target resolution differs (init_weights :352-370)."""
    p = {"stem1": _fold_bn(sd, prefix + "conv1", prefix + "bn1"),
         "stem2": _fold_bn(sd, prefix + "conv2", prefix + "bn2"),
         "stem3": _fold_bn(sd, prefix + "conv3", prefix + "bn3"),
         "layers": []}
    for li, n_blocks in enumerate(cfg.rn_layers):
        blocks = []
        for bi in range(n_blocks):
            bp = f"{prefix}layer{li + 1}.{bi}."
            blk = {"conv1": _fold_bn(sd, bp + "conv1", bp + "bn1"),
                   "conv2": _fold_bn(sd, bp + "conv2", bp + "bn2"),
                   "conv3": _fold_bn(sd, bp + "conv3", bp + "bn3")}
            if bp + "downsample.0.weight" in sd:
                blk["down"] = _fold_bn(sd, bp + "downsample.0",
                                       bp + "downsample.1")
            blocks.append(blk)
        p["layers"].append(blocks)
    ap = prefix + "attnpool."
    pos = _np(sd[ap + "positional_embedding"])
    pos = interpolate_pos_embedding(pos, (cfg.image_resolution // 32) ** 2 + 1)
    p["attnpool"] = {
        "pos": jnp.asarray(pos),
        "q_w": jnp.asarray(_np(sd[ap + "q_proj.weight"])),
        "q_b": jnp.asarray(_np(sd[ap + "q_proj.bias"])),
        "k_w": jnp.asarray(_np(sd[ap + "k_proj.weight"])),
        "k_b": jnp.asarray(_np(sd[ap + "k_proj.bias"])),
        "v_w": jnp.asarray(_np(sd[ap + "v_proj.weight"])),
        "v_b": jnp.asarray(_np(sd[ap + "v_proj.bias"])),
        "c_w": jnp.asarray(_np(sd[ap + "c_proj.weight"])),
        "c_b": jnp.asarray(_np(sd[ap + "c_proj.bias"])),
    }
    return p


def torch_state_dict_to_params(sd, cfg: CLIPConfig = None, use_adapter=True,
                               adapter_pos="all", adapter_num_layers=1,
                               rng=None):
    """state dict -> (params, cfg). ``cfg`` may override inference (its
    image_resolution drives pos-embed interpolation)."""
    inferred = infer_config(sd, use_adapter, adapter_pos, adapter_num_layers)
    if cfg is None:
        cfg = inferred
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    if cfg.is_resnet:
        visual = _rn_visual(sd, cfg)
        text = {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": [
                _block(sd, f"transformer.resblocks.{i}", cfg, False, rng)
                for i in range(cfg.transformer_layers)],
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(_np(sd["text_projection"])),
        }
        return {"visual": visual, "text": text,
                "logit_scale": jnp.asarray(_np(sd["logit_scale"]))}, cfg

    pos = _np(sd["visual.positional_embedding"])
    pos = interpolate_pos_embedding(pos, cfg.grid_size ** 2 + 1)

    visual = {
        "conv1_w": jnp.asarray(_np(sd["visual.conv1.weight"])),
        "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
        "positional_embedding": jnp.asarray(pos),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [
            _block(sd, f"visual.transformer.resblocks.{i}", cfg,
                   cfg.use_adapter and i in cfg.adapter_layers,
                   jax.random.fold_in(rng, i))
            for i in range(cfg.vision_layers)],
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": jnp.asarray(_np(sd["visual.proj"])),
    }
    text = {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
        "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
        "blocks": [
            _block(sd, f"transformer.resblocks.{i}", cfg, False, rng)
            for i in range(cfg.transformer_layers)],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": jnp.asarray(_np(sd["text_projection"])),
    }
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(_np(sd["logit_scale"]))}, cfg
