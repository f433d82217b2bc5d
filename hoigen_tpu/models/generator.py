"""CoOp-prompted VAE feature generator + SHIP alignment MLP + batched
unseen-class feature synthesis.

Reimplements the reference generator stack TPU-first:
  * main_coop_vae.py:40-303 — per-family (hoi/human/object) Encoder
    (512->2048->mu,logvar 512), Generator (512->4096->512), conditional
    PromptLearner (learned context tokens shifted by the generated bias,
    class prefix/suffix from CLIP token embeddings), reconstruction through
    the frozen CLIP text encoder, MSE + KLD loss.
  * finetune_ship.py:296-538 — frozen netG/prompt-learner, train only an
    alignment MLP (512->512->512->512) mapping generated text features onto
    cached GT crop features with MSE.
  * main_tip_finetune.py:448-824 — offline synthesis: the reference's
    100x600x3 Python loop collapses here into one vmapped, chunked text-
    encoder call (minutes -> seconds).

All functions are pure; training steps are jittable.
"""
import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .clip.config import CLIPConfig
from .clip.model import text_encoder_forward
from .clip.tokenizer import SimpleTokenizer, tokenize

FEAT = 512


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------
def _linear_init(rng, out_d, in_d):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_d)
    return {"w": jax.random.uniform(k1, (out_d, in_d), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(k2, (out_d,), jnp.float32,
                                    -bound, bound)}


def init_encoder_params(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"net": _linear_init(k1, 2048, FEAT),
            "mean": _linear_init(k2, FEAT, 2048),
            "log_var": _linear_init(k3, FEAT, 2048)}


def encoder_forward(p, x):
    h = jax.nn.relu(x @ p["net"]["w"].T + p["net"]["b"])
    return (h @ p["mean"]["w"].T + p["mean"]["b"],
            h @ p["log_var"]["w"].T + p["log_var"]["b"])


def init_generator_params(rng):
    k1, k2 = jax.random.split(rng)
    return {"l1": _linear_init(k1, 4096, FEAT),
            "l2": _linear_init(k2, FEAT, 4096)}


def generator_forward(p, z):
    h = jax.nn.relu(z @ p["l1"]["w"].T + p["l1"]["b"])
    return h @ p["l2"]["w"].T + p["l2"]["b"]


def init_ship_mlp_params(rng):
    ks = jax.random.split(rng, 3)
    return [_linear_init(ks[0], FEAT, FEAT), _linear_init(ks[1], FEAT, FEAT),
            _linear_init(ks[2], FEAT, FEAT)]


def ship_mlp_forward(p, x):
    for i, lp in enumerate(p):
        x = x @ lp["w"].T + lp["b"]
        if i < len(p) - 1:
            x = jax.nn.relu(x)
    return x


# --------------------------------------------------------------------------
# conditional prompt learner
# --------------------------------------------------------------------------
@dataclasses.dataclass
class PromptTables:
    """Per-classname-set constants: SOS prefix, class+EOS suffix, and the
    tokenized prompts whose argmax marks the EOT position. Rebuilt whenever
    the class set changes (get_prefix_suffix_token, main_coop_vae.py:99-113).

    class_token_position 'end' keeps the fast concatenate path; 'middle' /
    'front' (PromptLearner.forward, upt_tip...py:150-200 — per-class Python
    loops there) are static here: a per-class (L, D) ``template`` holding
    every non-context token at its final position plus a per-class one-hot
    ``ctx_placement`` (L, n_ctx), so prompts = template[t] + placement[t] @
    ctx — one einsum, no data-dependent shapes.
    """
    token_prefix: np.ndarray      # (C, 1, D)
    token_suffix: np.ndarray      # (C, 77-1-n_ctx, D)
    eot_idx: np.ndarray           # (C,)
    n_ctx: int
    template: Optional[np.ndarray] = None       # (C, L, D)
    ctx_placement: Optional[np.ndarray] = None  # (C, L, n_ctx)


def init_prompt_ctx(rng, n_ctx: int, dim: int = FEAT):
    """Learned context tokens, N(0, 0.02) (main_coop_vae.py:86-88)."""
    return jax.random.normal(rng, (n_ctx, dim)) * 0.02


def init_prompt_ctx_from_text(ctx_init: str, token_embedding):
    """Context vectors initialized from the words of ``ctx_init``
    (--CTX_INIT; PromptLearner, upt_tip...py:98-106 / main_coop_vae.py:79-88
    where it is present but hardcoded off). Returns (ctx (n_ctx, D),
    n_ctx) — n_ctx becomes the token count of the phrase.
    """
    ctx_init = ctx_init.replace("_", " ").strip()
    toks = tokenize([ctx_init])
    n_ctx = int(toks[0].argmax()) - 1            # tokens between SOS and EOT
    emb = np.asarray(token_embedding)[toks[0, 1:1 + n_ctx]]
    return jnp.asarray(emb), n_ctx


def build_prompt_tables(classnames: Sequence[str], token_embedding,
                        n_ctx: int, context_length: int = 77,
                        class_token_position: str = "end") -> PromptTables:
    prefix = " ".join(["X"] * n_ctx)
    prompts = [prefix + " " + name.replace("_", " ") + "." for name in
               classnames]
    toks = tokenize(prompts, context_length)
    emb = np.asarray(token_embedding)[toks]
    tables = PromptTables(token_prefix=emb[:, :1],
                          token_suffix=emb[:, 1 + n_ctx:],
                          eot_idx=toks.argmax(-1), n_ctx=n_ctx)
    if class_token_position == "end":
        return tables
    if class_token_position not in ("middle", "front"):
        raise ValueError(class_token_position)
    # name_lens: token count of each classname alone (PromptLearner :119)
    name_toks = tokenize([n.replace("_", " ") + "." for n in classnames],
                         context_length)
    name_lens = name_toks.argmax(-1) - 2        # minus SOS, '.'+EOS share? no:
    # argmax = EOT position; tokens are [SOS, name..., '.', EOT] -> name_len
    # = eot - 2 ('.' sits right before EOT)
    c, length, d = emb.shape[0], emb.shape[1], emb.shape[2]
    template = np.zeros((c, length, d), emb.dtype)
    placement = np.zeros((c, length, n_ctx), emb.dtype)
    half = n_ctx // 2
    for i in range(c):
        nl = int(name_lens[i])
        name_rows = emb[i, 1 + n_ctx:1 + n_ctx + nl]
        rest = emb[i, 1 + n_ctx + nl:]           # '.', EOT, padding
        template[i, 0] = emb[i, 0]               # SOS
        if class_token_position == "middle":
            # [SOS][ctx:half][name][ctx half:][rest] (:161-182)
            placement[i, np.arange(1, 1 + half), np.arange(half)] = 1
            template[i, 1 + half:1 + half + nl] = name_rows
            placement[i, np.arange(1 + half + nl, 1 + nl + n_ctx),
                      np.arange(half, n_ctx)] = 1
        else:                                    # front: [SOS][name][ctx][rest]
            template[i, 1:1 + nl] = name_rows
            placement[i, np.arange(1 + nl, 1 + nl + n_ctx),
                      np.arange(n_ctx)] = 1
        template[i, 1 + n_ctx + nl:] = rest
    tables.template = template
    tables.ctx_placement = placement
    return tables


def prompt_forward(ctx, tables: PromptTables, bias, target):
    """prompts = prefix[target] ++ (ctx + bias) ++ suffix[target]
    (main_coop_vae.py:117-128). bias: (B, D); target: (B,) class ids.
    Middle/front positions use the precomputed template + placement."""
    shifted = ctx[None] + bias[:, None, :]
    if tables.template is not None:
        tpl = jnp.asarray(tables.template)[target]
        place = jnp.asarray(tables.ctx_placement)[target]
        return tpl + jnp.einsum("blk,bkd->bld", place, shifted)
    prefix = jnp.asarray(tables.token_prefix)[target]
    suffix = jnp.asarray(tables.token_suffix)[target]
    return jnp.concatenate([prefix, shifted, suffix], axis=1)


def prompted_text_features(clip_params, clip_cfg: CLIPConfig, ctx,
                           tables: PromptTables, bias, target):
    prompts = prompt_forward(ctx, tables, bias, target)
    eot = jnp.asarray(tables.eot_idx)[target]
    return text_encoder_forward(clip_params, prompts, eot, clip_cfg)


# --------------------------------------------------------------------------
# VAE training (main_coop_vae.py:300-491)
# --------------------------------------------------------------------------
def vae_loss(recon, x, mean, log_var):
    rec = jnp.sum((recon - x) ** 2, axis=1).mean()
    kld = -0.5 * jnp.sum(1 + log_var - mean ** 2 - jnp.exp(log_var),
                         axis=1).mean()
    return rec + kld


def vae_step(params, tables, clip_params, clip_cfg, image_features, target,
             rng):
    """params: {enc, gen, ctx}. image_features must be L2-normalized.
    Returns scalar loss (differentiable in params)."""
    mean, log_var = encoder_forward(params["enc"], image_features)
    std = jnp.exp(0.5 * log_var)
    z = std * jax.random.normal(rng, mean.shape) + mean
    bias = generator_forward(params["gen"], z)
    text = prompted_text_features(clip_params, clip_cfg, params["ctx"],
                                  tables, bias, target)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    return vae_loss(text, image_features, mean, log_var)


def ship_step(mlp_params, gen_params, ctx, tables, clip_params, clip_cfg,
              gt_features, target, rng):
    """SHIP alignment (finetune_ship.py:474-530): z~N(0,I) -> frozen netG ->
    frozen prompts -> text features -> trainable MLP vs GT crop features."""
    z = jax.random.normal(rng, (target.shape[0], FEAT))
    bias = generator_forward(gen_params, z)
    text = prompted_text_features(clip_params, clip_cfg, ctx, tables, bias,
                                  target)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    out = ship_mlp_forward(mlp_params, text)
    return jnp.mean(jnp.sum((out - gt_features) ** 2, axis=1))


# --------------------------------------------------------------------------
# batched unseen-feature synthesis (main_tip_finetune.py:607-824)
# --------------------------------------------------------------------------
@dataclasses.dataclass
class GeneratorFamily:
    gen_params: dict            # frozen netG
    ctx: jnp.ndarray            # frozen learned context
    tables: PromptTables        # built over the synthesis class set
    mlp_params: Optional[list]  # SHIP MLP (None -> identity)


def synthesize_features(families: dict, clip_params, clip_cfg: CLIPConfig,
                        hoi_to_obj: np.ndarray, hoi_to_verb: np.ndarray,
                        num_hoi: int, n_rounds: int = 100, rng=None,
                        chunk: int = 2048):
    """families: {'hoi','human','object'} -> GeneratorFamily. Per round,
    every HOI class gets one sample per family; human/object families are
    conditioned on the HOI's object class (the reference conditions BOTH on
    the object id, main_tip_finetune.py:763-772).

    Returns (gen_feature (3*N, 512) stacked [hoi; human; object],
             gen_target (3*N,) HOI ids, gen_verb (N,) verb ids).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = n_rounds * num_hoi
    hoi_ids = np.tile(np.arange(num_hoi), n_rounds)
    obj_ids = np.asarray(hoi_to_obj)[hoi_ids]
    targets = {"hoi": hoi_ids, "human": obj_ids, "object": obj_ids}

    # clip_params passed as an argument: closed-over device arrays embed as
    # HLO constants and trigger pathological constant folding
    @jax.jit
    def run_chunk(cp, gen_params, ctx, prefix, suffix, eot, mlp, z, tgt):
        bias = generator_forward(gen_params, z)
        pre = prefix[tgt]
        suf = suffix[tgt]
        prompts = jnp.concatenate([pre, ctx[None] + bias[:, None, :], suf],
                                  axis=1)
        text = text_encoder_forward(cp, prompts, eot[tgt], clip_cfg)
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        if mlp is not None:
            text = ship_mlp_forward(mlp, text)
        return text

    out = {}
    for fi, (fam, gf) in enumerate(families.items()):
        feats = []
        frng = jax.random.fold_in(rng, fi)
        tgt_all = targets[fam]
        prefix = jnp.asarray(gf.tables.token_prefix)
        suffix = jnp.asarray(gf.tables.token_suffix)
        eot = jnp.asarray(gf.tables.eot_idx)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            z = jax.random.normal(jax.random.fold_in(frng, lo),
                                  (hi - lo, FEAT))
            feats.append(np.asarray(run_chunk(
                clip_params, gf.gen_params, gf.ctx, prefix, suffix, eot,
                gf.mlp_params, z, jnp.asarray(tgt_all[lo:hi]))))
        out[fam] = np.concatenate(feats, axis=0)

    gen_feature = np.concatenate([out["hoi"], out["human"], out["object"]],
                                 axis=0).astype(np.float32)
    gen_target = np.concatenate([hoi_ids, hoi_ids, hoi_ids]).astype(np.int32)
    gen_verb = np.asarray(hoi_to_verb)[hoi_ids].astype(np.int32)
    return gen_feature, gen_target, gen_verb


# --------------------------------------------------------------------------
# torch checkpoint converters (reference saves per-module .pth files:
# main_coop_vae.py:492-506, finetune_ship.py:532-538)
# --------------------------------------------------------------------------
def _t2n(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().float().numpy()


def torch_encoder_state_to_params(sd):
    return {"net": {"w": jnp.asarray(_t2n(sd["net.0.weight"])),
                    "b": jnp.asarray(_t2n(sd["net.0.bias"]))},
            "mean": {"w": jnp.asarray(_t2n(sd["mean.weight"])),
                     "b": jnp.asarray(_t2n(sd["mean.bias"]))},
            "log_var": {"w": jnp.asarray(_t2n(sd["log_var.weight"])),
                        "b": jnp.asarray(_t2n(sd["log_var.bias"]))}}


def torch_generator_state_to_params(sd):
    return {"l1": {"w": jnp.asarray(_t2n(sd["net.0.weight"])),
                   "b": jnp.asarray(_t2n(sd["net.0.bias"]))},
            "l2": {"w": jnp.asarray(_t2n(sd["net.2.weight"])),
                   "b": jnp.asarray(_t2n(sd["net.2.bias"]))}}


def torch_prompt_ctx_to_params(sd):
    return jnp.asarray(_t2n(sd["ctx"]))


def torch_ship_mlp_state_to_params(sd):
    return [{"w": jnp.asarray(_t2n(sd[f"net.{i}.weight"])),
             "b": jnp.asarray(_t2n(sd[f"net.{i}.bias"]))}
            for i in (0, 2, 4)]
