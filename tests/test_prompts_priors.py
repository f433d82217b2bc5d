"""Parity and wiring tests for the CoOp prompt class-token positions and
the prior_type / prior_method flags (VERDICT round-1 items: flags that
compile the wrong program).

PromptLearner oracle: /root/reference/upt_tip_cache_model_free_finetune_
distill3.py:88-207. Prior layout oracle: get_prior :1449-1494 (fixed
visual_output_dim+5-wide zero-padded features for every prior_type).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

import jax                                                 # noqa: E402
import jax.numpy as jnp                                    # noqa: E402

from ref_upt import load_ref_upt                           # noqa: E402

CLASSNAMES = ["ride a bicycle", "pet a dog", "fly a kite",
              "repair an umbrella"]


class _ClipStub(torch.nn.Module):
    def __init__(self, dim=32):
        super().__init__()
        torch.manual_seed(5)
        self.token_embedding = torch.nn.Embedding(49408, dim)
        self.ln_final = torch.nn.LayerNorm(dim)
        self.dtype = torch.float32


class _Args:
    N_CTX = 4
    CSC = False
    CTX_INIT = ""

    def __init__(self, pos):
        self.CLASS_TOKEN_POSITION = pos


@pytest.mark.parametrize("pos", ["end", "middle", "front"])
def test_prompt_learner_parity(pos):
    from hoigen_tpu.models.generator import build_prompt_tables, \
        prompt_forward

    ref = load_ref_upt()
    clip_model = _ClipStub()
    pl = ref.PromptLearner(_Args(pos), CLASSNAMES, clip_model)
    with torch.no_grad():
        expected = pl.forward().numpy()

    emb_table = clip_model.token_embedding.weight.detach().numpy()
    tables = build_prompt_tables(CLASSNAMES, emb_table, n_ctx=4,
                                 class_token_position=pos)
    ctx = jnp.asarray(pl.ctx.detach().numpy())
    got = prompt_forward(ctx, tables,
                         bias=jnp.zeros((len(CLASSNAMES), emb_table.shape[1])),
                         target=jnp.arange(len(CLASSNAMES)))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
    # EOT position unchanged by rearrangement
    ref_eot = pl.tokenized_prompts.argmax(-1).numpy()
    np.testing.assert_array_equal(tables.eot_idx, ref_eot)


def test_prompt_position_rejects_unknown():
    from hoigen_tpu.models.generator import build_prompt_tables
    with pytest.raises(ValueError):
        build_prompt_tables(CLASSNAMES, np.zeros((49408, 8), np.float32),
                            n_ctx=2, class_token_position="sideways")


# --------------------------------------------------------------------------
# prior_type layout / prior_method wiring
# --------------------------------------------------------------------------
def _tiny_setup(prior_type="cbe", prior_method=0):
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.clip.model import init_clip_params
    from hoigen_tpu.models.proposals import ProposalConfig
    from hoigen_tpu.models.upt import UPTConfig, init_upt_params

    cfg = UPTConfig(num_classes=6, num_shot=2, visual_output_dim=16,
                    prior_type=prior_type, prior_method=prior_method,
                    vis_prompt_num=5, use_dino=False,
                    proposals=ProposalConfig(max_instances=3))
    caches = random_caches(6, 2, num_objects=4)
    caches.object_embedding = caches.object_embedding[:, :16].copy()
    clip_cfg = CLIPConfig(image_resolution=16, vision_layers=1,
                          vision_width=32, vision_patch_size=8,
                          transformer_layers=1, transformer_width=32,
                          context_length=8)
    clip_p = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    params, buffers = init_upt_params(jax.random.PRNGKey(1), cfg, caches,
                                      clip_p)
    return cfg, params, buffers


def _prior_inputs(cfg):
    rng = np.random.default_rng(0)
    s = cfg.proposals.n_slots
    boxes = jnp.asarray(np.abs(rng.normal(20, 5, (2, s, 4))))
    scores = jnp.asarray(rng.random((2, s)))
    labels = jnp.asarray(rng.integers(0, 4, (2, s)))
    valid = jnp.asarray(np.array([[True] * 4 + [False] * (s - 4)] * 2))
    sizes = jnp.asarray(np.full((2, 2), 64.0))
    return boxes, scores, labels, valid, sizes


@pytest.mark.parametrize("prior_type",
                         ["cbe", "cb", "ce", "be", "c", "b", "e"])
def test_prior_type_layout(prior_type):
    """Every prior_type feeds the SAME fixed-width MLP; narrower types
    zero-pad the tail exactly like the reference's preallocated buffer."""
    from hoigen_tpu.models.upt import _mlp3, compute_priors

    cfg, params, buffers = _tiny_setup(prior_type)
    boxes, scores, labels, valid, sizes = _prior_inputs(cfg)
    tokens, mask = compute_priors(params, boxes, scores, labels, valid,
                                  sizes, buffers["object_embedding"], cfg)
    assert tokens.shape == (2, cfg.proposals.n_slots, 64)
    np.testing.assert_array_equal(np.asarray(mask), ~np.asarray(valid))

    # reconstruct the reference layout by hand and push through the MLP
    nb = np.asarray(boxes) / 64.0
    sc = np.asarray(scores)[..., None]
    emb = np.asarray(buffers["object_embedding"])[np.asarray(labels)]
    d = cfg.visual_output_dim
    feats = np.zeros((2, cfg.proposals.n_slots, d + 5), np.float32)
    if prior_type == "cbe":
        feats[..., :5] = np.concatenate([sc, nb], -1)
        feats[..., 5:5 + d] = emb
    elif prior_type == "cb":
        feats[..., :5] = np.concatenate([sc, nb], -1)
    elif prior_type == "ce":
        feats[..., :1] = sc
        feats[..., 1:1 + d] = emb
    elif prior_type == "be":
        feats[..., :4] = nb
        feats[..., 4:4 + d] = emb
    elif prior_type == "c":
        feats[..., :1] = sc
    elif prior_type == "b":
        feats[..., :4] = nb
    elif prior_type == "e":
        feats[..., :d] = emb
    feats *= np.asarray(valid)[..., None]
    expected = _mlp3(params["priors_downproj"], jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_prior_method_pairwise():
    from hoigen_tpu.models.proposals import pair_indices
    from hoigen_tpu.models.upt import compute_priors

    cfg, params, buffers = _tiny_setup(prior_method=1)
    assert params["priors_downproj"][0]["w"].shape[1] == \
        2 * cfg.priors_initial_dim
    boxes, scores, labels, valid, sizes = _prior_inputs(cfg)
    tokens, mask = compute_priors(params, boxes, scores, labels, valid,
                                  sizes, buffers["object_embedding"], cfg)
    assert tokens.shape == (2, cfg.proposals.n_pairs, 64)
    x_idx, y_idx = pair_indices(cfg.proposals)
    v = np.asarray(valid)
    pv = v[:, np.asarray(x_idx)] & v[:, np.asarray(y_idx)] \
        & (np.asarray(x_idx) != np.asarray(y_idx))
    np.testing.assert_array_equal(np.asarray(mask), ~pv)


def test_prior_method_learnable():
    from hoigen_tpu.models.upt import compute_priors

    cfg, params, buffers = _tiny_setup(prior_method=2)
    assert params["learnable_prior"].shape == (5, 64)
    boxes, scores, labels, valid, sizes = _prior_inputs(cfg)
    tokens, mask = compute_priors(params, boxes, scores, labels, valid,
                                  sizes, buffers["object_embedding"], cfg)
    assert tokens.shape == (2, 5, 64)
    assert not np.asarray(mask).any()
    np.testing.assert_allclose(np.asarray(tokens[0]),
                               np.asarray(params["learnable_prior"]))


def test_broken_reference_flags_rejected():
    from hoigen_tpu.models.upt import UPTConfig
    with pytest.raises(ValueError, match="use_consistloss"):
        UPTConfig(use_consistloss=True)
    with pytest.raises(ValueError, match="tpt"):
        UPTConfig(tpt=True)
    with pytest.raises(ValueError, match="prior_method"):
        UPTConfig(prior_method=7)
