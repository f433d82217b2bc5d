"""Generator stack tests: prompt assembly, VAE loss parity with the
reference formula, training-step improvement, batched synthesis, and
integration with the gen-cache builder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoigen_tpu.models.cache import build_gen_cache
from hoigen_tpu.models.clip import CLIPConfig
from hoigen_tpu.models.clip.model import init_clip_params
from hoigen_tpu.models.generator import (GeneratorFamily, PromptTables,
                                         build_prompt_tables,
                                         encoder_forward,
                                         generator_forward,
                                         init_encoder_params,
                                         init_generator_params,
                                         init_prompt_ctx,
                                         init_ship_mlp_params, prompt_forward,
                                         ship_step, synthesize_features,
                                         vae_loss, vae_step)

TINY = CLIPConfig(embed_dim=512, image_resolution=32, vision_layers=2,
                  vision_width=64, vision_patch_size=8,
                  transformer_layers=2, transformer_width=512,
                  context_length=77, adapter_layers=())


@pytest.fixture(scope="module")
def clip_setup():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    return params


def test_prompt_tables_and_forward(clip_setup):
    params = clip_setup
    names = ["riding a bicycle", "eating an apple", "no interaction"]
    tables = build_prompt_tables(names, params["text"]["token_embedding"],
                                 n_ctx=5)
    assert tables.token_prefix.shape == (3, 1, 512)
    assert tables.token_suffix.shape == (3, 77 - 6, 512)
    # eot position = prompt length: 1 SOT + 5 ctx + name tokens + '.' + EOT
    assert (tables.eot_idx > 6).all()
    ctx = init_prompt_ctx(jax.random.PRNGKey(1), 5)
    bias = jnp.ones((2, 512)) * 0.1
    target = jnp.asarray([0, 2])
    prompts = prompt_forward(ctx, tables, bias, target)
    assert prompts.shape == (2, 77, 512)
    # ctx slots contain ctx + bias
    np.testing.assert_allclose(np.asarray(prompts[0, 1:6]),
                               np.asarray(ctx + 0.1), atol=1e-6)
    # prefix slot = SOT embedding of the target class
    np.testing.assert_allclose(np.asarray(prompts[1, 0]),
                               tables.token_suffix[0, -1] * 0 +
                               tables.token_prefix[2, 0], atol=1e-6)


def test_vae_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    recon = rng.normal(size=(8, 512)).astype(np.float32)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    mean = rng.normal(size=(8, 512)).astype(np.float32)
    log_var = rng.normal(size=(8, 512)).astype(np.float32) * 0.1
    ours = float(vae_loss(jnp.asarray(recon), jnp.asarray(x),
                          jnp.asarray(mean), jnp.asarray(log_var)))
    tr, tx = torch.from_numpy(recon), torch.from_numpy(x)
    tm, tl = torch.from_numpy(mean), torch.from_numpy(log_var)
    rec = (tr - tx).pow(2).sum(1).mean()
    kld = -0.5 * (1 + tl - tm.pow(2) - tl.exp()).sum(dim=1).mean()
    assert abs(ours - float(rec + kld)) < 1e-2


def test_vae_training_reduces_loss(clip_setup):
    clip_params = clip_setup
    names = [f"class {i}" for i in range(4)]
    tables = build_prompt_tables(names,
                                 clip_params["text"]["token_embedding"], 5)
    params = {"enc": init_encoder_params(jax.random.PRNGKey(2)),
              "gen": init_generator_params(jax.random.PRNGKey(3)),
              "ctx": init_prompt_ctx(jax.random.PRNGKey(4), 5)}
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(16, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    target = jnp.asarray(rng.integers(0, 4, 16))
    feats = jnp.asarray(feats)

    import optax
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, r):
        loss, g = jax.value_and_grad(
            lambda pp: vae_step(pp, tables, clip_params, TINY, feats,
                                target, r))(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(20):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_ship_step_differentiable(clip_setup):
    clip_params = clip_setup
    tables = build_prompt_tables(["a", "b"],
                                 clip_params["text"]["token_embedding"], 4)
    gen = init_generator_params(jax.random.PRNGKey(5))
    ctx = init_prompt_ctx(jax.random.PRNGKey(6), 4)
    mlp = init_ship_mlp_params(jax.random.PRNGKey(7))
    gt = jnp.asarray(np.random.default_rng(2).normal(size=(6, 512))
                     .astype(np.float32))
    tgt = jnp.asarray([0, 1, 0, 1, 0, 1])
    loss, grads = jax.jit(jax.value_and_grad(
        lambda m: ship_step(m, gen, ctx, tables, clip_params, TINY, gt, tgt,
                            jax.random.PRNGKey(8))))(mlp)
    assert bool(jnp.isfinite(loss))
    assert float(jnp.abs(grads[0]["w"]).max()) > 0


def test_synthesis_and_gen_cache(clip_setup):
    clip_params = clip_setup
    num_hoi, n_rounds = 10, 3
    hoi_to_obj = np.asarray([0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    hoi_to_verb = np.asarray([0, 1, 0, 1, 2, 3, 2, 3, 4, 4])
    hoi_names = [f"hoi {i}" for i in range(num_hoi)]
    obj_names = [f"object {i}" for i in range(5)]
    emb = clip_params["text"]["token_embedding"]

    def fam(seed, names, mlp=False):
        return GeneratorFamily(
            gen_params=init_generator_params(jax.random.PRNGKey(seed)),
            ctx=init_prompt_ctx(jax.random.PRNGKey(seed + 1), 5),
            tables=build_prompt_tables(names, emb, 5),
            mlp_params=init_ship_mlp_params(jax.random.PRNGKey(seed + 2))
            if mlp else None)

    families = {"hoi": fam(10, hoi_names, mlp=True),
                "human": fam(20, obj_names),
                "object": fam(30, obj_names)}
    gf, gt, gv = synthesize_features(families, clip_params, TINY, hoi_to_obj,
                                     hoi_to_verb, num_hoi, n_rounds,
                                     rng=jax.random.PRNGKey(0), chunk=16)
    n = n_rounds * num_hoi
    assert gf.shape == (3 * n, 512)
    assert gt.shape == (3 * n,) and gv.shape == (n,)
    assert np.isfinite(gf).all()
    # hoi block rows are L2-normalized only when no MLP; human block is
    norms = np.linalg.norm(gf[n:2 * n], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # feed into the gen-cache builder grouped by verb (5 verbs)
    cache = build_gen_cache(gf, gt, hoi_to_verb, num_classes=5, num_shot=2)
    assert cache.cache_u.shape == (10, 512)
    assert cache.one_hots.shape == (10, 5)
    np.testing.assert_array_equal(cache.sample_lens, np.full(5, 2.0))


def test_ctx_init_from_text():
    """--CTX_INIT: context vectors equal the token embeddings of the
    phrase and n_ctx matches its token count (PromptLearner :98-106)."""
    import jax
    from hoigen_tpu.models import generator as G
    from hoigen_tpu.models.clip.tokenizer import tokenize

    rng = np.random.default_rng(0)
    vocab = 49408
    emb = rng.normal(size=(vocab, 8)).astype(np.float32)
    phrase = "a photo of a person"
    ctx, n_ctx = G.init_prompt_ctx_from_text(phrase, emb)
    toks = tokenize([phrase])
    assert n_ctx == int(toks[0].argmax()) - 1 == 5
    np.testing.assert_array_equal(np.asarray(ctx),
                                  emb[toks[0, 1:1 + n_ctx]])
