"""Golden parity: functional JAX CLIP (+instance adapters) vs the reference
torch implementation (/root/reference/CLIP_models_adapter_prior2.py), built
from the same tiny random state dict. torchvision-free: the reference module
only needs torch plus two stub imports."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hoigen_tpu.models.clip import (CLIPConfig, encode_image, encode_text,
                                    text_encoder_forward,
                                    torch_state_dict_to_params)  # noqa: E402

REF = "/root/reference"

# tiny architecture: ViT width 64 (1 head), 2+2 layers, 32px/patch8 -> 17 tok
W_V, L_V, PATCH, RES = 64, 2, 8, 32
W_T, L_T, CTX, VOCAB, EMB = 64, 2, 16, 64, 32


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "visual.conv1.weight": r(W_V, 3, PATCH, PATCH),
        "visual.class_embedding": r(W_V),
        "visual.positional_embedding": r((RES // PATCH) ** 2 + 1, W_V),
        "visual.ln_pre.weight": 1 + 0.1 * r(W_V),
        "visual.ln_pre.bias": 0.1 * r(W_V),
        "visual.ln_post.weight": 1 + 0.1 * r(W_V),
        "visual.ln_post.bias": 0.1 * r(W_V),
        "visual.proj": r(W_V, EMB),
        "token_embedding.weight": r(VOCAB, W_T),
        "positional_embedding": r(CTX, W_T),
        "ln_final.weight": 1 + 0.1 * r(W_T),
        "ln_final.bias": 0.1 * r(W_T),
        "text_projection": r(W_T, EMB),
        "logit_scale": torch.tensor(np.log(1 / 0.07), dtype=torch.float32),
    }
    for scope, width, layers in (("visual.transformer", W_V, L_V),
                                 ("transformer", W_T, L_T)):
        for i in range(layers):
            p = f"{scope}.resblocks.{i}"
            sd.update({
                f"{p}.attn.in_proj_weight": r(3 * width, width),
                f"{p}.attn.in_proj_bias": 0.1 * r(3 * width),
                f"{p}.attn.out_proj.weight": r(width, width),
                f"{p}.attn.out_proj.bias": 0.1 * r(width),
                f"{p}.ln_1.weight": 1 + 0.1 * r(width),
                f"{p}.ln_1.bias": 0.1 * r(width),
                f"{p}.ln_2.weight": 1 + 0.1 * r(width),
                f"{p}.ln_2.bias": 0.1 * r(width),
                f"{p}.mlp.c_fc.weight": r(4 * width, width),
                f"{p}.mlp.c_fc.bias": 0.1 * r(4 * width),
                f"{p}.mlp.c_proj.weight": r(width, 4 * width),
                f"{p}.mlp.c_proj.bias": 0.1 * r(width),
            })
    return sd


@pytest.fixture(scope="module")
def ref_clip():
    # stub the reference's broken/missing imports
    tm = types.ModuleType("transformer_module")
    tm.TransformerDecoderLayer = object
    tm.TransformerDecoderLayer_womhsa = object
    clip_pkg = types.ModuleType("CLIP")
    clip_pkg.__path__ = []
    clip_clip = types.ModuleType("CLIP.clip")
    clip_clip.__path__ = []
    st = types.ModuleType("CLIP.clip.simple_tokenizer")

    class _Tok:  # only instantiated, never used in encode paths we test
        def __init__(self, *a, **k):
            pass

    st.SimpleTokenizer = _Tok
    pkg_res = types.ModuleType("pkg_resources")
    import packaging
    import packaging.version  # noqa: F401
    pkg_res.packaging = packaging
    for k, v in {"transformer_module": tm, "CLIP": clip_pkg,
                 "CLIP.clip": clip_clip,
                 "CLIP.clip.simple_tokenizer": st,
                 "pkg_resources": pkg_res}.items():
        sys.modules[k] = v
    spec = importlib.util.spec_from_file_location(
        "ref_clip_adapter", f"{REF}/CLIP_models_adapter_prior2.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def models(ref_clip):
    torch.manual_seed(7)
    ref_model = ref_clip.build_model(dict(_tiny_state_dict()),
                                     use_adapter=True, adapter_pos="all",
                                     adapter_num_layers=1)
    ref_model = ref_model.float().eval()
    full_sd = {k: v for k, v in ref_model.state_dict().items()}
    params, cfg = torch_state_dict_to_params(full_sd, use_adapter=True,
                                             adapter_pos="all",
                                             adapter_num_layers=1)
    return ref_model, params, cfg


def test_config_inference(models):
    _, _, cfg = models
    assert cfg.vision_width == W_V and cfg.vision_layers == L_V
    assert cfg.image_resolution == RES and cfg.vision_patch_size == PATCH
    assert cfg.transformer_width == W_T and cfg.context_length == CTX
    assert cfg.embed_dim == EMB


def test_encode_image_with_prior(models):
    ref_model, params, cfg = models
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, RES, RES)).astype(np.float32)
    prior = rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.5
    mask = np.array([[False, False, False, True, True],
                     [False, True, True, True, True]])
    with torch.no_grad():
        g_ref, l_ref = ref_model.visual(
            torch.from_numpy(images),
            (torch.from_numpy(prior), torch.from_numpy(mask)))
    g, local = encode_image(params, jnp.asarray(images), cfg,
                            prior=jnp.asarray(prior),
                            prior_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(g), g_ref.numpy(), atol=2e-5)
    # ours is (B, gh, gw, C); reference is (B, C, gh, gw)
    np.testing.assert_allclose(np.asarray(local).transpose(0, 3, 1, 2),
                               l_ref.numpy(), atol=2e-5)


def test_encode_image_no_prior_no_adapter(ref_clip):
    torch.manual_seed(3)
    ref_model = ref_clip.build_model(dict(_tiny_state_dict(1)),
                                     use_adapter=False).float().eval()
    params, cfg = torch_state_dict_to_params(
        {k: v for k, v in ref_model.state_dict().items()}, use_adapter=False)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 3, RES, RES)).astype(np.float32)
    with torch.no_grad():
        g_ref, _ = ref_model.visual(torch.from_numpy(images))
    g, _ = encode_image(params, jnp.asarray(images), cfg)
    np.testing.assert_allclose(np.asarray(g), g_ref.numpy(), atol=2e-5)


def test_encode_text(models):
    ref_model, params, cfg = models
    rng = np.random.default_rng(2)
    tokens = rng.integers(1, VOCAB - 1, size=(4, CTX))
    # emulate SOT ... EOT structure: EOT (= max id) at varying positions
    for i, pos in enumerate([5, 9, 15, 3]):
        tokens[i, pos] = VOCAB - 1
        tokens[i, pos + 1:] = 0
    with torch.no_grad():
        t_ref = ref_model.encode_text(torch.from_numpy(tokens))
    t = encode_text(params, jnp.asarray(tokens), cfg)
    np.testing.assert_allclose(np.asarray(t), t_ref.numpy(), atol=2e-5)


def test_prompt_embedding_text_path(models):
    """CoOp path: prompts given as embeddings (TextEncoder :66-86)."""
    ref_model, params, cfg = models
    rng = np.random.default_rng(3)
    prompts = rng.normal(size=(3, CTX, W_T)).astype(np.float32) * 0.05
    eot = np.array([7, 12, 4])
    with torch.no_grad():
        x = torch.from_numpy(prompts) + ref_model.positional_embedding
        x = ref_model.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = ref_model.ln_final(x)
        t_ref = x[torch.arange(3), torch.from_numpy(eot)] @ ref_model.text_projection
    t = text_encoder_forward(params, jnp.asarray(prompts), jnp.asarray(eot),
                             cfg)
    np.testing.assert_allclose(np.asarray(t), t_ref.numpy(), atol=2e-5)


def test_pos_embed_interpolation():
    import torch.nn.functional as F
    from hoigen_tpu.models.clip.convert import interpolate_pos_embedding
    rng = np.random.default_rng(4)
    pos = rng.normal(size=(17, 8)).astype(np.float32)  # 4x4 grid + cls
    ours = interpolate_pos_embedding(pos, 50)          # -> 7x7 grid + cls
    spatial = torch.from_numpy(pos[1:]).reshape(1, 4, 4, 8).permute(0, 3, 1, 2)
    ref_sp = F.interpolate(spatial, size=(7, 7), mode="bilinear")
    ref_sp = ref_sp.reshape(8, 49).permute(1, 0).numpy()
    np.testing.assert_allclose(ours[1:], ref_sp, atol=1e-6)
    np.testing.assert_allclose(ours[0], pos[0])


# ---------------------------------------------------------------------------
# ModifiedResNet (RN-variant) visual tower
# (CLIP_models_adapter_prior2.py:205-420, build path :694,:796)
# ---------------------------------------------------------------------------
RN_W, RN_RES = 8, 64  # attnpool embed 8*32=256, 4 heads, spacial dim 2


@pytest.fixture(scope="module")
def rn_tower(ref_clip):
    torch.manual_seed(11)
    rn = ref_clip.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=EMB,
                                 heads=RN_W * 32 // 64,
                                 input_resolution=RN_RES, width=RN_W)
    # non-trivial BN running stats so the conversion-time folding is tested
    with torch.no_grad():
        for m in rn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    return rn.float().eval()


def test_modified_resnet_parity(rn_tower):
    from hoigen_tpu.models.clip import encode_image as enc
    # full RN-CLIP state dict: the RN visual tower + the tiny text stack
    sd = {"visual." + k: v for k, v in rn_tower.state_dict().items()}
    for k, v in _tiny_state_dict(2).items():
        if not k.startswith("visual."):
            sd[k] = v
    params, cfg = torch_state_dict_to_params(sd)
    assert cfg.is_resnet and cfg.rn_layers == (1, 1, 1, 1)
    assert cfg.image_resolution == RN_RES and cfg.vision_width == RN_W
    assert cfg.vision_heads == RN_W * 32 // 64 and cfg.embed_dim == EMB
    rng = np.random.default_rng(6)
    images = rng.normal(size=(2, 3, RN_RES, RN_RES)).astype(np.float32)
    with torch.no_grad():
        g_ref, l_ref = rn_tower(torch.from_numpy(images))
    g, local = enc(params, jnp.asarray(images), cfg)
    np.testing.assert_allclose(np.asarray(g), g_ref.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(local).transpose(0, 3, 1, 2),
                               l_ref.numpy(), atol=3e-5)


def test_modified_resnet_rejects_priors(rn_tower):
    from hoigen_tpu.models.clip import encode_image as enc
    sd = {"visual." + k: v for k, v in rn_tower.state_dict().items()}
    for k, v in _tiny_state_dict(2).items():
        if not k.startswith("visual."):
            sd[k] = v
    params, cfg = torch_state_dict_to_params(sd)
    with pytest.raises(ValueError, match="no instance adapters"):
        enc(params, jnp.zeros((1, 3, RN_RES, RN_RES)), cfg,
            prior=jnp.zeros((1, 2, 64)))


def test_modified_resnet_random_init_forward():
    from hoigen_tpu.models.clip.resnet import (init_modified_resnet_params,
                                               modified_resnet_forward)
    p = init_modified_resnet_params(jax.random.PRNGKey(0), (1, 1, 1, 1),
                                    RN_W, EMB, RN_RES // 32)
    g, local = modified_resnet_forward(
        p, jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 3, RN_RES, RN_RES)).astype(np.float32)),
        RN_W * 32 // 64)
    assert g.shape == (2, EMB) and local.shape == (2, 2, 2, EMB)
    assert bool(jnp.isfinite(g).all()) and bool(jnp.isfinite(local).all())


def test_tokenizer_matches_reference():
    # load the reference tokenizer straight from its file (bypassing the
    # CLIP package, which needs torchvision). It imports ftfy — stub with
    # an identity fixer if absent (our prompts are ASCII).
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    spec = importlib.util.spec_from_file_location(
        "ref_simple_tokenizer", f"{REF}/CLIP/clip/simple_tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from hoigen_tpu.models.clip import SimpleTokenizer
    ours = SimpleTokenizer()
    theirs = mod.SimpleTokenizer()
    texts = [
        "a photo of a person riding a bicycle.",
        "X X X X a photo of a person and an airplane",
        "person holding a wine glass, blocking a sports ball!",
        "washing a toothbrush  --  weird   spacing\t\ttabs",
    ]
    for t in texts:
        assert ours.encode(t) == theirs.encode(t), t
