"""DETR parity tests: transformer/pos-embedding vs the reference modules
(loaded standalone, torch-only), ResNet blocks vs a torch oracle."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hoigen_tpu.models.detr import (DETRConfig, detr_forward,
                                    downsample_mask, init_detr_params,
                                    postprocess, sine_position_embedding)
from hoigen_tpu.models.detr.model import transformer_forward  # noqa: E402
from hoigen_tpu.models.detr.resnet import fold_bn, _bottleneck, _conv_bn  # noqa: E402

REF = "/root/reference/detr"


def _load(relpath, name, stubs=None):
    for k, v in (stubs or {}).items():
        sys.modules[k] = v
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_transformer():
    return _load("models/transformer.py", "ref_detr_transformer")


@pytest.fixture(scope="module")
def ref_posenc():
    misc = types.ModuleType("util.misc")

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors, self.mask = tensors, mask

    misc.NestedTensor = NestedTensor
    util = types.ModuleType("util")
    util.misc = misc
    return _load("models/position_encoding.py", "ref_detr_posenc",
                 {"util": util, "util.misc": misc}), NestedTensor


def _attn_params(m):
    return {"w_qkv": jnp.asarray(m.in_proj_weight.detach().numpy()),
            "b_qkv": jnp.asarray(m.in_proj_bias.detach().numpy()),
            "w_out": jnp.asarray(m.out_proj.weight.detach().numpy()),
            "b_out": jnp.asarray(m.out_proj.bias.detach().numpy())}


def _ln_params(m):
    return {"g": jnp.asarray(m.weight.detach().numpy()),
            "b": jnp.asarray(m.bias.detach().numpy())}


def _ffn_params(layer):
    return {"lin1_w": jnp.asarray(layer.linear1.weight.detach().numpy()),
            "lin1_b": jnp.asarray(layer.linear1.bias.detach().numpy()),
            "lin2_w": jnp.asarray(layer.linear2.weight.detach().numpy()),
            "lin2_b": jnp.asarray(layer.linear2.bias.detach().numpy())}


def test_transformer_parity(ref_transformer):
    torch.manual_seed(0)
    cfg = DETRConfig(hidden_dim=64, nheads=2, enc_layers=2, dec_layers=2,
                     dim_feedforward=128, num_queries=10)
    t = ref_transformer.Transformer(
        d_model=64, nhead=2, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=128, dropout=0.0, return_intermediate_dec=True)
    t.eval()
    params = {
        "encoder": [{"attn": _attn_params(l.self_attn), **_ffn_params(l),
                     "norm1": _ln_params(l.norm1), "norm2": _ln_params(l.norm2)}
                    for l in t.encoder.layers],
        "decoder": [{"self_attn": _attn_params(l.self_attn),
                     "cross_attn": _attn_params(l.multihead_attn),
                     **_ffn_params(l),
                     "norm1": _ln_params(l.norm1), "norm2": _ln_params(l.norm2),
                     "norm3": _ln_params(l.norm3)}
                    for l in t.decoder.layers],
        "decoder_norm": _ln_params(t.decoder.norm),
    }
    rng = np.random.default_rng(0)
    b, c, h, w = 2, 64, 5, 7
    src = rng.normal(size=(b, c, h, w)).astype(np.float32)
    pos = rng.normal(size=(b, c, h, w)).astype(np.float32)
    mask = np.zeros((b, h, w), bool)
    mask[0, :, 5:] = True  # padding on image 0
    query = rng.normal(size=(10, 64)).astype(np.float32)
    with torch.no_grad():
        hs_ref, mem_ref = t(torch.from_numpy(src), torch.from_numpy(mask),
                            torch.from_numpy(query), torch.from_numpy(pos))
    src_j = jnp.asarray(src.reshape(b, c, h * w).transpose(0, 2, 1))
    pos_j = jnp.asarray(pos.reshape(b, c, h * w).transpose(0, 2, 1))
    hs, mem = jax.jit(lambda s, m, q, p: transformer_forward(
        params, s, m, q, p, cfg))(src_j, jnp.asarray(mask.reshape(b, -1)),
                                  jnp.asarray(query), pos_j)
    # reference Transformer.forward already returns hs as (layers, B, Q, D)
    np.testing.assert_allclose(np.asarray(hs), hs_ref.numpy(), atol=3e-5)
    mem_ref_j = mem_ref.numpy().reshape(b, c, h * w).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(mem), mem_ref_j, atol=3e-5)


def test_sine_position_embedding_parity(ref_posenc):
    mod, NestedTensor = ref_posenc
    pe = mod.PositionEmbeddingSine(64, normalize=True)
    rng = np.random.default_rng(1)
    b, h, w = 2, 9, 13
    mask = np.zeros((b, h, w), bool)
    mask[0, 6:, :] = True
    mask[0, :, 10:] = True
    x = rng.normal(size=(b, 128, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = pe(NestedTensor(torch.from_numpy(x), torch.from_numpy(mask)))
    ours = jax.jit(lambda m: sine_position_embedding(m, 64))(jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5)  # f32 trig tolerance


def test_downsample_mask_parity():
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    mask = rng.random((2, 37, 53)) > 0.5
    ref = F.interpolate(torch.from_numpy(mask)[None].float(),
                        size=(7, 9))[0].bool().numpy()
    ours = np.asarray(downsample_mask(jnp.asarray(mask), 7, 9))
    np.testing.assert_array_equal(ours, ref)


def test_bottleneck_and_frozen_bn_parity():
    torch.manual_seed(3)
    cin, mid, cout, s = 8, 4, 16, 2

    def make(cin_, cout_, k, stride=1, padding=0):
        conv = torch.nn.Conv2d(cin_, cout_, k, stride, padding, bias=False)
        bn = torch.nn.BatchNorm2d(cout_).eval()
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1, 0.2)
            bn.bias.normal_(0, 0.2)
        return conv, bn

    c1, b1 = make(cin, mid, 1)
    c2, b2 = make(mid, mid, 3, stride=s, padding=1)
    c3, b3 = make(mid, cout, 1)
    cd, bd = make(cin, cout, 1, stride=s)

    def fold(conv, bn):
        return fold_bn(conv.weight.detach().numpy(),
                       bn.weight.detach().numpy(), bn.bias.detach().numpy(),
                       bn.running_mean.numpy(), bn.running_var.numpy())

    p = {"conv1": fold(c1, b1), "conv2": fold(c2, b2), "conv3": fold(c3, b3),
         "down": fold(cd, bd)}
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, cin, 12, 12)).astype(np.float32)
    with torch.no_grad():
        relu = torch.nn.functional.relu
        out = relu(b1(c1(torch.from_numpy(x))))
        out = relu(b2(c2(out)))
        out = b3(c3(out))
        ident = bd(cd(torch.from_numpy(x)))
        ref = relu(out + ident).numpy()
    # note: stride applies to conv2 (v1.5) and the downsample
    ours = np.asarray(jax.jit(lambda xx: _bottleneck(xx, p, s))(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_detr_forward_and_postprocess():
    cfg = DETRConfig(hidden_dim=64, nheads=2, enc_layers=2, dec_layers=2,
                     dim_feedforward=128, num_queries=10, num_classes=81)
    params = jax.jit(lambda r: init_detr_params(r, cfg))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(2, 3, 64, 96)).astype(np.float32))
    mask = np.zeros((2, 64, 96), bool)
    mask[1, :, 64:] = True
    out = jax.jit(lambda p, im, m: detr_forward(p, im, m, cfg))(
        params, images, jnp.asarray(mask))
    assert out["pred_logits"].shape == (2, 10, 81)
    assert out["pred_boxes"].shape == (2, 10, 4)
    assert out["hs"].shape == (2, 2, 10, 64)
    assert bool(jnp.isfinite(out["pred_logits"]).all())
    res = postprocess(out["pred_logits"], out["pred_boxes"],
                      jnp.asarray([[64.0, 96.0], [64.0, 64.0]]))
    assert res["boxes"].shape == (2, 10, 4)
    # scores are post-softmax probabilities over real classes
    assert float(res["scores"].max()) <= 1.0
    # torch-oracle check of the softmax/max/label math
    logits = np.asarray(out["pred_logits"])
    prob = torch.softmax(torch.from_numpy(logits), -1)
    sc, lb = prob[..., :-1].max(-1)
    np.testing.assert_allclose(np.asarray(res["scores"]), sc.numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res["labels"]), lb.numpy())
