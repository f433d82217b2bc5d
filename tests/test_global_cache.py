"""Golden parity: build_global_cache vs the reference CLIP/DINO cache
builders (/root/reference/utils.py:6-176), run as torch CPU oracles on the
same synthetic loader, plus end-to-end plumbing of the built values into the
UPT buffers.

The reference selects per class with torch.randperm; to make the comparison
RNG-independent the synthetic data gives every class at most num_shot
candidate images, so both sides keep ALL candidates and only the within-
block order can differ — blocks are compared as sorted row sets.
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_utils():
    spec = importlib.util.spec_from_file_location(
        "ref_utils", os.path.join(REF, "utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Args:
    def __init__(self, num_classes, num_shot, cache_dir):
        self.clip_load_cache = False
        self.dino_load_cache = False
        self.num_classes = num_classes
        self.num_shot = num_shot
        self.dataset = "hicodet"
        self.zs = False
        self.zs_type = "rare_first"
        self.augment_epoch = 1
        self.cache_dir = cache_dir


class _StubEncoder:
    """clip_model stand-in: image tensors are (1,) index tensors; the
    encoder looks each index up in a fixed feature table."""

    def __init__(self, table):
        self.table = table

    def cuda(self):
        return self

    def image_encoder(self, images):
        idx = images.reshape(-1).long()
        feats = self.table[idx]
        return feats, feats[:, None, :]


class _StubDino(_StubEncoder):
    def __call__(self, images):
        idx = images.reshape(-1).long()
        return self.table[idx]

    def image_encoder(self, images):  # pragma: no cover
        raise AssertionError("dino path calls the model directly")


def _synthetic_loader(n_images, num_classes, dim, seed):
    """(features, multihots, loader) — every class appears in <= 2 images;
    classes >= num_classes-2 appear in none (backfill path)."""
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((n_images, dim)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    usable = num_classes - 2
    multihots = np.zeros((n_images, num_classes), np.float32)
    # round-robin: class c appears in images {c % n} plus a second verb on
    # some images (multi-verb values are the semantics under test)
    for c in range(usable):
        multihots[c % n_images, c] = 1
    # classes 0/1 appear in a second image (the min(n, num_shot)=2 case)
    multihots[1, 0] = 1
    multihots[2, 1] = 1
    counts = multihots.sum(0)
    assert counts[:usable].max() <= 2

    batches = []
    for i in range(n_images):
        verbs = np.nonzero(multihots[i])[0]
        if len(verbs) == 0:
            continue
        im_clip = torch.tensor([float(i)])
        target = {"verb": torch.as_tensor(verbs)}
        batches.append(([(None, im_clip)], [target]))
    return table, multihots, batches


def _blocks(keys_t, values_t):
    """Reference output: keys (D, R) -> (R, D) rows; values (R, C)."""
    return keys_t.T.numpy(), values_t.numpy()


@pytest.mark.parametrize("dim,builder", [(512, "clip"), (2048, "dino")])
def test_global_cache_parity(tmp_path, monkeypatch, dim, builder):
    from hoigen_tpu.models.cache import build_global_cache

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.chdir(tmp_path)

    num_classes, num_shot, n_images = 10, 2, 6
    table, multihots, batches = _synthetic_loader(
        n_images, num_classes, dim, seed=3)

    ref = _load_ref_utils()
    args = _Args(num_classes, num_shot, str(tmp_path))
    tbl = torch.as_tensor(table)
    if builder == "clip":
        ref_keys, ref_values = ref.build_clip_cache_model(
            args, _StubEncoder(tbl), batches)
    else:
        ref_keys, ref_values = ref.build_dino_cache_model(
            args, _StubDino(tbl), batches)
    ref_keys, ref_values = _blocks(ref_keys, ref_values)

    keys, values = build_global_cache(table, multihots, num_classes,
                                      num_shot, seed=0)
    keys = keys.T                       # (C*num_shot, D)

    # reference output is ragged: walk it per class using known counts
    counts = np.minimum(multihots.sum(0), num_shot).astype(int)
    counts[counts == 0] = num_shot      # backfilled classes
    lo = 0
    for c in range(num_classes):
        n = counts[c]
        rk, rv = ref_keys[lo:lo + n], ref_values[lo:lo + n]
        lo += n
        mine_k = keys[c * num_shot:(c + 1) * num_shot]
        mine_v = values[c * num_shot:(c + 1) * num_shot]
        real = np.linalg.norm(mine_k, axis=1) > 0
        if multihots[:, c].sum() == 0:
            # backfill: random keys (identity values) on both sides
            assert np.allclose(rv, np.eye(num_classes)[[c] * n])
            assert np.allclose(mine_v, np.eye(num_classes)[[c] * num_shot])
            assert np.allclose(np.linalg.norm(mine_k, axis=1), 1, atol=1e-5)
            continue
        assert real.sum() == n, f"class {c}: {real.sum()} != {n}"
        # order-insensitive: sort rows lexicographically
        order_r = np.lexsort(rk.T)
        order_m = np.lexsort(mine_k[real].T)
        np.testing.assert_allclose(rk[order_r], mine_k[real][order_m],
                                   atol=1e-5)
        np.testing.assert_allclose(rv[order_r], mine_v[real][order_m],
                                   atol=1e-6)
        # padding rows carry zero values: affinity@values unaffected
        assert np.all(mine_v[~real] == 0)


def test_multi_verb_values():
    """An image with verbs {1, 3} contributes its FULL multihot as the
    value row for both class 1 and class 3 (utils.py:31-41)."""
    from hoigen_tpu.models.cache import build_global_cache

    feats = np.eye(4, 8, dtype=np.float32)
    mh = np.zeros((4, 5), np.float32)
    mh[0, [1, 3]] = 1
    mh[1, 2] = 1
    keys, values = build_global_cache(feats, mh, 5, 2, seed=0)
    np.testing.assert_array_equal(values[1 * 2], mh[0])
    np.testing.assert_array_equal(values[3 * 2], mh[0])
    np.testing.assert_array_equal(values[2 * 2], mh[1])
    # key for class 1 and class 3 is image 0's feature
    np.testing.assert_allclose(keys.T[1 * 2], feats[0], atol=1e-6)
    np.testing.assert_allclose(keys.T[3 * 2], feats[0], atol=1e-6)


def test_global_values_modes():
    """init_upt_params wires 'built' vs 'pair_one_hots' values."""
    import dataclasses

    import jax

    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.clip.model import init_clip_params
    from hoigen_tpu.models.upt import UPTConfig, init_upt_params

    caches = random_caches(6, 2, num_objects=4)
    caches.clip_global_values = np.arange(
        12 * 6, dtype=np.float32).reshape(12, 6) % 2
    caches.dino_values = caches.clip_global_values[::-1].copy()
    clip_cfg = CLIPConfig(image_resolution=32, vision_layers=1,
                          vision_width=64, vision_patch_size=8,
                          transformer_layers=1, transformer_width=64,
                          context_length=8)
    clip_p = init_clip_params(jax.random.PRNGKey(0), clip_cfg)

    cfg = UPTConfig(num_classes=6, num_shot=2,
                    global_values_mode="pair_one_hots")
    _, buf = init_upt_params(jax.random.PRNGKey(1), cfg, caches, clip_p)
    np.testing.assert_array_equal(np.asarray(buf["global_values"]),
                                  caches.one_hots)

    cfg2 = dataclasses.replace(cfg, global_values_mode="built")
    _, buf2 = init_upt_params(jax.random.PRNGKey(1), cfg2, caches, clip_p)
    np.testing.assert_array_equal(np.asarray(buf2["global_values"]),
                                  caches.clip_global_values)
    np.testing.assert_array_equal(np.asarray(buf2["dino_values"]),
                                  caches.dino_values)
    np.testing.assert_array_equal(
        np.asarray(buf2["global_sample_len"]),
        np.maximum(caches.clip_global_values.sum(0), 1.0))

    with pytest.raises(ValueError):
        init_upt_params(
            jax.random.PRNGKey(1),
            dataclasses.replace(cfg, global_values_mode="bogus"),
            caches, clip_p)


def test_refresh_unseen_cache_oracle():
    """refresh_unseen_cache == the reference refresh_unseen_verb_cache_mem
    math (upt...py:609-633) re-run in torch on a ragged cache."""
    import torch
    import torch.nn.functional as F
    from hoigen_tpu.models.cache import refresh_unseen_cache

    rng = np.random.default_rng(0)
    C, S, D = 6, 2, 8
    counts = np.array([2, 1, 2, 2, 1, 2])
    seen, unseen = [0, 2, 4], [1, 3, 5]
    text = rng.normal(size=(C, D)).astype(np.float32)
    padded = rng.normal(size=(C * S, D)).astype(np.float32)
    # zero the padding rows like the real layout
    for c in range(C):
        padded[c * S + counts[c]:(c + 1) * S] = 0

    got = refresh_unseen_cache(padded, counts, text, seen, unseen, S)

    # torch oracle on the RAGGED layout (reference cumsum indexing)
    ragged = np.concatenate([padded[c * S:c * S + counts[c]]
                             for c in range(C)])
    cm = torch.from_numpy(ragged.copy())
    te = torch.from_numpy(text)
    cum = torch.cumsum(torch.as_tensor(counts), -1)
    tmp = cm[cum[torch.as_tensor(seen)] - 1]
    for i in unseen:
        logits = F.softmax(te[i] @ te[torch.as_tensor(seen)].T, dim=-1)
        emb = logits @ tmp
        lo = int(cum[i - 1]) if i > 0 else 0
        cm[lo:int(cum[i])] = emb
    # compare the real rows of every class
    for c in range(C):
        lo = int(cum[c - 1]) if c > 0 else 0
        np.testing.assert_allclose(
            got[c * S:c * S + counts[c]], cm[lo:int(cum[c])].numpy(),
            atol=1e-5)
