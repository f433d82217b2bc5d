"""UPT head tests: proposal selection equivalence against a faithful numpy
replica of the reference's three-branch logic, prior-score math, cache-logit
padding exactness, loss finiteness and gradient flow end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoigen_tpu.eval.association import box_iou as np_iou
from hoigen_tpu.models.cache import random_caches
from hoigen_tpu.models.clip import CLIPConfig
from hoigen_tpu.models.clip.model import init_clip_params
from hoigen_tpu.models.proposals import (ProposalConfig, make_pairs,
                                         select_region_proposals)
from hoigen_tpu.models.upt import (UPTConfig, compute_prior_scores,
                                   init_upt_params, upt_forward)

TINY_CLIP = CLIPConfig(embed_dim=512, image_resolution=32, vision_layers=2,
                       vision_width=64, vision_patch_size=8,
                       transformer_layers=2, transformer_width=64,
                       adapter_layers=(0, 1), context_length=16)


def _rand_boxes(rng, n, lim=200.0):
    xy = rng.random((n, 2)) * lim
    wh = rng.random((n, 2)) * lim / 3 + 4
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _np_reference_selection(scores, labels, boxes, cfg: ProposalConfig):
    """Faithful numpy replica of prepare_region_proposals
    (upt...py:1361-1398): batched NMS, then the three-branch min/max
    instance logic, preserving its ordering."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    keep_nms = []
    for i in order:
        if suppressed[i]:
            continue
        keep_nms.append(i)
        dup = (iou[i] > cfg.nms_thresh) & (labels == labels[i])
        dup[i] = False
        suppressed |= dup
    keep_nms = np.asarray(keep_nms)  # score-ordered
    sc, lb = scores[keep_nms], labels[keep_nms]
    is_human = lb == cfg.human_idx
    above = sc >= cfg.box_score_thresh

    def group(member):
        n_above = int(np.sum(member & above))
        cand = np.nonzero(member)[0]
        k = min(max(n_above, cfg.min_instances), cfg.max_instances,
                len(cand))
        return keep_nms[cand[:k]]  # already score-sorted

    return group(is_human), group(~is_human)


def test_proposal_selection_matches_reference_semantics():
    cfg = ProposalConfig()
    rng = np.random.default_rng(0)
    for trial in range(15):
        n = 60
        boxes = _rand_boxes(rng, n)
        scores = rng.random(n).astype(np.float32)
        # skew scores: some below threshold; few humans on some trials
        labels = rng.integers(0, 10, n)
        if trial % 3 == 0:
            labels[labels == 0] = 1
            labels[:2] = 0  # exactly two humans -> min-instance branch
        ref_h, ref_o = _np_reference_selection(scores, labels, boxes, cfg)
        b, s, l, v = jax.jit(
            lambda ss, ll, bb: select_region_proposals(ss, ll, bb, cfg))(
            jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(boxes))
        got_h = np.asarray(b[:cfg.max_instances][np.asarray(v[:cfg.max_instances])])
        got_o = np.asarray(b[cfg.max_instances:][np.asarray(v[cfg.max_instances:])])
        np.testing.assert_allclose(got_h, boxes[ref_h], atol=0)
        np.testing.assert_allclose(got_o, boxes[ref_o], atol=0)


def test_pair_enumeration():
    cfg = ProposalConfig(max_instances=3)
    boxes = jnp.asarray(np.arange(6 * 4, dtype=np.float32).reshape(6, 4))
    valid = jnp.asarray([True, True, False, True, False, False])
    bh, bo, bu, pv = make_pairs(boxes, valid, cfg)
    assert bh.shape == (18, 4) and pv.shape == (18,)
    pv = np.asarray(pv)
    # valid pairs: x in {0,1}, y in {0,1,3}, x != y
    expect = {(0, 1), (0, 3), (1, 0), (1, 3)}
    from hoigen_tpu.models.proposals import pair_indices
    x, y = pair_indices(cfg)
    got = {(int(a), int(b)) for a, b, k in zip(x, y, pv) if k}
    assert got == expect


def test_prior_scores_math():
    cfg = UPTConfig(num_classes=7, proposals=ProposalConfig(max_instances=2))
    m = np.zeros((5, 7), np.float32)
    m[2, [1, 3]] = 1
    m[4, [0]] = 1
    scores = jnp.asarray([[0.9, 0.0, 0.8, 0.5]])
    labels = jnp.asarray([[0, 0, 2, 4]])
    valid = jnp.asarray([[True, False, True, True]])
    from hoigen_tpu.models.proposals import pair_indices
    x, y = pair_indices(cfg.proposals)
    bh, bo, bu, pv = make_pairs(jnp.zeros((1, 4, 4)), valid, cfg.proposals)
    pr = compute_prior_scores(scores, labels, pv, jnp.asarray(m), x, y,
                              training=False, cfg=cfg)
    pr = np.asarray(pr)
    assert pr.shape == (2, 1, 8, 7)
    # pair (x=0 human score .9, y=2 object class 2 score .8): verbs 1,3
    pair_pos = int(np.nonzero((np.asarray(x) == 0)
                              & (np.asarray(y) == 2))[0][0])
    np.testing.assert_allclose(pr[0, 0, pair_pos, [1, 3]], 0.9 ** 2.8,
                               rtol=1e-5)
    np.testing.assert_allclose(pr[1, 0, pair_pos, [1, 3]], 0.8 ** 2.8,
                               rtol=1e-5)
    assert pr[0, 0, pair_pos, 0] == 0


def test_cache_padding_exactness():
    """Zero-padded cache rows must not change branch logits vs a ragged
    reference computation."""
    rng = np.random.default_rng(1)
    C, shot, D = 5, 3, 8
    # ragged: class counts [3,1,2,3,2]
    counts = [3, 1, 2, 3, 2]
    w_rows, labels = [], []
    for c, k in enumerate(counts):
        for _ in range(k):
            w_rows.append(rng.standard_normal(D))
            row = np.zeros(C)
            row[c] = 1
            if rng.random() < 0.5 and c + 1 < C:
                row[c + 1] = 1  # multi-hot
            labels.append(row)
    w_ragged = np.asarray(w_rows)
    l_ragged = np.asarray(labels)
    b_ragged = -np.ones(len(w_rows))
    lens = l_ragged.sum(0)
    feats = rng.standard_normal((6, D))
    ref = ((feats @ w_ragged.T + b_ragged) @ l_ragged) / lens
    # padded layout
    w_pad = np.zeros((C * shot, D))
    l_pad = np.zeros((C * shot, C))
    b_pad = -np.ones(C * shot)
    i = 0
    for c, k in enumerate(counts):
        for j in range(k):
            w_pad[c * shot + j] = w_ragged[i]
            l_pad[c * shot + j] = l_ragged[i]
            i += 1
    got = ((feats @ w_pad.T + b_pad) @ l_pad) / l_pad.sum(0)
    np.testing.assert_allclose(got, ref, atol=1e-10)


@pytest.fixture(scope="module")
def tiny_upt():
    cfg = UPTConfig(num_classes=7, num_shot=2,
                    proposals=ProposalConfig(max_instances=3),
                    clip_resolution=32, use_dino=False,
                    cache_model="cache_feat", max_gt_pairs=4)
    caches = random_caches(7, 2, num_objects=10, seed=0)
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    params, buffers = init_upt_params(jax.random.PRNGKey(1), cfg, caches,
                                      clip_params)
    return cfg, params, buffers


def _fake_inputs(rng, b, q=12):
    det = {"scores": jnp.asarray(rng.random((b, q), np.float32)),
           "labels": jnp.asarray(rng.integers(0, 10, (b, q))),
           "boxes": jnp.asarray(np.stack([_rand_boxes(rng, q, 30.0)
                                          for _ in range(b)]))}
    images = jnp.asarray(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    sizes = jnp.asarray(np.full((b, 2), 32.0, np.float32))
    return det, images, sizes


def test_upt_eval_forward(tiny_upt):
    cfg, params, buffers = tiny_upt
    rng = np.random.default_rng(2)
    det, images, sizes = _fake_inputs(rng, 2)
    out = jax.jit(lambda p, d, im, sz: upt_forward(
        p, buffers, d, im, sz, TINY_CLIP, cfg, training=False))(
        params, det, images, sizes)
    P = cfg.proposals.n_pairs
    assert out["detection_scores"].shape == (2, P, 7)
    assert bool(jnp.isfinite(out["detection_scores"]).all())
    # scores only appear where prior is nonzero and pair valid
    pp = np.asarray(out["prior"][0] * out["prior"][1])
    ds = np.asarray(out["detection_scores"])
    assert (ds[pp == 0] == 0).all()


def test_upt_train_loss_and_grads(tiny_upt):
    cfg, params, buffers = tiny_upt
    rng = np.random.default_rng(3)
    det, images, sizes = _fake_inputs(rng, 2)
    g = 4
    targets = {
        "boxes_h": jnp.asarray(rng.random((2, g, 4), np.float32) * 0.3 + 0.2),
        "boxes_o": jnp.asarray(rng.random((2, g, 4), np.float32) * 0.3 + 0.2),
        "labels": jnp.asarray(rng.integers(0, 7, (2, g))),
        "valid": jnp.asarray([[True, True, False, False],
                              [True, True, True, True]]),
    }

    def loss_fn(p):
        loss, aux = upt_forward(p, buffers, det, images, sizes, TINY_CLIP,
                                cfg, targets=targets, training=True)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert bool(jnp.isfinite(loss))
    # gradients reach the head parameters and the CLIP adapters
    g_u = grads["adapter_U_w"]
    assert float(jnp.abs(g_u).max()) > 0
    g_ad = grads["clip"]["visual"]["blocks"][0]["adapter"]["down_w"]
    assert g_ad.shape == (64, 64)
    g_text = grads["text_w"]
    assert float(jnp.abs(g_text).max()) > 0


def test_obj_affordance_and_optional_branches():
    """use_weight_pred + use_mlp_proj + obj_affordance variants run and
    stay finite through the train forward."""
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.model import init_clip_params
    cfg = UPTConfig(num_classes=7, num_shot=2,
                    proposals=ProposalConfig(max_instances=3),
                    clip_resolution=32, use_dino=False,
                    cache_model="cache_feat", max_gt_pairs=4,
                    use_weight_pred=True, use_mlp_proj=True,
                    obj_affordance=True)
    caches = random_caches(7, 2, num_objects=10, seed=0)
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    params, buffers = init_upt_params(jax.random.PRNGKey(1), cfg, caches,
                                      clip_params)
    assert "weight_pred_1" in params and "mlp_proj" in params
    assert "obj_affordance_query" in params
    rng = np.random.default_rng(7)
    det, images, sizes = _fake_inputs(rng, 2)
    g = 4
    targets = {
        "boxes_h": jnp.asarray(rng.random((2, g, 4), np.float32) * 0.3 + 0.2),
        "boxes_o": jnp.asarray(rng.random((2, g, 4), np.float32) * 0.3 + 0.2),
        "labels": jnp.asarray(rng.integers(0, 7, (2, g))),
        "valid": jnp.asarray(np.ones((2, g), bool)),
    }
    loss, aux = jax.jit(lambda p: upt_forward(
        p, buffers, det, images, sizes, TINY_CLIP, cfg, targets=targets,
        training=True))(params)
    assert bool(jnp.isfinite(loss))


def test_fully_masked_softmax_sites_finite():
    """Audit of the two fully-masked-softmax sites (round-3 VERDICT):
    a zero-valid-key row must stay FINITE on our side. torch emits NaN
    rows there (softmax over all -inf) which the reference only survives
    because its postprocessing drops zero-prior pairs structurally
    (upt_tip...py:1425-1426); our masked dense layout zeroes the same
    slots (models/upt.py det_scores where-guard), so finite garbage in
    masked lanes is unobservable — NaN would not be."""
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.model import init_clip_params, mha
    from hoigen_tpu.models.upt import object_affordances

    # 1) mha with an all-masked key row (an image with zero valid
    # detections makes the adapter cross-attention see exactly this)
    rng = jax.random.PRNGKey(3)
    e, heads = 16, 2
    p = {"w_qkv": jax.random.normal(rng, (3 * e, e)) * e ** -0.5,
         "b_qkv": jnp.zeros(3 * e),
         "w_out": jax.random.normal(jax.random.fold_in(rng, 1),
                                    (e, e)) * e ** -0.5,
         "b_out": jnp.zeros(e)}
    q = jax.random.normal(jax.random.fold_in(rng, 2), (2, 5, e))
    kv = jax.random.normal(jax.random.fold_in(rng, 3), (2, 7, e))
    mask = jnp.zeros((2, 7), bool).at[1].set(True)   # image 1: no valid keys
    out = mha(p, q, kv, heads, key_padding_mask=mask)
    assert bool(jnp.all(jnp.isfinite(out)))

    # 2) object_affordances with an object class that has ZERO valid verbs
    # (zero-shot seen-filtered multihots produce such rows for
    # unseen-object splits)
    cfg = UPTConfig(num_classes=7, num_shot=2,
                    proposals=ProposalConfig(max_instances=3),
                    clip_resolution=32, use_dino=False,
                    cache_model="cache_feat", obj_affordance=True)
    caches = random_caches(7, 2, num_objects=10, seed=0)
    caches.object_class_multihot[4] = 0.0            # object 4: no verbs
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    params, buffers = init_upt_params(jax.random.PRNGKey(1), cfg, caches,
                                      clip_params)
    aff = object_affordances(params, buffers, cfg)
    assert aff.shape == (10, caches.origin_text_embeddings.shape[-1])
    assert bool(jnp.all(jnp.isfinite(aff)))


def test_language_aware_loss_oracle():
    """LA regularizer == torch CE between normalized text-adapter rows and
    the frozen class text embeddings (upt_tip...py:1653-1658)."""
    import torch
    import jax.numpy as jnp
    from hoigen_tpu.models.upt import language_aware_loss

    rng = np.random.default_rng(0)
    w = rng.normal(size=(12, 16)).astype(np.float32)
    origin = rng.normal(size=(12, 16)).astype(np.float32)
    weight = 0.6
    ours = float(language_aware_loss({"text_w": jnp.asarray(w)},
                                     jnp.asarray(origin), weight))
    tw = torch.from_numpy(w)
    sim = (tw / tw.norm(dim=-1, keepdim=True)) @ torch.from_numpy(origin).T
    ref = weight * torch.nn.CrossEntropyLoss()(sim, torch.arange(12))
    assert abs(ours - float(ref)) < 1e-5


def test_train_step_with_la_loss():
    """LA flag adds the regularizer to the training loss and its gradient
    reaches text_w."""
    import jax
    import jax.numpy as jnp
    from hoigen_tpu.engine.hoi_model import (HOIModelConfig, init_hoi_model,
                                             make_example_batch,
                                             make_optimizer, make_train_step)
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.detr import DETRConfig
    from hoigen_tpu.models.proposals import ProposalConfig
    from hoigen_tpu.models.upt import UPTConfig

    def mkcfg(la):
        return HOIModelConfig(
            clip=CLIPConfig(image_resolution=32, vision_layers=2,
                            vision_width=64, vision_patch_size=8,
                            transformer_layers=2, transformer_width=64,
                            adapter_layers=(0, 1)),
            detr=DETRConfig(hidden_dim=64, nheads=2, enc_layers=1,
                            dec_layers=1, dim_feedforward=64, num_queries=8,
                            num_classes=81),
            upt=UPTConfig(num_classes=24, num_shot=2, clip_resolution=32,
                          use_dino=False, LA=la,
                          proposals=ProposalConfig(max_instances=4),
                          max_gt_pairs=4, generate_feature=False))

    caches = random_caches(24, 2, num_objects=80)
    losses = {}
    for la in (False, True):
        cfg = mkcfg(la)
        tr, fz, bu = init_hoi_model(jax.random.PRNGKey(0), cfg, caches)
        opt = make_optimizer()(tr)
        step = jax.jit(make_train_step(cfg, opt))
        batch = make_example_batch(cfg, batch_size=2, detr_hw=(64, 64))
        tr2, _, metrics = step(tr, opt.init(tr), fz, bu, batch,
                               jax.random.PRNGKey(1))
        losses[la] = float(metrics["loss"])
        if la:
            # text_w moved (LA gradient reached it)
            assert not np.allclose(np.asarray(tr2["text_w"]),
                                   np.asarray(tr["text_w"]))
    assert losses[True] != losses[False]


def test_apply_vis_tor():
    """--vis_tor multiplies the cache logit scales at eval time
    (main_tip_finetune.py:895-897); 1.0 is the identity."""
    import jax.numpy as jnp
    from hoigen_tpu.models.upt import UPTConfig, apply_vis_tor

    params = {"logit_scale_HO": jnp.asarray(2.0),
              "logit_scale_U": jnp.asarray(3.0),
              "logit_scale_T": jnp.asarray(4.0)}
    out = apply_vis_tor(params, UPTConfig(cache_model="cache_feat"), 1.5)
    assert float(out["logit_scale_HO"]) == 3.0
    assert float(out["logit_scale_U"]) == 4.5
    assert float(out["logit_scale_T"]) == 4.0        # text scale untouched
    same = apply_vis_tor(params, UPTConfig(cache_model="cache_feat"), 1.0)
    assert same is params
