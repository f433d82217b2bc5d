"""Compact eval-detection shipping: the eval step gathers the dense
(B, P, C) score matrix through the per-object verb LUT to (B, P, Vmax)
before it leaves the device (C=600 -> Vmax<=18 for HICO: ~17x less D2H).
Exactness: every dense entry outside a pair's object-class verb set is 0
by construction of the prior mask (compute_prior_scores,
upt_tip...py:806-833), so nonzero extraction from the compact form must
reproduce the dense extraction bit-for-bit and in the same order."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hoigen_tpu.engine.eval import _extract_detections  # noqa: E402


def test_extract_compact_matches_dense():
    rng = np.random.default_rng(0)
    P, C, Vmax, S = 12, 30, 5, 8
    lut = np.zeros((4, Vmax), np.int32)          # 4 object classes
    lut_valid = np.zeros((4, Vmax), np.float32)
    for o in range(4):
        v = np.sort(rng.permutation(C)[: rng.integers(1, Vmax + 1)])
        lut[o, : len(v)] = v
        lut_valid[o, : len(v)] = 1
    objects = rng.integers(0, 4, P)
    dense = np.zeros((P, C), np.float32)
    for p in range(P):
        vs = lut[objects[p]][lut_valid[objects[p]] > 0]
        dense[p, vs] = rng.uniform(0, 1, len(vs)) * (
            rng.uniform(size=len(vs)) > 0.3)     # some exact zeros
    cmp = np.take_along_axis(dense, lut[objects], axis=-1) \
        * lut_valid[objects]
    boxes = rng.uniform(0, 50, (S, 4))
    px = rng.integers(0, S, P)
    py = rng.integers(0, S, P)

    d_dense = _extract_detections(dense, boxes, objects, px, py)
    d_cmp = _extract_detections(cmp, boxes, objects, px, py,
                                verbs_mat=lut[objects])
    for k in d_dense:
        np.testing.assert_array_equal(d_dense[k], d_cmp[k], err_msg=k)


def test_upt_eval_emits_compact():
    """The forward's compact outputs reproduce its dense matrix, and the
    jitted eval step ships only the compact form."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.hoi_model import (_forward, make_eval_step,
                                             make_example_batch)

    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    vmax = buffers["verb_lut"].shape[1]
    m = np.asarray(buffers["object_class_multihot"])
    assert vmax == int((m > 0).sum(1).max())

    batch = make_example_batch(cfg, batch_size=2, detr_hw=detr_hw)
    out = jax.jit(make_eval_step(cfg))(trainable, frozen, buffers, batch)
    assert out["detection_scores"].shape[-1] == vmax
    assert out["detection_verbs"].shape == out["detection_scores"].shape

    # reconstruct dense from compact out of the SAME forward (jit-vs-eager
    # forwards differ by float rounding; the compaction itself is exact)
    aux = jax.jit(lambda t, f, b, d: _forward(t, f, b, d, cfg,
                                              training=False))(
        trainable, frozen, buffers, batch)
    dense = np.asarray(aux["detection_scores"])
    cmp = np.asarray(aux["detection_scores_cmp"])
    verbs = np.asarray(aux["detection_verbs"])
    B, P, C = dense.shape
    rebuilt = np.zeros_like(dense)
    for b in range(B):
        np.maximum.at(rebuilt[b],
                      (np.repeat(np.arange(P), verbs.shape[-1]),
                       verbs[b].ravel()), cmp[b].ravel())
    np.testing.assert_allclose(rebuilt, dense, atol=0)
