"""Parallel input pipeline: determinism for any worker count, tail padding,
error propagation, and stateless per-sample augmentation."""
import time

import numpy as np
import pytest

from hoigen_tpu.data.loader import batch_indices, iter_batches


def _fetch(i):
    return np.full(3, i, np.int64)


def _collate(samples):
    return np.stack(samples)


def _stream(num_workers, shuffle=False, pad_tail=False, n=13, bs=4, seed=3):
    batches = batch_indices(n, bs, shuffle=shuffle, seed=seed,
                            pad_tail=pad_tail)
    return list(iter_batches(_fetch, batches, _collate,
                             num_workers=num_workers))


def test_batch_indices_shapes():
    # sequential keeps the ragged tail; shuffled drops it (drop_last)
    seq = batch_indices(10, 4, shuffle=False)
    assert [len(i) for i, _ in seq] == [4, 4, 2]
    assert [n for _, n in seq] == [4, 4, 2]
    sh = batch_indices(10, 4, shuffle=True, seed=0)
    assert [len(i) for i, _ in sh] == [4, 4]
    assert sorted(np.concatenate([i for i, _ in seq]).tolist()) == \
        list(range(10))


def test_batch_indices_pad_tail():
    out = batch_indices(10, 4, shuffle=False, pad_tail=True)
    idx, n_real = out[-1]
    assert len(idx) == 4 and n_real == 2
    # padded entries repeat the last real index
    assert idx.tolist() == [8, 9, 9, 9]


@pytest.mark.parametrize("shuffle,pad_tail", [(False, False), (False, True),
                                              (True, False)])
def test_workers_match_sync(shuffle, pad_tail):
    ref = _stream(0, shuffle, pad_tail)
    for workers in (1, 4):
        got = _stream(workers, shuffle, pad_tail)
        assert len(got) == len(ref)
        for (b0, n0), (b1, n1) in zip(ref, got):
            np.testing.assert_array_equal(b0, b1)
            assert n0 == n1


def test_to_device_runs_on_producer():
    batches = batch_indices(8, 4, shuffle=False)
    got = list(iter_batches(_fetch, batches, _collate,
                            to_device=lambda b: b + 100, num_workers=2))
    assert all((b >= 100).all() for b, _ in got)


def test_exception_propagates():
    def bad(i):
        if i == 5:
            raise ValueError("boom")
        return _fetch(i)

    batches = batch_indices(8, 4, shuffle=False)
    with pytest.raises(ValueError, match="boom"):
        list(iter_batches(bad, batches, _collate, num_workers=2))


def test_early_close_does_not_hang():
    def slow(i):
        time.sleep(0.01)
        return _fetch(i)

    batches = batch_indices(64, 4, shuffle=False)
    it = iter_batches(slow, batches, _collate, num_workers=2)
    next(it)
    t0 = time.time()
    it.close()
    assert time.time() - t0 < 2.0


def test_workers_overlap_fetch():
    """4 workers over 16 samples of 20ms sleep each finish well under the
    serial 320ms (the point of the pipeline)."""
    def slow(i):
        time.sleep(0.02)
        return _fetch(i)

    batches = batch_indices(16, 4, shuffle=False)
    t0 = time.time()
    list(iter_batches(slow, batches, _collate, num_workers=4))
    assert time.time() - t0 < 0.25


def test_transform_stateless_rng():
    """Same (seed, epoch, index) -> identical augmentation regardless of
    call order; different epoch -> different augmentation."""
    from PIL import Image
    from hoigen_tpu.data.transforms import DualStreamTransform

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    tgt = {"boxes_h": np.asarray([[10., 10., 60., 60.]], np.float32),
           "boxes_o": np.asarray([[20., 20., 80., 80.]], np.float32),
           "hoi": np.asarray([3]), "verb": np.asarray([1]),
           "object": np.asarray([2]), "labels": np.asarray([1])}
    tf = DualStreamTransform(training=True, seed=7)

    def run(epoch, idx):
        r = np.random.default_rng((tf.seed, epoch, idx))
        return tf(img, dict(tgt), rng=r)

    a1, c1, _ = run(0, 5)
    # interleave another sample, then repeat — must not disturb (0, 5)
    run(0, 6)
    a2, c2, _ = run(0, 5)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)
    a3, _, _ = run(1, 5)
    assert a1.shape != a3.shape or not np.array_equal(a1, a3)


def test_pixels_device_normalize_and_mask():
    """Device-side uint8 normalization == the host float path; the
    device-built padding plane == the collated bool mask."""
    import jax.numpy as jnp
    from PIL import Image
    from hoigen_tpu.data.transforms import to_chw_uint8, to_normalized_array
    from hoigen_tpu.ops.pixels import device_normalize, pad_mask_from_sizes

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8))
    ref = to_normalized_array(img)[None]
    got = np.asarray(device_normalize(jnp.asarray(to_chw_uint8(img)[None])))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # float input passes through (synthetic benches / parity tests)
    f = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(device_normalize(
        jnp.asarray(f))), f)

    sizes = np.asarray([[3, 5], [7, 2]], np.int32)
    m = np.asarray(pad_mask_from_sizes(jnp.asarray(sizes), 8, 6))
    exp = np.ones((2, 8, 6), bool)
    exp[0, :3, :5] = False
    exp[1, :7, :2] = False
    np.testing.assert_array_equal(m, exp)


def test_uint8_padded_feed_matches_float_pad_after_normalize():
    """The reference zero-pads AFTER Normalize (padding = 0.0 floats,
    upt_tip...py:1593); a zero-padded uint8 feed maps pad bytes to
    -mean/std unless masked. device_normalize(pad_mask=...) must reproduce
    the reference layout exactly (advisor r2 high finding)."""
    import jax.numpy as jnp
    from PIL import Image
    from hoigen_tpu.data.transforms import to_chw_uint8, to_normalized_array
    from hoigen_tpu.ops.pixels import device_normalize, pad_mask_from_sizes

    rng = np.random.default_rng(7)
    h, w, hb, wb = 11, 13, 16, 20
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    # reference layout: normalize the real pixels, zero-pad the rest
    ref = np.zeros((1, 3, hb, wb), np.float32)
    ref[0, :, :h, :w] = to_normalized_array(img)
    # uint8 feed: zero-pad bytes, normalize+mask on device
    feed = np.zeros((1, 3, hb, wb), np.uint8)
    feed[0, :, :h, :w] = to_chw_uint8(img)
    mask = pad_mask_from_sizes(jnp.asarray([[h, w]], np.int32), hb, wb)
    got = np.asarray(device_normalize(jnp.asarray(feed), pad_mask=mask))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # without the mask the padding drifts — the bug being guarded against
    bad = np.asarray(device_normalize(jnp.asarray(feed)))
    assert abs(bad[0, 0, -1, -1]) > 1.0


def test_collate_uint8_and_sizes():
    """collate_batch ships uint8 pixels and (h, w) sizes that reproduce the
    bool mask exactly."""
    import jax.numpy as jnp
    from hoigen_tpu.data.factory import collate_batch
    from hoigen_tpu.ops.pixels import pad_mask_from_sizes

    rng = np.random.default_rng(1)

    def sample(h, w):
        img = rng.integers(0, 255, (3, h, w), dtype=np.uint8)
        cimg = rng.integers(0, 255, (3, 32, 32), dtype=np.uint8)
        tgt = {"boxes_h": np.zeros((1, 4), np.float32),
               "boxes_o": np.zeros((1, 4), np.float32),
               "labels": np.asarray([0]), "object": np.asarray([0])}
        return img, cimg, tgt, 0

    b = collate_batch([sample(40, 56), sample(48, 44)], 4,
                      buckets=((48, 56),))
    assert b.images.dtype == np.uint8 and b.images_clip.dtype == np.uint8
    np.testing.assert_array_equal(b.image_sizes, [[40, 56], [48, 44]])
    np.testing.assert_array_equal(
        np.asarray(pad_mask_from_sizes(jnp.asarray(b.image_sizes), 48, 56)),
        b.image_mask)


def test_factory_loader_parity(tmp_path):
    """batches_from_factory: threaded == synchronous on a tiny on-disk
    dataset, and eval tail padding reports n_real."""
    import json
    import os
    from PIL import Image
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.cli.main_finetune import batches_from_factory
    from hoigen_tpu.labels import HICO
    from hoigen_tpu.utils.config import RunConfig

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "hico_20160224_det" / "images" / "train2015"
    img_dir.mkdir(parents=True)
    names, sizes, annos = [], [], []
    for i in range(5):
        w, h = 64, 48
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(img_dir / f"im_{i}.jpg")
        names.append(f"im_{i}.jpg")
        sizes.append([w, h])
        annos.append({"boxes_h": [[2, 2, 30, 30]], "boxes_o": [[5, 5, 40, 40]],
                      "hoi": [int(rng.integers(0, 600))], "verb": [1],
                      "object": [2]})
    inst = {"annotation": annos, "filenames": names, "empty": [],
            "objects": HICO.objects, "verbs": HICO.verbs,
            "correspondence": HICO.class_corr, "size": sizes}
    json.dump(inst, open(tmp_path / "instances_train2015.json", "w"))
    os.symlink(img_dir, img_dir.parent / "test2015")
    json.dump(inst, open(tmp_path / "instances_test2015.json", "w"))

    def factory():
        return DataFactory("hicodet", "train2015", str(tmp_path),
                           training=True, max_gt_pairs=4, seed=0)

    cfg_sync = RunConfig(num_classes=117, max_gt_pairs=4, num_workers=0)
    cfg_thr = RunConfig(num_classes=117, max_gt_pairs=4, num_workers=3)
    ref = list(batches_from_factory(factory(), 2, cfg_sync, shuffle=True,
                                    seed=1))
    got = list(batches_from_factory(factory(), 2, cfg_thr, shuffle=True,
                                    seed=1))
    assert len(ref) == len(got) == 2   # drop_last: 5 -> 2 batches
    for (d0, b0), (d1, b1) in zip(ref, got):
        for k in d0:
            np.testing.assert_array_equal(np.asarray(d0[k]),
                                          np.asarray(d1[k]))
        np.testing.assert_array_equal(b0.indices, b1.indices)

    # eval: pad_tail fills the short batch and n_real marks the true rows
    tail = list(batches_from_factory(factory(), 2, cfg_thr, shuffle=False,
                                     pad_tail=True))
    assert len(tail) == 3
    d, b = tail[-1]
    assert b.n_real == 1 and np.asarray(d["images"]).shape[0] == 2
    np.testing.assert_array_equal(b.indices[0], b.indices[1])
