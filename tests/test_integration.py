"""End-to-end integration on synthetic data: dataset fixtures on disk ->
DataFactory -> collate -> (crops/pkl producers -> cache) and a
perfect-detector mAP sanity check through the full eval path."""
import json
import os

import numpy as np
import pytest

from hoigen_tpu.data import DataFactory, collate_batch
from hoigen_tpu.data.crops import (CropDataset, build_split_json,
                                   extract_crops, produce_pair_embeddings)
from hoigen_tpu.engine.eval import evaluate_hico
from hoigen_tpu.labels import HICO
from hoigen_tpu.models.cache import build_pair_cache
from hoigen_tpu.models.proposals import ProposalConfig, pair_indices
from hoigen_tpu.utils.config import RunConfig, parse_config


@pytest.fixture(scope="module")
def synthetic_hicodet(tmp_path_factory):
    """Tiny HICO-DET-format dataset: images on disk + instances jsons."""
    from PIL import Image
    root = tmp_path_factory.mktemp("hicodet_data")
    rng = np.random.default_rng(0)
    n_images = 6
    corr = HICO.class_corr
    filenames, sizes, annos = [], [], []
    img_dir = root / "hico_20160224_det" / "images" / "test2015"
    img_dir.mkdir(parents=True)
    for i in range(n_images):
        w, h = int(rng.integers(80, 140)), int(rng.integers(60, 120))
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"HICO_test2015_{i:08d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        filenames.append(name)
        sizes.append([w, h])
        n_pairs = int(rng.integers(1, 4))
        bh, bo, hois, verbs, objs = [], [], [], [], []
        for _ in range(n_pairs):
            x, y = rng.integers(1, w // 2, 2)
            bw, bhh = rng.integers(10, w // 2), rng.integers(10, h // 2)
            bh.append([int(x), int(y), int(min(x + bw, w)),
                       int(min(y + bhh, h))])
            x, y = rng.integers(1, w // 2, 2)
            bo.append([int(x), int(y), int(min(x + bw, w)),
                       int(min(y + bhh, h))])
            hoi, obj, verb = corr[int(rng.integers(0, 600))]
            hois.append(hoi)
            verbs.append(verb)
            objs.append(obj)
        annos.append({"boxes_h": bh, "boxes_o": bo, "hoi": hois,
                      "verb": verbs, "object": objs})
    instance = {"annotation": annos, "filenames": filenames, "empty": [],
                "objects": HICO.objects, "verbs": HICO.verbs,
                "correspondence": corr, "size": sizes}
    for part in ("train2015", "test2015"):
        with open(root / f"instances_{part}.json", "w") as f:
            json.dump(instance, f)
    # train images dir symlink to the same images
    tr = root / "hico_20160224_det" / "images" / "train2015"
    os.symlink(img_dir, tr)
    return str(root)


def test_data_factory_and_collate(synthetic_hicodet):
    factory = DataFactory("hicodet", "test2015", synthetic_hicodet,
                          training=False, max_gt_pairs=8)
    assert len(factory) == 6
    samples = [factory[i] for i in range(3)]
    batch = collate_batch(samples, max_gt_pairs=8)
    assert batch.images_clip.shape == (3, 3, 224, 224)
    assert batch.images.shape[0] == 3 and batch.image_mask.shape[0] == 3
    # every real pixel region unmasked
    assert (~batch.image_mask).sum() > 0
    # GT boxes normalized cxcywh in (0, 1]
    valid = batch.gt_valid
    assert valid.any()
    assert (batch.boxes_h[valid] >= 0).all()
    assert (batch.boxes_h[valid] <= 1.0 + 1e-5).all()
    # train factory with augmentation runs too
    tf = DataFactory("hicodet", "train2015", synthetic_hicodet,
                     training=True, max_gt_pairs=8, seed=1)
    img, cimg, tgt, _ = tf[0]
    assert cimg.shape == (3, 224, 224)


def test_600_class_batches_use_hoi_ids(synthetic_hicodet):
    """num_classes=600 training must associate against interaction ids,
    not verbs (reference targets['hoi'], upt_tip...py:1292-1293); a verb id
    in a 600-wide one-hot would silently corrupt the loss."""
    from hoigen_tpu.cli.main_finetune import batches_from_factory
    from hoigen_tpu.utils.config import RunConfig

    def fresh_factory():
        # augmentation is stateful per factory: rebuild for each pass
        return DataFactory("hicodet", "train2015", synthetic_hicodet,
                           training=True, max_gt_pairs=8, seed=0)

    cfg600 = RunConfig(num_classes=600, max_gt_pairs=8)
    cfg117 = RunConfig(num_classes=117, max_gt_pairs=8)
    d600, b = next(batches_from_factory(fresh_factory(), 2, cfg600,
                                        shuffle=False))
    d117, b117 = next(batches_from_factory(fresh_factory(), 2, cfg117,
                                           shuffle=False))
    np.testing.assert_array_equal(np.asarray(d600["labels"]), b.hoi)
    np.testing.assert_array_equal(np.asarray(d117["labels"]), b117.labels)
    v = b.gt_valid
    assert v.any()
    # hoi ids map back to the verbs through the label table
    np.testing.assert_array_equal(
        np.asarray(HICO.hoi_to_verb)[b.hoi[v]], b.labels[v])
    # and at least one hoi id differs from its verb id (the confusion the
    # reference batch dict would propagate)
    assert (b.hoi[v] != b.labels[v]).any()


def test_zero_shot_filtering(synthetic_hicodet):
    tf = DataFactory("hicodet", "train2015", synthetic_hicodet,
                     training=True, zero_shot=True, zs_type="rare_first",
                     num_classes=600, max_gt_pairs=8)
    unseen = set(HICO.unseen_index["rare_first"])
    for i in range(len(tf)):
        _, _, tgt, _ = tf[i]
        assert not (set(tgt["hoi"].tolist()) & unseen)


def test_crops_and_pair_embedding_producer(synthetic_hicodet, tmp_path):
    factory = DataFactory("hicodet", "test2015", synthetic_hicodet,
                          training=False)
    items = extract_crops(factory.dataset, str(tmp_path / "crops"), "hoi",
                          limit=4)
    assert items
    split = build_split_json(items, str(tmp_path / "split.json"))
    assert len(split["train"]) == len(items)
    ds = CropDataset(str(tmp_path / "split.json"), "train", training=False)
    img, label = ds[0]
    assert img.shape == (3, 224, 224)

    # fake CLIP: spatial mean features projected to 512
    rng = np.random.default_rng(1)
    proj = rng.normal(size=(3, 512)).astype(np.float32)

    def fake_clip(images):
        pooled = images.mean((2, 3))
        return pooled @ proj

    pkl = tmp_path / "pairs.p"
    anno = produce_pair_embeddings(factory.dataset, fake_clip, str(pkl),
                                   limit=4)
    key = next(iter(anno))
    assert "huamn_features" in anno[key]
    assert anno[key]["huamn_features"].shape[1] == 512

    cache = build_pair_cache(
        anno, 600, 2, HICO.object_n_verb_to_interaction,
        None, use_multi_hot=True, label_choice="random",
        num_anno=factory.dataset.anno_interaction)
    assert cache.cache_u.shape == (1200, 512)
    assert cache.one_hots.shape == (1200, 600)
    # classes observed in the synthetic data have nonzero cache rows
    observed = {int(h) for a in anno.values()
                for h in HICO.object_n_verb_to_interaction[
                    np.asarray(a["objects"]), np.asarray(a["verbs"])]}
    for c in observed:
        assert np.abs(cache.cache_u[c * 2]).sum() > 0


def test_device_crop_encoder_matches_host_producer(synthetic_hicodet,
                                                   tmp_path):
    """The fused on-device crop+CLIP path (make_device_crop_encoder) must
    produce the same pair-embedding pickle as the host PIL loop, through a
    real (tiny) CLIP encoder: crop pixels differ by <=1/255 (PIL uint8
    rounding), so features must agree tightly."""
    import jax

    from hoigen_tpu.data.crops import make_device_crop_encoder
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.clip.model import encode_image, init_clip_params

    cfg = CLIPConfig(image_resolution=32, vision_layers=2, vision_width=64,
                     vision_patch_size=8, transformer_layers=2,
                     transformer_width=64, context_length=16,
                     adapter_layers=())
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    apply_fn = jax.jit(lambda im: encode_image(params, im, cfg)[0])

    factory = DataFactory("hicodet", "test2015", synthetic_hicodet,
                          training=False)
    host = produce_pair_embeddings(
        factory.dataset, lambda im: np.asarray(apply_fn(im)),
        str(tmp_path / "host.p"), limit=3, resolution=32)
    dev = produce_pair_embeddings(
        factory.dataset, None, str(tmp_path / "dev.p"), limit=3,
        crop_encoder=make_device_crop_encoder(params, cfg, resolution=32,
                                              chunk=4, pad_to=64))
    assert host.keys() == dev.keys()
    for fname in host:
        for kind in ("huamn_features", "object_features", "union_features"):
            h, d = host[fname][kind], dev[fname][kind]
            assert h.shape == d.shape
            denom = np.maximum(np.abs(h).max(), 1e-6)
            assert np.abs(h - d).max() / denom < 2e-2, (fname, kind)


def test_evaluate_hico_perfect_detector(synthetic_hicodet):
    """Detections fabricated exactly at GT -> AP 1.0 for annotated classes."""
    factory = DataFactory("hicodet", "test2015", synthetic_hicodet,
                          training=False, max_gt_pairs=8)
    p_cfg = ProposalConfig(max_instances=4)
    px, py = (np.asarray(x) for x in pair_indices(p_cfg))
    n_pairs = p_cfg.n_pairs
    n_slots = p_cfg.n_slots

    def run_batches():
        for i in range(len(factory)):
            batch = collate_batch([factory[i]], max_gt_pairs=8)
            gv = batch.gt_valid[0]
            n = int(gv.sum())
            scores = np.zeros((1, n_pairs, 600), np.float32)
            boxes = np.zeros((1, n_slots, 4), np.float32)
            objects = np.zeros((1, n_pairs), np.int64)
            # place GT humans in slots 0..n-1, objects in slots max..max+n-1
            from hoigen_tpu.engine.eval import _recover_gt
            gt_h = _recover_gt(batch.boxes_h[0][gv], batch.clip_sizes[0])
            gt_o = _recover_gt(batch.boxes_o[0][gv], batch.clip_sizes[0])
            hois = batch.hoi[0][gv]
            for j in range(min(n, p_cfg.max_instances)):
                boxes[0, j] = gt_h[j]
                boxes[0, p_cfg.max_instances + j] = gt_o[j]
                pair_pos = np.nonzero(
                    (px == j) & (py == p_cfg.max_instances + j))[0][0]
                scores[0, pair_pos, hois[j]] = 0.9
                objects[0, pair_pos] = HICO.hoi_to_object[hois[j]]
            yield ({"detection_scores": scores, "boxes": boxes,
                    "objects": objects}, batch)

    result = evaluate_hico(run_batches(), factory.dataset, 600, p_cfg,
                           HICO.object_n_verb_to_interaction)
    annotated = np.asarray(factory.dataset.anno_interaction) > 0
    assert result["ap"][annotated].mean() > 0.99
    assert result["mAP"] > 0


def test_cli_config_roundtrip(tmp_path):
    cfg = parse_config(["--num-classes", "600", "--zs", "true",
                        "--zs-type", "unseen_verb", "--batch-size", "8"])
    assert cfg.num_classes == 600 and cfg.zs and cfg.zs_type == "unseen_verb"
    cfg.save(str(tmp_path / "args.json"))
    saved = json.load(open(tmp_path / "args.json"))
    assert saved["batch_size"] == 8


def test_detection_prep_and_eval(synthetic_hicodet, tmp_path):
    """GT detections dumped as perfect predictions -> detection AP == 1 for
    annotated classes (detections prep/eval utilities)."""
    from hoigen_tpu.data.detections import (eval_detections,
                                            generate_gt_detections)
    factory = DataFactory("hicodet", "test2015", synthetic_hicodet,
                          training=False)
    out = str(tmp_path / "gt_dets")
    generate_gt_detections(factory.dataset, out)
    ap = eval_detections(out, factory.dataset, num_classes=80)
    seen = set()
    for i in range(len(factory.dataset)):
        t = factory.dataset.target(i)
        seen.add(0)
        seen.update(np.asarray(t["object"]).tolist())
    got = ap[sorted(seen)]
    assert (got > 0.99).all(), got


def test_step_timer():
    from hoigen_tpu.engine.profiling import StepTimer
    import jax.numpy as jnp
    import jax
    t = StepTimer()
    f = jax.jit(lambda x: x * 2)
    for _ in range(3):
        t.timed(f, jnp.ones(4))
    assert t.mean > 0 and np.isfinite(t.p50)
