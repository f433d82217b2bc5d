"""Train -> eval IMPROVEMENT through the real CLI (round-4 VERDICT item 7).

Loss-decrease tests can pass while the gradient path trains the wrong
things; the cheapest full-loop sanity is that N training steps IMPROVE
eval mAP on the fixture over the initial weights, driven end to end by
``cli.main_finetune`` (train -> checkpoint -> eval, real loader, real
meter).

The DETR tower is canned to a content-independent detection set (the same
seam as the full-model parity suites — DETR is frozen in production, so
the trainable path under test is exactly the CLIP-adapter/cache/text
scoring). The fixture's GT boxes are authored AT the canned boxes in
normalized coordinates and centered at cx=0.5, so hflip maps them onto
themselves and multi-scale resize preserves them: train-time association
always finds its positives, and eval association is exact. What must be
LEARNED is which verb goes with which image — pure trainable-scoring
signal through the CLIP crops.
"""
import json
import os

import numpy as np
import pytest

from hoigen_tpu.labels import HICO

pytestmark = pytest.mark.slow          # ~4 min: 3 CLI drives, 56 steps

# canned detections: 4 person queries (q0 = the GT human), 6 object
# queries with distinct classes and boxes, 2 below-threshold queries
Q = 12
OBJ_CLASSES = [1, 10, 19, 28, 37, 46]
PERSON_BOXES = np.array([
    [0.50, 0.30, 0.44, 0.40],      # the GT human (cx = 0.5: flip-stable)
    [0.20, 0.20, 0.20, 0.25],
    [0.80, 0.25, 0.18, 0.28],
    [0.50, 0.85, 0.30, 0.22],
], np.float32)
OBJECT_BOXES = np.array([
    [0.50, 0.62, 0.40, 0.30],
    [0.50, 0.75, 0.50, 0.28],
    [0.50, 0.50, 0.60, 0.35],
    [0.50, 0.40, 0.70, 0.30],
    [0.50, 0.68, 0.24, 0.40],
    [0.50, 0.55, 0.36, 0.50],
], np.float32)


def _canned_outputs():
    logits = np.full((Q, 81), -4.0, np.float32)
    boxes = np.zeros((Q, 4), np.float32)
    for q in range(4):
        logits[q, 0] = 4.0 - 0.5 * q
        boxes[q] = PERSON_BOXES[q]
    for j, cls in enumerate(OBJ_CLASSES):
        logits[4 + j, cls] = 3.5 - 0.3 * j
        boxes[4 + j] = OBJECT_BOXES[j]
    boxes[10:] = np.array([0.5, 0.5, 0.1, 0.1], np.float32)
    return logits, boxes


def _gt_for_image(i, w, h):
    """Image i interacts with object class OBJ_CLASSES[i]: GT pair =
    (person box 0, object box i) in pixel xyxy, verb = that object's
    first valid verb."""
    obj = OBJ_CLASSES[i]
    verb = HICO.object_to_verb[obj][0]
    hoi = next(hh for hh, oo, vv in HICO.class_corr
               if oo == obj and vv == verb)

    def to_xyxy(b):
        cx, cy, bw, bh = b
        return [float((cx - bw / 2) * w), float((cy - bh / 2) * h),
                float((cx + bw / 2) * w), float((cy + bh / 2) * h)]
    return {"boxes_h": [to_xyxy(PERSON_BOXES[0])],
            "boxes_o": [to_xyxy(OBJECT_BOXES[i])],
            "hoi": [hoi], "verb": [verb], "object": [obj]}, hoi


@pytest.fixture(scope="module")
def aligned_dataset(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("aligned_hico")
    rng = np.random.default_rng(3)
    img_dir = root / "hico_20160224_det" / "images" / "train2015"
    img_dir.mkdir(parents=True)
    names, sizes, annos, hois = [], [], [], []
    w, h = 64, 48
    # 4 images: the tiny config's ProposalConfig(max_instances=4) keeps
    # only the top-4 object queries, so only OBJ_CLASSES[:4] are pairable
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(img_dir / f"im_{i}.jpg")
        names.append(f"im_{i}.jpg")
        sizes.append([w, h])
        anno, hoi = _gt_for_image(i, w, h)
        annos.append(anno)
        hois.append(hoi)
    inst = {"annotation": annos, "filenames": names, "empty": [],
            "objects": HICO.objects, "verbs": HICO.verbs,
            "correspondence": HICO.class_corr, "size": sizes}
    json.dump(inst, open(root / "instances_train2015.json", "w"))
    os.symlink(img_dir, img_dir.parent / "test2015")
    json.dump(inst, open(root / "instances_test2015.json", "w"))
    return str(root), hois


def test_training_improves_eval_map(aligned_dataset, tmp_path, monkeypatch):
    import functools
    import jax.numpy as jnp
    import hoigen_tpu.cli.main_finetune as mf
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.engine.hoi_model as hm
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig
    from test_cli_main import _tiny_model_config

    data_root, hois = aligned_dataset
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    # crop_range >= image size -> identity crop; single train scale; flips
    # are safe by the cx=0.5 construction
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(48,),
                              crop_resize_choices=(48,),
                              crop_range=(64, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS", ((64, 80),))

    logits, boxes = _canned_outputs()

    def canned_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.tile(jnp.asarray(logits)[None],
                                        (b, 1, 1)),
                "pred_boxes": jnp.tile(jnp.asarray(boxes)[None], (b, 1, 1))}

    monkeypatch.setattr(hm, "detr_forward", canned_detr_forward)

    out = str(tmp_path / "run")
    common = dict(data_root=data_root, output_dir=out, batch_size=1,
                  num_workers=0, num_classes=117, dino=False,
                  generate_feature=False, max_gt_pairs=4, devices=1,
                  epochs=14, seed=3)

    # eval at init (no resume -> fresh random-but-seeded weights)
    init = mf.main(RunConfig(**{**common, "eval": True}))
    init_ap = np.asarray(init["ap"])[hois]

    # train through the CLI, then eval the checkpoint
    mf.main(RunConfig(**common))
    trained = mf.main(RunConfig(**{**common, "eval": True, "resume": out}))
    trained_ap = np.asarray(trained["ap"])[hois]

    # the margin is the test: scoring must LEARN the image->verb mapping,
    # not just shuffle it (each class has 1 positive among ~20 candidate
    # pairs, so random ranking keeps mean AP low)
    assert trained_ap.mean() > init_ap.mean() + 0.15, (
        f"init {init_ap} (mean {init_ap.mean():.3f}) -> "
        f"trained {trained_ap} (mean {trained_ap.mean():.3f})")
    assert trained_ap.mean() > 0.6, trained_ap
