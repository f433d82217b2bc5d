"""Standalone synthetic HICO-DET fixture builder (no pytest needed).

Produces the same tiny 5-image dataset the CLI test suite uses
(tests/test_cli_main.py::tiny_dataset) so the repro scripts
(scripts/repro_*.sh) can exercise the full production flow in CI mode when
the real HICO-DET images / checkpoints are absent.

Usage: python tools/make_fixture.py <out_dir> [--images N] [--seed S]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(root: str, n_images: int = 5, seed: int = 0) -> str:
    from PIL import Image
    from hoigen_tpu.labels import HICO

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "hico_20160224_det", "images", "train2015")
    os.makedirs(img_dir, exist_ok=True)
    names, sizes, annos = [], [], []
    for i in range(n_images):
        w, h = 64, 48
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(os.path.join(img_dir, f"im_{i}.jpg"))
        names.append(f"im_{i}.jpg")
        sizes.append([w, h])
        hoi = int(rng.integers(0, 600))
        _, obj, verb = HICO.class_corr[hoi]
        annos.append({"boxes_h": [[2, 2, 30, 30]],
                      "boxes_o": [[5, 5, 40, 40]],
                      "hoi": [hoi], "verb": [verb], "object": [obj]})
    inst = {"annotation": annos, "filenames": names, "empty": [],
            "objects": HICO.objects, "verbs": HICO.verbs,
            "correspondence": HICO.class_corr, "size": sizes}
    json.dump(inst, open(os.path.join(root, "instances_train2015.json"),
                         "w"))
    test_link = os.path.join(img_dir, os.pardir, "test2015")
    if not os.path.exists(test_link):
        os.symlink(img_dir, test_link)
    json.dump(inst, open(os.path.join(root, "instances_test2015.json"),
                         "w"))
    return root


def build_vcoco(root: str, n_images: int = 4, seed: int = 0) -> str:
    """V-COCO fixture: instances_vcoco_{trainval,test}.json over tiny COCO
    -named JPEGs, real 24-action/80-object label surface from
    hoigen_tpu.labels.VCOCO_LABELS (schema as
    /root/reference/vcoco/vcoco.py:33-204)."""
    from PIL import Image
    from hoigen_tpu.labels import VCOCO_LABELS as V

    rng = np.random.default_rng(seed)
    actions = [V.values[next(i for i, k in enumerate(V.keys)
                             if k[0] == a)][0] for a in range(24)]
    objects = ["background"] + list(V.object_name)
    a2o = [sorted({k[1] for k in V.keys if k[0] == a}) for a in range(24)]
    os.makedirs(root, exist_ok=True)
    for part, img_dir_name, n in (("trainval", "train2014", n_images),
                                  ("test", "val2014", n_images)):
        img_dir = os.path.join(root, "images", img_dir_name)
        os.makedirs(img_dir, exist_ok=True)
        annos, images = [], []
        for i in range(n):
            w, h = 64, 48
            name = f"COCO_{img_dir_name}_{i:012d}.jpg"
            Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                         dtype=np.uint8)) \
                .save(os.path.join(img_dir, name))
            k = int(rng.integers(1, 3))
            acts = rng.integers(0, 24, k).tolist()
            objs = [int(rng.choice(a2o[a])) for a in acts]
            annos.append({"boxes_h": [[2, 2, 30, 30]] * k,
                          "boxes_o": [[5, 5, 40, 40]] * k,
                          "actions": acts, "objects": objs,
                          "file_name": name})
            images.append(1000 + i)
        inst = {"annotations": annos, "classes": actions,
                "objects": objects, "images": images,
                "action_to_object": a2o}
        json.dump(inst, open(os.path.join(
            root, f"instances_vcoco_{part}.json"), "w"))
    return root


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--images", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default="hicodet",
                   choices=["hicodet", "vcoco"])
    a = p.parse_args()
    if a.dataset == "vcoco":
        print(build_vcoco(a.out_dir, a.images, a.seed))
    else:
        print(build(a.out_dir, a.images, a.seed))
