"""Detector-output preparation and detection-level evaluation CLI.

Equivalent of the reference's standalone scripts
/root/reference/hicodet/detections/{preprocessing.py,
generate_gt_detections.py, eval_detections.py} (and their vcoco/
counterparts): dump per-image detection jsons from the DETR, write GT
boxes as perfect detections, and score detection mAP.

  python -m hoigen_tpu.cli.detections dump --data-root ... \\
      --pretrained checkpoints/detr-r50-hicodet.pth --out-dir detections/
  python -m hoigen_tpu.cli.detections gt --data-root ... --out-dir gt/
  python -m hoigen_tpu.cli.detections eval --det-dir detections/ \\
      --data-root ...
"""
import argparse
import os

import numpy as np

from ..data.detections import dump_detections, eval_detections, \
    generate_gt_detections, remap_detections
from ..data.factory import DataFactory, collate_batch


def _detr_batches(factory, params, cfg, batch_size, limit=None):
    import jax

    from ..models.detr import detr_forward, postprocess
    from ..ops.pixels import device_normalize

    @jax.jit
    def step(p, images, mask, clip_sizes):
        out = detr_forward(p, device_normalize(images, pad_mask=mask),
                           mask, cfg)
        return postprocess(out["pred_logits"].astype(np.float32),
                           out["pred_boxes"].astype(np.float32), clip_sizes)

    n = len(factory) if limit is None else min(limit, len(factory))
    for lo in range(0, n, batch_size):
        idx = list(range(lo, min(lo + batch_size, n)))
        batch = collate_batch([factory[i] for i in idx], 8)
        post = step(params, batch.images, batch.image_mask,
                    batch.clip_sizes)
        yield jax.tree.map(np.asarray, post), batch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["dump", "gt", "eval", "vis", "remap"])
    p.add_argument("--dataset", default="hicodet")
    p.add_argument("--partition", default="test2015")
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--out-dir", default="detections")
    p.add_argument("--det-dir", default="detections")
    p.add_argument("--pretrained", default="",
                   help="dump: DETR torch checkpoint to convert")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--score-thresh", type=float, default=0.0)
    p.add_argument("--min-iou", type=float, default=0.5)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--label-map", default="",
                   help="remap: json mapping of source label id (string) -> "
                        "HICO-80 id, e.g. the reference's coco80tohico80.json")
    args = p.parse_args(argv)

    if args.task == "remap":
        # external-detector label surgery (the legacy Faster-RCNN prep,
        # hicodet/detections/preprocessing.py) — no dataset/model needed
        import json as _json
        with open(args.label_map) as f:
            label_map = _json.load(f)
        n = remap_detections(args.det_dir, args.out_dir, label_map)
        print(f"remapped {n} detection files -> {args.out_dir}")
        return

    factory = DataFactory(args.dataset, args.partition, args.data_root,
                          training=False)
    dataset = factory.dataset

    if args.task == "gt":
        generate_gt_detections(dataset, args.out_dir)
        print(f"GT detections -> {args.out_dir}")
        return

    if args.task == "vis":
        # GT pair renderer ({hicodet,vcoco}/utilities/
        # visualise_and_cache.py:38-75): per image, one PNG per HOI/action
        # class present, human box blue, object green, a red centre line
        # joining the pair
        from PIL import ImageDraw
        n = len(dataset) if args.limit is None else min(args.limit,
                                                        len(dataset))
        root = os.path.join(args.out_dir, args.partition)
        for idx in range(n):
            image = dataset.load_image(idx)
            target = dataset.target(idx)
            classes = np.asarray(target["hoi"] if "hoi" in target
                                 else target["actions"])
            for cls_idx in np.unique(classes):
                img = image.copy()
                canvas = ImageDraw.Draw(img)
                for i in np.where(classes == cls_idx)[0]:
                    b1 = np.asarray(target["boxes_h"][i], np.float64)
                    b2 = np.asarray(target["boxes_o"][i], np.float64)
                    canvas.rectangle(b1.tolist(), outline="#007CFF",
                                     width=5)
                    canvas.rectangle(b2.tolist(), outline="#46FF00",
                                     width=5)
                    ch = (b1[:2] + b1[2:]) / 2
                    co = (b2[:2] + b2[2:]) / 2
                    canvas.line(ch.tolist() + co.tolist(), fill="#FF4444",
                                width=5)
                    for c in (ch, co):
                        canvas.ellipse((c - 5).tolist() + (c + 5).tolist(),
                                       fill="#FF4444")
                d = os.path.join(root, f"class_{int(cls_idx):03d}")
                os.makedirs(d, exist_ok=True)
                img.save(os.path.join(d, f"{idx}.png"))
        print(f"GT visualisations -> {root}")
        return

    if args.task == "eval":
        ap = eval_detections(args.det_dir, dataset, min_iou=args.min_iou,
                             limit=args.limit)
        print(f"detection mAP: {float(ap[ap > 0].mean() if (ap > 0).any() else 0.0):.4f} "
              f"({(ap > 0).sum()} classes with detections)")
        return ap

    # dump: run the (converted) DETR over the partition
    import jax

    from ..models.detr import DETRConfig, init_detr_params
    cfg = DETRConfig(num_classes=81 if args.dataset == "hicodet" else 92)
    if args.pretrained and os.path.exists(args.pretrained):
        import torch

        from ..models.detr.convert import torch_detr_state_dict_to_params
        ckpt = torch.load(args.pretrained, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("model_state_dict", ckpt))
        params, cfg = torch_detr_state_dict_to_params(sd)
        print(f"[load] {args.pretrained}")
    else:
        params = init_detr_params(jax.random.PRNGKey(0), cfg)
        print("[warn] no --pretrained; random DETR")
    dump_detections(
        _detr_batches(factory, params, cfg, args.batch_size, args.limit),
        dataset, args.out_dir, score_thresh=args.score_thresh)
    print(f"detections -> {args.out_dir}")


if __name__ == "__main__":
    main()
