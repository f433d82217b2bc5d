"""Data preparation: crop extraction, split jsons, and the feature
artifacts the reference only ships pre-computed.

Replaces /root/reference/pre_images/{crop_images,split_gen_dataset}.py and
adds producers for the pair-embedding pickle and new_gt_features pickles
(SURVEY.md §2.2 "no producer scripts"), plus the CLIP/DINO global caches
(/root/reference/utils.py:6-176) built in one jitted pass.

  python -m hoigen_tpu.cli.prepare_data crops --dataset hicodet ...
  python -m hoigen_tpu.cli.prepare_data pair-embeddings ...
  python -m hoigen_tpu.cli.prepare_data gt-features ...
  python -m hoigen_tpu.cli.prepare_data global-caches ...
"""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.crops import (CropDataset, build_split_json, extract_crops,
                          produce_gt_features, produce_pair_embeddings)
from ..data.factory import DataFactory
from ..labels import HICO
from ..models.cache import build_global_cache
from ..models.clip.config import VIT_B16
from ..models.clip.model import encode_image, init_clip_params


def _clip_apply(clip_params, clip_cfg):
    fn = jax.jit(lambda p, im: encode_image(p, im, clip_cfg)[0])
    return lambda images: np.asarray(fn(clip_params,
                                        jnp.asarray(images)))


def _load_clip(path):
    cfg = VIT_B16
    if path and os.path.exists(path):
        import torch
        from ..models.clip.convert import torch_state_dict_to_params
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        return torch_state_dict_to_params({k: v for k, v in sd.items()},
                                          use_adapter=False)
    print("[warn] no CLIP checkpoint; random init")
    return init_clip_params(jax.random.PRNGKey(0), cfg), cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["crops", "pair-embeddings",
                                    "gt-features", "global-caches",
                                    "vcoco-annotations"])
    p.add_argument("--dataset", default="hicodet")
    p.add_argument("--partition", default="train2015")
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--out-dir", default="./crops")
    p.add_argument("--category", default="hoi",
                   choices=["hoi", "human", "object"])
    p.add_argument("--clip-model", default="")
    p.add_argument("--split-json", default="")
    p.add_argument("--out", default="")
    p.add_argument("--num-classes", type=int, default=600)
    p.add_argument("--num-shot", type=int, default=2)
    p.add_argument("--zs", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--zs-type", default="rare_first")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pickle", default="",
                   help="vcoco-annotations: the official repo's cached "
                   "vcoco_all pickle")
    p.add_argument("--vsrl-partition", type=int, default=0,
                   help="vcoco-annotations: 0 = train/val/trainval "
                   "(COCO train2014 filenames), 1 = test (val2014)")
    p.add_argument("--host-crops", action="store_true",
                   help="pair-embeddings: host PIL crop path instead of "
                   "the fused on-device crop+CLIP encoder")
    args = p.parse_args(argv)

    if args.task == "vcoco-annotations":
        from ..data.vcoco import generate_vcoco_annotations
        out = generate_vcoco_annotations(args.pickle, args.vsrl_partition,
                                         out=args.out or None)
        print(f"vcoco annotations -> {out}")
        return

    if args.task != "gt-features":   # gt-features only needs the split json
        factory = DataFactory(args.dataset, args.partition, args.data_root,
                              training=False)
        dataset = factory.dataset

    if args.task == "crops":
        items = extract_crops(dataset, args.out_dir, args.category,
                              limit=args.limit)
        excluded = HICO.unseen_index[args.zs_type] if (
            args.zs and args.category == "hoi") else ()
        out = args.out or os.path.join(
            args.out_dir, f"{args.dataset}_{args.category}_split.json")
        build_split_json(items, out, excluded_classes=excluded,
                         seed=args.seed)
        print(f"{len(items)} crops -> {out}")
        return

    clip_params, clip_cfg = _load_clip(args.clip_model)
    apply_fn = _clip_apply(clip_params, clip_cfg)

    if args.task == "pair-embeddings":
        out = args.out or ("hicodet_pkl_files/union_embeddings_cachemodel_"
                           "crop_padding_zeros_vitb16.p")
        crop_encoder = None
        if not args.host_crops:
            from ..data.crops import make_device_crop_encoder
            crop_encoder = make_device_crop_encoder(clip_params, clip_cfg)
        produce_pair_embeddings(dataset, apply_fn, out, limit=args.limit,
                                crop_encoder=crop_encoder)
        print(f"pair embeddings -> {out}")
    elif args.task == "gt-features":
        crops = CropDataset(args.split_json, "train", training=False)
        out = args.out or f"new_gt_features/{args.category}.pickle"
        produce_gt_features(crops, apply_fn, args.num_classes, out)
        print(f"gt features -> {out}")
    elif args.task == "global-caches":
        # one pass over the train stream encoding whole (CLIP-frame) images
        feats, multihots = [], []
        n = len(factory) if args.limit is None else min(args.limit,
                                                        len(factory))
        for i in range(n):
            _, clip_img, tgt, _ = factory[i]
            feats.append(clip_img)
            mh = np.zeros(args.num_classes, np.float32)
            mh[np.asarray(tgt["labels"], int)] = 1
            multihots.append(mh)
        embs = []
        for lo in range(0, len(feats), 64):
            embs.append(apply_fn(np.stack(feats[lo:lo + 64])))
        embs = np.concatenate(embs)
        embs /= np.maximum(np.linalg.norm(embs, axis=1, keepdims=True),
                           1e-8)
        clip_keys, clip_values = build_global_cache(
            embs, np.stack(multihots), args.num_classes, args.num_shot,
            seed=args.seed)
        from ..models.dino import dino_forward, init_dino_params
        dino_params = init_dino_params(jax.random.PRNGKey(1))
        dfn = jax.jit(lambda p, im: dino_forward(p, im))
        dembs = np.concatenate([
            np.asarray(dfn(dino_params, jnp.asarray(np.stack(
                feats[lo:lo + 64])))) for lo in range(0, len(feats), 64)])
        dembs /= np.maximum(np.linalg.norm(dembs, axis=1, keepdims=True),
                            1e-8)
        dino_keys, dino_values = build_global_cache(
            dembs, np.stack(multihots), args.num_classes, args.num_shot,
            seed=args.seed)
        tag = f"{args.zs_type}_{args.num_shot}" if args.zs else "2shots"
        # num_classes is part of the name: a 600-class cache must not be
        # picked up by a 117-class run (row counts differ)
        out = args.out or os.path.join(
            "caches", "dataset",
            f"{args.dataset}_{args.num_classes}_global_{tag}.npz")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez(out, clip_keys=clip_keys, clip_values=clip_values,
                 dino_keys=dino_keys, dino_values=dino_values)
        print(f"global caches -> {out}")


if __name__ == "__main__":
    main()
