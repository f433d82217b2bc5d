"""SHIP-style generator finetune: freeze netG + prompt learner, train an
alignment MLP against cached GT crop features.

Equivalent of /root/reference/finetune_ship.py:344-556.

  python -m hoigen_tpu.cli.finetune_ship --data hoi_data \\
      --vae-ckpt ckpt/hicodet/hoi_vae_50.npz \\
      --gt-features new_gt_features/hoi.pickle \\
      --split-json crops/hicodet_hoi_split.json
"""
import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import generator as G
from ..models.clip.config import VIT_B16
from ..models.clip.model import init_clip_params
from ..data.crops import CropDataset
from .main_vae import family_classnames, load_family


def train_ship(clip_params, clip_cfg, gen_params, ctx, tables, gt_features,
               crop_dataset, epochs=50, batch_size=256, lr=1e-3, seed=0,
               log=print):
    """gt_features: {class_id: [array (N_c, 512)]} (NaN rows dropped,
    finetune_ship.py:469-472)."""
    clean = {}
    for c, v in gt_features.items():
        if not v:
            continue
        arr = np.asarray(v[0])
        arr = arr[~np.isnan(arr).any(axis=1)]
        if len(arr):
            clean[int(c)] = arr / np.linalg.norm(arr, axis=1, keepdims=True)

    mlp = G.init_ship_mlp_params(jax.random.PRNGKey(seed))
    opt = optax.adamw(lr)
    opt_state = opt.init(mlp)

    @jax.jit
    def step(m, s, cp, feats, target, r):
        loss, g = jax.value_and_grad(
            lambda mm: G.ship_step(mm, gen_params, ctx, tables, cp, clip_cfg,
                                   feats, target, r))(m)
        updates, s = opt.update(g, s, m)
        return optax.apply_updates(m, updates), s, loss

    rng = np.random.default_rng(seed)
    jrng = jax.random.PRNGKey(seed + 3)
    it = 0
    for epoch in range(1, epochs + 1):
        losses = []
        for _, labels in crop_dataset.batches(batch_size):
            # sample one cached GT feature per target class
            # (finetune_ship.py:485-492)
            keep = [i for i, c in enumerate(labels) if int(c) in clean]
            if not keep:
                continue
            labels = labels[keep]
            feats = np.stack([
                clean[int(c)][rng.integers(len(clean[int(c)]))]
                for c in labels])
            mlp, opt_state, loss = step(
                mlp, opt_state, clip_params, jnp.asarray(feats),
                jnp.asarray(labels), jax.random.fold_in(jrng, it))
            losses.append(float(loss))
            it += 1
        log(f"SHIP epoch {epoch}/{epochs} loss "
            f"{np.mean(losses) if losses else float('nan'):.4f}")
    return mlp


def save_mlp(mlp, out_dir, family, epochs=50):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{family}_mlp_{epochs}.npz")
    np.savez(path, **{f"{i}.{k}": np.asarray(v)
                      for i, lp in enumerate(mlp) for k, v in lp.items()})
    return path


def load_mlp(path):
    z = np.load(path)
    n = max(int(k.split(".")[0]) for k in z.files) + 1
    return [{k: jnp.asarray(z[f"{i}.{k}"]) for k in ("w", "b")}
            for i in range(n)]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="hoi_data",
                   choices=["hoi_data", "human_data", "object_data"])
    p.add_argument("--dataset", default="hicodet_crop")
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--gt-features", required=True)
    p.add_argument("--split-json", required=True)
    p.add_argument("--clip-model", default="")
    p.add_argument("--ckpt-dir", default="ckpt")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--zs", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--zs-type", default="rare_first")
    p.add_argument("--seed", type=int, default=66)
    args = p.parse_args(argv)

    clip_cfg = VIT_B16
    if args.clip_model and os.path.exists(args.clip_model):
        import torch
        from ..models.clip.convert import torch_state_dict_to_params
        obj = torch.load(args.clip_model, map_location="cpu",
                         weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        clip_params, clip_cfg = torch_state_dict_to_params(
            {k: v for k, v in sd.items()}, use_adapter=False)
    else:
        print("[warn] no CLIP checkpoint; random init")
        clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)

    vae = load_family(args.vae_ckpt)
    names = family_classnames(args.dataset, args.data, args.zs, args.zs_type)
    tables = G.build_prompt_tables(
        names, clip_params["text"]["token_embedding"], vae["ctx"].shape[0])
    with open(args.gt_features, "rb") as f:
        gt = pickle.load(f)
    crops = CropDataset(args.split_json, "train", training=True,
                        seed=args.seed)
    mlp = train_ship(clip_params, clip_cfg, vae["gen"], vae["ctx"], tables,
                     gt, crops, args.epochs, args.batch_size, args.lr,
                     args.seed)
    family = args.data.split("_")[0]
    out = save_mlp(mlp, os.path.join(args.ckpt_dir,
                                     args.dataset.split("_")[0]),
                   family, args.epochs)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
