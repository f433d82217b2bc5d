"""Train the CoOp+VAE feature generator for one crop family.

TPU-native equivalent of /root/reference/main_coop_vae.py: per family
(hoi/human/object), train Encoder+Generator+PromptLearner to reconstruct
frozen-CLIP crop features through the prompted text encoder (MSE+KLD), 50
epochs, batch 256, AdamW 1e-3; checkpoints saved per family.

  python -m hoigen_tpu.cli.main_vae --data hoi_data \\
      --split-json crops/hicodet_hoi_split.json --clip-model <ViT-B-16.pt>
"""
import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..labels import HICO, VCOCO_LABELS
from ..models import generator as G
from ..models.clip.config import VIT_B16
from ..models.clip.model import encode_image, init_clip_params
from ..data.crops import CropDataset


def family_classnames(dataset: str, data: str, zs: bool, zs_type: str):
    """Class-name list per family (main_coop_vae.py seen_classnames logic:
    zero-shot training uses seen-only names)."""
    labels = HICO if dataset.startswith("hicodet") else VCOCO_LABELS
    if data == "hoi_data":
        if dataset.startswith("hicodet"):
            return (HICO.seen_classnames if zs else HICO.all_classnames)
        return [f"{v} {o}" for v, o in (VCOCO_LABELS.seen_values if zs
                                        else VCOCO_LABELS.values)]
    if data == "human_data":
        if dataset.startswith("hicodet"):
            return (HICO.human_seen_name if zs and zs_type ==
                    "unseen_object" else HICO.human_name)
        return (VCOCO_LABELS.human_seen_values if zs
                else VCOCO_LABELS.human_name)
    if dataset.startswith("hicodet"):
        return (HICO.object_seen_name if zs and zs_type == "unseen_object"
                else HICO.object_name)
    return (VCOCO_LABELS.object_seen_values if zs
            else VCOCO_LABELS.object_name)


def train_vae(clip_params, clip_cfg, crop_dataset, classnames, n_ctx,
              epochs=50, batch_size=256, lr=1e-3, seed=0, log=print,
              ctx_init=""):
    token_embedding = clip_params["text"]["token_embedding"]
    if ctx_init:
        # context initialized from the given words; n_ctx becomes the
        # phrase's token count (PromptLearner :98-106)
        ctx, n_ctx = G.init_prompt_ctx_from_text(ctx_init, token_embedding)
    else:
        ctx = G.init_prompt_ctx(jax.random.PRNGKey(seed + 2), n_ctx)
    params = {"enc": G.init_encoder_params(jax.random.PRNGKey(seed)),
              "gen": G.init_generator_params(jax.random.PRNGKey(seed + 1)),
              "ctx": ctx}
    tables = G.build_prompt_tables(classnames, token_embedding, n_ctx)
    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    encode = jax.jit(lambda p, im: encode_image(p, im, clip_cfg)[0])

    @jax.jit
    def step(p, s, cp, feats, target, r):
        loss, g = jax.value_and_grad(
            lambda pp: G.vae_step(pp, tables, cp, clip_cfg, feats, target,
                                  r))(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(seed + 7)
    it = 0
    for epoch in range(1, epochs + 1):
        losses = []
        for images, labels in crop_dataset.batches(batch_size):
            feats = encode(clip_params, jnp.asarray(images))
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            params, opt_state, loss = step(
                params, opt_state, clip_params, feats, jnp.asarray(labels),
                jax.random.fold_in(rng, it))
            losses.append(float(loss))
            it += 1
        log(f"VAE epoch {epoch}/{epochs} loss "
            f"{np.mean(losses) if losses else float('nan'):.4f}")
    return params, tables


def save_family(params, out_dir, family, epochs=50):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{family}_vae_{epochs}.npz")
    flat = {}
    flat["ctx"] = np.asarray(params["ctx"])
    for mod in ("enc", "gen"):
        for k, v in params[mod].items():
            flat[f"{mod}.{k}.w"] = np.asarray(v["w"])
            flat[f"{mod}.{k}.b"] = np.asarray(v["b"])
    np.savez(path, **flat)
    return path


def load_family(path):
    z = np.load(path)
    params = {"ctx": jnp.asarray(z["ctx"]), "enc": {}, "gen": {}}
    for k in z.files:
        if k == "ctx":
            continue
        mod, name, wb = k.split(".")
        params[mod].setdefault(name, {})[wb] = jnp.asarray(z[k])
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="hoi_data",
                   choices=["hoi_data", "human_data", "object_data"])
    p.add_argument("--dataset", default="hicodet_crop")
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
    p.add_argument("--ctx-init", default="",
                   help="words to initialize the CoOp context (e.g. "
                   "'a photo of a person'); overrides the n_ctx default")
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

    names = family_classnames(args.dataset, args.data, args.zs, args.zs_type)
    n_ctx = 5 if args.data == "hoi_data" else 4
    crops = CropDataset(args.split_json, "train", training=True,
                        seed=args.seed)
    params, _ = train_vae(clip_params, clip_cfg, crops, names, n_ctx,
                          args.epochs, args.batch_size, args.lr, args.seed,
                          ctx_init=args.ctx_init)
    family = args.data.split("_")[0]
    out = save_family(params, os.path.join(args.ckpt_dir,
                                           args.dataset.split("_")[0]),
                      family, args.epochs)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
