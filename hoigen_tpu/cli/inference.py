"""Per-image inference + visualization.

Equivalent of /root/reference/inference.py:321-938: rebuild the model, run
one image (or an index into the test set), render box pairs with action
scores to an output directory.

  python -m hoigen_tpu.cli.inference --index 0 --data-root ... \\
      --resume <ckpt> --output-dir visualization
"""
import os

import numpy as np

from ..labels import HICO
from ..models.proposals import pair_indices
from ..utils.config import parse_config


def draw_box_pairs(image, boxes_h, boxes_o, scores, labels, out_path,
                   top_k=10, action_names=None):
    """Render the top-k scoring pairs (inference.py:321-395)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as patches

    order = np.argsort(-np.asarray(scores))[:top_k]
    fig, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(image)
    for rank, i in enumerate(order):
        for box, color in ((boxes_h[i], "tab:blue"), (boxes_o[i], "tab:red")):
            x1, y1, x2, y2 = box
            ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           fill=False, color=color,
                                           linewidth=2))
        name = (action_names[int(labels[i])] if action_names is not None
                else str(int(labels[i])))
        ax.text(boxes_h[i][0], boxes_h[i][1] - 3 - 12 * rank,
                f"{name}: {scores[i]:.2f}", fontsize=9, color="w",
                bbox=dict(facecolor="tab:green", alpha=0.8, pad=1))
    ax.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    import argparse
    import jax

    from ..data.factory import DataFactory, collate_batch
    from ..engine.hoi_model import make_eval_step
    from .main_finetune import (build_caches, load_pretrained,
                                make_model_config, maybe_gen_features)
    from ..engine.hoi_model import init_hoi_model
    from ..models.clip.model import init_clip_params

    parser = argparse.ArgumentParser(parents=[], add_help=True)
    from ..utils.config import add_args
    add_args(parser)
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--image-path", default="")
    parser.add_argument("--action-score-thresh", type=float, default=0.2)
    args = parser.parse_args(argv)
    from ..utils.config import RunConfig
    import dataclasses
    cfg = RunConfig(**{f.name: getattr(args, f.name)
                       for f in dataclasses.fields(RunConfig)})

    model_cfg = make_model_config(cfg)
    factory = DataFactory(cfg.dataset, "test2015" if cfg.dataset == "hicodet"
                          else "test", cfg.data_root, training=False)
    rng = jax.random.PRNGKey(cfg.seed)
    clip_params, detr_params, dino_params = load_pretrained(cfg, model_cfg,
                                                            rng)
    if clip_params is None:
        clip_params = init_clip_params(rng, model_cfg.clip)
    caches, pair = build_caches(cfg, clip_params, model_cfg, factory)
    maybe_gen_features(cfg, clip_params, model_cfg, pair)
    trainable, frozen, buffers = init_hoi_model(
        rng, model_cfg, caches, clip_params=clip_params,
        detr_params=detr_params, dino_params=dino_params)
    if cfg.resume and os.path.exists(cfg.resume):
        from ..engine.checkpoint import restore_checkpoint
        trainable = restore_checkpoint(cfg.resume,
                                       {"trainable": trainable})["trainable"]

    batch = collate_batch([factory[args.index]], cfg.max_gt_pairs)
    step = jax.jit(make_eval_step(model_cfg))
    out = step(trainable, frozen, buffers, {
        "images": batch.images, "image_sizes": batch.image_sizes,
        "images_clip": batch.images_clip, "clip_sizes": batch.clip_sizes,
        "boxes_h": batch.boxes_h, "boxes_o": batch.boxes_o,
        "labels": batch.labels, "gt_valid": batch.gt_valid})

    scores_mat = np.asarray(out["detection_scores"])[0]
    boxes = np.asarray(out["boxes"])[0]
    px, py = (np.asarray(x) for x in pair_indices(model_cfg.upt.proposals))
    ps, cs = np.nonzero(scores_mat)
    sc = scores_mat[ps, cs]
    keep = sc >= args.action_score_thresh
    image = factory.dataset.load_image(args.index).resize(
        (cfg.max_gt_pairs and 224, 224))
    names = (HICO.hoi_prompts if cfg.num_classes == 600
             else HICO.verbs_sentence)
    out_path = os.path.join(cfg.output_dir,
                            f"vis_{args.index:06d}.png")
    draw_box_pairs(image, boxes[px[ps[keep]]], boxes[py[ps[keep]]],
                   sc[keep], cs[keep], out_path, action_names=names)
    print(f"saved {out_path} ({int(keep.sum())} pairs above "
          f"{args.action_score_thresh})")


if __name__ == "__main__":
    main()
