"""Per-image inference + visualization.

Equivalent of /root/reference/inference.py:321-938: rebuild the model, run
one image of the test set, print the per-action pair listing and render
figures into an output directory. Mirrors the reference's three output
modes (inference.py:333-397):

  * ``--action K``: one figure with every box pair predicted for action K
    with score >= --action-score-thresh, score text at the human box
    corner (reference `visualise_entire_image` action branch :352-371)
  * ``--action K --failure``: same but score < thresh (:355-356)
  * default: print every predicted action with its (human, object)
    instance indices, score and object name (:377-387), then render all
    detected instance boxes numbered 1..N (:321-330, draw_boxes) plus a
    top-k pair overview figure.

  python -m hoigen_tpu.cli.inference --index 0 --data-root ... \\
      --resume <ckpt> --output-dir visualization
"""
import os

import numpy as np

from ..labels import HICO
from ..models.proposals import pair_indices
from ..utils.config import parse_config


def _fig_ax(image):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(image)
    ax.axis("off")
    return fig, ax


def _save(fig, out_path):
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", pad_inches=0.0, dpi=120)
    import matplotlib.pyplot as plt
    plt.close(fig)
    return out_path


def draw_boxes(image, boxes, out_path):
    """All instance boxes numbered 1..N (reference draw_boxes,
    inference.py:321-330)."""
    import matplotlib.patches as patches
    import matplotlib.patheffects as peff

    fig, ax = _fig_ax(image)
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes)):
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       facecolor="none", edgecolor="w"))
        txt = ax.text(x1, y1, str(i + 1), fontsize=20,
                      fontweight="semibold", color="w")
        txt.set_path_effects([peff.withStroke(linewidth=5,
                                              foreground="#000000")])
    return _save(fig, out_path)


def draw_action_pairs(image, boxes_h, boxes_o, scores, out_path):
    """All pairs of one action, score text at the human box corner
    (reference action branch, inference.py:352-371)."""
    import matplotlib.patches as patches
    import matplotlib.patheffects as peff

    fig, ax = _fig_ax(image)
    for bh, bo, s in zip(np.asarray(boxes_h), np.asarray(boxes_o),
                         np.asarray(scores)):
        for box, color in ((bh, "tab:blue"), (bo, "tab:red")):
            x1, y1, x2, y2 = box
            ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           facecolor="none", edgecolor=color,
                                           linewidth=5))
        ax.plot([(bh[0] + bh[2]) / 2, (bo[0] + bo[2]) / 2],
                [(bh[1] + bh[3]) / 2, (bo[1] + bo[3]) / 2],
                color="tab:green", linewidth=2)
        txt = ax.text(bh[0], bh[1], f"{s:.2f}", fontsize=15,
                      fontweight="semibold", color="w")
        txt.set_path_effects([peff.withStroke(linewidth=5,
                                              foreground="#000000")])
    return _save(fig, out_path)


def draw_box_pairs(image, boxes_h, boxes_o, scores, labels, out_path,
                   top_k=10, action_names=None):
    """Top-k scoring pairs overview with action names."""
    import matplotlib.patches as patches

    order = np.argsort(-np.asarray(scores))[:top_k]
    fig, ax = _fig_ax(image)
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
    return _save(fig, out_path)


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
    parser.add_argument("--action", type=int, default=None,
                        help="render only this action id's pairs")
    parser.add_argument("--failure", action="store_true",
                        help="with --action: render pairs BELOW the "
                        "score threshold (reference inference.py:355)")
    parser.add_argument("--action-score-thresh", type=float, default=0.2)
    args = parser.parse_args(argv)
    from ..utils.config import RunConfig
    import dataclasses
    cfg = RunConfig(**{f.name: getattr(args, f.name)
                       for f in dataclasses.fields(RunConfig)})

    model_cfg = make_model_config(cfg)
    factory = DataFactory(cfg.dataset, "test2015" if cfg.dataset == "hicodet"
                          else "test", cfg.data_root, training=False,
                          host_clip_stream=cfg.host_clip_stream)
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
    feed = {
        "images": batch.images, "image_sizes": batch.image_sizes,
        "clip_sizes": batch.clip_sizes,
        "boxes_h": batch.boxes_h, "boxes_o": batch.boxes_o,
        "labels": batch.labels, "gt_valid": batch.gt_valid}
    if batch.images_clip is not None:
        feed["images_clip"] = batch.images_clip
    out = step(trainable, frozen, buffers, feed)

    # rebuild the dense (P, C) matrix from the compact LUT-gathered form
    # (np.maximum.at: LUT pad slots carry zeros and scores are >= 0, so
    # they can never clobber a real verb-0 entry)
    cmp = np.asarray(out["detection_scores"])[0]
    verbs = np.asarray(out["detection_verbs"])[0]
    P = cmp.shape[0]
    scores_mat = np.zeros((P, model_cfg.upt.num_classes), cmp.dtype)
    np.maximum.at(scores_mat,
                  (np.repeat(np.arange(P), cmp.shape[1]), verbs.ravel()),
                  cmp.ravel())
    boxes = np.asarray(out["boxes"])[0]
    objects = np.asarray(out["objects"])[0]
    pair_valid = np.asarray(out["pair_valid"])[0]
    px, py = (np.asarray(x) for x in pair_indices(model_cfg.upt.proposals))

    # boxes live in the CLIP frame; rescale to the original image size
    # (reference visualise_entire_image :335-341)
    image = factory.dataset.load_image(args.index)
    ow, oh = image.size
    h, w = np.asarray(batch.clip_sizes[0])
    boxes = boxes * np.asarray([ow / w, oh / h, ow / w, oh / h])

    ps, cs = np.nonzero(scores_mat)
    sc = scores_mat[ps, cs]
    names = (HICO.hoi_prompts if cfg.num_classes == 600
             else HICO.verbs_sentence)

    if args.action is not None:
        # one figure for the requested action (scores >= thresh, or
        # < thresh in --failure mode)
        m = cs == args.action
        m &= ((sc < args.action_score_thresh) if args.failure
              else (sc >= args.action_score_thresh))
        out_path = os.path.join(
            cfg.output_dir,
            f"vis_{args.index:06d}_action_{args.action:03d}"
            f"{'_failure' if args.failure else ''}.png")
        draw_action_pairs(image, boxes[px[ps[m]]], boxes[py[ps[m]]],
                          sc[m], out_path)
        print(f"saved {out_path} ({int(m.sum())} pairs, "
              f"action '{names[args.action]}')")
        return

    # numbered instance boxes (reference draw_boxes figure): every slot
    # that participates in a valid pair
    valid_pairs = np.nonzero(pair_valid)[0]
    used = (np.unique(np.concatenate([px[valid_pairs], py[valid_pairs]]))
            if len(valid_pairs) else np.arange(0))
    # printed indices must match the numbers rendered in the boxes figure,
    # which counts positions within `used` (reference keeps them consistent)
    slot_no = {int(slot): i + 1 for i, slot in enumerate(used)}

    # print every predicted action with pair indices, score, object name
    # (reference :377-387); instance indices are 1-based like the figures
    thresh_keep = sc >= args.action_score_thresh
    for verb in np.unique(cs[thresh_keep]):
        print(f"\n=> Action: {names[int(verb)]}")
        for j in np.nonzero((cs == verb) & thresh_keep)[0]:
            hi = slot_no.get(int(px[ps[j]]), int(px[ps[j]]) + 1)
            oi = slot_no.get(int(py[ps[j]]), int(py[ps[j]]) + 1)
            print(f"({hi:<2}, {oi:<2}), "
                  f"score: {sc[j]:.4f}, "
                  f"object: {HICO.objects[int(objects[ps[j]])]}.")
    boxes_path = os.path.join(cfg.output_dir, f"vis_{args.index:06d}_boxes.png")
    draw_boxes(image, boxes[used], boxes_path)

    out_path = os.path.join(cfg.output_dir, f"vis_{args.index:06d}.png")
    draw_box_pairs(image, boxes[px[ps[thresh_keep]]], boxes[py[ps[thresh_keep]]],
                   sc[thresh_keep], cs[thresh_keep], out_path,
                   action_names=names)
    print(f"saved {boxes_path}, {out_path} ({int(thresh_keep.sum())} pairs "
          f"above {args.action_score_thresh})")


if __name__ == "__main__":
    main()
