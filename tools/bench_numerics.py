"""Full-graph ACCURACY A/B of the production numerics toggles.

bench_ab_fused.py answers "is it faster?"; this answers "does it change the
numbers?".  The parity suites certify the f32/XLA/host-stream path against
the torch reference (which runs fp32 — autocast is commented out at
/root/reference/utils_tip_cache_and_union_finetune.py:335); the production
TPU path additionally enables {bf16 towers, fused Pallas attention,
pallas_cache, device-derived 224 stream}.  This tool bounds the per-class
AP / mAP / raw-score drift each toggle introduces, vs a float32 +
highest-matmul-precision + XLA + host-stream baseline, on a synthetic
fixture through the REAL eval CLI (cli.main_finetune --eval: full DETR-R50
+ ViT-B/16 + DINO towers, proposals, association, 600-class AP).

Random weights score random classes, so a fixture with arbitrary GT gives
mAP == 0 for every variant and the AP comparison is degenerate.  We make
the AP axis live with a SELF-REFERENTIAL fixture: pass A runs the baseline
on throwaway GT and re-authors each image's GT at the baseline's own
top-scoring detections (boxes mapped back to original pixels — the eval
resize is affine per axis, so IoU associations survive exactly); pass B
then evaluates every variant on the authored fixture.  The baseline scores
high mAP on its own predictions by construction, and any toggle-induced
score/rank/proposal perturbation shows up as AP drift.

All variants share one process, one fixture, and one seed (identical f32
weights — HOIModelConfig.dtype only casts activations).  Raw-score drift is
reported only when the variant selects the *same proposals* as the
baseline (same boxes/objects); otherwise the detection rows don't align
and only the AP-level comparison is meaningful.

Usage (on the TPU chip — the Pallas toggles are inert on CPU):
    python tools/bench_numerics.py [--images 12] [--batch 4]
        [--variants bf16,production] [--json out.json]
"""
import argparse
import contextlib
import faulthandler
import importlib.util
import json
import os
import shutil
import signal
import sys
import tempfile
import time

# diagnosis hook: `kill -USR1 <pid>` dumps all thread stacks to stderr
# without killing the run (compiles through the axon relay can take
# minutes; this separates "slow" from "stuck")
faulthandler.register(signal.SIGUSR1)

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_make_fixture():
    spec = importlib.util.spec_from_file_location(
        "make_fixture", os.path.join(ROOT, "tools", "make_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# per-query detection perturbation shared by every variant (see
# patched_detr in run_variant): 100 queries, 25 persons (class 0) + 75
# seeded object classes at +8.0 logits, and seeded spread boxes
_Q = 100
_rngp = np.random.default_rng(11)
_CLASSES = _rngp.integers(1, 80, _Q)
_CLASSES[:25] = 0
_LOGIT_OFF = np.zeros((_Q, 81), np.float32)
_LOGIT_OFF[range(_Q), _CLASSES] = 8.0
_BOX_CANNED = _rngp.uniform(0.15, 0.85, (_Q, 4)).astype("float32")
_BOX_CANNED[:, 2:] = _rngp.uniform(0.15, 0.45, (_Q, 2))


# toggle set: (dtype, clip_fused, detr_fused, pallas_cache, host_stream,
#              matmul_precision)
VARIANTS = {
    # the configuration the parity suites certify (CPU f32 runs under
    # jax_default_matmul_precision=highest; see tests/conftest.py)
    "baseline":     ("float32", False, False, False, True,  "highest"),
    # this JAX build defaults f32 matmuls to bf16 MXU passes — quantify
    # that default alone before any explicit toggle
    "f32_mxu":      ("float32", False, False, False, True,  None),
    "bf16":         ("bfloat16", False, False, False, True,  None),
    # CAVEAT rows: the production EVAL path disables the CLIP fused
    # attention regardless (engine/hoi_model.py:60-66, measured XLA win),
    # and the DETR fused path requires bf16 (detr/model.py:139) — so both
    # f32 rows are inert BY DESIGN and certify exactly that (drift == 0).
    "clip_fused":   ("float32", True,  False, False, True,  "highest"),
    "detr_fused":   ("float32", False, True,  False, True,  "highest"),
    # the DETR fused kernel at its production dtype, isolated (diff
    # against the plain bf16 row, not against the f32 baseline)
    "bf16_detr_fused": ("bfloat16", False, True, False, True, None),
    "pallas_cache": ("float32", False, False, True,  True,  "highest"),
    "dev_stream":   ("float32", False, False, False, False, "highest"),
    # what bench.py / the CLI defaults actually run on TPU
    "production":   ("bfloat16", True,  True,  True,  False, None),
}


def _make_cfg(name, spec, data_root, out_root, batch, seed):
    from hoigen_tpu.utils.config import RunConfig
    dtype, _, _, pallas, host_stream, _ = spec
    return RunConfig(
        data_root=data_root, output_dir=os.path.join(out_root, name),
        eval=True, batch_size=batch, num_workers=2, num_classes=117,
        seed=seed, devices=1, generate_feature=False,
        dtype=dtype, use_pallas_cache=pallas, host_clip_stream=host_stream)


def run_variant(name, spec, data_root, out_root, batch, seed, captured,
                canned_detr=False):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import hoigen_tpu.cli.main_finetune as mf

    dtype, clip_f, detr_f, pallas, host_stream, prec = spec
    orig_mmc = mf.make_model_config

    def patched_mmc(cfg):
        mc = orig_mmc(cfg)
        return dataclasses.replace(
            mc,
            clip=dataclasses.replace(mc.clip, fused_attention=clip_f),
            detr=dataclasses.replace(mc.detr, fused_encoder_attention=detr_f))

    import hoigen_tpu.engine.hoi_model as hm

    orig_detr = hm.detr_forward

    def patched_detr(params, images, mask, dcfg):
        # A RANDOM-INIT decoder collapses to query-INDEPENDENT outputs
        # (measured: all 100 queries share one class score 0.0729, box cx
        # std 1.6e-7) -> zero humans, NMS keeps one box, no pairs, and the
        # whole AP axis is dead. The REAL tower still runs — we add a
        # per-query CONSTANT perturbation (identical for every variant) on
        # top: +8.0 logits at a seeded class per query (25 persons) and a
        # 50/50 blend with seeded spread boxes. Variant-induced tower
        # drift still propagates additively into the final detections
        # (boxes at half weight), so the drift comparison stays live.
        out = dict(orig_detr(params, images, mask, dcfg))
        lo = jnp.asarray(_LOGIT_OFF, out["pred_logits"].dtype)
        bc = jnp.asarray(_BOX_CANNED, out["pred_boxes"].dtype)
        if canned_detr:
            # fixed-proposals mode: detections are pure constants, so
            # EVERY variant selects identical proposals and the per-row
            # score drift of the trained path (CLIP adapters + cache +
            # text + head) is directly comparable — the dtype variants'
            # free-running proposal flips (near-tied random-weight scores
            # reordering top-k) no longer mask it.
            b = out["pred_logits"].shape[0]
            out["pred_logits"] = jnp.broadcast_to(
                lo, (b,) + lo.shape).astype(out["pred_logits"].dtype)
            out["pred_boxes"] = jnp.broadcast_to(
                bc, (b,) + bc.shape).astype(out["pred_boxes"].dtype)
        else:
            out["pred_logits"] = out["pred_logits"] + lo
            out["pred_boxes"] = 0.5 * out["pred_boxes"] + 0.5 * bc
        return out

    orig_eval = mf.evaluate_hico
    rows = {"scores": [], "verbs": [], "boxes": [], "objects": [],
            "clip_sizes": []}

    def patched_eval(run_batches, *a, **k):
        def tee():
            for out, b in run_batches:
                rows["scores"].append(np.asarray(out["detection_scores"],
                                                 np.float64))
                if "detection_verbs" in out:
                    rows["verbs"].append(np.asarray(out["detection_verbs"]))
                rows["boxes"].append(np.asarray(out["boxes"]))
                rows["objects"].append(np.asarray(out["objects"]))
                rows["clip_sizes"].append(np.asarray(b.clip_sizes))
                yield out, b
        return orig_eval(tee(), *a, **k)

    cfg = _make_cfg(name, spec, data_root, out_root, batch, seed)
    ctx = (jax.default_matmul_precision(prec) if prec
           else contextlib.nullcontext())
    mf.make_model_config = patched_mmc
    mf.evaluate_hico = patched_eval
    hm.detr_forward = patched_detr
    try:
        with ctx:
            result = mf.main(cfg)
    finally:
        mf.make_model_config = orig_mmc
        mf.evaluate_hico = orig_eval
        hm.detr_forward = orig_detr
    captured[name] = {
        "ap": np.asarray(result["ap"], np.float64),
        "mAP": float(result["mAP"]),
        "scores": np.concatenate(rows["scores"], axis=0),
        "verbs": (np.concatenate(rows["verbs"], axis=0)
                  if rows["verbs"] else None),
        "boxes": np.concatenate(rows["boxes"], axis=0),
        "objects": np.concatenate(rows["objects"], axis=0),
        "clip_sizes": np.concatenate(rows["clip_sizes"], axis=0),
    }


def author_fixture(cap, spec, dummy_root, out_root, batch, seed, top_k=3):
    """Rewrite the fixture's GT at the baseline's own top detections.

    Detection boxes live in the CLIP-transform frame (clip_sizes pixels);
    the annotation JSON wants original-image pixels.  Per-axis affine
    scaling preserves IoU, so GT authored at det_box * orig/clip re-lands
    exactly on the detections after the forward transform.
    """
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.engine.eval import _extract_detections
    from hoigen_tpu.labels import HICO
    from hoigen_tpu.models.proposals import pair_indices

    cfg = _make_cfg("author", spec, dummy_root, out_root, batch, seed)
    px, py = (np.asarray(x) for x in
              pair_indices(mf.make_model_config(cfg).upt.proposals))
    conv = HICO.object_n_verb_to_interaction

    inst = json.load(open(os.path.join(dummy_root,
                                       "instances_test2015.json")))
    n_img = len(inst["filenames"])
    assert cap["scores"].shape[0] == n_img, \
        (cap["scores"].shape, n_img)

    # pass 1: extract every image's detections once. With random weights
    # the (s_h*s_o)^2.8 prior factor is ~content-invariant, so a plain
    # top-k-by-score authors the SAME few classes in every image and the
    # per-class AP drowns in cross-image ties (measured: 9 distinct hoi
    # over 32 images). Rank instead by the score's margin over that
    # class's cross-image mean — the content-driven part of the score —
    # so each image's authored GT is where ITS detections genuinely beat
    # the other images', and per-class AP ranks on real signal.
    dets = []
    for i in range(n_img):
        det = _extract_detections(
            cap["scores"][i], cap["boxes"][i], cap["objects"][i], px, py,
            None if cap["verbs"] is None else cap["verbs"][i])
        inter = conv[det["objects"], det["verbs"]]
        dets.append((det, inter))
    best = {}                          # class -> per-image best score
    for i, (det, inter) in enumerate(dets):
        for c in np.unique(inter[inter >= 0]):
            m = float(det["scores"][inter == c].max())
            best.setdefault(int(c), []).append(m)
    classmean = {c: float(np.mean(v)) for c, v in best.items()}

    new_annos = []
    n_authored = 0
    for i, (det, inter) in enumerate(dets):
        keep = inter >= 0
        if not keep.any():
            new_annos.append(inst["annotation"][i])   # keep dummy GT
            continue
        rel = det["scores"] - np.asarray(
            [classmean.get(int(c), 0.0) for c in inter])
        order = np.argsort(np.where(keep, rel, -np.inf))[::-1]
        order = order[keep[order]]
        inter_k = inter[order]
        # top_k by relative score with DISTINCT interactions (one GT per
        # class per image keeps the association unambiguous)
        _, first = np.unique(inter_k, return_index=True)
        pick = order[np.sort(first)[:top_k]]
        w_o, h_o = inst["size"][i]
        ch, cw = cap["clip_sizes"][i]
        sc = np.asarray([w_o / cw, h_o / ch, w_o / cw, h_o / ch])
        new_annos.append({
            "boxes_h": (det["boxes_h"][pick] * sc).tolist(),
            "boxes_o": (det["boxes_o"][pick] * sc).tolist(),
            "hoi": inter[pick].tolist(),
            "verb": det["verbs"][pick].tolist(),
            "object": det["objects"][pick].tolist(),
        })
        n_authored += 1

    root = os.path.join(out_root, "authored_fixture")
    img_src = os.path.join(dummy_root, "hico_20160224_det", "images")
    img_dst = os.path.join(root, "hico_20160224_det", "images")
    os.makedirs(os.path.dirname(img_dst), exist_ok=True)
    if not os.path.exists(img_dst):
        shutil.copytree(img_src, img_dst, symlinks=True)
    inst = dict(inst, annotation=new_annos)
    for split in ("train2015", "test2015"):
        json.dump(inst, open(os.path.join(root,
                                          f"instances_{split}.json"), "w"))
    print(f"[numerics] authored GT from baseline detections on "
          f"{n_authored}/{n_img} images", file=sys.stderr)
    if n_authored < n_img // 2:
        sys.exit(f"[numerics] DEGENERATE FIXTURE: only {n_authored}/{n_img}"
                 " images got authored GT — the AP axis would be dead."
                 " (Did the bbox-head spread in run_variant stop working?)")
    return root


def compare(base, var):
    d_ap = var["ap"] - base["ap"]
    out = {
        "mAP": var["mAP"],
        "dmAP": var["mAP"] - base["mAP"],
        "max_abs_dAP": float(np.abs(d_ap).max()),
        "classes_dAP_gt_1e-3": int((np.abs(d_ap) > 1e-3).sum()),
    }
    same_props = (var["boxes"].shape == base["boxes"].shape
                  and np.array_equal(var["objects"], base["objects"])
                  and np.allclose(var["boxes"], base["boxes"],
                                  atol=1e-2, rtol=0))
    out["proposals_match"] = bool(same_props)
    if same_props:
        out["max_abs_dscore"] = float(
            np.abs(var["scores"] - base["scores"]).max())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma-separated subset (baseline always runs)")
    ap.add_argument("--json", default=None, help="write results here too")
    ap.add_argument("--canned-detr", action="store_true",
                    help="fixed-proposals mode: pure-constant detections "
                         "(identical for every variant) so dtype variants "
                         "get an aligned per-row score drift of the "
                         "trained path")
    args = ap.parse_args()

    names = [v for v in args.variants.split(",") if v]
    for v in names:
        if v not in VARIANTS:
            sys.exit(f"unknown variant {v!r}; choose from {list(VARIANTS)}")
    if "baseline" not in names:
        names.insert(0, "baseline")

    mk = _load_make_fixture()
    tmp = tempfile.mkdtemp(prefix="hoigen_numerics_")
    dummy_root = mk.build(os.path.join(tmp, "data"), n_images=args.images,
                          seed=args.seed)

    import jax
    print(f"[numerics] backend={jax.default_backend()} "
          f"images={args.images} batch={args.batch}", file=sys.stderr)
    if jax.default_backend() != "tpu":
        print("[numerics] WARNING: not on TPU — the Pallas toggles are "
              "inert here (fused_attention/pallas_cache fall back to XLA)",
              file=sys.stderr)

    # pass A: baseline on dummy GT -> author the real fixture
    authored = {}
    print("[numerics] pass A: baseline on dummy GT (authoring) ...",
          file=sys.stderr, flush=True)
    run_variant("author", VARIANTS["baseline"], dummy_root, tmp,
                args.batch, args.seed, authored,
                canned_detr=args.canned_detr)
    data_root = author_fixture(authored["author"], VARIANTS["baseline"],
                               dummy_root, tmp, args.batch, args.seed)

    # pass B: every variant on the authored fixture
    captured = {}
    for name in names:
        print(f"[numerics] running {name} ... "
              f"(t={time.strftime('%H:%M:%S')})", file=sys.stderr,
              flush=True)
        run_variant(name, VARIANTS[name], data_root, tmp, args.batch,
                    args.seed, captured, canned_detr=args.canned_detr)

    base = captured["baseline"]
    # the 600-class mean dilutes (only ~top_k * images distinct classes
    # carry authored GT), so gate on the count of LIVE classes instead
    if int((base["ap"] > 0).sum()) < 10:
        sys.exit(f"[numerics] only {int((base['ap'] > 0).sum())} classes "
                 "with AP>0 on the baseline's OWN authored detections — "
                 "the AP axis is dead; aborting rather than reporting "
                 "vacuous zero drift.")
    report = {"backend": jax.default_backend(), "images": args.images,
              "batch": args.batch, "seed": args.seed,
              "canned_detr": bool(args.canned_detr),
              "baseline_mAP": base["mAP"], "variants": {}}
    nonzero = int((base["ap"] > 0).sum())
    print(f"\nbaseline: mAP {base['mAP']:.6f} "
          f"({nonzero} classes with AP>0)")
    hdr = (f"{'variant':<14}{'mAP':>10}{'dmAP':>12}{'max|dAP|':>12}"
           f"{'#cls>1e-3':>11}{'props':>7}{'max|dscore|':>13}")
    print(hdr)
    for name in names:
        if name == "baseline":
            continue
        c = compare(base, captured[name])
        report["variants"][name] = c
        ds = (f"{c['max_abs_dscore']:.3e}" if "max_abs_dscore" in c
              else "n/a")
        print(f"{name:<14}{c['mAP']:>10.6f}{c['dmAP']:>12.2e}"
              f"{c['max_abs_dAP']:>12.2e}{c['classes_dAP_gt_1e-3']:>11d}"
              f"{str(c['proposals_match']):>7}{ds:>13}")
    if "bf16" in captured and "bf16_detr_fused" in captured:
        # the DETR fused kernel at its production dtype, isolated against
        # the plain-bf16 tower (not the f32 baseline)
        c = compare(captured["bf16"], captured["bf16_detr_fused"])
        report["bf16_detr_fused_vs_bf16"] = c
        ds = (f"{c['max_abs_dscore']:.3e}" if "max_abs_dscore" in c
              else "n/a")
        print(f"{'^fused vs bf16':<14}{c['mAP']:>10.6f}{c['dmAP']:>12.2e}"
              f"{c['max_abs_dAP']:>12.2e}{c['classes_dAP_gt_1e-3']:>11d}"
              f"{str(c['proposals_match']):>7}{ds:>13}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[numerics] wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
