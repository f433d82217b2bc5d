"""Composed V-COCO cache parity: the SAME fixture and transplanted weights
through the REAL reference V-COCO pipeline (DataFactory('vcoco'),
UPT with dataset='vcoco' incl. the 92->81 reserve_indices logit gather,
CustomisedDLE.cache_vcoco writing cache.pkl) and through
``cli.main_finetune --dataset vcoco --cache``, asserting the dumped
CacheTemplate entries agree. The reference's in-repo V-COCO eval raises
NotImplementedError (main_tip_finetune.py:912), so cache.pkl IS the entire
V-COCO eval-side surface; as a bonus the in-repo role AP (beyond parity)
must produce identical numbers on both dumps.

Reference anchors: utils_tip_cache_and_union_finetune.py:494-540
(cache_vcoco + CacheTemplate), :72-92 (vcoco DataFactory paths),
upt_tip...py:575-581,1600-1602 (reserve_indices), vcoco/vcoco.py:153-160
(object_to_action).
"""
import json
import os
import pickle
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hoigen_tpu.labels.vcoco import VCOCO_LABELS  # noqa: E402
from test_e2e_map_parity import (_CannedDETR, _ClipHead, _RefArgs,  # noqa: E402
                                 _tiny_clip_sd, C as _HICO_C, EMB, L_T, L_V,
                                 CTX, PATCH, RES, Q, SEED, W_T, W_V)

C = 24                      # V-COCO action classes
N_IMAGES = 5
IMG_SIZES = [(64, 48), (80, 56), (72, 64), (96, 72), (60, 60)]


def _canned_detections_92():
    """Q fixed detections with a 92-wide COCO head: 4 humans (raw slot 1)
    + objects on real (non-N/A) raw slots — exercises the reserve_indices
    gather on both sides."""
    from hoigen_tpu.labels.vcoco import COCO_91_CLASSES
    rng = np.random.default_rng(SEED)
    real = [i for i, n in enumerate(COCO_91_CLASSES)
            if n != "N/A" and i != 1]
    logits = rng.normal(0, 0.3, (1, Q, 92)).astype(np.float32)
    for q in range(Q):
        if q < 4:
            cls = 1                                  # raw person slot
        elif q < 18:
            cls = real[((q - 4) * 7) % len(real)]
        else:
            logits[0, q, :] = 0.0
            continue
        logits[0, q, cls] += 2.0 + 0.3 * q
    centers = rng.uniform(0.3, 0.7, (1, Q, 2))
    sizes = rng.uniform(0.2, 0.35, (1, Q, 2))
    boxes = np.concatenate([centers, sizes], -1).astype(np.float32)
    return logits, boxes


def _write_vcoco_fixture(root):
    from PIL import Image
    rng = np.random.default_rng(SEED + 1)
    actions = [f"verb{i} obj" for i in range(C)]
    objects = ["background"] + [f"obj{i}" for i in range(80)]
    for part, img_dir_name, n in (("trainval", "train2014", N_IMAGES),
                                  ("test", "val2014", N_IMAGES)):
        img_dir = os.path.join(root, "images", img_dir_name)
        os.makedirs(img_dir, exist_ok=True)
        prefix = f"COCO_{img_dir_name}"
        annos, images = [], []
        for i in range(n):
            w, h = IMG_SIZES[i]
            name = f"{prefix}_{i:012d}.jpg"
            Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                         dtype=np.uint8)) \
                .save(os.path.join(img_dir, name))
            k = int(rng.integers(1, 3))
            annos.append({
                "boxes_h": [[2.0, 2.0, 30.0, 30.0]] * k,
                "boxes_o": [[5.0, 5.0, 40.0, 40.0]] * k,
                # spread actions/objects so the derived object_to_action
                # covers many pairs on the trainval side
                "actions": [(3 * i + j) % C for j in range(k)],
                "objects": [1 + (7 * i + 11 * j) % 80 for j in range(k)],
                "file_name": name})
            images.append(1000 + i)
        # a non-trivial valid-object table: each action maps to a few
        # objects (the runtime prior inverts this field,
        # vcoco/vcoco.py:152-160)
        inst = {"annotations": annos, "classes": actions,
                "objects": objects, "images": images,
                "action_to_object": [
                    sorted({1 + a % 80, 1 + (3 * a + 7) % 80,
                            1 + (11 * a + 29) % 80})
                    for a in range(C)]}
        json.dump(inst, open(os.path.join(
            root, f"instances_vcoco_{part}.json"), "w"))


def _vcoco_pkl(tmp):
    """Synthetic vcoco pair-embedding pkl: exactly num_shot (2) rows per
    action class. The reference's gen_feat eval path multiplies the
    48-row GEN cache against the PKL-derived one_hots labels
    (gen_label_H = one_hots_H, upt_tip...py:477-489 vs :1156-1162), so it
    only shape-checks when every class contributes exactly num_shot pkl
    rows — true on the real vcoco pkl, enforced here."""
    rng = np.random.default_rng(SEED + 3)
    anno = {}
    for v in range(C):
        n = 2
        feats = rng.normal(0, 1, (3, n, EMB)).astype(np.float32)
        bh = rng.uniform(0, 50, (n, 2))
        bh = np.concatenate([bh, bh + rng.uniform(20, 40, (n, 2))], 1)
        bo = rng.uniform(0, 50, (n, 2))
        bo = np.concatenate([bo, bo + rng.uniform(20, 40, (n, 2))], 1)
        anno[f"vcoco_img_{v}.jpg"] = {
            "huamn_features": feats[0], "object_features": feats[1],
            "union_features": feats[2],
            "boxes_h": bh.astype(np.float32),
            "boxes_o": bo.astype(np.float32),
            "verbs": np.full(n, v, np.int64),
            "objects": np.full(n, 1 + v % 80, np.int64),
        }
    path = os.path.join(tmp, "vcoco_pairs.p")   # no 'hico' -> no 117 filter
    with open(path, "wb") as f:
        pickle.dump(anno, f)
    return path


def test_composed_vcoco_cache_parity(tmp_path, monkeypatch):
    from ref_eval_engine import load_ref_pipeline, make_engine
    from ref_upt import load_ref_upt
    from test_full_model_parity import _RefPostProcess

    import hoigen_tpu.cli.main_finetune as mf
    import hoigen_tpu.engine.hoi_model as hm
    from hoigen_tpu.engine.hoi_model import HOIModelConfig
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.detr import DETRConfig
    from hoigen_tpu.models.proposals import ProposalConfig
    from hoigen_tpu.models.upt import UPTConfig
    from hoigen_tpu.utils.config import RunConfig

    root = str(tmp_path / "data")
    os.makedirs(root)
    _write_vcoco_fixture(root)
    pkl_path = _vcoco_pkl(str(tmp_path))
    clip_sd = _tiny_clip_sd()
    clip_path = str(tmp_path / "tiny_clip.pt")
    torch.save(clip_sd, clip_path)

    from hoigen_tpu.cli.main_finetune import encode_class_texts
    from hoigen_tpu.labels import HICO
    from hoigen_tpu.models.clip import torch_state_dict_to_params
    clip_params_mine, clip_cfg_mine = torch_state_dict_to_params(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1, rng=jax.random.PRNGKey(66))
    origin_text = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                     VCOCO_LABELS.verbs_sentence)
    obj_emb = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                 [t for _, t in HICO.obj_text_label])

    # ---- reference model (dataset='vcoco') -------------------------------
    ref_upt = load_ref_upt()
    ref_pipe = load_ref_pipeline()
    ref_clip_mod = sys.modules["CLIP_models_adapter_prior2"]
    torch.manual_seed(SEED)
    ref_clip = ref_clip_mod.build_model(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1).float().eval()
    grng = np.random.default_rng(SEED + 2)
    gen_n = 236
    gen_feature = torch.as_tensor(
        grng.normal(0, 1, (3 * gen_n, EMB)).astype(np.float32))
    gen_target = torch.cat([torch.arange(gen_n)] * 3)
    gen_verb = torch.as_tensor(
        np.asarray([v for v, _ in VCOCO_LABELS.keys]))
    logits, boxes = _canned_detections_92()

    # the reference VCOCO class directly (the trainval DataFactory builds
    # TRAIN transforms, which the eval-oracle torchvision shim doesn't
    # provide); main only needs its object_to_action (main:850-851)
    VCOCORef = sys.modules["vcoco.vcoco"].VCOCO
    train_ds = VCOCORef(
        root=os.path.join(root, "images", "train2014"),
        anno_file=os.path.join(root, "instances_vcoco_trainval.json"))
    obj_to_target = list(train_ds.object_to_action.values())

    args = _RefArgs(pkl_path)
    args.dataset = "vcoco"
    args.cache = True
    model = ref_upt.UPT(
        args, None, None, None, None, None,
        gen_feature, gen_target, gen_verb, obj_to_target,
        _CannedDETR(logits, boxes), _RefPostProcess(),
        _ClipHead(ref_clip.visual),
        torch.as_tensor(origin_text), torch.as_tensor(obj_emb),
        human_idx=0, num_classes=C, alpha=0.5, gamma=0.2,
        box_score_thresh=0.2, fg_iou_thresh=0.5,
        min_instances=3, max_instances=15,
        object_class_to_target_class=obj_to_target,
        object_n_verb_to_interaction=VCOCO_LABELS
        .object_n_verb_to_interaction(),
        num_anno=None, use_mlp_proj=False)
    model = model.float().eval()

    ref_pt = str(tmp_path / "ref_vcoco_ckpt.pt")
    torch.save({"model_state_dict": model.state_dict(), "epoch": 1}, ref_pt)

    test_factory = ref_pipe.DataFactory("vcoco", "test", root, "ViT-B/16")
    loader = torch.utils.data.DataLoader(
        test_factory, batch_size=1, shuffle=False,
        collate_fn=ref_pipe.custom_collate)
    engine = make_engine(ref_pipe, model, loader, str(tmp_path),
                         num_classes=C, print_interval=10 ** 6)
    ref_dir = str(tmp_path / "ref_cache")
    engine.cache_vcoco(loader, ref_dir)
    import torch.distributed as dist
    if dist.is_initialized():
        dist.destroy_process_group()
    ref_results = pickle.load(
        open(os.path.join(ref_dir, "cache.pkl"), "rb"))
    assert len(ref_results) > 0

    # ---- this framework ---------------------------------------------------
    def fake_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.broadcast_to(jnp.asarray(logits),
                                                (b, Q, 92)),
                "pred_boxes": jnp.broadcast_to(jnp.asarray(boxes),
                                               (b, Q, 4))}

    monkeypatch.setattr(hm, "detr_forward", fake_detr_forward)

    def tiny_model_config(cfg):
        return HOIModelConfig(
            clip=CLIPConfig(embed_dim=EMB, image_resolution=RES,
                            vision_layers=L_V, vision_width=W_V,
                            vision_patch_size=PATCH, context_length=CTX,
                            transformer_width=W_T, transformer_layers=L_T,
                            adapter_layers=tuple(range(L_V))),
            detr=DETRConfig(num_classes=92),
            upt=UPTConfig(num_classes=C, num_shot=2,
                          visual_output_dim=EMB, clip_resolution=RES,
                          use_dino=False, use_clip_global=False,
                          cache_model="gen_feat",
                          hyper_lambda=cfg.hyper_lambda,
                          proposals=ProposalConfig(),
                          max_gt_pairs=cfg.max_gt_pairs,
                          generate_feature=False),
            dtype="float32")

    monkeypatch.setattr(mf, "make_model_config", tiny_model_config)
    monkeypatch.chdir(tmp_path)

    out_dir = str(tmp_path / "my_cache")
    mf.main(RunConfig(
        dataset="vcoco", data_root=root, output_dir=out_dir,
        cache=True, resume=ref_pt,
        clip_model_path=clip_path, file1=pkl_path,
        pretrained_detr=str(tmp_path / "missing_detr.pth"),
        dino=False, clip_global=False, generate_feature=False,
        num_classes=C, num_shot=2, batch_size=2, num_workers=0,
        max_gt_pairs=8, devices=1, seed=66))
    my_results = pickle.load(
        open(os.path.join(out_dir, "cache.pkl"), "rb"))

    # ---- compare entry multisets ------------------------------------------
    assert len(my_results) == len(ref_results)
    unmatched = list(my_results)
    for r in ref_results:
        hit = None
        for i, m in enumerate(unmatched):
            if set(m) != set(r) or m["image_id"] != r["image_id"]:
                continue
            ok = True
            for k in r:
                if k == "image_id":
                    continue
                ok &= np.allclose(np.asarray(m[k], np.float64),
                                  np.asarray(r[k], np.float64), atol=2e-3)
            if ok:
                hit = i
                break
        assert hit is not None, f"no match for reference entry {dict(r)}"
        unmatched.pop(hit)
    assert not unmatched

    # beyond parity: the in-repo role AP scores both dumps identically
    from hoigen_tpu.eval.vcoco_ap import evaluate_vcoco_results
    from hoigen_tpu.data.vcoco import VCOCODataset
    ds = VCOCODataset(os.path.join(root, "instances_vcoco_test.json"))
    rep_ref = evaluate_vcoco_results([dict(r) for r in ref_results], ds)
    rep_my = evaluate_vcoco_results([dict(r) for r in my_results], ds)
    for k in ("role_ap_scenario_1", "role_ap_scenario_2", "agent_ap"):
        np.testing.assert_allclose(rep_my[k]["mean"], rep_ref[k]["mean"],
                                   atol=1e-6)
