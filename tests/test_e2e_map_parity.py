"""Composed end-to-end mAP parity: the SAME on-disk HICO-DET fixture and
the SAME transplanted weights through

  * the reference eval engine — the real ``DataFactory`` transform chain,
    ``CustomisedDLE.test_hico`` loop, ``BoxPairAssociation`` and
    ``DetectionAPMeter`` (torch CPU, loaded by tests/ref_eval_engine.py), vs
  * ``cli.main_finetune --eval`` — this framework's full pipeline (reader,
    dual-stream transforms, collate, jitted model, host association/meter),

asserting the final per-class AP vector (and hence every reported mAP
aggregate: full/rare/non-rare and any zero-shot split) agrees.

The object detector is canned — the same fixed (Q, 81)/(Q, 4) detection
tensors injected on both sides (the reference via a stand-in ``detector``
module, ours via a patched ``detr_forward``) — because DETR itself has its
own golden-parity suite (tests/test_detr_parity.py) and torchvision's
ResNet is unavailable for the torch side. Everything downstream of the raw
DETR outputs runs for real on both sides: CLIP-stream PIL transforms,
postprocess scaling, proposal selection, priors, the adapter-CLIP encoder,
roi_align, cache/text scoring, eval postprocessing, GT box recovery,
association and the AP meter. Ground truth is written in a second pass as a
subset of the (deterministic) detections so association produces real
positives and the APs are non-trivial.

Reference anchors: utils_tip_cache_and_union_finetune.py:348-411
(test_hico), :52-240 (DataFactory), main_tip_finetune.py:908-950 (mAP
reporting), pocket/pocket/utils/{meters,association}.py.
"""
import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hoigen_tpu.labels import HICO  # noqa: E402

C, EMB = 117, 32                  # verb classes, tiny CLIP embed dim
W_V, L_V, PATCH, RES = 64, 2, 32, 224
W_T, L_T, CTX, VOCAB = 64, 2, 77, 49408
Q = 20                            # canned detr queries (> max_instances)
NUM_SHOT = 2
SEED = 23


def _tiny_clip_sd(seed=SEED):
    """Tiny CLIP ViT at the real 224 resolution / 77 context / full BPE
    vocab (the CLI tokenizes real class texts), embed dim 32."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "visual.conv1.weight": r(W_V, 3, PATCH, PATCH),
        "visual.class_embedding": r(W_V),
        "visual.positional_embedding": r((RES // PATCH) ** 2 + 1, W_V),
        "visual.ln_pre.weight": 1 + 0.1 * r(W_V),
        "visual.ln_pre.bias": 0.1 * r(W_V),
        "visual.ln_post.weight": 1 + 0.1 * r(W_V),
        "visual.ln_post.bias": 0.1 * r(W_V),
        "visual.proj": r(W_V, EMB),
        "token_embedding.weight": r(VOCAB, W_T),
        "positional_embedding": r(CTX, W_T),
        "ln_final.weight": 1 + 0.1 * r(W_T),
        "ln_final.bias": 0.1 * r(W_T),
        "text_projection": r(W_T, EMB),
        "logit_scale": torch.tensor(np.log(1 / 0.07), dtype=torch.float32),
    }
    for scope, width, layers in (("visual.transformer", W_V, L_V),
                                 ("transformer", W_T, L_T)):
        for i in range(layers):
            p = f"{scope}.resblocks.{i}"
            sd.update({
                f"{p}.attn.in_proj_weight": r(3 * width, width),
                f"{p}.attn.in_proj_bias": 0.1 * r(3 * width),
                f"{p}.attn.out_proj.weight": r(width, width),
                f"{p}.attn.out_proj.bias": 0.1 * r(width),
                f"{p}.ln_1.weight": 1 + 0.1 * r(width),
                f"{p}.ln_1.bias": 0.1 * r(width),
                f"{p}.ln_2.weight": 1 + 0.1 * r(width),
                f"{p}.ln_2.bias": 0.1 * r(width),
                f"{p}.mlp.c_fc.weight": r(4 * width, width),
                f"{p}.mlp.c_fc.bias": 0.1 * r(4 * width),
                f"{p}.mlp.c_proj.weight": r(width, 4 * width),
                f"{p}.mlp.c_proj.bias": 0.1 * r(width),
            })
    return sd


def _canned_detections():
    """One fixed set of Q detections used for EVERY image on both sides:
    4 humans + 14 objects with well-separated scores, 2 below threshold."""
    rng = np.random.default_rng(SEED)
    logits = rng.normal(0, 0.3, (1, Q, 81)).astype(np.float32)
    for q in range(Q):
        if q < 4:
            cls = 0
        elif q < 18:
            cls = 1 + ((q - 4) * 11) % 79
        else:
            logits[0, q, :] = 0.0
            continue
        logits[0, q, cls] += 2.0 + 0.3 * q
    centers = rng.uniform(0.3, 0.7, (1, Q, 2))
    sizes = rng.uniform(0.2, 0.35, (1, Q, 2))
    boxes = np.concatenate([centers, sizes], -1).astype(np.float32)
    return logits, boxes


class _CannedDETR(torch.nn.Module):
    """Reference-side detector stand-in emitting the fixed detections
    (same plumbing as tests/test_full_model_parity._CannedDETR, B=1)."""

    def __init__(self, logits, boxes):
        super().__init__()
        self._logits = torch.as_tensor(logits)
        self._boxes = torch.as_tensor(boxes)
        self.input_proj = torch.nn.Identity()
        self.query_embed = types.SimpleNamespace(weight=torch.zeros(Q, 4))

    def backbone(self, nested):
        src, mask = nested.decompose()
        feat = types.SimpleNamespace(decompose=lambda: (src, mask))
        return [feat], [None]

    def transformer(self, src, mask, query, pos):
        return torch.zeros(1), torch.zeros(1)

    def class_embed(self, hs):
        return self._logits[None]

    def bbox_embed(self, hs):
        return types.SimpleNamespace(sigmoid=lambda: self._boxes[None])


class _ClipHead(torch.nn.Module):
    """Real nn.Module wrapper so the adapted visual tower (incl. its
    randomly initialized adapters) lands in the checkpoint state_dict."""

    def __init__(self, visual):
        super().__init__()
        self.image_encoder = visual
        self.dtype = torch.float32


class _RefArgs:
    def __init__(self, file1):
        # generate_feature=True selects the defined logits branch for
        # dino=False/clip_global=False (the generate_feature=False else at
        # upt_tip...py:1200-1209 omits that combination entirely); with
        # eval=True the gen path contributes nothing else to the forward
        self.generate_feature = True
        self.dataset = "hicodet"
        self.eval = True
        self.cache = False
        self.dino = False
        self.clip_global = False
        self.keep_datasets = 10 ** 9
        self.use_distill = False
        self.use_consistloss = False
        self.use_multi_hot = True
        self.obj_affordance = False
        self.logits_type = "HO+U+T"
        self.num_shot = NUM_SHOT
        self.file1 = file1
        self.zs = False
        self.zs_type = None
        self.label_choice = "random"
        self.cache_model = "gen_feat"
        self.prior_type = "cbe"
        self.use_weight_pred = False
        self.use_insadapter = True
        self.prior_method = 0
        self.hyper_lambda = 2.8
        self.pseudo_label = False
        self.tpt = False
        self.feat_mask_type = 0
        self.LA = False
        self.LA_weight = 0.6
        self.box_proj = 0


N_IMAGES = 6
IMG_SIZES = [(64, 48), (80, 56), (72, 64), (96, 72), (60, 60), (88, 48)]


def _write_fixture(root, annos):
    """instances json in the reference HICODet schema (boxes in 1-based
    pixel-index convention on x1/y1, hicodet/hicodet.py:289-312)."""
    names = [f"im_{i}.jpg" for i in range(N_IMAGES)]
    inst = {"annotation": annos, "filenames": names, "empty": [],
            "objects": HICO.objects, "verbs": HICO.verbs,
            "correspondence": HICO.class_corr,
            "size": [list(s) for s in IMG_SIZES]}
    for part in ("train2015", "test2015"):
        json.dump(inst, open(os.path.join(root,
                                          f"instances_{part}.json"), "w"))


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    from PIL import Image
    from ref_eval_engine import load_ref_pipeline, make_engine
    from ref_upt import load_ref_upt
    from test_full_model_parity import _RefPostProcess, _synthetic_pkl

    tmp = tmp_path_factory.mktemp("e2e_parity")
    root = str(tmp / "data")
    img_dir = os.path.join(root, "hico_20160224_det", "images")
    os.makedirs(os.path.join(img_dir, "train2015"))
    os.symlink(os.path.join(img_dir, "train2015"),
               os.path.join(img_dir, "test2015"))
    rng = np.random.default_rng(SEED + 1)
    for i, (w, h) in enumerate(IMG_SIZES):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(os.path.join(img_dir, "train2015", f"im_{i}.jpg"))

    # pass 0: provisional GT (one valid pair per image) just to load data
    hoi0, obj0, verb0 = HICO.class_corr[0]
    prov = [{"boxes_h": [[2.0, 2.0, 20.0, 20.0]],
             "boxes_o": [[4.0, 4.0, 24.0, 24.0]],
             "hoi": [hoi0], "verb": [verb0], "object": [obj0]}
            for _ in range(N_IMAGES)]
    _write_fixture(root, prov)

    # the synthetic pair-embedding pkl shared by both sides (117 classes,
    # D=32, 1-2 rows/class -> deterministic counts, no randperm truncation)
    pkl_path, counts = _synthetic_pkl(str(tmp))

    # tiny base CLIP checkpoint shared by both sides
    clip_sd = _tiny_clip_sd()
    clip_path = str(tmp / "tiny_clip.pt")
    torch.save(clip_sd, clip_path)

    # class-text embeddings computed ONCE with this framework's text
    # encoder and fed verbatim to the reference UPT (the computation's
    # parity vs the reference has its own suites; here it must only be
    # byte-identical on both sides)
    from hoigen_tpu.cli.main_finetune import encode_class_texts
    from hoigen_tpu.models.clip import torch_state_dict_to_params
    clip_params_mine, clip_cfg_mine = torch_state_dict_to_params(
        {k: v for k, v in clip_sd.items()}, use_adapter=True,
        adapter_pos="all", adapter_num_layers=1,
        rng=jax.random.PRNGKey(66))
    origin_text = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                     HICO.verbs_sentence)
    obj_emb = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                 [t for _, t in HICO.obj_text_label])

    # ---- reference model --------------------------------------------------
    ref_upt = load_ref_upt()
    ref_pipe = load_ref_pipeline()
    ref_clip_mod = sys.modules["CLIP_models_adapter_prior2"]
    torch.manual_seed(SEED)
    ref_clip = ref_clip_mod.build_model(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1).float().eval()
    grng = np.random.default_rng(SEED + 2)
    gen_n = 600
    gen_feature = torch.as_tensor(
        grng.normal(0, 1, (3 * gen_n, EMB)).astype(np.float32))
    gen_target = torch.cat([torch.arange(gen_n)] * 3)
    gen_verb = torch.as_tensor(np.asarray(HICO.hoi_to_verb))
    logits, boxes = _canned_detections()
    args = _RefArgs(pkl_path)
    model = ref_upt.UPT(
        args, None, None, None, None, None,
        gen_feature, gen_target, gen_verb, HICO.object_to_verb,
        _CannedDETR(logits, boxes), _RefPostProcess(),
        _ClipHead(ref_clip.visual),
        torch.as_tensor(origin_text), torch.as_tensor(obj_emb),
        human_idx=0, num_classes=C, alpha=0.5, gamma=0.2,
        box_score_thresh=0.2, fg_iou_thresh=0.5,
        min_instances=3, max_instances=15,
        object_class_to_target_class=HICO.object_to_verb,
        object_n_verb_to_interaction=HICO.object_n_verb_to_interaction,
        num_anno=torch.ones(C), use_mlp_proj=False)
    model = model.float().eval()

    def make_loader():
        factory = ref_pipe.DataFactory("hicodet", "test2015", root,
                                       "ViT-B/16")
        return torch.utils.data.DataLoader(
            factory, batch_size=1, shuffle=False,
            collate_fn=ref_pipe.custom_collate)

    # pass 0 run: collect the deterministic detections, then write GT as a
    # subset of them (exact box match -> association IoU 1.0 -> positives)
    conv = np.asarray(HICO.object_n_verb_to_interaction)
    annos = []
    loader = make_loader()
    all_dets = []
    with torch.no_grad():
        for batch in loader:
            all_dets.append(model(batch[0], batch[1])[0])
    # the common class anchored on image 0's top pair: >=13 GT instances
    # across the fixture pushes it past the rare threshold (>=10 train
    # instances) so the rare/non-rare split is non-degenerate
    sc0 = all_dets[0]["scores"].numpy()
    common = None
    for j in np.argsort(-sc0):
        hoi = int(conv[int(all_dets[0]["objects"][j]),
                       int(all_dets[0]["labels"][j])])
        if hoi >= 0:
            pair = all_dets[0]["pairing"][:, j]
            common = (hoi, int(all_dets[0]["objects"][j]),
                      int(all_dets[0]["labels"][j]),
                      all_dets[0]["boxes"][pair[0]].numpy(),
                      all_dets[0]["boxes"][pair[1]].numpy())
            break
    for i, dets in enumerate(all_dets):
        if True:
            sc = dets["scores"].numpy()
            order = np.argsort(-sc)
            bh, bo, hois, objs, verbs = [], [], [], [], []
            seen_hoi = set()
            for j in order:
                obj = int(dets["objects"][j])
                verb = int(dets["labels"][j])
                hoi = int(conv[obj, verb])
                if hoi < 0 or hoi in seen_hoi:
                    continue
                seen_hoi.add(hoi)
                pair = dets["pairing"][:, j]
                w, h = IMG_SIZES[i]
                scale = np.asarray([w / RES, h / RES, w / RES, h / RES])
                b_h = dets["boxes"][pair[0]].numpy() * scale
                b_o = dets["boxes"][pair[1]].numpy() * scale
                # json convention: x1/y1 are 1-based pixel indices
                bh.append([b_h[0] + 1, b_h[1] + 1, b_h[2], b_h[3]])
                bo.append([b_o[0] + 1, b_o[1] + 1, b_o[2], b_o[3]])
                hois.append(hoi)
                objs.append(obj)
                verbs.append(verb)
                if len(hois) == 2 + i % 2:
                    break
            # the common pair (exact + one shifted copy) in every image
            c_hoi, c_obj, c_verb, c_bh, c_bo = common
            w, h = IMG_SIZES[i]
            scale = np.asarray([w / RES, h / RES, w / RES, h / RES])
            for dx in (0.0, 1.5):
                b_h, b_o = c_bh * scale + dx, c_bo * scale - dx
                bh.append([b_h[0] + 1, b_h[1] + 1, b_h[2], b_h[3]])
                bo.append([b_o[0] + 1, b_o[1] + 1, b_o[2], b_o[3]])
                hois.append(c_hoi)
                objs.append(c_obj)
                verbs.append(c_verb)
            # one never-detected GT per image: a recall miss on both sides
            miss_hoi, miss_obj, miss_verb = HICO.class_corr[(37 * (i + 1))
                                                            % 600]
            bh.append([3.0, 3.0, 22.0, 20.0])
            bo.append([6.0, 5.0, 28.0, 26.0])
            hois.append(miss_hoi)
            objs.append(miss_obj)
            verbs.append(miss_verb)
            annos.append({"boxes_h": [[float(v) for v in b] for b in bh],
                          "boxes_o": [[float(v) for v in b] for b in bo],
                          "hoi": hois, "verb": verbs, "object": objs})
    _write_fixture(root, annos)

    # reference checkpoint for this framework's importer
    ref_pt = str(tmp / "ref_engine_ckpt.pt")
    torch.save({"model_state_dict": model.state_dict(), "epoch": 1}, ref_pt)

    # pass 1: the real reference eval engine on the final fixture
    loader = make_loader()
    engine = make_engine(ref_pipe, model, loader, str(tmp),
                         num_classes=C, print_interval=10 ** 6)
    ap_ref = engine.test_hico(loader, types.SimpleNamespace(
        dataset="hicodet"))
    ap_ref = np.asarray(ap_ref, np.float64)

    # tear down the single-process gloo group make_engine created: a live
    # group flips dist.is_initialized() for the rest of the pytest process
    # and sends the reference's train forward down its distributed branch,
    # which hardcodes device='cuda' (upt_tip...py:1338-1340) — that broke
    # test_full_model_parity::test_train_loss_parity when run after this
    # module.
    import torch.distributed as dist
    if dist.is_initialized():
        dist.destroy_process_group()

    return {"root": root, "tmp": str(tmp), "pkl": pkl_path,
            "clip_path": clip_path, "ref_pt": ref_pt, "ap_ref": ap_ref,
            "canned": (logits, boxes),
            "test_num_gt": np.asarray(
                loader.dataset.dataset.anno_interaction, np.float64)}


def test_composed_map_parity(harness, tmp_path, monkeypatch):
    import hoigen_tpu.cli.main_finetune as mf
    import hoigen_tpu.engine.hoi_model as hm
    from hoigen_tpu.engine.hoi_model import HOIModelConfig
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.detr import DETRConfig
    from hoigen_tpu.models.proposals import ProposalConfig
    from hoigen_tpu.models.upt import UPTConfig
    from hoigen_tpu.utils.config import RunConfig

    ap_ref = harness["ap_ref"]
    assert np.nansum(ap_ref) > 0, "reference produced no positives"

    logits, boxes = harness["canned"]

    def fake_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.broadcast_to(jnp.asarray(logits),
                                                (b, Q, 81)),
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
            detr=DETRConfig(num_classes=81),
            upt=UPTConfig(num_classes=C, num_shot=NUM_SHOT,
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

    result = mf.main(RunConfig(
        data_root=harness["root"], output_dir=str(tmp_path / "out"),
        eval=True, resume=harness["ref_pt"],
        clip_model_path=harness["clip_path"], file1=harness["pkl"],
        pretrained_detr=str(tmp_path / "missing_detr.pth"),
        dino=False, clip_global=False, generate_feature=False,
        num_classes=C, num_shot=NUM_SHOT, batch_size=2, num_workers=0,
        max_gt_pairs=8, devices=1, seed=66))

    ap_mine = np.asarray(result["ap"], np.float64)
    assert ap_mine.shape == ap_ref.shape == (600,)

    # the AP vectors must agree elementwise — this implies every aggregate
    # the reference prints (full/rare/non-rare, zs seen/unseen) agrees too
    np.testing.assert_allclose(ap_mine, ap_ref, atol=2e-3,
                               err_msg="per-class AP diverged")
    m_ref = float(np.mean(ap_ref))
    assert abs(result["mAP"] - m_ref) < 1e-3
    # rare split: <10 TRAIN instances (train == test fixture here)
    rare = harness["test_num_gt"] < 10
    assert abs(result["mAP_rare"] - float(ap_ref[rare].mean())) < 1e-3
    assert abs(result["mAP_non_rare"]
               - float(ap_ref[~rare].mean())) < 1e-3


def test_composed_cache_parity(harness, tmp_path, monkeypatch):
    """Official .mat dump composition parity: the REAL reference
    cache_hico (utils_tip...py:413-492 — original-size rescale,
    pixel-index conversion, per-interaction grouping, per-object file
    layout) vs `cli.main_finetune --cache` on the shared fixture and
    transplanted weights. Cells compare as row-sets (the reference groups
    via argsort, whose intra-class order is unspecified)."""
    import types as _types

    import scipy.io as sio

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

    clip_sd = torch.load(harness["clip_path"], weights_only=True)
    from hoigen_tpu.cli.main_finetune import encode_class_texts
    from hoigen_tpu.models.clip import torch_state_dict_to_params
    clip_params_mine, clip_cfg_mine = torch_state_dict_to_params(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1, rng=jax.random.PRNGKey(66))
    origin_text = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                     HICO.verbs_sentence)
    obj_emb = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                 [t for _, t in HICO.obj_text_label])

    ref_upt = load_ref_upt()
    ref_pipe = load_ref_pipeline()
    ref_clip_mod = sys.modules["CLIP_models_adapter_prior2"]
    torch.manual_seed(SEED)
    ref_clip = ref_clip_mod.build_model(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1).float().eval()
    grng = np.random.default_rng(SEED + 2)
    gen_feature = torch.as_tensor(
        grng.normal(0, 1, (3 * 600, EMB)).astype(np.float32))
    logits, boxes = harness["canned"]
    model = ref_upt.UPT(
        _RefArgs(harness["pkl"]), None, None, None, None, None,
        gen_feature, torch.cat([torch.arange(600)] * 3),
        torch.as_tensor(np.asarray(HICO.hoi_to_verb)), HICO.object_to_verb,
        _CannedDETR(logits, boxes), _RefPostProcess(),
        _ClipHead(ref_clip.visual),
        torch.as_tensor(origin_text), torch.as_tensor(obj_emb),
        human_idx=0, num_classes=C, alpha=0.5, gamma=0.2,
        box_score_thresh=0.2, fg_iou_thresh=0.5,
        min_instances=3, max_instances=15,
        object_class_to_target_class=HICO.object_to_verb,
        object_n_verb_to_interaction=HICO.object_n_verb_to_interaction,
        num_anno=torch.ones(C), use_mlp_proj=False)
    # exact weights of the harness run (removes construction randomness)
    sd = torch.load(harness["ref_pt"], weights_only=False)
    model.load_state_dict(sd["model_state_dict"])
    model = model.float().eval()

    factory = ref_pipe.DataFactory("hicodet", "test2015", harness["root"],
                                   "ViT-B/16")
    loader = torch.utils.data.DataLoader(
        factory, batch_size=1, shuffle=False,
        collate_fn=ref_pipe.custom_collate)
    engine = make_engine(ref_pipe, model, loader, harness["tmp"],
                         num_classes=C, print_interval=10 ** 6)
    ref_dir = str(tmp_path / "ref_mat")
    engine.cache_hico(loader, ref_dir)
    import torch.distributed as dist
    if dist.is_initialized():
        dist.destroy_process_group()

    def fake_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.broadcast_to(jnp.asarray(logits),
                                                (b, Q, 81)),
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
            detr=DETRConfig(num_classes=81),
            upt=UPTConfig(num_classes=C, num_shot=NUM_SHOT,
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

    out_dir = str(tmp_path / "my_mat")
    mf.main(RunConfig(
        data_root=harness["root"], output_dir=out_dir,
        cache=True, resume=harness["ref_pt"],
        clip_model_path=harness["clip_path"], file1=harness["pkl"],
        pretrained_detr=str(tmp_path / "missing_detr.pth"),
        dino=False, clip_global=False, generate_feature=False,
        num_classes=C, num_shot=NUM_SHOT, batch_size=2, num_workers=0,
        max_gt_pairs=8, devices=1, seed=66))

    n_nonempty = 0
    for obj in range(1, 81):
        a = sio.loadmat(os.path.join(ref_dir, f"detections_{obj:02d}.mat"),
                        )["all_boxes"]
        b = sio.loadmat(os.path.join(out_dir, f"detections_{obj:02d}.mat"),
                        )["all_boxes"]
        assert a.shape == b.shape, f"file {obj}: shape {a.shape}!={b.shape}"
        for idx in np.ndindex(a.shape):
            ra, rb = np.asarray(a[idx], np.float64), \
                np.asarray(b[idx], np.float64)
            if ra.size == 0 and rb.size == 0:
                continue
            assert ra.shape == rb.shape, f"file {obj} cell {idx}"
            # order-free row matching: intra-class order is argsort-
            # dependent in the reference, and sorting noisy floats can
            # flip near-ties — greedily pair each row instead
            used = np.zeros(len(rb), bool)
            for r in ra:
                d = np.abs(rb - r).max(axis=1)
                d[used] = np.inf
                j = int(d.argmin())
                assert d[j] < 2e-3, (obj, idx, r, rb[j])
                used[j] = True
            n_nonempty += 1
    assert n_nonempty > 10          # the fixture produces real detections


def _pick_zs_type(root):
    """A zs split whose unseen set intersects the fixture's DETECTED GT
    classes (GT minus the per-image never-detected 'miss' classes) — so
    unseen classes genuinely exercise the eval path."""
    inst = json.load(open(os.path.join(root, "instances_test2015.json")))
    gt = set()
    for a in inst["annotation"]:
        gt.update(a["hoi"])
    miss = {HICO.class_corr[(37 * (i + 1)) % 600][0]
            for i in range(N_IMAGES)}
    detected_gt = gt - miss
    for zt in ("rare_first", "non_rare_first", "uc0", "uc1", "uc2", "uc3",
               "uc4", "unseen_verb", "unseen_object"):
        if detected_gt & set(HICO.unseen_index[zt]):
            return zt
    raise AssertionError("no zs split intersects the fixture GT")


def test_composed_map_parity_zero_shot(harness, tmp_path, monkeypatch):
    """Same composed harness in ZERO-SHOT mode: the reference UPT is built
    with the zs-filtered table (zs_object_to_target,
    utils_tip...py:144-152) so its caches filter exactly like a zs run,
    then — as the reference main does at eval (main_tip_finetune.py:868-872)
    — the FULL table is swapped back in before test_hico. Our CLI runs with
    --zs --zs-type and must reproduce the per-class AP vector and the
    seen/unseen aggregates. Would have caught the filtered-prior-at-eval
    bug (unseen mAP identically 0)."""
    import types as _types

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

    zs_type = _pick_zs_type(harness["root"])
    filtered = set(HICO.unseen_index[zs_type])
    # zs_object_to_target: the train-time table with unseen pairs removed
    zs_map = [[] for _ in range(80)]
    for hoi, obj, verb in HICO.class_corr:
        if hoi not in filtered:
            zs_map[obj].append(verb)

    clip_sd = torch.load(harness["clip_path"], weights_only=True)
    from hoigen_tpu.cli.main_finetune import encode_class_texts
    from hoigen_tpu.models.clip import torch_state_dict_to_params
    clip_params_mine, clip_cfg_mine = torch_state_dict_to_params(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1, rng=jax.random.PRNGKey(66))
    origin_text = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                     HICO.verbs_sentence)
    obj_emb = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                 [t for _, t in HICO.obj_text_label])

    ref_upt = load_ref_upt()
    ref_pipe = load_ref_pipeline()
    ref_clip_mod = sys.modules["CLIP_models_adapter_prior2"]
    torch.manual_seed(SEED)
    ref_clip = ref_clip_mod.build_model(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1).float().eval()
    grng = np.random.default_rng(SEED + 2)
    gen_feature = torch.as_tensor(
        grng.normal(0, 1, (3 * 600, EMB)).astype(np.float32))
    gen_target = torch.cat([torch.arange(600)] * 3)
    gen_verb = torch.as_tensor(np.asarray(HICO.hoi_to_verb))
    logits, boxes = harness["canned"]
    args = _RefArgs(harness["pkl"])
    args.zs, args.zs_type = True, zs_type
    model = ref_upt.UPT(
        args, None, None, None, None, None,
        gen_feature, gen_target, gen_verb, HICO.object_to_verb,
        _CannedDETR(logits, boxes), _RefPostProcess(),
        _ClipHead(ref_clip.visual),
        torch.as_tensor(origin_text), torch.as_tensor(obj_emb),
        human_idx=0, num_classes=C, alpha=0.5, gamma=0.2,
        box_score_thresh=0.2, fg_iou_thresh=0.5,
        min_instances=3, max_instances=15,
        object_class_to_target_class=zs_map,
        object_n_verb_to_interaction=HICO.object_n_verb_to_interaction,
        num_anno=torch.ones(C), use_mlp_proj=False)
    model = model.float().eval()
    # the reference main's eval-time swap (main_tip_finetune.py:868-872)
    model.object_class_to_target_class = HICO.object_to_verb

    factory = ref_pipe.DataFactory("hicodet", "test2015", harness["root"],
                                   "ViT-B/16")
    loader = torch.utils.data.DataLoader(
        factory, batch_size=1, shuffle=False,
        collate_fn=ref_pipe.custom_collate)
    engine = make_engine(ref_pipe, model, loader, harness["tmp"],
                         num_classes=C, print_interval=10 ** 6)
    ap_ref = np.asarray(engine.test_hico(
        loader, _types.SimpleNamespace(dataset="hicodet")), np.float64)
    import torch.distributed as dist
    if dist.is_initialized():
        dist.destroy_process_group()
    assert np.nansum(ap_ref) > 0

    ref_pt = str(tmp_path / "ref_zs_ckpt.pt")
    torch.save({"model_state_dict": model.state_dict(), "epoch": 1}, ref_pt)

    def fake_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.broadcast_to(jnp.asarray(logits),
                                                (b, Q, 81)),
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
            detr=DETRConfig(num_classes=81),
            upt=UPTConfig(num_classes=C, num_shot=NUM_SHOT,
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

    result = mf.main(RunConfig(
        data_root=harness["root"], output_dir=str(tmp_path / "out_zs"),
        eval=True, resume=ref_pt, zs=True, zs_type=zs_type,
        clip_model_path=harness["clip_path"], file1=harness["pkl"],
        pretrained_detr=str(tmp_path / "missing_detr.pth"),
        dino=False, clip_global=False, generate_feature=False,
        num_classes=C, num_shot=NUM_SHOT, batch_size=2, num_workers=0,
        max_gt_pairs=8, devices=1, seed=66))

    ap_mine = np.asarray(result["ap"], np.float64)
    np.testing.assert_allclose(ap_mine, ap_ref, atol=2e-3,
                               err_msg="zs per-class AP diverged")
    unseen = np.zeros(600, bool)
    unseen[np.asarray(HICO.unseen_index[zs_type])] = True
    assert abs(result["mAP"] - float(ap_ref.mean())) < 1e-3
    assert abs(result["mAP_unseen"] - float(ap_ref[unseen].mean())) < 1e-3
    assert abs(result["mAP_seen"] - float(ap_ref[~unseen].mean())) < 1e-3
    # the fixture must actually exercise unseen classes at eval
    assert float(ap_ref[unseen].sum()) > 0


def _synthetic_pkl_600(tmp):
    """600-mode pair pkl: every interaction gets 1-2 rows (the reference's
    600-class load_cache_model does NOT zero-fill seen classes with no
    samples — torch.stack crashes — so full coverage is required, as on
    the real pkl)."""
    import pickle

    rng = np.random.default_rng(SEED + 7)
    anno = {}
    for i, (hoi, obj, verb) in enumerate(HICO.class_corr):
        n = 1 + (i % 2)
        feats = rng.normal(0, 1, (3, n, EMB)).astype(np.float32)
        bh = rng.uniform(0, 50, (n, 2))
        bh = np.concatenate([bh, bh + rng.uniform(20, 40, (n, 2))], 1)
        bo = rng.uniform(0, 50, (n, 2))
        bo = np.concatenate([bo, bo + rng.uniform(20, 40, (n, 2))], 1)
        anno[f"hico600_img_{i}.jpg"] = {
            "huamn_features": feats[0], "object_features": feats[1],
            "union_features": feats[2],
            "boxes_h": bh.astype(np.float32),
            "boxes_o": bo.astype(np.float32),
            "verbs": np.full(n, verb, np.int64),
            "objects": np.full(n, obj, np.int64),
        }
    path = os.path.join(tmp, "hico600_pairs.p")
    with open(path, "wb") as f:
        pickle.dump(anno, f)
    return path


def test_600_mode_reference_breakage_and_our_e2e(harness, tmp_path,
                                                monkeypatch):
    """600-interaction mode is BROKEN in the shipped reference: main
    hardcodes cache_model='gen_feat' + generate_feature=True
    (main_tip_finetune.py:444-445), and load_gen_model hardcodes
    num_classes=117 for hicodet (upt_tip...py:861), so at 600 classes the
    gen cache (117-space rows) cannot multiply the 600-space one_hots
    (gen_label_* = one_hots_*, :477-489 vs :1156-1162) — the forward
    raises. This test pins that breakage (no composed 600 oracle can
    exist against the shipped main) and then runs OUR 600-mode eval end
    to end on the same fixture."""
    from ref_eval_engine import load_ref_pipeline
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

    C6 = 600
    pkl600 = _synthetic_pkl_600(str(tmp_path))
    clip_sd = torch.load(harness["clip_path"], weights_only=True)
    from hoigen_tpu.cli.main_finetune import encode_class_texts
    from hoigen_tpu.models.clip import torch_state_dict_to_params
    clip_params_mine, clip_cfg_mine = torch_state_dict_to_params(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1, rng=jax.random.PRNGKey(66))
    origin_text = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                     HICO.hoi_prompts)
    obj_emb = encode_class_texts(clip_params_mine, clip_cfg_mine,
                                 [t for _, t in HICO.obj_text_label])

    ref_upt = load_ref_upt()
    ref_pipe = load_ref_pipeline()
    ref_clip_mod = sys.modules["CLIP_models_adapter_prior2"]
    torch.manual_seed(SEED)
    ref_clip = ref_clip_mod.build_model(
        dict(clip_sd), use_adapter=True, adapter_pos="all",
        adapter_num_layers=1).float().eval()
    grng = np.random.default_rng(SEED + 2)
    gen_feature = torch.as_tensor(
        grng.normal(0, 1, (3 * 600, EMB)).astype(np.float32))
    logits, boxes = harness["canned"]
    model = ref_upt.UPT(
        _RefArgs(pkl600), None, None, None, None, None,
        gen_feature, torch.cat([torch.arange(600)] * 3),
        torch.as_tensor(np.asarray(HICO.hoi_to_verb)), HICO.object_to_verb,
        _CannedDETR(logits, boxes), _RefPostProcess(),
        _ClipHead(ref_clip.visual),
        torch.as_tensor(origin_text), torch.as_tensor(obj_emb),
        human_idx=0, num_classes=C6, alpha=0.5, gamma=0.2,
        box_score_thresh=0.2, fg_iou_thresh=0.5,
        min_instances=3, max_instances=15,
        object_class_to_target_class=HICO.object_to_interaction,
        object_n_verb_to_interaction=HICO.object_n_verb_to_interaction,
        num_anno=torch.ones(C6), use_mlp_proj=False)
    model = model.float().eval()

    # the gen cache is 117-space while labels are 600-space: the shipped
    # reference cannot evaluate 600-mode — pin the exact failure
    factory = ref_pipe.DataFactory("hicodet", "test2015", harness["root"],
                                   "ViT-B/16")
    loader = torch.utils.data.DataLoader(
        factory, batch_size=1, shuffle=False,
        collate_fn=ref_pipe.custom_collate)
    batch = next(iter(loader))
    with torch.no_grad(), pytest.raises(RuntimeError,
                                        match="cannot be multiplied"):
        model(batch[0], batch[1])

    def fake_detr_forward(params, images, mask, cfg):
        b = images.shape[0]
        return {"pred_logits": jnp.broadcast_to(jnp.asarray(logits),
                                                (b, Q, 81)),
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
            detr=DETRConfig(num_classes=81),
            upt=UPTConfig(num_classes=C6, num_shot=NUM_SHOT,
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

    # no transplant: the broken reference ckpt carries 117-space gen rows
    # that cannot map onto a 600-space cache — run our 600 pipeline with
    # its own built cache instead
    result = mf.main(RunConfig(
        data_root=harness["root"], output_dir=str(tmp_path / "out600"),
        eval=True,
        clip_model_path=harness["clip_path"], file1=pkl600,
        pretrained_detr=str(tmp_path / "missing_detr.pth"),
        dino=False, clip_global=False, generate_feature=False,
        num_classes=C6, num_shot=NUM_SHOT, batch_size=2, num_workers=0,
        max_gt_pairs=8, devices=1, seed=66))

    # OUR 600-mode runs end to end on the same fixture (beyond the
    # shipped reference) with its own built cache
    ap_mine = np.asarray(result["ap"], np.float64)
    assert ap_mine.shape == (600,)
    assert np.isfinite(result["mAP"]) and np.nansum(ap_mine) >= 0
