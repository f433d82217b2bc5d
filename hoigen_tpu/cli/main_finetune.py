"""Train / evaluate / cache the HOI detector.

TPU-native equivalent of /root/reference/main_tip_finetune.py: one SPMD
program over a data mesh instead of mp.spawn+DDP; cache construction and
unseen-feature synthesis are batched jitted passes; checkpoints are Orbax.

  python -m hoigen_tpu.cli.main_finetune --data-root ./datasets ...
  python -m hoigen_tpu.cli.main_finetune --eval true --resume <ckpt> ...
  python -m hoigen_tpu.cli.main_finetune --cache true ...
"""
import os
import sys

import jax
import numpy as np

from ..data.factory import DataFactory, collate_batch, slice_batch
from ..data.loader import batch_indices, iter_batches
from ..engine.checkpoint import latest_checkpoint, restore_checkpoint, \
    save_checkpoint
from ..engine.eval import (cache_hico, cache_vcoco, evaluate_hico,
                           evaluate_vcoco)
from ..engine.hoi_model import HOIModelConfig, init_hoi_model, \
    make_eval_step, make_optimizer, make_train_step
from ..engine.train import Trainer
from ..labels import HICO, VCOCO_LABELS
from ..models.cache import UPTCaches, build_gen_cache, build_global_cache, \
    build_pair_cache, load_pair_annotations, random_caches
from ..models.clip.config import CLIPConfig, VIT_B16
from ..models.clip.model import encode_text, init_clip_params
from ..models.clip.tokenizer import tokenize
from ..models.detr import DETRConfig
from ..models.proposals import ProposalConfig
from ..models.upt import UPTConfig
from ..parallel import (gather_pyobj, global_batch_from_local, global_mesh,
                        host_local_rows, init_distributed,
                        local_batch_indices, local_n_real, make_mesh,
                        process_allgather_ragged, replicate, shard_batch)
from ..utils.config import RunConfig, parse_config


def _load_torch(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def load_pretrained(cfg: RunConfig, model_cfg: HOIModelConfig, rng):
    """Convert torch checkpoints when present; random-init otherwise."""
    clip_params = detr_params = dino_params = None
    if os.path.exists(cfg.clip_model_path):
        from ..models.clip.convert import torch_state_dict_to_params
        obj = _load_torch(cfg.clip_model_path)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        clip_params, _ = torch_state_dict_to_params(
            {k: v for k, v in sd.items()}, cfg=model_cfg.clip,
            use_adapter=cfg.use_insadapter, adapter_pos=cfg.adapter_pos,
            adapter_num_layers=cfg.adapter_num_layers, rng=rng)
        print(f"[load] CLIP weights from {cfg.clip_model_path}")
    else:
        print(f"[warn] CLIP checkpoint missing ({cfg.clip_model_path}); "
              "random init")
    if os.path.exists(cfg.pretrained_detr):
        from ..models.detr.convert import torch_detr_state_dict_to_params
        ckpt = _load_torch(cfg.pretrained_detr)
        sd = ckpt.get("model", ckpt.get("model_state_dict", ckpt))
        detr_params, _ = torch_detr_state_dict_to_params(sd, model_cfg.detr)
        print(f"[load] DETR weights from {cfg.pretrained_detr}")
    else:
        print(f"[warn] DETR checkpoint missing ({cfg.pretrained_detr}); "
              "random init")
    if cfg.dino and os.path.exists(cfg.dino_pretrained):
        from ..models.dino import torch_dino_state_dict_to_params
        ckpt = _load_torch(cfg.dino_pretrained)
        sd = ckpt.get("teacher", ckpt)
        sd = {k.replace("module.", "").replace("backbone.", ""): v
              for k, v in sd.items()}
        dino_params = torch_dino_state_dict_to_params(sd)
        print(f"[load] DINO weights from {cfg.dino_pretrained}")
    return clip_params, detr_params, dino_params


PROMPT_TEMPLATES = [
    "a photo of a person {}.", "a video of a person {}.",
    "a example of a person {}.", "a demonstration of a person {}.",
    "a photo of the person {}.", "a video of the person {}.",
    "a example of the person {}.", "a demonstration of the person {}.",
]  # get_multi_prompts (upt...py:1667-1685)


def encode_class_texts(clip_params, clip_cfg, texts, chunk=256,
                       use_templates=False):
    """Frozen-CLIP class text embeddings (get_origin_text_emb,
    upt...py:1687-1709). With use_templates, each class is the mean over the
    8 person-action templates applied to the text after its 5th word."""
    if use_templates:
        stripped = [" ".join(t.split(" ")[5:]) for t in texts]
        all_texts = [tmpl.format(s) for tmpl in PROMPT_TEMPLATES
                     for s in stripped]
    else:
        all_texts = list(texts)
    toks = tokenize(all_texts)
    fn = jax.jit(lambda p, t: encode_text(p, t, clip_cfg))
    outs = [np.asarray(fn(clip_params, toks[lo:lo + chunk]))
            for lo in range(0, len(toks), chunk)]
    emb = np.concatenate(outs, 0)
    if use_templates:
        emb = emb.reshape(len(PROMPT_TEMPLATES), len(texts), -1).mean(0)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def hico_prior_multihot(num_classes, zs, evaluating, filtered,
                        zs_type=None):
    """Object-class -> valid-verb multihot for the prior mask.

    Zero-shot TRAINING masks priors to seen classes (zs_object_to_target,
    utils_tip...py:144-152), but at eval/cache the reference swaps the FULL
    test-set table back in (main_tip_finetune.py:868-872) — without that,
    unseen classes get zero prior and unseen mAP is identically 0.

    Reference quirk reproduced: compute_prior_scores special-cases
    zs_type=='rare_first' to index self.object_to_verb — the UNFILTERED
    map (main_tip_finetune.py:680) — instead of the filtered
    object_class_to_target_class (upt_tip...py:821-824), so RF-UC trains
    with the full prior (the published RF-UC checkpoints depend on it).
    117-mode only: at 600 classes that upstream branch indexes VERB ids
    into the interaction-dim prior table (broken); there we keep the
    evidently-intended filtered table.

    Deliberate divergence: the reference's swap gates on args.eval ONLY, so
    its --cache under zs dumps .mat files with the FILTERED prior — unseen
    detections can never appear in the official-toolkit results, which
    defeats zero-shot evaluation. We treat that as an upstream oversight
    and use the full table for --cache as well."""
    rf_quirk = zs_type == "rare_first" and num_classes == 117
    if zs and not evaluating and not rf_quirk:
        return HICO.seen_object_class_multihot(num_classes, filtered)
    return HICO.object_class_multihot(num_classes)


def build_caches(cfg: RunConfig, clip_params, model_cfg, train_factory):
    """Pair cache from the pkl + text/object embeddings; CLIP/DINO global
    caches from .npz if cached (utils.py save/load behavior) else random
    placeholders when no data pass is possible."""
    num_classes = cfg.num_classes
    filtered = HICO.unseen_index[cfg.zs_type] if cfg.zs else []
    labels = HICO if cfg.dataset == "hicodet" else VCOCO_LABELS

    if os.path.exists(cfg.file1):
        anno = load_pair_annotations(cfg.file1)
        # 117-verb mode counts per-VERB annotations (anno_action), 600 per
        # interaction (main_tip_finetune.py:860-862); feeds the rare-based
        # label_choice shot policies
        if cfg.dataset != "hicodet":
            num_anno = None
        elif num_classes == 117:
            num_anno = train_factory.dataset.anno_action
        else:
            num_anno = train_factory.dataset.anno_interaction
        obj_to_verb = (train_factory.dataset.object_to_verb
                       if cfg.dataset == "hicodet"
                       else VCOCO_LABELS.object_to_verb)
        if cfg.zs and cfg.dataset == "hicodet":
            # cache CONSTRUCTION always uses the zs-filtered train map
            # (the reference model is built with zs_object_to_target,
            # utils...py:144-152, and filters 117-mode cache rows through
            # it at upt...py:676-678) — even at eval, where only the PRIOR
            # table is swapped back to full (hico_prior_multihot above)
            fset = set(filtered)
            obj_to_verb = [[] for _ in range(len(obj_to_verb))]
            for hoi, obj, verb in HICO.class_corr:
                if hoi not in fset:
                    obj_to_verb[obj].append(verb)
        pair = build_pair_cache(
            anno, num_classes, cfg.num_shot,
            HICO.object_n_verb_to_interaction, obj_to_verb,
            filtered_hoi_idx=filtered, use_multi_hot=cfg.use_multi_hot,
            label_choice=cfg.label_choice, num_anno=num_anno, seed=cfg.seed)
        print(f"[cache] pair cache from {cfg.file1}")
    else:
        print(f"[warn] pair-embedding pkl missing ({cfg.file1}); random "
              "cache — run hoigen_tpu.cli.prepare_data to produce it")
        rc = random_caches(num_classes, cfg.num_shot)
        pair = type("P", (), dict(cache_h=rc.cache_h, cache_o=rc.cache_o,
                                  cache_u=rc.cache_u, one_hots=rc.one_hots,
                                  sample_lens=rc.sample_lens,
                                  counts=np.full(num_classes,
                                                 cfg.num_shot)))()

    # class texts
    if num_classes == 117:
        classnames = HICO.verbs_sentence
    elif num_classes == 600:
        classnames = HICO.hoi_prompts
    else:
        classnames = VCOCO_LABELS.verbs_sentence
    obj_texts = [t for _, t in HICO.obj_text_label]
    origin_text = encode_class_texts(clip_params, model_cfg.clip, classnames,
                                     use_templates=cfg.use_templates)
    object_embedding = encode_class_texts(clip_params, model_cfg.clip,
                                          obj_texts)

    cache_dir = os.path.join("caches", "dataset")
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"{cfg.zs_type}_{cfg.num_shot}" if cfg.zs else "2shots"
    npz = os.path.join(
        cache_dir, f"{cfg.dataset}_{num_classes}_global_{tag}.npz")
    loaded = False
    if os.path.exists(npz) and cfg.clip_load_cache:
        g = np.load(npz)
        clip_keys, dino_keys = g["clip_keys"], g["dino_keys"]
        # values saved alongside the keys (utils.py:72-76 analog); older
        # npz files carry keys only -> runtime falls back to pair one_hots
        clip_values = g["clip_values"] if "clip_values" in g else None
        dino_values = g["dino_values"] if "dino_values" in g else None
        if clip_keys.shape[1] != num_classes * cfg.num_shot:
            print(f"[warn] {npz} was built for a different class/shot "
                  f"layout ({clip_keys.shape[1]} rows, expected "
                  f"{num_classes * cfg.num_shot}); ignoring it")
        else:
            loaded = True
            print(f"[cache] global caches from {npz}")
    if not loaded:
        rc = random_caches(num_classes, cfg.num_shot, seed=cfg.seed)
        clip_keys, dino_keys = rc.clip_global_keys, rc.dino_keys
        clip_values, dino_values = rc.clip_global_values, rc.dino_values
        print("[warn] global caches not found; random placeholders — run "
              "prepare_data to build them from the train set")

    if cfg.dataset == "hicodet":
        multihot = hico_prior_multihot(num_classes, cfg.zs,
                                       cfg.eval or cfg.cache, filtered,
                                       zs_type=cfg.zs_type)
    else:
        # V-COCO object ids are 1-based (0 = background) while detector
        # labels are 0-based person-first; shift rows so multihot[label]
        # indexes the right object class
        if num_classes == 24:
            # annotation-derived valid-action table like the reference
            # (object_to_action, vcoco/vcoco.py:153-160, consumed at
            # main_tip_finetune.py:850-851); equals the static 236-key
            # table on the official trainval annotations
            m = np.zeros((81, num_classes), np.float32)
            for o, acts in train_factory.dataset.object_to_action.items():
                m[o, acts] = 1.0
        else:
            m = VCOCO_LABELS.object_class_multihot(num_classes)
        multihot = m[1:]
    return UPTCaches(
        cache_h=pair.cache_h, cache_o=pair.cache_o, cache_u=pair.cache_u,
        one_hots=pair.one_hots, sample_lens=pair.sample_lens,
        clip_global_keys=clip_keys, dino_keys=dino_keys,
        clip_global_values=clip_values, dino_values=dino_values,
        object_class_multihot=multihot,
        object_embedding=object_embedding,
        origin_text_embeddings=origin_text), pair


def maybe_gen_features(cfg: RunConfig, clip_params, model_cfg, pair):
    """Load generator checkpoints and synthesize unseen-class features
    (main_tip_finetune.py:607-824), then build the gen cache."""
    if not cfg.generate_feature:
        return None, None
    from ..models import generator as G
    fams = {}
    emb = clip_params["text"]["token_embedding"]
    if cfg.dataset == "hicodet":
        names = {"hoi": HICO.all_classnames, "human": HICO.human_name,
                 "object": HICO.object_name}
        hoi_to_obj, hoi_to_verb = HICO.hoi_to_object, HICO.hoi_to_verb
        num_hoi = 600
    else:
        names = {"hoi": [f"{v} {o}" for v, o in VCOCO_LABELS.values],
                 "human": VCOCO_LABELS.human_name,
                 "object": VCOCO_LABELS.object_name}
        hoi_to_obj = VCOCO_LABELS.hoi_to_object
        hoi_to_verb = VCOCO_LABELS.hoi_to_verb
        num_hoi = 236
    ck = os.path.join(cfg.gen_ckpt_dir, cfg.dataset)
    for fam, key in (("hoi", "hoi"), ("human", "human"),
                     ("object", "object")):
        n_ctx = 5 if fam == "hoi" else 4
        gp_path = os.path.join(ck, f"{key}_netg_50.pth")
        if os.path.exists(gp_path):
            gen_p = G.torch_generator_state_to_params(_load_torch(gp_path))
            ctx = G.torch_prompt_ctx_to_params(
                _load_torch(os.path.join(ck, f"{key}_prompt_learner_50.pth")))
            mlp_path = os.path.join(ck, f"{key}_mlp_50.pth")
            mlp = G.torch_ship_mlp_state_to_params(_load_torch(mlp_path)) \
                if os.path.exists(mlp_path) else None
        else:
            r = jax.random.PRNGKey(hash(fam) % 2 ** 31)
            gen_p = G.init_generator_params(r)
            ctx = G.init_prompt_ctx(jax.random.fold_in(r, 1), n_ctx)
            mlp = None
            print(f"[warn] generator ckpt missing for {fam}; random init")
        fams[fam] = G.GeneratorFamily(
            gen_p, ctx, G.build_prompt_tables(names[fam], emb, ctx.shape[0]),
            mlp)
    gf, gt, gv = G.synthesize_features(
        fams, clip_params, model_cfg.clip, hoi_to_obj, hoi_to_verb, num_hoi,
        n_rounds=cfg.gen_rounds, rng=jax.random.PRNGKey(cfg.seed))
    hoi_to_class = (hoi_to_verb if cfg.num_classes in (117, 24)
                    else np.arange(num_hoi))
    gen_cache = build_gen_cache(gf, gt, hoi_to_class, cfg.num_classes,
                                cfg.num_shot, counts=pair.counts,
                                seed=cfg.seed)
    return gen_cache, (gf, gt, gv)


def make_model_config(cfg: RunConfig) -> HOIModelConfig:
    num_detr_classes = 81 if cfg.dataset == "hicodet" else 92
    use_pallas_cache = (jax.default_backend() == "tpu"
                        if cfg.use_pallas_cache is None
                        else cfg.use_pallas_cache)
    if cfg.use_insadapter:
        # adapter placement (--adapter_pos all/front/end/last/random,
        # CLIP_models_adapter_prior2.py:958-967) and depth
        # (--adapter_num_layers); 'random' draws from the run seed rather
        # than the reference's unseeded random module (reproducibility)
        import random as _random
        clip_cfg = CLIPConfig(
            adapter_layers=CLIPConfig.adapter_layer_ids(
                cfg.adapter_pos, VIT_B16.vision_layers,
                rng=_random.Random(cfg.seed)),
            adapter_num_layers=cfg.adapter_num_layers)
    else:
        clip_cfg = CLIPConfig(use_adapter=False)
    return HOIModelConfig(
        clip=clip_cfg,
        detr=DETRConfig(num_classes=num_detr_classes),
        upt=UPTConfig(
            num_classes=cfg.num_classes, num_shot=cfg.num_shot,
            alpha=cfg.alpha, gamma=cfg.gamma,
            fg_iou_thresh=cfg.fg_iou_thresh, hyper_lambda=cfg.hyper_lambda,
            logits_type=cfg.logits_type, cache_model=cfg.cache_model,
            use_clip_global=cfg.clip_global, use_dino=cfg.dino,
            use_weight_pred=cfg.use_weight_pred,
            use_insadapter=cfg.use_insadapter, prior_type=cfg.prior_type,
            use_mlp_proj=cfg.use_mlp_proj, obj_affordance=cfg.obj_affordance,
            prior_method=cfg.prior_method, vis_prompt_num=cfg.vis_prompt_num,
            use_consistloss=cfg.use_consistloss, tpt=cfg.tpt,
            LA=cfg.LA, LA_weight=cfg.LA_weight,
            feat_mask_type=cfg.feat_mask_type,
            use_pallas_cache=use_pallas_cache,
            global_values_mode=cfg.global_values_mode,
            proposals=ProposalConfig(
                human_idx=cfg.human_idx,
                box_score_thresh=cfg.box_score_thresh,
                min_instances=cfg.min_instances,
                max_instances=cfg.max_instances),
            max_gt_pairs=cfg.max_gt_pairs,
            generate_feature=cfg.generate_feature and not cfg.eval
            and not cfg.cache),
        dtype=cfg.dtype)


def batches_from_factory(factory, batch_size, cfg, mesh=None, shuffle=True,
                         seed=0, pad_tail=False):
    """Yield (device_feed_dict, Batch) via the parallel input pipeline
    (data/loader.py; torch-DataLoader analog, main_tip_finetune.py:374-388).
    With ``pad_tail`` the final short batch is padded to ``batch_size`` by
    repeating its last sample (single jit shape for eval) and
    ``Batch.n_real`` records the true length."""

    def collate(samples, pad_hw=None):
        batch = collate_batch(samples, cfg.max_gt_pairs, pad_hw=pad_hw)
        # 600-class training associates pairs against interaction ids, not
        # verbs (reference targets['hoi'], upt_tip...py:1292-1293)
        cls_ids = batch.hoi if cfg.num_classes == 600 else batch.labels
        # uint8 pixels + (h, w) sizes: ~4x less H2D traffic than normalized
        # float + bool mask; the device reconstructs both (ops/pixels)
        d = {"images": batch.images, "image_sizes": batch.image_sizes,
             "clip_sizes": batch.clip_sizes,
             "boxes_h": batch.boxes_h, "boxes_o": batch.boxes_o,
             "labels": cls_ids, "gt_valid": batch.gt_valid}
        if batch.images_clip is not None:     # host 224 stream (opt-in)
            d["images_clip"] = batch.images_clip
        return d, batch

    multi = jax.process_count() > 1

    def to_device(db):
        d, batch = db
        if multi:
            return global_batch_from_local(mesh, d), batch
        return shard_batch(mesh, d), batch

    if multi:
        # every process walks the same global stream, loading only its
        # rows. The padded image shape is computed over the GLOBAL batch
        # from size metadata (factory.padded_hw replays the stateless
        # per-sample transform plan), because a locally-chosen bucket
        # would diverge across ranks and the global array requires one
        # shape on every process.
        idx_batches = [
            (lidx, n_real, {"pad_hw": factory.padded_hw(gidx)})
            for gidx, lidx, n_real in local_batch_indices(
                len(factory), batch_size, shuffle, seed,
                pad_tail=pad_tail, return_global=True)]
    else:
        idx_batches = batch_indices(len(factory), batch_size, shuffle, seed,
                                    pad_tail=pad_tail)
    for (d, batch), n_real in iter_batches(
            factory.__getitem__, idx_batches, collate,
            to_device=to_device if mesh is not None else None,
            num_workers=cfg.num_workers):
        batch.n_real = local_n_real(n_real, batch_size) if multi else n_real
        yield d, batch


def main(cfg: RunConfig):
    # multi-host: no-op unless COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    # are set (the reference's mp.spawn+DDP launcher role,
    # main_tip_finetune.py:328-332)
    multi = init_distributed()
    np.random.seed(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed)
    model_cfg = make_model_config(cfg)
    os.makedirs(cfg.output_dir, exist_ok=True)
    if jax.process_index() == 0:
        cfg.save(os.path.join(cfg.output_dir, "args.json"))

    if cfg.dataset == "hicodet":
        cfg.partitions = ["train2015", "test2015"]
    else:
        cfg.partitions = ["trainval", "test"]
    train_factory = DataFactory(cfg.dataset, cfg.partitions[0],
                                cfg.data_root, training=True,
                                zero_shot=cfg.zs, zs_type=cfg.zs_type,
                                num_classes=cfg.num_classes,
                                max_gt_pairs=cfg.max_gt_pairs, seed=cfg.seed,
                                host_clip_stream=cfg.host_clip_stream)
    if cfg.training_set_ratio < 0.9:
        # random-subset training (main_tip_finetune.py:368-372; the
        # reference permutes with the global np seed — we use cfg.seed)
        perm = np.random.default_rng(cfg.seed).permutation(
            len(train_factory.keep))
        n = int(len(perm) * cfg.training_set_ratio)
        train_factory.keep = [train_factory.keep[i] for i in perm[:n]]
        print(f"[INFO] using {cfg.training_set_ratio} of the train set "
              f"({n} images)")
    test_factory = DataFactory(cfg.dataset, cfg.partitions[1],
                               cfg.data_root, training=False,
                               max_gt_pairs=cfg.max_gt_pairs,
                               host_clip_stream=cfg.host_clip_stream)

    clip_params, detr_params, dino_params = load_pretrained(
        cfg, model_cfg, rng)
    if clip_params is None:
        clip_params = init_clip_params(rng, model_cfg.clip)

    caches, pair = build_caches(cfg, clip_params, model_cfg, train_factory)
    gen_cache, gen_raw = maybe_gen_features(cfg, clip_params, model_cfg,
                                            pair)
    if gen_cache is not None and cfg.cache_model == "gen_feat":
        caches.cache_h, caches.cache_o, caches.cache_u = \
            gen_cache.cache_h, gen_cache.cache_o, gen_cache.cache_u
        caches.one_hots, caches.sample_lens = gen_cache.one_hots, \
            gen_cache.sample_lens
    elif gen_cache is not None and cfg.cache_model == "cache_feat":
        caches.cache_h = (caches.cache_h + gen_cache.cache_h) / 2
        caches.cache_o = (caches.cache_o + gen_cache.cache_o) / 2
        caches.cache_u = (caches.cache_u + gen_cache.cache_u) / 2

    if cfg.zs and cfg.fill_zs_verb_type == 1:
        # blend unseen classes' cache rows from seen ones by text similarity
        # (refresh_unseen_verb_cache_mem, upt...py:609-633)
        from ..models.cache import refresh_unseen_cache
        unseen = HICO.unseen_index[cfg.zs_type]
        seen = [i for i in range(cfg.num_classes) if i not in set(unseen)]
        for attr in ("cache_h", "cache_o", "cache_u"):
            setattr(caches, attr, refresh_unseen_cache(
                getattr(caches, attr), pair.counts,
                caches.origin_text_embeddings, seen, unseen, cfg.num_shot))

    trainable, frozen, buffers = init_hoi_model(
        rng, model_cfg, caches, clip_params=clip_params,
        detr_params=detr_params, dino_params=dino_params)

    if cfg.resume and cfg.resume.endswith((".pt", ".pth")) \
            and os.path.isfile(cfg.resume):
        # a reference torch checkpoint: import towers + UPT head through
        # the converters (models/convert_upt.py; golden-parity-certified
        # by tests/test_full_model_parity.py)
        from ..engine.partition import merge_params, split_params, \
            trainable_predicate
        from ..models.convert_upt import load_reference_checkpoint
        clip_base_sd = None
        if cfg.clip_model_path and os.path.exists(cfg.clip_model_path):
            import torch
            obj = torch.load(cfg.clip_model_path, map_location="cpu",
                             weights_only=False)
            clip_base_sd = (obj.state_dict()
                            if hasattr(obj, "state_dict") else obj)
        params = merge_params(trainable, frozen["upt"])
        params, buffers, detr_p, dino_p = load_reference_checkpoint(
            cfg.resume, params, buffers, pair.counts, cfg.num_shot,
            cfg.cache_model, clip_base_sd=clip_base_sd,
            adapter_pos=cfg.adapter_pos,
            adapter_num_layers=cfg.adapter_num_layers)
        trainable, frozen_clip = split_params(params, trainable_predicate)
        frozen = {"upt": frozen_clip,
                  "detr": detr_p if detr_p is not None else frozen["detr"],
                  "dino": dino_p if dino_p is not None else frozen["dino"]}
        print(f"[load] imported reference torch checkpoint {cfg.resume}")
        cfg.resume = ""           # the Orbax resume path below is bypassed

    if cfg.frozen_classifier:
        # freeze selected cache-adapter branches (--frozen_classifier,
        # main_tip_finetune.py:964-977): 'HO' -> concatenated-pair cache,
        # 'U' -> union cache, 'T' -> text branch (adapter_union_weight ==
        # our text_w). Moving the leaves to the frozen tree removes them
        # from the optimizer exactly like requires_grad=False.
        names = []
        if "HO" in cfg.frozen_classifier:
            names += ["adapter_HO_w", "adapter_HO_b"]
        if "U" in cfg.frozen_classifier:
            names += ["adapter_U_w", "adapter_U_b"]
        if "T" in cfg.frozen_classifier:
            names += ["text_w"]
        for n in names:
            if trainable.get(n) is not None:
                frozen["upt"][n] = trainable[n]
                trainable[n] = None
        print(f"[freeze] classifier branches: {names}")

    resume_path = None
    if cfg.resume:
        base = os.path.basename(os.path.normpath(cfg.resume))
        resume_path = cfg.resume if base.startswith("ckpt_") \
            else latest_checkpoint(cfg.resume)
    if resume_path and (cfg.eval or cfg.cache or cfg.sanity):
        # eval/cache only need the weights; training resumes the full
        # state (optimizer/iteration/epoch) via Trainer.restore below
        state = restore_checkpoint(resume_path, {"trainable": trainable},
                                   partial=True)
        trainable = state["trainable"]
        print(f"[load] resumed trainable params from {resume_path}")

    if cfg.vis_tor != 1.0 and (cfg.eval or cfg.cache):
        from ..models.upt import apply_vis_tor
        trainable = apply_vis_tor(trainable, model_cfg.upt, cfg.vis_tor)

    if cfg.sanity:
        # build + run one sample end to end (sanity_check,
        # main_tip_finetune.py:1034-1044)
        opt = make_optimizer()(trainable)
        step = jax.jit(make_train_step(model_cfg, opt))
        d, _ = next(batches_from_factory(train_factory, 1, cfg))
        _, _, metrics = step(trainable, opt.init(trainable), frozen,
                             buffers, d, rng)
        print(f"[sanity] one step ok: loss={float(metrics['loss']):.4f} "
              f"n_p={float(metrics['n_p'])}")
        return metrics

    mesh = global_mesh() if multi else make_mesh(n_data=cfg.devices)
    with mesh:
        rep = replicate(mesh)
        trainable = jax.device_put(trainable, rep)
        frozen = jax.device_put(frozen, rep)
        buffers = jax.device_put(buffers, rep)

        if cfg.eval or cfg.cache:
            eval_step = jax.jit(make_eval_step(model_cfg))

            def run_batches():
                # pad_tail keeps eval at one jit shape; the padded rows are
                # sliced off host-side before the meters see them. Under
                # multi-host, host_local_rows extracts this process's shard
                # and the meters merge via process_allgather_ragged below.
                # One batch of lookahead: step N+1 is dispatched (async)
                # before N's outputs are consumed, so the chip computes
                # N+1 while the host runs association/meters on N.
                prev = None
                for d, batch in batches_from_factory(
                        test_factory, cfg.batch_size, cfg, mesh,
                        shuffle=False, pad_tail=True):
                    out = eval_step(trainable, frozen, buffers, d)
                    out = jax.tree.map(
                        lambda x: host_local_rows(x)[:batch.n_real], out)
                    if prev is not None:
                        yield prev
                    prev = out, slice_batch(batch, batch.n_real)
                if prev is not None:
                    yield prev

            # multi-process caching shards the scoring (each process its
            # rows) and merges the ragged per-image results via pickled
            # allgather — beyond the reference, which caches on rank 0 only
            # (utils...py:413) and re-scores everything there
            gather = gather_pyobj if multi else None
            primary = jax.process_index() == 0
            if cfg.cache:
                if cfg.dataset == "hicodet":
                    cache_hico(run_batches(), test_factory.dataset,
                               model_cfg.upt.proposals,
                               HICO.object_n_verb_to_interaction,
                               HICO.object_to_interaction, cfg.num_classes,
                               cfg.output_dir, gather_fn=gather,
                               is_primary=primary)
                else:
                    cache_vcoco(run_batches(), test_factory.dataset,
                                model_cfg.upt.proposals, cfg.output_dir,
                                gather_fn=gather, is_primary=primary)
                return None
            if cfg.dataset == "vcoco":
                # Beyond reference parity: main_tip_finetune.py:912 raises
                # here and defers to the official toolkit on cache.pkl; we
                # evaluate the vsrl role AP in-repo (eval/vcoco_ap.py).
                report = evaluate_vcoco(run_batches(), test_factory.dataset,
                                        model_cfg.upt.proposals,
                                        gather_fn=gather,
                                        is_primary=primary)
                if primary:
                    for k in ("role_ap_scenario_1", "role_ap_scenario_2",
                              "agent_ap"):
                        print(f"{k}: mean AP "
                              f"{report[k]['mean'] * 100:.2f}")
                return report
            result = evaluate_hico(
                run_batches(), test_factory.dataset, cfg.num_classes,
                model_cfg.upt.proposals,
                HICO.object_n_verb_to_interaction,
                zs_unseen=HICO.unseen_index[cfg.zs_type] if cfg.zs else None,
                gather_fn=process_allgather_ragged if multi else None,
                ap_workers=cfg.num_workers,
                train_anno_interaction=train_factory.dataset
                .anno_interaction)
            if jax.process_index() == 0:
                print(f"The mAP is {result['mAP'] * 100:.2f}, "
                      f"rare: {result['mAP_rare'] * 100:.2f}, "
                      f"none-rare: {result['mAP_non_rare'] * 100:.2f}")
                if cfg.zs:
                    print(f"zero-shot({cfg.zs_type}) "
                          f"unseen: {result['mAP_unseen'] * 100:.2f} "
                          f"seen: {result['mAP_seen'] * 100:.2f}")
            return result

        # training
        steps_per_epoch = max(len(train_factory) // cfg.batch_size, 1)
        optimizer = make_optimizer(cfg.lr_vit, cfg.lr_head, cfg.weight_decay,
                                   cfg.lr_drop * steps_per_epoch,
                                   cfg.clip_max_norm)(trainable)
        step = make_train_step(model_cfg, optimizer)
        trainer = Trainer(step, optimizer, trainable, frozen, buffers,
                          print_interval=cfg.print_interval,
                          output_dir=cfg.output_dir)
        if resume_path:
            trainer.restore(resume_path)
            print(f"[load] resumed full training state from {resume_path} "
                  f"(epoch {trainer.epoch}, iteration {trainer.iteration})")
        for epoch in range(trainer.epoch, cfg.epochs):
            train_factory.set_epoch(epoch)
            avg = trainer.run_epoch(
                (d for d, _ in batches_from_factory(
                    train_factory, cfg.batch_size, cfg, mesh,
                    seed=cfg.seed + epoch)),
                jax.random.fold_in(rng, epoch))
            print(f"[epoch {epoch + 1}/{cfg.epochs}] loss {avg:.4f}")
        return trainer


if __name__ == "__main__":
    main(parse_config())
