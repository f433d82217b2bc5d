"""End-to-end drive of the main_finetune CLI orchestration — train (with
the parallel loader) -> checkpoint -> resume -> eval (padded tail) — on a
tiny synthetic dataset with a tiny model. This is the wiring-level test the
unit suite can't provide: it exercises main() itself, where round 1 shipped
a train path that fed (feed, Batch) tuples into the jitted step."""
import json
import os

import numpy as np
import pytest

from hoigen_tpu.labels import HICO


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("tiny_hico")
    rng = np.random.default_rng(0)
    img_dir = root / "hico_20160224_det" / "images" / "train2015"
    img_dir.mkdir(parents=True)
    names, sizes, annos = [], [], []
    for i in range(5):
        w, h = 64, 48
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(img_dir / f"im_{i}.jpg")
        names.append(f"im_{i}.jpg")
        sizes.append([w, h])
        hoi = int(rng.integers(0, 600))
        _, obj, verb = HICO.class_corr[hoi]
        annos.append({"boxes_h": [[2, 2, 30, 30]],
                      "boxes_o": [[5, 5, 40, 40]],
                      "hoi": [hoi], "verb": [verb], "object": [obj]})
    inst = {"annotation": annos, "filenames": names, "empty": [],
            "objects": HICO.objects, "verbs": HICO.verbs,
            "correspondence": HICO.class_corr, "size": sizes}
    json.dump(inst, open(root / "instances_train2015.json", "w"))
    os.symlink(img_dir, img_dir.parent / "test2015")
    json.dump(inst, open(root / "instances_test2015.json", "w"))
    return str(root)


def _tiny_model_config(cfg):
    from hoigen_tpu.engine.hoi_model import HOIModelConfig
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.detr import DETRConfig
    from hoigen_tpu.models.proposals import ProposalConfig
    from hoigen_tpu.models.upt import UPTConfig
    return HOIModelConfig(
        # context_length stays 77: main() tokenizes class texts at the
        # standard CLIP context
        clip=CLIPConfig(image_resolution=32, vision_layers=2,
                        vision_width=64, vision_patch_size=8,
                        transformer_layers=2, transformer_width=64,
                        context_length=77, adapter_layers=(0, 1)),
        detr=DETRConfig(hidden_dim=64, nheads=2, enc_layers=2, dec_layers=2,
                        dim_feedforward=128, num_queries=12, num_classes=81),
        upt=UPTConfig(num_classes=cfg.num_classes, num_shot=cfg.num_shot,
                      clip_resolution=32, use_dino=False,
                      use_clip_global=cfg.clip_global,
                      cache_model=cfg.cache_model,
                      proposals=ProposalConfig(max_instances=4),
                      max_gt_pairs=cfg.max_gt_pairs,
                      generate_feature=False))


def test_main_train_resume_eval(tiny_dataset, tmp_path, monkeypatch):
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.engine.checkpoint import latest_checkpoint
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "run")
    common = dict(data_root=tiny_dataset, output_dir=out, batch_size=2,
                  num_workers=2, num_classes=117, dino=False,
                  generate_feature=False, max_gt_pairs=4, devices=1,
                  print_interval=1, epochs=1, seed=3)

    # --- train one epoch (2 steps; ragged tail dropped) ------------------
    trainer = mf.main(RunConfig(**common))
    assert trainer.epoch == 1 and trainer.iteration == 2
    ckpt = latest_checkpoint(out)
    assert ckpt is not None

    # --- resume and continue to epoch 2 ----------------------------------
    trainer2 = mf.main(RunConfig(**{**common, "epochs": 2, "resume": out}))
    assert trainer2.epoch == 2 and trainer2.iteration == 4

    # --- eval with the padded tail (5 images -> 3 batches of 2) ----------
    result = mf.main(RunConfig(**{**common, "eval": True, "resume": out}))
    assert "mAP" in result and np.isfinite(result["mAP"])
    assert result["ap"].shape == (600,)


def test_two_process_cli_matches_single(tiny_dataset, tmp_path):
    """VERDICT r2 #9: the full CLI (train 1 epoch -> checkpoint -> eval)
    under a real 2-process CPU cluster must produce exactly the merged mAP
    of the single-process run — catches rank-conditional drift anywhere in
    batches_from_factory (global bucket shapes, sampler stream, grad psum)
    or the eval meter merge."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_cli_worker.py")

    def env_for(n_local_devices):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("COORDINATOR_ADDRESS", None)
        env["PYTHONPATH"] = os.pathsep.join(
            [repo, os.path.join(repo, "tests")]
            + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
               if p and ".axon_site" not in p and p != repo])
        env["XLA_FLAGS"] = " ".join(
            [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
            + [f"--xla_force_host_platform_device_count={n_local_devices}"])
        return env

    def run(nproc, out_dir):
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port),
             tiny_dataset, out_dir],
            env=env_for(1), cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for pid in range(nproc)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
        return outs

    single = run(1, str(tmp_path / "single"))[0]
    multi = run(2, str(tmp_path / "multi"))

    by_pid = {o["pid"]: o for o in multi}
    assert set(by_pid) == {0, 1}
    # every process returns the same merged result...
    np.testing.assert_array_equal(by_pid[0]["ap"], by_pid[1]["ap"])
    # ...and it equals the single-process run bit-for-bit at 1e-10 rounding
    np.testing.assert_allclose(by_pid[0]["ap"], single["ap"],
                               rtol=1e-6, atol=1e-9)
    for k in ("mAP", "rare", "non_rare"):
        np.testing.assert_allclose(by_pid[0][k], single[k],
                                   rtol=1e-6, atol=1e-9)
    # --cache under the cluster: sharded scoring + gather_pyobj merge must
    # reproduce the single-process .mat dump (per-object row counts + sums)
    s_dig = np.asarray(single["mat_digest"], np.float64)
    m_dig = np.asarray(by_pid[0]["mat_digest"], np.float64)
    assert s_dig.shape == m_dig.shape == (80, 2)
    np.testing.assert_array_equal(s_dig[:, 0], m_dig[:, 0])
    np.testing.assert_allclose(s_dig[:, 1], m_dig[:, 1], rtol=1e-6,
                               atol=1e-6)


def test_inference_cli(tiny_dataset, tmp_path, monkeypatch):
    """Drive cli.inference end to end on the tiny fixture: default mode
    (action listing + numbered-boxes + top-k figures) and --action /
    --failure modes (reference inference.py:333-397)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    import hoigen_tpu.cli.inference as inf
    from hoigen_tpu.data import DataFactory

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    # inference.main imports DataFactory lazily from data.factory; patch it
    # at the source module
    monkeypatch.setattr(
        factory_mod, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "vis")
    common = ["--data-root", tiny_dataset, "--output-dir", out,
              "--num-classes", "117", "--dino", "false",
              "--generate-feature", "false", "--max-gt-pairs", "4",
              "--index", "0", "--action-score-thresh", "0.0"]
    inf.main(common)
    assert os.path.exists(os.path.join(out, "vis_000000.png"))
    assert os.path.exists(os.path.join(out, "vis_000000_boxes.png"))

    inf.main(common + ["--action", "5"])
    assert os.path.exists(os.path.join(out, "vis_000000_action_005.png"))
    inf.main(common + ["--action", "5", "--failure"])
    assert os.path.exists(
        os.path.join(out, "vis_000000_action_005_failure.png"))


def test_frozen_classifier_and_train_ratio(tiny_dataset, tmp_path,
                                           monkeypatch):
    """--frozen_classifier removes the selected branches from the
    optimizer (main_tip...py:964-977) and --training_set_ratio subsets the
    train set (:368-372)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "run_fc")
    trainer = mf.main(RunConfig(
        data_root=tiny_dataset, output_dir=out, batch_size=2, num_workers=0,
        num_classes=117, dino=False, generate_feature=False, max_gt_pairs=4,
        devices=1, print_interval=1, epochs=1, seed=3,
        frozen_classifier="U+T", training_set_ratio=0.8))
    # frozen branches are gone from the trainable tree (no grads/updates)
    assert trainer.trainable["adapter_U_w"] is None
    assert trainer.trainable["text_w"] is None
    # other branches stay trainable (gen_feat mode has H/O/U branches)
    assert trainer.trainable["adapter_H_w"] is not None
    # 5 * 0.8 = 4 images seen per epoch -> 2 steps of batch 2
    assert trainer.iteration == 2


def test_train_detr_cli(tiny_dataset, tmp_path, monkeypatch):
    """Drive cli.train_detr end to end (tiny transformer dims, full R50
    stem) with aux-layer losses and the coefficient/schedule flags."""
    import functools
    import hoigen_tpu.cli.train_detr as td
    import hoigen_tpu.data.factory as factory_mod
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.models.detr import DETRConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        td, "DETRConfig",
        functools.partial(DETRConfig, hidden_dim=64, nheads=2, enc_layers=1,
                          dec_layers=2, dim_feedforward=64, num_queries=8))
    monkeypatch.setattr(
        td, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "detr_out")
    td.main(["--data-root", tiny_dataset, "--epochs", "1",
             "--batch-size", "2", "--max-gt", "4", "--output-dir", out,
             "--set-cost-class", "2.0", "--eos-coef", "0.2",
             "--lr-drop", "100"])
    from hoigen_tpu.engine.checkpoint import latest_checkpoint
    assert latest_checkpoint(out) is not None

    # --no-aux-loss path (single-layer matching) also runs
    td.main(["--data-root", tiny_dataset, "--epochs", "1",
             "--batch-size", "2", "--max-gt", "4",
             "--output-dir", out + "2", "--no-aux-loss"])
    assert latest_checkpoint(out + "2") is not None


def test_eval_with_reference_torch_checkpoint(tiny_dataset, tmp_path,
                                              monkeypatch, capsys):
    """--resume <file>.pt imports a reference torch checkpoint through
    models.convert_upt and evaluates with it."""
    import functools
    import torch
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    # head-only reference checkpoint at the tiny run's shapes (random
    # pair cache -> full counts: 117 classes x 2 shots)
    rng = np.random.default_rng(5)
    R, C, D = 117 * 2, 117, 512
    sd = {}
    for fam in "HOU":
        sd[f"gen_adapter_{fam}_weight"] = torch.from_numpy(
            rng.normal(size=(R, D)).astype(np.float32))
        sd[f"gen_adapter_{fam}_bias"] = torch.from_numpy(
            rng.normal(size=(R,)).astype(np.float32))
        sd[f"gen_logit_scale_{fam}"] = torch.tensor(2.0)
    sd["adapter_union_weight"] = torch.from_numpy(
        rng.normal(size=(C, D)).astype(np.float32))
    sd["logit_scale_text"] = torch.tensor(1.0)
    ckpt = str(tmp_path / "ref_upt.pt")
    torch.save({"model_state_dict": sd, "epoch": 3}, ckpt)

    out = str(tmp_path / "run_refckpt")
    result = mf.main(RunConfig(
        data_root=tiny_dataset, output_dir=out, batch_size=2, num_workers=0,
        num_classes=117, dino=False, generate_feature=False, max_gt_pairs=4,
        devices=1, epochs=1, seed=3, eval=True, resume=ckpt))
    assert "mAP" in result and np.isfinite(result["mAP"])
    assert "imported reference torch checkpoint" in capsys.readouterr().out


def test_zero_shot_train_eval(tiny_dataset, tmp_path, monkeypatch, capsys):
    """Zero-shot mode end to end: --zs filters unseen-HOI training pairs
    (DataFactory zs path), eval reports seen/unseen mAP
    (main_tip_finetune.py:927-948)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "run_zs")
    common = dict(data_root=tiny_dataset, output_dir=out, batch_size=2,
                  num_workers=0, num_classes=600, dino=False,
                  generate_feature=False, max_gt_pairs=4, devices=1,
                  epochs=1, seed=3, zs=True, zs_type="rare_first")
    trainer = mf.main(RunConfig(**common))
    assert trainer.epoch == 1

    result = mf.main(RunConfig(**{**common, "eval": True, "resume": out}))
    assert {"mAP", "mAP_seen", "mAP_unseen"} <= set(result)
    assert "zero-shot(rare_first)" in capsys.readouterr().out


def test_zs_prior_multihot_full_at_eval():
    """Zero-shot EVAL must use the full object->verb prior table (the
    reference swaps it back in at main_tip_finetune.py:868-872); only
    training masks to seen classes. A filtered table at eval makes every
    unseen class undetectable (prior == 0 -> unseen mAP == 0)."""
    import hoigen_tpu.cli.main_finetune as mf

    filtered = HICO.unseen_index["rare_first"]
    full = mf.hico_prior_multihot(600, zs=True, evaluating=True,
                                  filtered=filtered)
    np.testing.assert_array_equal(full, HICO.object_class_multihot(600))
    # unseen interactions must be reachable at eval...
    assert all(full[:, filtered].sum(0) > 0)
    # ...and masked during training
    train = mf.hico_prior_multihot(600, zs=True, evaluating=False,
                                   filtered=filtered)
    assert not train[:, filtered].any()
    # non-zs: always full
    np.testing.assert_array_equal(
        mf.hico_prior_multihot(600, zs=False, evaluating=False,
                               filtered=[]),
        HICO.object_class_multihot(600))
    # reference quirk: rare_first at 117 TRAINS with the full map
    # (compute_prior_scores indexes the unfiltered object_to_verb,
    # upt_tip...py:821-824 + main_tip_finetune.py:680)
    np.testing.assert_array_equal(
        mf.hico_prior_multihot(117, zs=True, evaluating=False,
                               filtered=filtered, zs_type="rare_first"),
        HICO.object_class_multihot(117))
    # ...but 600-mode keeps the intended filtered table (the upstream
    # branch is broken there: verb ids into an interaction-dim prior)
    assert not mf.hico_prior_multihot(
        600, zs=True, evaluating=False, filtered=filtered,
        zs_type="rare_first")[:, filtered].any()


def test_adapter_pos_wiring():
    """--adapter_pos/--adapter_num_layers reach the model config (they
    were silently overridden by the VIT_B16 default before), and 'random'
    placement is seeded by the run seed (reproducible, unlike the
    reference's bare random module, CLIP_models_adapter_prior2.py:963)."""
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.utils.config import RunConfig

    assert mf.make_model_config(
        RunConfig()).clip.adapter_layers == tuple(range(12))
    assert mf.make_model_config(
        RunConfig(adapter_pos="last")).clip.adapter_layers == (11,)
    assert mf.make_model_config(
        RunConfig(adapter_pos="front")).clip.adapter_layers == tuple(range(6))
    assert mf.make_model_config(
        RunConfig(adapter_num_layers=3)).clip.adapter_num_layers == 3
    r1 = mf.make_model_config(
        RunConfig(adapter_pos="random", seed=7)).clip.adapter_layers
    r2 = mf.make_model_config(
        RunConfig(adapter_pos="random", seed=7)).clip.adapter_layers
    r3 = mf.make_model_config(
        RunConfig(adapter_pos="random", seed=8)).clip.adapter_layers
    assert r1 == r2 and len(r1) == 6
    assert all(0 <= i < 12 for i in r1)
    del r3  # different seeds usually differ, but that's not guaranteed
    assert mf.make_model_config(
        RunConfig(use_insadapter=False)).clip.use_adapter is False


def test_cache_hico_cli(tiny_dataset, tmp_path, monkeypatch):
    """--cache true drives the official .mat dump through main()
    (cache_hico, utils_tip...py:413-492)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "cache_out")
    mf.main(RunConfig(
        data_root=tiny_dataset, output_dir=out, batch_size=2, num_workers=0,
        num_classes=117, dino=False, generate_feature=False, max_gt_pairs=4,
        devices=1, epochs=1, seed=3, cache=True))
    mats = [f for f in os.listdir(out) if f.startswith("detections_")
            and f.endswith(".mat")]
    assert len(mats) == 80


def test_detections_cli(tiny_dataset, tmp_path, monkeypatch):
    """cli.detections: gt -> eval gives perfect mAP; dump (tiny random
    DETR) writes per-image jsons (reference: hicodet/detections/*)."""
    import functools
    import hoigen_tpu.cli.detections as dc
    import hoigen_tpu.data.factory as factory_mod
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.models.detr import DETRConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        dc, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))
    # cli.detections imports DETRConfig lazily; patch at the source package
    import hoigen_tpu.models.detr as detr_pkg
    monkeypatch.setattr(
        detr_pkg, "DETRConfig",
        functools.partial(DETRConfig, hidden_dim=64, nheads=2, enc_layers=1,
                          dec_layers=1, dim_feedforward=64, num_queries=8))

    gt_dir = str(tmp_path / "gt")
    dc.main(["gt", "--data-root", tiny_dataset, "--out-dir", gt_dir])
    assert len(os.listdir(gt_dir)) == 5
    ap = dc.main(["eval", "--det-dir", gt_dir, "--data-root", tiny_dataset])
    assert float(ap[ap > 0].mean()) == 1.0     # perfect detector

    det_dir = str(tmp_path / "det")
    dc.main(["dump", "--data-root", tiny_dataset, "--out-dir", det_dir,
             "--batch-size", "2"])
    assert len(os.listdir(det_dir)) == 5

    # vis: GT pair renderer (hicodet/utilities/visualise_and_cache.py) —
    # one PNG per (image, HOI class present)
    vis_dir = str(tmp_path / "vis")
    dc.main(["vis", "--data-root", tiny_dataset, "--out-dir", vis_dir,
             "--limit", "2"])
    part = os.path.join(vis_dir, "test2015")
    classes = os.listdir(part)
    assert classes and all(c.startswith("class_") for c in classes)
    pngs = [f for c in classes
            for f in os.listdir(os.path.join(part, c))]
    assert pngs and all(f.endswith(".png") for f in pngs)


def test_mismatched_global_cache_ignored(tiny_dataset, tmp_path,
                                         monkeypatch, capsys):
    """A cached global npz built for a different class/shot layout is
    ignored with a warning instead of crashing the cache matmul (caught
    on-hardware: a 600-class cache poisoning a 117-class run)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    os.makedirs("caches/dataset", exist_ok=True)
    # expected name for a 117-class 2-shot run, but 600-class-sized rows
    np.savez("caches/dataset/hicodet_117_global_2shots.npz",
             clip_keys=np.zeros((512, 1200), np.float32),
             dino_keys=np.zeros((2048, 1200), np.float32),
             clip_values=np.zeros((1200, 600), np.float32),
             dino_values=np.zeros((1200, 600), np.float32))

    out = str(tmp_path / "run_badcache")
    trainer = mf.main(RunConfig(
        data_root=tiny_dataset, output_dir=out, batch_size=2, num_workers=0,
        num_classes=117, dino=False, generate_feature=False, max_gt_pairs=4,
        devices=1, epochs=1, seed=3, sanity=True))
    assert "different class/shot layout" in capsys.readouterr().out


@pytest.fixture(scope="module")
def tiny_vcoco(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("tiny_vcoco")
    rng = np.random.default_rng(2)
    actions = [f"verb{i} obj" for i in range(24)]
    objects = ["background"] + [f"obj{i}" for i in range(80)]
    for part, img_dir_name, n in (("trainval", "train2014", 4),
                                  ("test", "val2014", 4)):
        img_dir = root / "images" / img_dir_name
        img_dir.mkdir(parents=True, exist_ok=True)
        prefix = f"COCO_{img_dir_name}"
        annos, images = [], []
        for i in range(n):
            w, h = 64, 48
            name = f"{prefix}_{i:012d}.jpg"
            Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                         dtype=np.uint8)).save(img_dir / name)
            k = int(rng.integers(1, 3))
            annos.append({"boxes_h": [[2, 2, 30, 30]] * k,
                          "boxes_o": [[5, 5, 40, 40]] * k,
                          "actions": rng.integers(0, 24, k).tolist(),
                          "objects": rng.integers(1, 81, k).tolist(),
                          "file_name": name})
            images.append(1000 + i)
        inst = {"annotations": annos, "classes": actions, "objects": objects,
                "images": images,
                "action_to_object": [[1] for _ in range(24)]}
        json.dump(inst, open(root / f"instances_vcoco_{part}.json", "w"))
    return str(root)


def test_vcoco_eval_cli(tiny_vcoco, tmp_path, monkeypatch, capsys):
    """--dataset vcoco --eval prints the in-repo role AP (the reference
    raises NotImplementedError here, main_tip_finetune.py:912)."""
    import functools
    import hoigen_tpu.data.factory as factory_mod
    import hoigen_tpu.cli.main_finetune as mf
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(mf, "make_model_config", _tiny_model_config)
    monkeypatch.setattr(
        mf, "DataFactory",
        functools.partial(DataFactory, clip_resolution=32,
                          transform_kwargs=dict(
                              eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64))))
    monkeypatch.setattr(factory_mod, "DEFAULT_BUCKETS",
                        ((56, 80), (80, 56), (80, 80)))

    out = str(tmp_path / "vcoco_out")
    report = mf.main(RunConfig(
        dataset="vcoco", partitions=["trainval", "test"],
        data_root=tiny_vcoco, output_dir=out, batch_size=2, num_workers=0,
        num_classes=24, dino=False, generate_feature=False, max_gt_pairs=4,
        devices=1, epochs=1, seed=3, eval=True))
    assert set(report) == {"role_ap_scenario_1", "role_ap_scenario_2",
                           "agent_ap"}
    for k in report:
        assert 0.0 <= report[k]["mean"] <= 1.0
    assert "role_ap_scenario_1: mean AP" in capsys.readouterr().out

    # vcoco GT pair renderer (vcoco/utilities/visualise_and_cache.py)
    import hoigen_tpu.cli.detections as dc
    monkeypatch.setattr(dc, "DataFactory", mf.DataFactory)
    vis_dir = str(tmp_path / "vvis")
    dc.main(["vis", "--dataset", "vcoco", "--partition", "test",
             "--data-root", tiny_vcoco, "--out-dir", vis_dir,
             "--limit", "2"])
    part = os.path.join(vis_dir, "test")
    assert any(f.endswith(".png") for c in os.listdir(part)
               for f in os.listdir(os.path.join(part, c)))
