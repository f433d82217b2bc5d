"""Engine smoke tests on the virtual 8-device CPU mesh: parameter
partitioning, one real train step under pjit (loss finite, params move),
eval step shapes, dryrun entry points."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoigen_tpu.engine.partition import (merge_params, split_params,
                                         trainable_predicate)


def test_partition_roundtrip_and_selection():
    from hoigen_tpu.models.cache import random_caches
    from hoigen_tpu.models.clip.config import CLIPConfig
    from hoigen_tpu.models.clip.model import init_clip_params
    from hoigen_tpu.models.upt import UPTConfig, init_upt_params
    from hoigen_tpu.models.proposals import ProposalConfig

    cfg = UPTConfig(num_classes=7, num_shot=2,
                    proposals=ProposalConfig(max_instances=3),
                    use_dino=False)
    tiny = CLIPConfig(image_resolution=32, vision_layers=2, vision_width=64,
                      vision_patch_size=8, transformer_layers=2,
                      transformer_width=64, context_length=16,
                      adapter_layers=(0, 1))
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    params, _ = init_upt_params(jax.random.PRNGKey(1), cfg,
                                random_caches(7, 2, 10), clip_params)
    train, frozen = split_params(params, trainable_predicate)
    merged = merge_params(train, frozen)
    # round trip: every leaf identical
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(params),
                                jax.tree_util.tree_leaves_with_path(merged)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frozen tree holds the CLIP text tower; trainable holds adapters
    leaves_t = {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(train)}
    assert any("adapter" in k for k in leaves_t)
    assert any("adapter_U_w" in k for k in leaves_t)
    assert not any("token_embedding" in k for k in leaves_t)
    leaves_f = {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(frozen)}
    assert any("token_embedding" in k for k in leaves_f)


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() itself is the full-size model (driver compile-checks it);
    here we exercise the same code path at tiny size."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.hoi_model import make_eval_step, \
        make_example_batch
    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    batch = make_example_batch(cfg, batch_size=2, detr_hw=detr_hw)
    step = jax.jit(make_eval_step(cfg))
    out = step(trainable, frozen, buffers, batch)
    assert out["detection_scores"].shape[0] == 2
    assert bool(jnp.isfinite(out["detection_scores"]).all())


def test_full_resume_roundtrip(tmp_path):
    """Save after 2 epochs, restore into a fresh Trainer, and verify the
    continued run is bit-identical to an uninterrupted one — i.e. the
    optimizer state (incl. schedule count), iteration and epoch all
    survive the round trip (reference: main_tip_finetune.py:1013-1021)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.checkpoint import latest_checkpoint
    from hoigen_tpu.engine.hoi_model import (make_example_batch,
                                             make_optimizer, make_train_step)
    from hoigen_tpu.engine.train import Trainer

    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    opt = make_optimizer(lr_drop_step=3)(trainable)
    step = make_train_step(cfg, opt)
    batch = make_example_batch(cfg, batch_size=2, detr_hw=detr_hw)
    rng = jax.random.PRNGKey(7)

    def batches(epoch):
        return [batch, batch]

    # step_fn donates trainable/opt_state: give each Trainer its own copy
    tr0 = jax.tree.map(np.asarray, trainable)
    fresh = lambda: jax.tree.map(jnp.asarray, tr0)  # noqa: E731

    out = str(tmp_path / "ckpts")
    t1 = Trainer(step, opt, fresh(), frozen, buffers, output_dir=out)
    for e in range(2):
        t1.run_epoch(batches(e), jax.random.fold_in(rng, e))
    # uninterrupted continuation (epoch 3)
    t1_ckpt = latest_checkpoint(out)
    t1.checkpoint_every_epoch = False
    t1.run_epoch(batches(2), jax.random.fold_in(rng, 2))
    expected = t1.trainable

    t2 = Trainer(step, opt, fresh(), frozen, buffers, output_dir=None)
    t2.restore(t1_ckpt)
    assert t2.epoch == 2 and t2.iteration == 4
    t2.run_epoch(batches(2), jax.random.fold_in(rng, 2))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(expected),
            jax.tree_util.tree_leaves_with_path(t2.trainable)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(p1))


def test_training_reduces_loss_tiny_flagship():
    """A few optimizer steps on the tiny flagship (with the gen-feature
    branch providing positives) reduce the interaction loss."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.hoi_model import (make_example_batch,
                                             make_optimizer, make_train_step)
    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    opt = make_optimizer()(trainable)
    opt_state = opt.init(trainable)
    step = jax.jit(make_train_step(cfg, opt))
    batch = make_example_batch(cfg, batch_size=4, detr_hw=detr_hw)
    losses = []
    for i in range(8):
        trainable, opt_state, metrics = step(
            trainable, opt_state, frozen, buffers, batch,
            jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_tp_cache_equivalence_2x4():
    """Tensor-sharding the cache matmuls over a 'model' axis (2 data x 4
    model mesh) produces the same training loss as pure DP on the same 8
    virtual devices — GSPMD inserts the contraction psum from the sharding
    annotations alone (parallel.shard_cache_rows)."""
    import jax
    sys = __import__("sys")
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.hoi_model import make_example_batch, \
        make_optimizer, make_train_step
    from hoigen_tpu.parallel import make_mesh, replicate, shard_batch, \
        shard_cache_rows

    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    opt = make_optimizer(lr_drop_step=10)(trainable)
    step = make_train_step(cfg, opt)
    batch = make_example_batch(cfg, batch_size=8, detr_hw=detr_hw)

    losses = {}
    for name, (nd, nm) in {"dp": (8, 1), "tp": (2, 4)}.items():
        mesh = make_mesh(n_data=nd, n_model=nm)
        with mesh:
            rep = replicate(mesh)
            tr = shard_cache_rows(mesh, trainable)
            bu = shard_cache_rows(mesh, buffers)
            fz = jax.device_put(frozen, rep)
            os_ = jax.device_put(opt.init(trainable), rep)
            sharded = shard_batch(mesh, batch)
            _, _, metrics = jax.jit(step)(tr, os_, fz, bu, sharded,
                                          jax.random.PRNGKey(0))
            losses[name] = float(metrics["loss"])
    assert np.isfinite(losses["dp"])
    assert abs(losses["dp"] - losses["tp"]) < 1e-4, losses


def test_vcoco_92_logit_gather():
    """COCO-pretrained V-COCO detector logits (92) gather to 81 before the
    postprocess softmax (reserve_indices, upt_tip...py:575-581,1600-1602):
    person lands at label 0, N/A holes close up."""
    from hoigen_tpu.labels.vcoco import VCOCO_LABELS
    from hoigen_tpu.models.detr.model import postprocess

    logits = np.full((1, 2, 92), -10.0, np.float32)
    logits[0, 0, 1] = 5.0       # raw 'person' slot
    logits[0, 1, 13] = 5.0      # raw 'stop sign' (after the N/A at 12)
    idx = np.asarray(VCOCO_LABELS.detr_reserve_indices)
    g = jnp.asarray(logits[..., idx])
    assert g.shape == (1, 2, 81)
    post = postprocess(g, jnp.zeros((1, 2, 4)),
                       jnp.asarray([[64.0, 64.0]]))
    assert np.asarray(post["labels"]).tolist() == [[0, 11]]


def test_multistep_1_vs_8_device_equivalence():
    """K optimizer steps on a 1-device mesh vs an 8-device dp mesh, SAME
    global batch sequence and per-step rngs: the loss trajectory and the
    final trainable params must agree (round-4 VERDICT item 4 — DDP
    semantics, pocket/core/distributed.py:103-146 + the psum-free global
    normalization argued in models/upt.py::interaction_loss_sum)."""
    import jax
    sys = __import__("sys")
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    from hoigen_tpu.engine.hoi_model import make_example_batch, \
        make_optimizer, make_train_step
    from hoigen_tpu.parallel import make_mesh, replicate, shard_batch, \
        shard_cache_rows

    cfg, trainable, frozen, buffers, detr_hw = ge._flagship(tiny=True)
    opt = make_optimizer(lr_drop_step=2)(trainable)
    step = make_train_step(cfg, opt)
    batches = [make_example_batch(cfg, batch_size=8, detr_hw=detr_hw,
                                  seed=100 + s) for s in range(4)]

    def run(n_data):
        mesh = make_mesh(n_data=n_data)
        with mesh:
            rep = replicate(mesh)
            tr = shard_cache_rows(mesh, trainable)
            bu = shard_cache_rows(mesh, buffers)
            fz = jax.device_put(frozen, rep)
            os_ = jax.device_put(opt.init(trainable), rep)
            jstep = jax.jit(step)
            losses = []
            for s, batch in enumerate(batches):
                sharded = shard_batch(mesh, batch)
                tr, os_, metrics = jstep(tr, os_, fz, bu, sharded,
                                         jax.random.PRNGKey(200 + s))
                losses.append(float(metrics["loss"]))
            return losses, jax.device_get(tr)

    losses_1, tr_1 = run(1)
    losses_8, tr_8 = run(8)
    assert all(np.isfinite(losses_1))
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5, atol=1e-6)
    flat_1 = jax.tree_util.tree_leaves_with_path(tr_1)
    flat_8 = jax.tree_util.tree_leaves(tr_8)
    assert len(flat_1) == len(flat_8)
    for (path, a), b in zip(flat_1, flat_8):
        if a is None or b is None:
            assert a is None and b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
