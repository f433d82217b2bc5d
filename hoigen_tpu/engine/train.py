"""Training loop driver.

Replaces DistributedLearningEngine/CustomisedDLE
(/root/reference/pocket/pocket/core/distributed.py:23-224,
/root/reference/utils_tip_cache_and_union_finetune.py:328-346): a host loop
around one jitted SPMD train step — NaN guard, timing meters, periodic
logging, per-epoch Orbax checkpoints. No DDP wrappers, no grad scaler
(training is bf16/f32 native on TPU).
"""
import time
from collections import deque
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from .checkpoint import save_checkpoint


class Trainer:
    def __init__(self, train_step: Callable, optimizer, trainable,
                 frozen, buffers, print_interval: int = 500,
                 output_dir: Optional[str] = None,
                 checkpoint_every_epoch: bool = True):
        self.step_fn = jax.jit(train_step, donate_argnums=(0, 1))
        self.optimizer = optimizer
        self.trainable = trainable
        self.opt_state = optimizer.init(trainable)
        self.frozen = frozen
        self.buffers = buffers
        self.print_interval = print_interval
        self.output_dir = output_dir
        self.checkpoint_every_epoch = checkpoint_every_epoch
        self.iteration = 0
        self.epoch = 0
        self._t_data = deque(maxlen=print_interval)
        self._t_iter = deque(maxlen=print_interval)
        self._losses = deque(maxlen=print_interval)

    def restore(self, path: str) -> None:
        """Resume the FULL training state — trainable params, optimizer
        state (including the schedule step count), iteration and epoch —
        matching the reference's resume (main_tip_finetune.py:1013-1021 +
        pocket/pocket/core/distributed.py:209-224)."""
        from .checkpoint import restore_checkpoint
        like = {"trainable": self.trainable, "opt_state": self.opt_state,
                "iteration": np.asarray(self.iteration),
                "epoch": np.asarray(self.epoch)}
        state = restore_checkpoint(path, like)
        self.trainable = state["trainable"]
        self.opt_state = state["opt_state"]
        self.iteration = int(state["iteration"])
        self.epoch = int(state["epoch"])

    def run_epoch(self, batches: Iterable, rng) -> float:
        """batches: iterable of batch dicts (already device-sharded)."""
        self.epoch += 1
        last = time.perf_counter()
        epoch_loss, n = 0.0, 0
        for batch in batches:
            t0 = time.perf_counter()
            self._t_data.append(t0 - last)
            step_rng = jax.random.fold_in(rng, self.iteration)
            self.trainable, self.opt_state, metrics = self.step_fn(
                self.trainable, self.opt_state, self.frozen, self.buffers,
                batch, step_rng)
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise ValueError(
                    f"HOI loss is not finite at iteration {self.iteration}")
            self.iteration += 1
            self._losses.append(loss)
            epoch_loss += loss
            n += 1
            last = time.perf_counter()
            self._t_iter.append(last - t0)
            if self.iteration % self.print_interval == 0:
                print(f"Epoch [{self.epoch}], Iter [{self.iteration}], "
                      f"loss: {np.mean(self._losses):.4f}, "
                      f"time[data/iter]: "
                      f"[{np.sum(self._t_data):.2f}s/"
                      f"{np.sum(self._t_iter):.2f}s]")
        # ALL processes call save: Orbax's Checkpointer runs its own
        # sync_global_devices protocol in a multi-process runtime and the
        # primary host does the writing — a rank-gated call deadlocks /
        # mismatches those barriers (the reference's rank-0 torch.save has
        # no such coordination, hence the difference).
        if self.checkpoint_every_epoch and self.output_dir:
            save_checkpoint(self.output_dir, self.iteration, {
                "trainable": self.trainable, "opt_state": self.opt_state,
                "iteration": self.iteration, "epoch": self.epoch})
        return epoch_loss / max(n, 1)
