"""Training driver (reference train.py parity).

Epoch loop: jitted train step (Adam 1e-3, StepLR 100/0.1), per-epoch
checkpoint with auto-resume, validation at power-of-2 epochs or every 32nd
(``scn.is_power2(epoch) or epoch % 32 == 0``, train.py:94), TB-style scalar
logging of train loss and validation mIoU, MegaMulAdd reporting from XLA
cost analysis, parameter-count printout.

Fixes vs the reference (SURVEY.md §3.6 latent-bug ledger): the loss
denominator uses a dedicated step counter (ref train.py:60 clobbered ``i``),
and the text-contrastive loss consumes the model meta tuple (ref
train.py:76 clobbered it with the registry entry).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp

from tdwss.config import Config
from tdwss.data.collate import CollateStats
from tdwss.data.dataset import load_train_val
from tdwss.data.loader import steps_per_epoch, train_batches
from tdwss.engine.evaluate import validate
from tdwss.engine.steps import (
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from tdwss.models import build_model
from tdwss.utils.checkpoint import Checkpointer, load_pretrain
from tdwss.utils.flops import mega_mul_add, param_count
from tdwss.utils.logging_util import ScalarLogger

# max un-synced dispatched steps (device-buffer backpressure)
_PIPELINE_DEPTH = 4


def is_power2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


class Trainer:
    def __init__(self, cfg: Config, train_scenes=None, val_scenes=None,
                 use_checkpoints: bool = True, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        if train_scenes is None or val_scenes is None:
            train_scenes, val_scenes = load_train_val(cfg)
        self.train_scenes = train_scenes
        self.val_scenes = val_scenes
        if verbose:
            print("Training examples:", len(train_scenes))
            print("Validation examples:", len(val_scenes))

        self.model = build_model(cfg)
        # cfg.mesh.data > 1 trains data-parallel over an ICI mesh — the
        # reference's `options: [distributed]` stub (its 4gpu config,
        # SURVEY.md §2.5) made real.  ``batch_size`` stays GLOBAL (the
        # reference's 4gpu yaml scales batch 4 -> 30 and lr 4x for the
        # whole job): each device consumes batch_size/ndev scenes per
        # step, so the optimizer sees len/batch_size steps per epoch.
        self.ndev = max(int(getattr(cfg.mesh, "data", 1) or 1), 1)
        self.mesh = None
        if self.ndev > 1:
            import dataclasses

            bs = cfg.pointcloud_data.batch_size
            if bs % self.ndev:
                raise ValueError(
                    f"batch_size {bs} must divide across mesh.data="
                    f"{self.ndev} devices")
            self._local_cfg = dataclasses.replace(
                cfg, pointcloud_data=dataclasses.replace(
                    cfg.pointcloud_data, batch_size=bs // self.ndev))
        else:
            self._local_cfg = cfg
        self.spe = max(
            steps_per_epoch(len(train_scenes), cfg.pointcloud_data.batch_size),
            1)
        self.tx = make_optimizer(cfg, self.spe)
        if self.ndev > 1:
            from tdwss.parallel.dp import make_dp_train_step, make_mesh

            self.mesh = make_mesh(self.ndev)
            self.train_step = make_dp_train_step(
                self._local_cfg, self.model, self.tx, self.mesh)
        else:
            self.train_step = jax.jit(make_train_step(cfg, self.model, self.tx))
        self.eval_step = jax.jit(make_eval_step(self.model))

        if cfg.engine.prewarm_shapes:
            from tdwss.data.loader import warm_plan_shapes

            warm_plan_shapes(train_scenes, self._local_cfg,
                             epochs=cfg.engine.prewarm_epochs)
        example = next(iter(train_batches(train_scenes, self._local_cfg,
                                          epoch=0, prefetch=False)))
        example = jax.tree_util.tree_map(jnp.asarray, example)
        self.state = init_state(cfg, self.model, self.tx, example)
        self._example = example
        self._example_dev = None       # first device batch seen (DP cost acct)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # replicate the training state across the mesh; pmean in the
            # step keeps every device-varying quantity synchronized
            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, P()))
        if verbose:
            print("#classifier parameters", param_count(self.state.params))

        self.ckpt: Optional[Checkpointer] = None
        self.start_epoch = 1
        if use_checkpoints:
            exp_dir = os.path.join("exp", cfg.training_name, "checkpoints")
            self.ckpt = Checkpointer(exp_dir)
            self.state, self.start_epoch = self.ckpt.restore_latest(self.state)
            if verbose:
                print("Start from epoch", self.start_epoch)
        if cfg.pretrain and self.start_epoch == 1:
            # --pretrain seeds params/batch_stats for a FRESH run only; a
            # resumed run keeps its own state (reference utils/config.py:17
            # declares the flag but never loads it — here it works).
            self.state = load_pretrain(cfg.pretrain, self.state)
            if verbose:
                print("Loaded pretrain weights from", cfg.pretrain)
        self.logger = ScalarLogger(os.path.join("exp", cfg.training_name))

    def _epoch_batches(self, epoch: int, stats: CollateStats):
        if self.mesh is None:
            return train_batches(self.train_scenes, self.cfg, epoch, stats,
                                 to_device=True)
        from tdwss.parallel.dp import dp_train_batches, shard_batch

        def gen():
            for stacked in dp_train_batches(
                    self.train_scenes, self._local_cfg, epoch, self.ndev,
                    stats):
                yield shard_batch(stacked, self.mesh)

        return gen()

    def run_epoch(self, epoch: int) -> float:
        stats = CollateStats()
        losses = []
        for batch in self._epoch_batches(epoch, stats):
            if self._example_dev is None:
                self._example_dev = batch
            self.state, aux = self.train_step(self.state, batch)
            # keep the loss ON DEVICE until epoch end: float() here would
            # block on every step, serializing the host loop with the
            # device and defeating the loader's transfer/plan overlap.
            # Bounded pipelining: on hosts where collate outruns the
            # device, an unbounded dispatch queue would pin every
            # in-flight batch's ~100+ MB of buffers in HBM — waiting on
            # the step from PIPELINE_DEPTH iterations ago caps that.
            losses.append(aux["loss"])
            if len(losses) > _PIPELINE_DEPTH:
                jax.block_until_ready(losses[-_PIPELINE_DEPTH])
        return float(jnp.mean(jnp.stack(losses))) if losses else 0.0

    def fit(self, epochs: Optional[int] = None) -> List[float]:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        history = []
        madds = None
        for epoch in range(self.start_epoch, epochs + 1):
            start = time.time()
            mean_loss = self.run_epoch(epoch)
            history.append(mean_loss)
            if madds is None:
                # cost-analyse the step actually being run (DP: the
                # device-stacked batch, normalized per scene across devices)
                example = (self._example_dev if self.mesh is not None
                           else self._example)
                if example is not None:
                    madds = mega_mul_add(
                        self.train_step, self.state, example,
                        per=cfg.pointcloud_data.batch_size,
                    )
                else:
                    madds = 0.0
            if self.verbose:
                print(
                    epoch, "Train loss", mean_loss,
                    "MegaMulAdd", round(madds, 1),
                    "time", round(time.time() - start, 2), "s",
                )
            self.logger.scalar("Train Loss", mean_loss, epoch)
            if self.ckpt is not None:
                self.ckpt.save(epoch, self.state)

            if (is_power2(epoch) or epoch % 32 == 0) and self.val_scenes:
                params, bstats = self.state.params, self.state.batch_stats
                if self.mesh is not None:
                    # replicated mesh arrays -> host so the single-device
                    # eval jit can place them itself
                    params = jax.device_get(params)
                    bstats = jax.device_get(bstats)
                ious = validate(
                    self._local_cfg, self.model, params, bstats,
                    self.val_scenes, verbose=self.verbose,
                )
                self.logger.scalar("Validation accuracy", ious[-1], epoch)
        return history
