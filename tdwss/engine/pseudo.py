"""Weak-supervision loop stage 2: threshold search + pseudo-label generation.

Capability parity with the reference drivers:

- :func:`threshold_sweep` (statistics.py:26-73): sweep thresholds
  linspace(0.6, 0.8, 9) over the train set, count generated/correct pseudo
  labels, plot the curve to ``visualization/Statistics.jpg``.  TPU-native
  twist: logits are computed ONCE per batch and all thresholds are evaluated
  vectorized on device (the reference re-ran the full dataset per threshold).
- :func:`generate_pseudo_labels` (pseudoLabelGeneration.py:38-59): one
  threshold, write per-scene ``<scene><suffix>`` label files.

Alignment fix vs the reference: generation here uses a crop-tracking pass
with global point ids, so stored label arrays are full-scene-length with
-100 at uncovered points.  The reference stored *cropped* arrays and also
dropped the scene-label mask in generation (signature drift,
pseudoLabelGeneration.py:51 — SURVEY.md §3.4); we always use the
scene-masked form.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdwss.config import Config
from tdwss.data.dataset import val_offsets
from tdwss.data.loader import val_batches
from tdwss.engine.steps import make_eval_step
from tdwss.utils.pseudo import preprocess_logits

DEFAULT_THRESHOLDS = np.linspace(0.6, 0.8, 9)


def _scores_fn(model):
    eval_step = make_eval_step(model)

    def scores(params, batch_stats, batch):
        logits = eval_step(params, batch_stats, batch)
        s = preprocess_logits(logits, batch.scene_label, batch.coords[:, 3])
        conf = jnp.max(s, axis=-1)
        label = jnp.argmax(s, axis=-1).astype(jnp.int32)
        return conf, label

    return scores


def threshold_sweep(cfg: Config, model, params, batch_stats, scenes,
                    thresholds: Optional[np.ndarray] = None,
                    plot_path: str = "visualization/Statistics.jpg",
                    verbose: bool = True, train_augmented: bool = False):
    """Returns dict(thresholds, labelnum_prop, correct_prop).

    Default sweeps deterministic val-style views (full coverage of every
    point, same operating point as generation).  ``train_augmented=True``
    is the reference-parity mode: the sweep runs over the TRAIN-augmented
    loader like /root/reference/statistics.py:41-56, measuring the
    thresholds at the augmented distribution the model actually saw.
    """
    thresholds = np.asarray(
        DEFAULT_THRESHOLDS if thresholds is None else thresholds, np.float32
    )
    offsets, _ = val_offsets(scenes)
    scores = jax.jit(_scores_fn(model))

    t = jnp.asarray(thresholds)
    generated = np.zeros(len(thresholds), np.int64)
    correct = np.zeros(len(thresholds), np.int64)
    total = 0

    @jax.jit
    def count(conf, label, gt, valid):
        keep = jnp.logical_and(conf[None, :] >= t[:, None], valid[None, :])
        gen = jnp.sum(keep, axis=1)
        corr = jnp.sum(jnp.logical_and(keep, (label == gt)[None, :]), axis=1)
        return gen, corr

    if train_augmented:
        import dataclasses

        from tdwss.data.loader import train_batches

        # The sweep scores `label == batch.point_label` as "correct", and
        # train_collate fills point_label with PSEUDO labels when
        # cfg.label == 'pseudo' — the reference statistics.py:41-56 scores
        # against ground truth (y_orig), so a pseudo config here would
        # silently inflate precision.  Run the sweep with the base
        # (pre-pseudo) config, as the reference pipeline does.
        if cfg.label == "pseudo":
            raise ValueError(
                "threshold_sweep(train_augmented=True) needs ground-truth "
                "point labels: run it with the base config (label="
                "'scene_level'), not a with_pseudo config")

        # keep coords: _scores_fn masks per point via coords[:, 3], which
        # slim_batch_for_train drops for scene-level models
        sweep_cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine,
                                            slim_train_batch=False))
        batches = train_batches(scenes, sweep_cfg, epoch=0, prefetch=False)
    else:
        batches = val_batches(scenes, cfg, offsets, rep=0)
    for batch in batches:
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        conf, label = scores(params, batch_stats, batch)
        gen, corr = count(conf, label, batch.point_label, batch.valid)
        generated += np.asarray(gen, np.int64)
        correct += np.asarray(corr, np.int64)
        total += int(np.asarray(batch.valid).sum())

    labelnum_prop = generated / max(total, 1)
    correct_prop = correct / np.maximum(generated, 1)
    if verbose:
        for i, th in enumerate(thresholds):
            print(
                f"Thresh={th:.3f}: generated {generated[i]} labels "
                f"({100 * labelnum_prop[i]:.2f}%), of which {correct[i]} correct "
                f"({100 * correct_prop[i]:.2f}%)"
            )
    _plot(thresholds, labelnum_prop, correct_prop, plot_path)
    return {
        "thresholds": thresholds,
        "labelnum_prop": labelnum_prop,
        "correct_prop": correct_prop,
    }


def _plot(thresholds, labelnum_prop, correct_prop, path: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except Exception:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.figure()
    plt.plot(thresholds, labelnum_prop, label="Label number")
    plt.plot(thresholds, correct_prop, label="Label precision")
    plt.legend()
    plt.savefig(path)
    plt.close()


def generate_pseudo_labels(cfg: Config, model, params, batch_stats, scenes,
                           threshold: Optional[float] = None,
                           saving_path: Optional[str] = None,
                           verbose: bool = True) -> Tuple[int, int, int]:
    """Write per-scene pseudo-label files; returns (generated, correct, total)."""
    threshold = cfg.threshold if threshold is None else threshold
    if saving_path is None:
        saving_path = os.path.join(
            cfg.path, f"{cfg.training_name}_thresh{threshold}"
        )
    os.makedirs(saving_path, exist_ok=True)

    offsets, gt_all = val_offsets(scenes)
    scores = jax.jit(_scores_fn(model))
    store = np.full(int(offsets[-1]), -100, np.int64)

    for batch in val_batches(scenes, cfg, offsets, rep=0):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        conf, label = scores(params, batch_stats, batch)
        keep = np.asarray(
            jnp.logical_and(conf >= threshold, batch.valid)
        )
        pids = np.asarray(batch.point_ids)
        labels = np.asarray(label)
        sel = keep & (pids >= 0)
        store[pids[sel]] = labels[sel]

    generated = int((store != -100).sum())
    correct = int(((store == gt_all) & (store != -100)).sum())
    total = int(store.shape[0])
    for i, scene in enumerate(scenes):
        seg = store[offsets[i]: offsets[i + 1]].astype(np.int32)
        np.save(os.path.join(saving_path, scene.name + cfg.suffix), seg)
    if verbose:
        print(
            f"Using Thresh={threshold}. Generated {generated} labels "
            f"({100 * generated / max(total, 1):.2f}%), of which {correct} "
            f"correct ({100 * correct / max(generated, 1):.2f}%)"
        )
    return generated, correct, total
