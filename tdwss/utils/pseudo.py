"""Pseudo-label math for the weak-supervision loop.

Capability parity with the reference's ``utils/stats.py``:

- ``preprocess_logits`` (stats.py:5-22): mask per-point logits by the owning
  scene's multi-label tag, L2-normalize along classes, sigmoid.
- ``get_pseudo_labels`` (stats.py:24-42): confidence = max class score;
  argmax label, ``-100`` where confidence < threshold; returns count.
- ``assess_label_quality`` (stats.py:44-48): precision of generated labels
  against ground truth.
- ``store_pseudo_label`` (stats.py:50-55): per-scene persistence (here .npy).

Differences by design: the reference indexes points by ``batch_offsets``
segments (a python loop); the TPU pipeline carries an explicit per-point
scene index + validity mask, so everything is one gather + elementwise ops,
jit-safe with static shapes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_LABEL = -100


def preprocess_logits(logits: jnp.ndarray, scene_label: jnp.ndarray,
                      point_batch: jnp.ndarray) -> jnp.ndarray:
    """Scene-tag-masked, L2-normalized, sigmoid'd per-point scores.

    logits:      (N, C) per-point class logits
    scene_label: (B, C) {0,1} scene tags
    point_batch: (N,)   owning-scene index per point
    """
    per_point_mask = jnp.take(scene_label, point_batch, axis=0, mode="clip")
    masked = logits * per_point_mask.astype(logits.dtype)
    norm = jnp.linalg.norm(masked, axis=-1, keepdims=True)
    normalized = masked / jnp.maximum(norm, 1e-12)
    return jax.nn.sigmoid(normalized)


def get_pseudo_labels(logits: jnp.ndarray, scene_label: jnp.ndarray,
                      point_batch: jnp.ndarray, threshold: float = 0.5,
                      valid: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(pseudo_labels (N,), num_generated) — -100 where below threshold."""
    scores = preprocess_logits(logits, scene_label, point_batch)
    conf = jnp.max(scores, axis=-1)
    labels = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    keep = conf >= threshold
    if valid is not None:
        keep = jnp.logical_and(keep, valid)
    pseudo = jnp.where(keep, labels, IGNORE_LABEL)
    return pseudo, jnp.sum(keep.astype(jnp.int32))


def assess_label_quality(pseudo_labels: jnp.ndarray, labels: jnp.ndarray,
                         valid: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(num_correct, num_generated) over points with a pseudo label."""
    mask = pseudo_labels != IGNORE_LABEL
    if valid is not None:
        mask = jnp.logical_and(mask, valid)
    correct = jnp.sum(jnp.logical_and(mask, pseudo_labels == labels).astype(jnp.int32))
    total = jnp.sum(mask.astype(jnp.int32))
    return correct, total


def store_pseudo_label(pseudo_labels: np.ndarray, scene_names: Sequence[str],
                       batch_offsets: Sequence[int], path: str,
                       suffix: str = "_pseudo_label.npy") -> None:
    """Write one ``<scene><suffix>`` file per scene (host-side)."""
    os.makedirs(path, exist_ok=True)
    pseudo_labels = np.asarray(pseudo_labels)
    for b, scene_name in enumerate(scene_names):
        segment = pseudo_labels[batch_offsets[b]: batch_offsets[b + 1]]
        np.save(os.path.join(path, scene_name + suffix), segment)
