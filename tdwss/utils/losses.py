"""Training losses.

Capability parity with the reference's ``utils/loss.py``:

- ``Classification`` (reference utils/loss.py:21-33): scene-level multi-label
  soft-margin loss for (B, C) logits vs (B, C) {0,1} tags, and point-level
  cross-entropy with ``-100`` ignore labels for (N, C) logits vs (N,) labels.
- ``TextContrastive`` (reference utils/loss.py:6-18): scene-text similarity
  ``text @ pc.T`` scored with cross-entropy against the scene index.

All functions are pure jnp, jit-safe with static shapes, and take explicit
validity masks (the TPU pipeline pads scenes/points/texts to fixed sizes;
the reference ran with dynamic shapes and needed no masks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tdwss.registry import LOSS_REGISTRY

IGNORE_LABEL = -100


def _log_sigmoid(x):
    # stable log(sigmoid(x)) = -softplus(-x)
    return -jax.nn.softplus(-x)


def multilabel_soft_margin(logits: jnp.ndarray, labels: jnp.ndarray,
                           scene_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over scenes of mean over classes of binary soft-margin loss.

    Matches ``torch.nn.functional.multilabel_soft_margin_loss`` semantics:
    ``-mean_c [ y log σ(x) + (1-y) log σ(-x) ]`` averaged over the batch.
    """
    labels = labels.astype(logits.dtype)
    per_class = labels * _log_sigmoid(logits) + (1.0 - labels) * _log_sigmoid(-logits)
    per_scene = -jnp.mean(per_class, axis=-1)
    if scene_mask is None:
        return jnp.mean(per_scene)
    scene_mask = scene_mask.astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(scene_mask), 1.0)
    return jnp.sum(per_scene * scene_mask) / denom


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cross-entropy over (N, C) logits vs (N,) int labels, ignoring -100.

    ``valid`` additionally masks padded rows.
    """
    keep = labels != IGNORE_LABEL
    if valid is not None:
        keep = jnp.logical_and(keep, valid)
    safe_labels = jnp.where(keep, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    keep_f = keep.astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(keep_f), 1.0)
    return jnp.sum(nll * keep_f) / denom


@LOSS_REGISTRY.register()
def Classification(logits: jnp.ndarray, labels: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch on label rank, mirroring reference utils/loss.py:27-33.

    (B, C) labels -> scene-level multilabel soft margin;
    (N,) labels  -> point-level CE with -100 ignore.
    """
    if labels.ndim == 2:
        return multilabel_soft_margin(logits, labels, scene_mask=mask)
    if labels.ndim == 1:
        return masked_cross_entropy(logits, labels, valid=mask)
    raise ValueError(f"unsupported label rank: {labels.ndim}")


@LOSS_REGISTRY.register()
def TextContrastive(pc: jnp.ndarray, text: jnp.ndarray, has_text: jnp.ndarray,
                    text_mask: Optional[jnp.ndarray] = None,
                    scene_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scene-text contrastive loss (reference utils/loss.py:6-18).

    pc:        (B, m)   per-scene pooled point-cloud features
    text:      (B', T, m) text features for scenes that have descriptions
    has_text:  (B',)    index of the owning scene within the batch
    text_mask: (B',) or (B', T) optional validity (padded rows/slots)
    scene_mask:(B,)     optional scene validity — padded scenes are removed
               from the softmax's column axis (the reference runs with a
               dynamic batch, so its softmax only ever sees real scenes;
               without the mask a padded scene's zero pooled feature leaks
               probability mass at logit 0).

    similarity[b', t, b] = <text[b', t], pc[b]>; cross-entropy against the
    owning-scene index, averaged over all valid (b', t).
    """
    if text.ndim != 3:
        raise ValueError(f"text must be (B', T, m), got {text.shape}")
    similarity = jnp.einsum("btm,cm->btc", text, pc)
    if scene_mask is not None:
        neg = jnp.asarray(jnp.finfo(similarity.dtype).min, similarity.dtype)
        similarity = jnp.where(scene_mask[None, None, :], similarity, neg)
    logp = jax.nn.log_softmax(similarity, axis=-1)  # over scenes
    num_text = text.shape[1]
    labels = jnp.tile(has_text[:, None], (1, num_text))  # (B', T)
    safe = jnp.clip(labels, 0, pc.shape[0] - 1).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]  # (B', T)
    if text_mask is None:
        keep = jnp.ones_like(nll)
    else:
        keep = text_mask.astype(nll.dtype)
        if keep.ndim == 1:
            keep = keep[:, None] * jnp.ones((1, num_text), nll.dtype)
    keep = keep * (labels >= 0).astype(nll.dtype)
    denom = jnp.maximum(jnp.sum(keep), 1.0)
    return jnp.sum(nll * keep) / denom
