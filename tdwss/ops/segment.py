"""Segment reductions keyed by scene (batch) index.

The reference computes per-scene mean pooling with a python loop over
``batch_offsets`` segments (models/MultiLabelContrastive.py:36-39,
models/SparseConvNet.py:20-26) and accumulates multi-view votes with
``store.index_add_`` on host (train.py:107).  On TPU both become static
scatter-adds keyed by an explicit per-row scene index.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def segment_sum_by_batch(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                         num_segments: int,
                         valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(N, C) rows summed into (num_segments, C) by scene index."""
    ids = batch_idx.astype(jnp.int32)
    if valid is not None:
        ids = jnp.where(valid, ids, num_segments)
    return (
        jnp.zeros((num_segments, feats.shape[-1]), feats.dtype)
        .at[ids]
        .add(feats, mode="drop")
    )


def segment_mean_by_batch(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                          num_segments: int,
                          valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-scene mean pooling (postProcessing parity), padding-aware."""
    ids = batch_idx.astype(jnp.int32)
    if valid is not None:
        ids = jnp.where(valid, ids, num_segments)
    summed = (
        jnp.zeros((num_segments, feats.shape[-1]), feats.dtype)
        .at[ids]
        .add(feats, mode="drop")
    )
    counts = jnp.zeros((num_segments,), jnp.int32).at[ids].add(1, mode="drop")
    return summed / jnp.maximum(counts, 1).astype(summed.dtype)[:, None]
