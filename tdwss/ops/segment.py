"""Segment reductions keyed by scene (batch) index.

The reference computes per-scene mean pooling with a python loop over
``batch_offsets`` segments (models/MultiLabelContrastive.py:36-39,
models/SparseConvNet.py:20-26) and accumulates multi-view votes with
``store.index_add_`` on host (train.py:107).

TPU note: XLA lowers scatter-add with potentially-colliding indices to a
SERIAL loop on TPU — catastrophic at 10^5-10^6 rows.  The scene count B is
tiny (<= tens), so these reductions are implemented as a one-hot (B, N)
mask matmul instead: one MXU GEMM, fully parallel, and its transpose (the
VJP) is another GEMM.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _one_hot_mask(batch_idx: jnp.ndarray, num_segments: int,
                  valid: Optional[jnp.ndarray],
                  weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(num_segments, N) f32 membership mask (optionally weighted)."""
    ids = batch_idx.astype(jnp.int32)
    if valid is not None:
        ids = jnp.where(valid, ids, num_segments)
    seg = jnp.arange(num_segments, dtype=jnp.int32)
    mask = (seg[:, None] == ids[None, :]).astype(jnp.float32)
    if weights is not None:
        mask = mask * weights.astype(jnp.float32)[None, :]
    return mask


def segment_sum_by_batch(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                         num_segments: int,
                         valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(N, C) rows summed into (num_segments, C) by scene index."""
    mask = _one_hot_mask(batch_idx, num_segments, valid)
    out = jnp.dot(mask, feats.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def segment_mean_by_batch(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                          num_segments: int,
                          valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-scene mean pooling (postProcessing parity), padding-aware."""
    mask = _one_hot_mask(batch_idx, num_segments, valid)
    summed = jnp.dot(mask, feats.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    counts = jnp.sum(mask, axis=1)
    return (summed / jnp.maximum(counts, 1.0)[:, None]).astype(feats.dtype)


def segment_mean_weighted(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                          weights: jnp.ndarray, num_segments: int,
                          valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weighted per-scene mean: sum_i w_i f_i / sum_i w_i per segment.

    Used to pool scene features directly over VOXELS with per-voxel point
    counts — numerically equal to the reference's mean over points (each
    point reads its voxel's features) without materializing the per-point
    devoxelize in the training graph.
    """
    mask = _one_hot_mask(batch_idx, num_segments, valid, weights)
    summed = jnp.dot(mask, feats.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    denom = jnp.sum(mask, axis=1)
    return (summed / jnp.maximum(denom, 1e-9)[:, None]).astype(feats.dtype)
