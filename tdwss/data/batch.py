"""Device batch schema (static shapes).

The reference's collate fns produce ragged per-batch tensors plus python
``batch_offsets`` lists (dataset/data.py:223-238, 300-310).  On TPU every
array is padded to a static capacity and carries explicit masks; segment
membership is an int index per point instead of offsets.

Train schema parity (trainMerge, data.py:223-238):
  coords<->locs, feats<->feature, point_label<->y_orig, scene_label<->y,
  texts/has_text<->text, point boxes are carried by the GSS pipeline
  separately (dead weight in the wired-in reference models, SURVEY §3.5).
Val schema parity (valMerge, data.py:300-310): + point_ids for vote
accumulation.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TextBatch:
    """Padded text inputs for scenes that have descriptions.

    tokens:    (B', T, L) int32 BPE ids (0-padded)
    has_text:  (B',) int32 owning-scene index within the batch
    valid:     (B',) bool row validity (padding mask)
    """

    tokens: jnp.ndarray
    has_text: jnp.ndarray
    valid: jnp.ndarray


@flax.struct.dataclass
class PointBatch:
    """A fixed-capacity batch of concatenated scenes.

    coords:      (N, 4) int32 [x, y, z, scene_idx], cropped to [0, full_scale)
    feats:       (N, C) float   point features (colors)
    valid:       (N,) bool      point validity
    scene_label: (B, 20) float  multi-label scene tags
    scene_mask:  (B,) bool      scene validity (padded scenes)
    point_label: (N,) int32     per-point gt or pseudo labels (-100 ignore)
    point_ids:   (N,) int32     global val-point index for vote accumulation
                                (-1 / unused at train time)
    text:        optional TextBatch
    plans:       optional host-precomputed LevelPlans (tdwss.ops.host_plan);
                 when set, vox_feats / point2voxel must be set too, and the
                 encoder skips every on-device sort/search
    vox_feats:   (V0, C) voxelized features (InputLayer mode=4 output)
    point2voxel: (N,) int32 owning-voxel id per point (>= V0 when dropped)
    point_perm:  (N,) int32 points in per-voxel-run order (devoxelize VJP)
    """

    coords: jnp.ndarray
    feats: jnp.ndarray
    valid: jnp.ndarray
    scene_label: jnp.ndarray
    scene_mask: jnp.ndarray
    point_label: jnp.ndarray
    point_ids: jnp.ndarray
    text: Optional[TextBatch] = None
    plans: Optional[Any] = None
    vox_feats: Optional[jnp.ndarray] = None
    point2voxel: Optional[jnp.ndarray] = None
    point_perm: Optional[jnp.ndarray] = None

    @property
    def num_points(self) -> int:
        return self.coords.shape[0]

    @property
    def num_scenes(self) -> int:
        return self.scene_label.shape[0]

    @property
    def batch_idx(self) -> jnp.ndarray:
        return self.coords[:, 3]
