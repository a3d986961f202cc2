"""Device batch schema (static shapes).

The reference's collate fns produce ragged per-batch tensors plus python
``batch_offsets`` lists (dataset/data.py:223-238, 300-310).  On TPU every
array is padded to a static capacity and carries explicit masks; segment
membership is an int index per point instead of offsets.

Train schema parity (trainMerge, data.py:223-238):
  coords<->locs, feats<->feature, point_label<->y_orig, scene_label<->y,
  texts/has_text<->text, box<->boxes+transform (gated by
  cfg.pointcloud_data.with_boxes — the wired-in reference models never
  consume them, SURVEY §3.5).
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
class BoxBatch:
    """GSS proposal boxes + the inverse augmentation per scene.

    Reference trainMerge carries ``boxes`` (NumBoxes, 6+1 concat over
    scenes) and ``transform = [align_matrices, centers, rots, offsets]``
    (dataset/data.py:199,223-238; train.py:59-61 uploads both).  Static-
    shape equivalent: per-scene padded boxes + a validity mask; the
    transform quartet inverts the train augmentation so grid coords map
    back to the axis-aligned world space the boxes live in.

    boxes:    (B, K, 6) float32  [centre xyz, extent xyz] world space
    valid:    (B, K) bool        real proposals (padding mask)
    align:    (B, 4, 4) float32  scan axis-align matrix
    center:   (B, 3) float32     mean subtracted during prep
    rot_inv:  (B, 3, 3) float32  inverse of the augmentation rotation
    offset:   (B, 3) float32     augmentation translation
    """

    boxes: jnp.ndarray
    valid: jnp.ndarray
    align: jnp.ndarray
    center: jnp.ndarray
    rot_inv: jnp.ndarray
    offset: jnp.ndarray

    def concat_boxes(self) -> "jnp.ndarray":
        """(M, 7) [centre, extent, scene_idx] over valid rows — the
        reference's concatenated layout (crop_box input)."""
        import numpy as np

        b, k, _ = self.boxes.shape
        scene = np.repeat(np.arange(b, dtype=np.float32), k)
        flat = np.asarray(self.boxes).reshape(b * k, 6)
        keep = np.asarray(self.valid).reshape(b * k)
        return np.concatenate([flat, scene[:, None]], axis=1)[keep]

    def transform_tuple(self):
        """(align, centers, rot_inv, offsets) — crop_box's transform arg."""
        import numpy as np

        return (np.asarray(self.align), np.asarray(self.center),
                np.asarray(self.rot_inv), np.asarray(self.offset))


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
    # GSS proposals + inverse augmentation (cfg.pointcloud_data.with_boxes)
    box: Optional[BoxBatch] = None
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
