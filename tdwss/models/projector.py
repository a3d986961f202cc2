"""Box projector: crop GSS boxes, matte, voxelize, max-project to 2D masks.

Capability parity with reference ``models/projector`` (SURVEY.md §2.1
"Projector (standalone)" — carried in the batch but not wired into the
training drivers, projector.py:6-19, components.py:5-101):

- :func:`crop_box` (components.py cropBox): undo the train-time augmentation
  (offset, rotation, recentre, axis-align) and crop points to each proposal
  box, normalizing the crop into the unit cube;
- :class:`MattingModule`: per-point linear matting head;
- :func:`voxelize_views` (components.py Voxelizer): scn.InputLayer(mode=4) +
  SparseToDense + max-projection along H/W/Z.  TPU twist: the dense
  (res^3, C) volume is never materialized — the three 2D views are produced
  directly with masked scatter-max over the deduplicated voxels.

Host-side crop (variable box membership) + jitted render core.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def crop_box(coords: np.ndarray, feats: np.ndarray, boxes: np.ndarray,
             transform: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Crop augmented grid points back in world space to proposal boxes.

    coords (N, 4) [x,y,z,batch] grid coords; feats (N, C);
    boxes (M, 7) [centre xyz, extent xyz, batch]; transform =
    (axis_align (B,4,4), centers (B,3), rot_inv (B,3,3), offsets (B,3)).
    Returns (M-indexed coords (N',4) normalized to [0,1]^3, feats (N',C)).
    """
    axis_align, centers, rot_inv, offsets = transform
    coords_pool: List[np.ndarray] = []
    feats_pool: List[np.ndarray] = []
    for bid, box in enumerate(boxes):
        centre, length = box[:3], box[3:6]
        mn, mx = centre - length / 2, centre + length / 2
        b = int(box[-1])
        sel = coords[:, -1] == b
        pc = coords[sel, :3].astype(np.float64)
        pc = (pc - offsets[b]) @ rot_inv[b] + centers[b]
        pc = np.concatenate([pc, np.ones((pc.shape[0], 1))], -1) @ axis_align[b].T
        inside = np.all(pc[:, :3] >= mn, -1) & np.all(pc[:, :3] <= mx, -1)
        if not inside.any():
            continue
        crop = pc[inside, :3]
        crop -= crop.min(0)
        crop /= np.maximum(crop.max(0), 1e-9)
        out = np.concatenate(
            [crop, np.full((crop.shape[0], 1), bid, np.float64)], -1
        )
        coords_pool.append(out.astype(np.float32))
        feats_pool.append(feats[sel][inside])
    if not coords_pool:
        return np.zeros((0, 4), np.float32), np.zeros((0, feats.shape[1]), feats.dtype)
    return np.concatenate(coords_pool), np.concatenate(feats_pool)


class MattingModule(nn.Module):
    """Per-point linear matting head (components.py:54-62)."""

    out_channels: int = 2

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.out_channels, name="model")(feats)


@partial(jax.jit, static_argnums=(3, 4, 5))
def voxelize_views(coords: jnp.ndarray, feats: jnp.ndarray,
                   valid: jnp.ndarray, resolution: int, num_boxes: int,
                   view: str = "HWZ") -> jnp.ndarray:
    """Mode-4-averaged voxels max-projected along the chosen axes.

    coords (N, 4) with xyz in [0, 1] and box id; returns
    (len(view) * num_boxes, C, res, res).
    """
    from tdwss.ops.voxelize import voxelize

    grid_coords = jnp.concatenate(
        [
            jnp.clip((coords[:, :3] * resolution).astype(jnp.int32), 0, resolution - 1),
            coords[:, 3:4].astype(jnp.int32),
        ],
        axis=1,
    )
    grid, vfeats, _ = voxelize(grid_coords, feats, valid, coords.shape[0])
    c = feats.shape[1]
    neg = jnp.finfo(vfeats.dtype).min
    views = []
    axes = {"H": 0, "W": 1, "Z": 2}
    for v in view:
        a = axes[v]
        kept = [d for d in range(3) if d != a]
        # flat index: box * res^2 + u * res + w
        flat = (
            grid.coords[:, 3] * resolution * resolution
            + grid.coords[:, kept[0]] * resolution
            + grid.coords[:, kept[1]]
        )
        flat = jnp.where(grid.valid, flat, num_boxes * resolution * resolution)
        img = (
            jnp.full((num_boxes * resolution * resolution, c), neg, vfeats.dtype)
            .at[flat]
            .max(vfeats, mode="drop")
        )
        img = jnp.where(img == neg, 0, img)
        views.append(
            img.reshape(num_boxes, resolution, resolution, c).transpose(0, 3, 1, 2)
        )
    return jnp.concatenate(views, axis=0)


class Projector(nn.Module):
    """crop -> matting -> voxelize/max-project (projector.py:6-19)."""

    out_channels: int = 2
    resolution: int = 256
    view: str = "HWZ"

    @nn.compact
    def __call__(self, coords: jnp.ndarray, feats: jnp.ndarray,
                 valid: jnp.ndarray, num_boxes: int) -> jnp.ndarray:
        """coords (N, 4) cropped+normalized (from :func:`crop_box`)."""
        matted = MattingModule(self.out_channels, name="matting")(feats)
        return voxelize_views(coords, matted, valid, self.resolution,
                              num_boxes, self.view)


def project_from_batch(batch, feats: np.ndarray, variables,
                       projector: "Projector") -> jnp.ndarray:
    """Run the Projector head from a train batch carrying a BoxBatch.

    Bridges the batch contract (cfg.pointcloud_data.with_boxes) to the
    standalone projector: converts the padded BoxBatch back to the
    reference's concatenated (M, 7) boxes + transform quartet
    (dataset/data.py:223-238), crops on host, renders on device.

    batch: PointBatch with ``box`` set; feats (N, C) per-point features
    aligned with batch.coords.  Returns (len(view) * M, C_out, res, res).
    """
    if batch.box is None:
        raise ValueError("batch has no BoxBatch; set pointcloud_data.with_boxes")
    boxes = batch.box.concat_boxes()
    transform = batch.box.transform_tuple()
    keep = np.asarray(batch.valid)
    coords = np.asarray(batch.coords)[keep]
    crop_coords, crop_feats = crop_box(coords, np.asarray(feats)[keep],
                                       boxes, transform)
    num_boxes = max(int(boxes.shape[0]), 1)
    valid = np.ones((crop_coords.shape[0],), bool)
    if crop_coords.shape[0] == 0:
        crop_coords = np.zeros((1, 4), np.float32)
        crop_feats = np.zeros((1, feats.shape[1]), np.float32)
        valid = np.zeros((1,), bool)
    return projector.apply(variables, jnp.asarray(crop_coords),
                           jnp.asarray(crop_feats), jnp.asarray(valid),
                           num_boxes)
