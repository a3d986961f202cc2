"""Attach host-precomputed sparse-conv plans to a collated batch.

Bridges the host plan builder (:mod:`tdwss.ops.host_plan`) and the model's
static geometry: the encoder declares its level count / capacities via
``plan_spec`` (tdwss.models.sparse_encoders), collate calls
:func:`attach_host_plans`, and the jitted step receives rulebooks as plain
int32 arrays — no sorts or binary searches on device.
"""

from __future__ import annotations

import numpy as np

from tdwss.config import Config
from tdwss.data.batch import PointBatch
from tdwss.ops.host_plan import host_voxelize_and_plan


def encoder_plan_spec(cfg: Config, n_points: int):
    """(num_levels, capacities, downsample) for the configured encoder."""
    from tdwss.models.meta_arch import _build_encoder

    encoder, _ = _build_encoder(cfg.pointcloud_model, cfg.engine)
    return encoder.plan_spec(n_points)


def attach_host_plans(batch: PointBatch, cfg: Config) -> PointBatch:
    """Return the batch with plans/vox_feats/point2voxel filled in (numpy).

    No-op if the batch already carries plans.
    """
    if batch.plans is not None:
        return batch
    coords = np.asarray(batch.coords)
    num_levels, caps, downsample = encoder_plan_spec(cfg, coords.shape[0])
    plans, vox_feats, p2v, perm = host_voxelize_and_plan(
        coords, np.asarray(batch.feats), np.asarray(batch.valid),
        num_levels, caps, downsample)
    return batch.replace(plans=plans, vox_feats=vox_feats, point2voxel=p2v,
                         point_perm=perm)
