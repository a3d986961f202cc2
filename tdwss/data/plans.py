"""Attach host-precomputed sparse-conv plans to a collated batch.

Bridges the host plan builder (:mod:`tdwss.ops.host_plan`) and the model's
static geometry: the encoder declares its level count / capacities via
``plan_spec`` (tdwss.models.sparse_encoders), collate calls
:func:`attach_host_plans`, and the jitted step receives rulebooks as plain
int32 arrays — no sorts or binary searches on device.
"""

from __future__ import annotations

import numpy as np

from typing import Optional

from tdwss.config import Config
from tdwss.data.batch import PointBatch
from tdwss.ops.host_plan import host_voxelize_and_plan


def encoder_plan_spec(cfg: Config, n_points: int):
    """(num_levels, capacities, downsample) for the configured encoder."""
    from tdwss.models.meta_arch import _build_encoder

    encoder, _ = _build_encoder(cfg.pointcloud_model, cfg.engine)
    return encoder.plan_spec(n_points)


def _slim_win(win):
    """rb_local (the dominant plan leaf) travels at the narrowest dtype
    that holds its values: sub-form locals live in [0, subwin] (sentinel
    == subwin), so with subwin <= 255 they ship as UINT8 — 104 -> 52 MB
    per bench batch, the decisive cut for the axon tunnel's ~77 MB/s
    device_put which bounds measured e2e on this rig.  Flat-form locals
    (sentinel == window, up to a few thousand) ship int16.  The apply
    entry points (tdwss.ops.sparse_conv._rb32) cast back to int32
    in-graph either way."""
    if win is None:
        return win
    want = (np.uint8 if (win.sub and win.subwin <= 255) else np.int16)
    if win.rb_local.dtype == want:
        return win
    return win.replace(rb_local=np.asarray(win.rb_local, want))


def slim_plans_for_device(plans):
    """Drop device-dead plan leaves before the host->device transfer.

    The windowed conv path (Windowed27 / WindowedGather, including its
    in-graph einsum fallbacks) never reads the global rulebooks — they are
    host-side inputs to the window builders.  A full bench batch carries
    ~480 MB; the global ``subm_rb`` (~146 MB), ``down_rb``/``parent``/
    ``child_offset`` at wg levels (~23 MB), coarse-level grid arrays, and
    int32 rb_locals (~100 MB saved as int16) are pure transfer cost.
    Zero-row placeholders keep the static kernel-volume dimension (modules
    size weights from ``rulebook.shape[-1]``) and the pytree structure.
    """
    new_levels = []
    for i, lvl in enumerate(plans.levels):
        grid = lvl.grid
        subm_rb = lvl.subm_rb
        parent, child_offset, down_rb = lvl.parent, lvl.child_offset, lvl.down_rb
        if lvl.win is not None and subm_rb is not None and subm_rb.shape[0]:
            subm_rb = np.zeros((0, subm_rb.shape[1]), np.int32)
        if lvl.wg_down is not None and lvl.wg_up is not None:
            if down_rb is not None and down_rb.shape[0]:
                down_rb = np.zeros((0, down_rb.shape[1]), np.int32)
            if parent is not None and parent.shape[0]:
                parent = np.zeros((0,), np.int32)
            if child_offset is not None and child_offset.shape[0]:
                child_offset = np.zeros((0,), np.int32)
        if i > 0 and grid.coords.shape[0]:
            # in-graph consumers above level 0 only read grid.valid
            grid = grid.replace(coords=np.zeros((0, 4), np.int32),
                                key_hi=np.zeros((0,), np.int32),
                                key_lo=np.zeros((0,), np.int32),
                                counts=np.zeros((0,), np.int32))
        elif grid.key_hi.shape[0]:
            # L0: only coords[:, 3] (scene ids) and counts feed the
            # training graph's pooling — the sorted keys serve on-device
            # rulebook lookups, which host plans replace entirely.  Ship
            # JUST the scene-id column as int16 (the encoder reads
            # grid.coords[:, -1]); the spatial columns were 4.7 MB of
            # dead transfer per bench batch.
            grid = grid.replace(key_hi=np.zeros((0,), np.int32),
                                key_lo=np.zeros((0,), np.int32),
                                coords=np.asarray(grid.coords[:, 3:4],
                                                  np.int16))
        new_levels.append(lvl.replace(
            grid=grid, subm_rb=subm_rb, parent=parent,
            child_offset=child_offset, down_rb=down_rb,
            win=_slim_win(lvl.win),
            wg_down=_slim_win(lvl.wg_down), wg_up=_slim_win(lvl.wg_up)))
    return plans.replace(levels=tuple(new_levels))


def slim_batch_for_train(batch: PointBatch,
                         cfg: Optional[Config] = None) -> PointBatch:
    """Drop point leaves no train graph reads once plans are attached.

    With host plans, every encoder path takes ``vox_feats``/``point2voxel``
    and reads ``coords``/``feats`` only in the plans-free branch
    (tdwss.models.sparse_encoders.__call__), and ``point_ids`` exists only
    for val-time vote accumulation — yet all three still ride the
    host->device transfer (~25 MB of a ~184 MB bench batch).  Zero-row
    placeholders keep the pytree structure and column counts; XLA already
    dead-code-eliminated the values, this eliminates the transfer.

    ``coords`` survives for models registered with
    ``reads_point_coords=True`` (FullySupervised's scene pooling segments
    point logits by ``batch.batch_idx == coords[:, 3]``).
    ``point_label``/``valid``/``point2voxel``/``point_perm`` always stay:
    the pseudo-label point loss and FullySupervised read them at train.
    """
    if batch.plans is None:
        return batch
    feats = np.zeros((0, batch.feats.shape[1]),
                     np.asarray(batch.feats).dtype)
    pids = np.zeros((0,), np.asarray(batch.point_ids).dtype)
    out = batch.replace(feats=feats, point_ids=pids)
    # narrow dtypes on the leaves that do ship: labels are class ids in
    # [-100, 19] (int8 exact; masked_cross_entropy upcasts in-graph), and
    # the step's first op casts vox_feats to the compute dtype anyway —
    # casting host-side moves the transfer to the narrow side
    if cfg is not None:
        label8 = np.asarray(batch.point_label).astype(np.int8)
        out = out.replace(point_label=label8)
        if cfg.engine.compute_dtype == "bfloat16" and out.vox_feats is not None:
            import jax.numpy as jnp

            out = out.replace(
                vox_feats=np.asarray(out.vox_feats).astype(jnp.bfloat16))
    needs_coords = False
    if cfg is not None:
        from tdwss.models.meta_arch import MODEL_REGISTRY

        try:
            _, meta = MODEL_REGISTRY.get(cfg.model_name)
            needs_coords = bool(meta.get("reads_point_coords"))
        except KeyError:
            needs_coords = True        # unknown model: keep everything
    if not needs_coords:
        coords = np.zeros((0, batch.coords.shape[1]),
                          np.asarray(batch.coords).dtype)
        out = out.replace(coords=coords)
    # Scene-level training never touches the point domain: the encoder
    # pools count-weighted VOXEL features (devoxelize stays out of the
    # train graph) and the scene loss masks via scene_mask.  The point
    # leaves only feed the pseudo-label point CE (label: pseudo /
    # FullySupervised) — ~8 MB/batch of dead transfer otherwise.
    if cfg is not None and cfg.label != "pseudo" and (
            cfg.model_name != "FullySupervised"):
        out = out.replace(
            point2voxel=np.zeros((0,), np.int32),
            point_perm=np.zeros((0,), np.int32),
            point_label=np.zeros((0,), np.asarray(out.point_label).dtype),
            valid=np.zeros((0,), np.asarray(out.valid).dtype))
    return out


def attach_host_plans(batch: PointBatch, cfg: Config,
                      slim: bool = True) -> PointBatch:
    """Return the batch with plans/vox_feats/point2voxel filled in (numpy).

    No-op if the batch already carries plans.  ``slim`` strips
    device-dead plan leaves (see :func:`slim_plans_for_device`); pass
    False to keep the full host plan (e.g. for plan introspection).
    """
    if batch.plans is not None:
        return batch
    coords = np.asarray(batch.coords)
    num_levels, caps, downsample = encoder_plan_spec(cfg, coords.shape[0])
    plans, vox_feats, p2v, perm = host_voxelize_and_plan(
        coords, np.asarray(batch.feats), np.asarray(batch.valid),
        num_levels, caps, downsample)
    if slim and cfg.engine.slim_device_plans:
        plans = slim_plans_for_device(plans)
    return batch.replace(plans=plans, vox_feats=vox_feats, point2voxel=p2v,
                         point_perm=perm)
