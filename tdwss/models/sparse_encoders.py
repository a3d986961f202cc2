"""Sparse-conv point-cloud encoders (flax), reference parity.

Mirrors the encoder zoo of reference ``models/SparseConvNet.py``:

- ``SparseConvUNet``        scn.UNet body, embed = m                 (ref :57-71)
- ``SparseConvFCNet``       scn.FullyConvolutionalNet, embed = 28m   (ref :73-88)
- ``SparseConvFCNetNarrow`` FCN with explicit planes                 (ref :90-105)
- ``SparseConvFCNetDirectUpPool[Light]`` sequential down/up-pool FCN (ref :107-211)

Every encoder follows the scn pipeline
``InputLayer(mode=4) -> SubmanifoldConvolution(3->m) -> body ->
BatchNormReLU -> OutputLayer`` and the ``[coords, feats] -> per-point
features`` contract (reference models/SparseConvNet.py:34-55); with
``istrain=True`` the per-scene mean pooling of ``postProcessing``
(ref :20-26) is applied on device via segment_mean.

TPU-native structure: one :class:`~tdwss.ops.plan.LevelPlans` is built per
forward and shared by all layers (SCN metadata parity); all shapes static.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tdwss.models.layers import (
    BatchNormReLU,
    Deconv,
    NetworkInNetwork,
    StridedConv,
    SubmConv,
)
from tdwss.ops.plan import LevelPlans, build_plans, level_capacities
from tdwss.ops.segment import segment_mean_weighted
from tdwss.ops.voxelize import devoxelize, devoxelize_seg, voxelize
from tdwss.registry import MODEL_REGISTRY


class ConvBlock(nn.Module):
    """VGG (BNReLU->SubmConv) or ResNet (two-conv + shortcut) block.

    Matches the scn ``block(m, a, b)`` helper used by UNet /
    FullyConvolutionalNet and the reference's hand-rolled FCNEncoder
    (models/SparseConvNet.py:112-124).
    """

    out_channels: int
    residual: bool = False

    @nn.compact
    def __call__(self, feats, rulebook, valid, train: bool, win=None):
        a, b = feats.shape[-1], self.out_channels
        if not self.residual:
            h = BatchNormReLU(name="bnrelu")(feats, valid, train)
            return SubmConv(b, rulebook.shape[-1], name="conv")(h, rulebook,
                                                                win)
        shortcut = feats if a == b else NetworkInNetwork(b, name="nin")(feats)
        h = BatchNormReLU(name="bnrelu1")(feats, valid, train)
        h = SubmConv(b, rulebook.shape[-1], name="conv1")(h, rulebook, win)
        h = BatchNormReLU(name="bnrelu2")(h, valid, train)
        h = SubmConv(b, rulebook.shape[-1], name="conv2")(h, rulebook, win)
        return shortcut + h


class UNetBody(nn.Module):
    """scn.UNet parity: recursive U with concat skip + decoder blocks."""

    n_planes: Tuple[int, ...]
    reps: int
    residual: bool

    @nn.compact
    def __call__(self, feats, plans: LevelPlans, level: int, train: bool):
        planes = self.n_planes
        lvl = plans.levels[level]
        valid = lvl.grid.valid
        for i in range(self.reps):
            feats = ConvBlock(planes[0], self.residual, name=f"enc{i}")(
                feats, lvl.subm_rb, valid, train, lvl.win
            )
        if len(planes) > 1:
            identity = feats
            h = BatchNormReLU(name="down_bnrelu")(feats, valid, train)
            h = StridedConv(planes[1], lvl.down_rb.shape[-1], name="down_conv")(
                h, lvl.down_rb, lvl.parent, lvl.child_offset,
                lvl.wg_down, lvl.wg_up
            )
            h = UNetBody(planes[1:], self.reps, self.residual, name="inner")(
                h, plans, level + 1, train
            )
            h = BatchNormReLU(name="up_bnrelu")(
                h, plans.levels[level + 1].grid.valid, train
            )
            h = Deconv(planes[0], lvl.down_rb.shape[-1], name="up_deconv")(
                h, lvl.parent, lvl.child_offset, valid, lvl.down_rb,
                lvl.wg_up, lvl.wg_down
            )
            feats = jnp.concatenate([identity, h], axis=-1)
            for i in range(self.reps):
                feats = ConvBlock(planes[0], self.residual, name=f"dec{i}")(
                    feats, lvl.subm_rb, valid, train, lvl.win
                )
        return feats


class FCNBody(nn.Module):
    """scn.FullyConvolutionalNet parity: concat identity with unpooled deep.

    Output channels at the finest level = sum(n_planes).
    """

    n_planes: Tuple[int, ...]
    reps: int
    residual: bool

    @nn.compact
    def __call__(self, feats, plans: LevelPlans, level: int, train: bool):
        planes = self.n_planes
        lvl = plans.levels[level]
        valid = lvl.grid.valid
        for i in range(self.reps):
            feats = ConvBlock(planes[0], self.residual, name=f"enc{i}")(
                feats, lvl.subm_rb, valid, train, lvl.win
            )
        if len(planes) > 1:
            identity = feats
            h = BatchNormReLU(name="down_bnrelu")(feats, valid, train)
            h = StridedConv(planes[1], lvl.down_rb.shape[-1], name="down_conv")(
                h, lvl.down_rb, lvl.parent, lvl.child_offset,
                lvl.wg_down, lvl.wg_up
            )
            h = FCNBody(planes[1:], self.reps, self.residual, name="inner")(
                h, plans, level + 1, train
            )
            if lvl.wg_up is not None and lvl.wg_down is not None:
                from tdwss.ops.sparse_conv import wg_unpool_apply

                h = wg_unpool_apply(h, lvl.wg_up, lvl.wg_down)
            else:
                from tdwss.ops.sparse_conv import unpool

                h = unpool(h, lvl.parent, fine_valid=valid,
                           down_rb=lvl.down_rb)
            feats = jnp.concatenate([identity, h], axis=-1)
        return feats


class DirectUpPoolBody(nn.Module):
    """Reference FCNEncoder parity (models/SparseConvNet.py:110-143).

    Sequential (no skip concat): blocks -> BNReLU -> strided conv ->
    recurse -> unpool.  Output channels = n_planes[-1] at finest level.
    """

    n_planes: Tuple[int, ...]
    reps: int
    residual: bool

    @nn.compact
    def __call__(self, feats, plans: LevelPlans, level: int, train: bool):
        planes = self.n_planes
        lvl = plans.levels[level]
        valid = lvl.grid.valid
        for i in range(self.reps):
            feats = ConvBlock(planes[0], self.residual, name=f"enc{i}")(
                feats, lvl.subm_rb, valid, train, lvl.win
            )
        if len(planes) > 1:
            h = BatchNormReLU(name="down_bnrelu")(feats, valid, train)
            h = StridedConv(planes[1], lvl.down_rb.shape[-1], name="down_conv")(
                h, lvl.down_rb, lvl.parent, lvl.child_offset,
                lvl.wg_down, lvl.wg_up
            )
            h = DirectUpPoolBody(planes[1:], self.reps, self.residual, name="inner")(
                h, plans, level + 1, train
            )
            if lvl.wg_up is not None and lvl.wg_down is not None:
                from tdwss.ops.sparse_conv import wg_unpool_apply

                feats = wg_unpool_apply(h, lvl.wg_up, lvl.wg_down)
            else:
                from tdwss.ops.sparse_conv import unpool

                feats = unpool(h, lvl.parent, fine_valid=valid,
                               down_rb=lvl.down_rb)
        return feats


_BODIES = {"unet": UNetBody, "fcn": FCNBody, "direct_uppool": DirectUpPoolBody}


class _SparseEncoderBase(nn.Module):
    """Shared scn pipeline around a body (SparseConvBase_ parity, ref :10-55).

    Subclasses define ``plane_schedule()`` and ``body_kind``.
    """

    m: int = 16
    dimension: int = 3
    full_scale: int = 4096
    block_reps: int = 1
    residual_blocks: bool = False
    depth: int = 7
    n_planes: Optional[Sequence[int]] = None
    downsample: Tuple[int, int] = (2, 2)
    # engine knobs
    max_voxels: int = 0                   # 0 => number of input points
    level_capacity_shrink: int = 2
    level_capacity_schedule: Optional[Tuple[int, ...]] = None
    min_level_capacity: int = 2048
    compute_dtype: str = "float32"        # bfloat16 halves HBM traffic
    remat: bool = False                   # rematerialize level bodies
    body_kind: str = "unet"

    def plane_schedule(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def plan_spec(self, n_points: int):
        """(num_levels, capacities, downsample) — shared with the host-side
        plan builder so collate can precompute identical rulebooks."""
        planes = self.plane_schedule()
        cap0 = self.max_voxels or n_points
        caps = level_capacities(
            cap0, len(planes), self.level_capacity_shrink,
            self.min_level_capacity, self.level_capacity_schedule,
        )
        return len(planes), caps, tuple(self.downsample)

    @nn.compact
    def __call__(self, coords, feats, valid, istrain: bool = False,
                 train: bool = False, num_scenes: int = 1,
                 plans=None, vox_feats=None, point2voxel=None,
                 point_perm=None):
        """[coords, feats] -> per-point features (or per-scene means if istrain).

        coords (N, 4) int32 [x,y,z,b]; feats (N, C); valid (N,) bool.
        ``train`` controls BN statistics; ``istrain`` additionally applies
        the per-scene mean pooling (postProcessing parity).

        When ``plans`` (+ ``vox_feats``/``point2voxel``) are supplied — built
        on host by :mod:`tdwss.ops.host_plan` — the on-device voxelize/sort/
        rulebook construction is skipped entirely and the step is pure
        gather-GEMM-scatter.
        """
        planes = self.plane_schedule()
        n = coords.shape[0]
        if plans is not None:
            grid = plans.levels[0].grid
            vfeats, p2v = vox_feats, point2voxel
        else:
            _, caps, (f, s) = self.plan_spec(n)
            cap0 = caps[0]
            # InputLayer(mode=4): dedupe-average points into voxels
            grid, vfeats, p2v = voxelize(coords, feats, valid, cap0, mode="mean")
            plans = build_plans(grid, len(planes), caps, (f, s), subm_kernel=3)

        vfeats = vfeats.astype(jnp.dtype(self.compute_dtype))
        h = SubmConv(self.m, 27, name="stem")(
            vfeats, plans.levels[0].subm_rb, plans.levels[0].win)
        body = _BODIES[self.body_kind]
        if self.remat:
            # trade FLOPs for HBM: recompute the body in the backward pass
            body = nn.remat(body, static_argnums=(3, 4))  # (level, train); 0 = self
        h = body(tuple(planes), self.block_reps, self.residual_blocks, name="body")(
            h, plans, 0, train
        )
        h = BatchNormReLU(name="final_bnrelu")(h, grid.valid, train)
        if istrain:
            # Scene mean over points == count-weighted mean over voxels
            # (every point reads its voxel's features, OutputLayer parity).
            # Pooling on voxels keeps the devoxelize gather — whose VJP is a
            # TPU-hostile scatter — out of the training graph entirely.
            # grid.coords may ship int16 (slim_batch_for_train); the
            # segment one-hot compares want int32
            # [:, -1]: slim may ship only the scene-id column (V, 1)
            return segment_mean_weighted(
                h.astype(jnp.float32),
                grid.coords[:, -1].astype(jnp.int32), grid.counts,
                num_scenes, grid.valid)
        # OutputLayer: voxel -> point readback (fp32 for heads/losses).
        # With a host-provided run permutation the readback stays
        # differentiable without a TPU scatter (FullySupervised point CE).
        if point_perm is not None:
            return devoxelize_seg(h.astype(jnp.float32), p2v, point_perm,
                                  grid.counts)
        return devoxelize(h.astype(jnp.float32), p2v)


@MODEL_REGISTRY.register(embed_length=lambda m: m)
class SparseConvUNet(_SparseEncoderBase):
    """scn.UNet encoder, planes [m..7m] (reference models/SparseConvNet.py:57-71)."""

    body_kind: str = "unet"

    def plane_schedule(self):
        return tuple((i + 1) * self.m for i in range(7))


@MODEL_REGISTRY.register(embed_length=lambda m: 7 * (7 + 1) * m // 2)
class SparseConvFCNet(_SparseEncoderBase):
    """scn.FullyConvolutionalNet encoder (reference :73-88), embed = 28m."""

    body_kind: str = "fcn"

    def plane_schedule(self):
        return tuple((i + 1) * self.m for i in range(self.depth))


@MODEL_REGISTRY.register(embed_length=lambda m: sum([m, 64, 128, 192, 256]))
class SparseConvFCNetNarrow(_SparseEncoderBase):
    """FCN with explicit narrow planes (reference :90-105)."""

    body_kind: str = "fcn"

    def plane_schedule(self):
        extra = tuple(self.n_planes) if self.n_planes else (64, 128, 192, 256)
        return (self.m,) + extra


@MODEL_REGISTRY.register(embed_length=lambda m: 256)
class SparseConvFCNetDirectUpPool(_SparseEncoderBase):
    """Sequential down/up-pool FCN (reference :107-158), embed = planes[-1]."""

    body_kind: str = "direct_uppool"

    def plane_schedule(self):
        extra = tuple(self.n_planes) if self.n_planes else (64, 128, 192, 256)
        return (self.m,) + extra


@MODEL_REGISTRY.register(embed_length=lambda m: 128)
class SparseConvFCNetDirectUpPoolLight(_SparseEncoderBase):
    """Light variant with downsample [4,4] (reference :160-211)."""

    body_kind: str = "direct_uppool"
    downsample: Tuple[int, int] = (4, 4)

    def plane_schedule(self):
        extra = tuple(self.n_planes) if self.n_planes else (32, 64, 96, 128)
        return (self.m,) + extra


def embed_length_of(name: str, m: int) -> int:
    """Resolve an encoder's output width from registry metadata."""
    _, meta = MODEL_REGISTRY.get(name)
    return meta.get("embed_length", lambda m_: m_)(m)
