"""Point-cloud voxelization / devoxelization.

Capability parity with SparseConvNet's ``scn.InputLayer(dim, full_scale,
mode=4)`` (duplicate coordinates averaged — see reference
models/SparseConvNet.py:61 and Function_test.py:38-45) and
``scn.OutputLayer`` (per-point readback of the owning voxel's features).

TPU-native design: a lexicographic sort over packed integer keys followed by
adjacent-compare deduplication and ``segment_sum`` averaging — all static
shapes.  The resulting voxel arrays are *key-sorted by construction*, which
is what makes the binary-search rulebooks in :mod:`tdwss.ops.plan` possible
without any hash table.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tdwss.ops.coords import INVALID_KEY, make_keys, sort_by_keys


@flax.struct.dataclass
class SparseGrid:
    """A static-capacity set of active voxels, key-sorted.

    coords:  (V, 4) int32 [x, y, z, b]; undefined rows where ``~valid``
    key_hi:  (V,) int32 sorted ascending (INVALID_KEY padding at tail)
    key_lo:  (V,) int32
    valid:   (V,) bool
    counts:  (V,) int32 number of source points/voxels merged into each slot
    num_valid: () int32 TRUE number of distinct voxels — may EXCEED capacity,
               which signals overflow (excess voxels were dropped)
    """

    coords: jnp.ndarray
    key_hi: jnp.ndarray
    key_lo: jnp.ndarray
    valid: jnp.ndarray
    counts: jnp.ndarray
    num_valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        # from ``valid``, not ``coords``: device-slimmed coarse grids
        # (tdwss.data.plans.slim_plans_for_device) drop coords/keys/counts
        # but always keep the (V,) valid mask
        return self.valid.shape[0]


def voxelize(
    coords: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    valid: jnp.ndarray,
    num_voxels: int,
    mode: str = "mean",
) -> Tuple[SparseGrid, Optional[jnp.ndarray], jnp.ndarray]:
    """Deduplicate integer point coordinates into a sparse voxel grid.

    Args:
      coords: (N, 4) int32 [x, y, z, b], already cropped to [0, full_scale).
      feats:  (N, C) per-point features, or None (structure-only pass — used
              for building coarser coordinate levels).
      valid:  (N,) bool point validity (padding mask).
      num_voxels: static voxel capacity V.  Points whose voxel rank exceeds V
              are dropped (overflow is counted in ``grid.num_valid`` vs V).
      mode:   "mean" (InputLayer mode=4), "sum", or "first".

    Returns:
      (grid, vox_feats (V, C) or None, point2voxel (N,) int32).
      ``point2voxel[i] >= V`` for invalid/overflowed points — gathers with
      ``mode='fill'`` then read zeros, scatters with ``mode='drop'`` ignore.
    """
    n = coords.shape[0]
    hi, lo = make_keys(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_idx = sort_by_keys(hi, lo, idx)
    s_coords = jnp.take(coords, s_idx, axis=0)
    s_valid = jnp.take(valid, s_idx)

    prev_hi = jnp.concatenate([jnp.full((1,), -2, jnp.int32), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -2, jnp.int32), s_lo[:-1]])
    is_first = jnp.logical_and((s_hi != prev_hi) | (s_lo != prev_lo), s_valid)

    ranks = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # voxel rank per sorted point
    num_valid = jnp.where(is_first.any(), ranks[-1] + 1, 0).astype(jnp.int32)
    # Invalid or overflowed points map out of range (drop/fill semantics).
    vox_id = jnp.where(s_valid & (ranks < num_voxels), ranks, num_voxels)

    point2voxel = jnp.zeros((n,), jnp.int32).at[s_idx].set(vox_id)

    v = num_voxels
    vox_coords = jnp.zeros((v, 4), jnp.int32).at[vox_id].set(s_coords, mode="drop")
    vox_hi = jnp.full((v,), INVALID_KEY, jnp.int32).at[vox_id].set(s_hi, mode="drop")
    vox_lo = jnp.full((v,), INVALID_KEY, jnp.int32).at[vox_id].set(s_lo, mode="drop")
    counts = jnp.zeros((v,), jnp.int32).at[vox_id].add(1, mode="drop")
    vox_valid = counts > 0

    grid = SparseGrid(
        coords=vox_coords,
        key_hi=vox_hi,
        key_lo=vox_lo,
        valid=vox_valid,
        counts=counts,
        num_valid=num_valid,
    )

    vox_feats = None
    if feats is not None:
        s_feats = jnp.take(feats, s_idx, axis=0)
        if mode == "first":
            order = jnp.where(is_first, 0, 1).astype(jnp.int32)
            # stable: first occurrence wins via add of masked values
            masked = jnp.where(is_first[:, None], s_feats, 0)
            vox_feats = (
                jnp.zeros((v, feats.shape[1]), feats.dtype)
                .at[vox_id]
                .add(masked, mode="drop")
            )
            del order
        else:
            vox_feats = (
                jnp.zeros((v, feats.shape[1]), feats.dtype)
                .at[vox_id]
                .add(s_feats, mode="drop")
            )
            if mode == "mean":
                denom = jnp.maximum(counts, 1).astype(vox_feats.dtype)
                vox_feats = vox_feats / denom[:, None]

    return grid, vox_feats, point2voxel


def devoxelize(vox_feats: jnp.ndarray, point2voxel: jnp.ndarray) -> jnp.ndarray:
    """Per-point readback of voxel features (scn.OutputLayer parity).

    Out-of-range ids (invalid/overflowed points) read zeros.  NOTE: the
    autodiff VJP of this gather is an XLA scatter-add (serialized on TPU);
    training paths should use :func:`devoxelize_seg`.
    """
    return jnp.take(vox_feats, point2voxel, axis=0, mode="fill", fill_value=0)


@jax.custom_vjp
def _devoxelize_seg(vox_feats, point2voxel, point_perm, counts):
    return jnp.take(vox_feats, point2voxel, axis=0, mode="fill", fill_value=0)


def _devoxelize_seg_fwd(vox_feats, point2voxel, point_perm, counts):
    out = _devoxelize_seg(vox_feats, point2voxel, point_perm, counts)
    return out, (point2voxel, point_perm, counts, vox_feats.shape[0])


def _devoxelize_seg_bwd(res, dpts):
    point2voxel, point_perm, counts, v = res
    # dvox[j] = sum of dpts over voxel j's contiguous run in the
    # host-sorted point order — a cumsum difference, NOT a scatter (XLA
    # serializes colliding scatter-adds on TPU).
    sorted_d = jnp.take(dpts, point_perm, axis=0).astype(jnp.float32)
    prefix = jnp.cumsum(sorted_d, axis=0)
    prefix = jnp.concatenate(
        [jnp.zeros((1, dpts.shape[1]), jnp.float32), prefix], axis=0)
    ends = jnp.cumsum(counts)                        # (V,)
    starts = ends - counts
    dvox = jnp.take(prefix, ends, axis=0) - jnp.take(prefix, starts, axis=0)
    from jax.dtypes import float0 as _f0

    zeros = lambda a: np.zeros(a.shape, dtype=_f0)  # noqa: E731
    return (dvox.astype(dpts.dtype), zeros(point2voxel), zeros(point_perm),
            zeros(counts))


_devoxelize_seg.defvjp(_devoxelize_seg_fwd, _devoxelize_seg_bwd)


def devoxelize_seg(vox_feats: jnp.ndarray, point2voxel: jnp.ndarray,
                   point_perm: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """Differentiable devoxelize with a scatter-free (cumsum-run) VJP.

    ``point_perm`` (N,) orders points into contiguous per-voxel runs with
    dropped/invalid points at the tail; ``counts`` (V,) is points-per-voxel
    (both from the host voxelizer, tdwss.ops.host_plan).
    """
    return _devoxelize_seg(vox_feats, point2voxel, point_perm, counts)
