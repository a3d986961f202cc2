"""Brick-form submanifold convolution (experimental round-2 engine).

Runs a 3^3 submanifold convolution as XLA `conv3d` over dense occupied
bricks (see `tdwss/ops/brick_plan.py` and docs/DESIGN.md): fill bricks from
the voxel array, assemble a 1-cell halo from the 26 adjacent bricks
(static-slice placements, gathered per offset), convolve VALID, and read
occupied cells back.  Exactly equivalent to
:func:`tdwss.ops.sparse_conv.subm_conv_apply` — empty cells are zero, so
missing neighbors contribute nothing and outputs exist only at occupied
cells (the readout).

Status: forward implemented + oracle-tested, and measured at production
scale: on ScanNet-like surfaces the 8^3-brick occupancy is only ~5%
(26k bricks for 637k voxels at 2cm), so conv3d does ~20x the voxel FLOPs
and — with the 26 halo gathers — runs 522 ms/conv vs 135 ms for the
windowed engine.  Kept as the reference implementation for denser data /
smaller bricks and as the substrate for a future coalesced-descriptor halo
(see `tdwss/ops/pallas_gather.py`); the windowed path stays the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tdwss.ops.experimental.brick_plan import _NEIGHBOR_OFFSETS, BrickPlan


def _fill_bricks(vox_feats: jnp.ndarray, plan: BrickPlan) -> jnp.ndarray:
    """(V, C) -> (B, S, S, S, C) dense bricks (empty cells zero)."""
    s = plan.size
    c = vox_feats.shape[-1]
    flat = jnp.take(vox_feats, plan.cell2vox.reshape(-1), axis=0,
                    mode="fill", fill_value=0)
    return flat.reshape(-1, s, s, s, c)


def _halo_pad(bricks: jnp.ndarray, neighbors: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, S, C) -> (B, S+2, S+2, S+2, C) with neighbor halos.

    For each of the 26 offsets, the needed slice of the neighbor brick is
    gathered (missing neighbor -> zero) and placed into the halo shell with
    a static-slice update.
    """
    b, s = bricks.shape[0], bricks.shape[1]
    c = bricks.shape[-1]
    padded = jnp.zeros((b, s + 2, s + 2, s + 2, c), bricks.dtype)
    padded = padded.at[:, 1:s + 1, 1:s + 1, 1:s + 1].set(bricks)

    def src_slice(d):
        # offset +1 means the neighbor brick ABOVE us in that axis: we need
        # its LOW face; -1 means its HIGH face; 0 keeps the full axis.
        return {1: slice(0, 1), -1: slice(s - 1, s), 0: slice(0, s)}[int(d)]

    def dst_slice(d):
        return {1: slice(s + 1, s + 2), -1: slice(0, 1),
                0: slice(1, s + 1)}[int(d)]

    for j, (dx, dy, dz) in enumerate(_NEIGHBOR_OFFSETS):
        piece = bricks[:, src_slice(dx), src_slice(dy), src_slice(dz), :]
        gathered = jnp.take(piece, neighbors[:, j], axis=0, mode="fill",
                            fill_value=0)
        padded = padded.at[:, dst_slice(dx), dst_slice(dy), dst_slice(dz),
                           :].set(gathered)
    return padded


def brick_subm_conv(vox_feats: jnp.ndarray, plan: BrickPlan,
                    weight: jnp.ndarray) -> jnp.ndarray:
    """Submanifold 3^3 conv over bricks; (V, Cin) -> (V, Cout).

    weight (27, Cin, Cout) in the x-slowest tap order of
    tdwss.ops.coords.kernel_offsets.
    """
    s = plan.size
    k, cin, cout = weight.shape
    if k != 27:
        raise ValueError("brick conv supports 3^3 kernels")
    bricks = _fill_bricks(vox_feats, plan)
    padded = _halo_pad(bricks, jnp.asarray(plan.neighbors))
    kernel = weight.reshape(3, 3, 3, cin, cout).astype(bricks.dtype)
    y = jax.lax.conv_general_dilated(
        padded, kernel, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(vox_feats.dtype)                                # (B, S, S, S, Cout)
    flat = y.reshape(-1, cout)
    return jnp.take(flat, plan.vox2cell, axis=0, mode="fill", fill_value=0)
