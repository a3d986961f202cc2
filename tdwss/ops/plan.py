"""Per-level coordinate systems + rulebooks for a whole encoder forward.

SparseConvNet builds a "metadata" object per spatial size — hash tables and
gather/scatter "rulebooks" shared by every layer operating at that size.
This module is the TPU-native equivalent: given the input voxel grid and the
static network geometry (number of levels, downsample factor), it constructs
once per forward:

- each level's key-sorted :class:`~tdwss.ops.voxelize.SparseGrid`;
- a submanifold rulebook ``(V, K)`` per level (neighbor index per filter
  offset, -1 where inactive) via vectorized binary search;
- fine->coarse ``parent`` / ``child_offset`` maps and the strided-conv
  rulebook ``(V_coarse, f^3)`` — derived *without any search* when
  ``filter == stride`` (the only case the reference models use,
  models/SparseConvNet.py:137-140) by scattering fine indices into their
  parent's offset slot.

All shapes are static; per-level capacities come from the engine config.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from tdwss.ops.coords import kernel_offsets, lookup_sorted, make_query_keys
from tdwss.ops.voxelize import SparseGrid, voxelize


@flax.struct.dataclass
class Windowed27:
    """Metadata for the 27-tap windowed-MXU submanifold conv (host-built).

    TPU gathers run at a fixed ~62M rows/s regardless of row width, which
    made plain 27-tap gathers ~90% of the train step; this decomposition
    replaces them with per-tile contiguous window loads + one-hot MXU
    matmuls.  (An earlier x-triple form anchored on the 9 dx==0 taps, but
    on surfaces the dx==0 anchor is often missing while a diagonal
    neighbor exists, flooding its residual list with ~7% of entries —
    measured 1.03M of 1.07M residuals at V=636k — so it was dropped.)
    Here every one of the 27 taps is a windowed one-hot matmul.  Taps
    sharing (dy, dz) differ by +-1 physical row (x is the fastest key
    dim), so the 27 taps ride the same 9 shared windows (group = tap % 9,
    :func:`tdwss.ops.coords.kernel_offsets` ordering with x slowest in the
    tap index).  The only residuals left are window spills (~0.3-0.7% of
    entries), kept as a compact overflow list — no aligned per-voxel tier.

    starts:    (tiles, nwin) int32  shared-window start per (row-tile,
                                 window group), nwin in {9, 3} (per-(dy,dz)
                                 or per-dz sharing), 8-aligned, clamped to
                                 [0, V - window]
    rb_local:  (V, 27) int32     tap source pos - start[tile, k % nwin], or
                                 == window (sentinel -> zero one-hot row)
    res_ovf:   (E2, 3) int32     spilled entries [v, tap27, src], sorted
                                 by v (pad rows carry v == src == V) —
                                 legacy run-sum layout, normally EMPTY
                                 when the tiled layouts below are present
                                 (its per-owner scatter-add costs ~150
                                 ns/row serialized on TPU)
    ovf_v:     (H,) int32        voxels owning spills (pad V)
    ovf_count: (H,) int32        entries per such voxel (prefix-run layout)
    res_tile:  (T2, R1, 3) int32 TILE-GROUPED spills [v %% t_res, tap, src]
                                 per t_res=512-row out tile (pad rows:
                                 local == t_res, src == V): accumulation
                                 becomes a per-tile one-hot MXU matmul —
                                 scatter-free.  Tiles holding more than R1
                                 spills (scene-boundary clusters would
                                 blow R1 to thousands) route to
    res_hent:  (EH, 3) int32     the compact flat heavy list sorted by
                                 tile (pad v == V, src == V), walked by
    res_htile: (H2, 2) int32     [base tile_id, entry_offset] per heavy chunk
                                 (a chunk packs up to _RES_HSPAN consecutive
                                 heavy tiles' entries; scatter window starts
                                 at the base tile) —
                                 a lax.scan reads a fixed S2-entry window
                                 of the flat list per heavy tile, one-hot
                                 scatters it into a (t_res, C) block, and
                                 block-adds via dynamic_update_slice (H2
                                 serial steps; pad rows tile_id == T2).
    window:    static int        W (multiple of 8)

    The backward reuses the SAME metadata: the decomposition is an exact
    cover of rb27's entries, so the transposed conv is this same evaluation
    applied to the cotangent with the flipped-transposed weight table
    W'[k] = W[26-k]^T.
    """

    starts: jnp.ndarray
    rb_local: jnp.ndarray
    res_ovf: jnp.ndarray
    ovf_v: jnp.ndarray
    ovf_count: jnp.ndarray
    res_tile: Optional[jnp.ndarray] = None
    res_hent: Optional[jnp.ndarray] = None
    res_htile: Optional[jnp.ndarray] = None
    # Tap-chunked companion of res_hent (host_plan._tap_chunk): every
    # _RES_HCHUNK-entry chunk holds ONE tap's entries, so the device
    # evaluates contributions as a batched (chunk, C) @ (C, Cout) GEMM
    # with a gathered per-chunk weight instead of the (E, K*C)
    # one-hot-masked operand (27x the traffic).  res_tent (NC*CHUNK, 2)
    # [src, owner]; res_ttap (NC,) tap per chunk; res_tperm (EH,) slot of
    # each res_hent row in the tap layout (pad == NC*CHUNK).
    res_tent: Optional[jnp.ndarray] = None
    res_ttap: Optional[jnp.ndarray] = None
    res_tperm: Optional[jnp.ndarray] = None
    window: int = flax.struct.field(pytree_node=False, default=512)
    # Two-level sub-windows (0 = disabled): rows are additionally split
    # into sub-tiles of ``sub`` rows whose taps read a ``subwin``-wide
    # slice of the big window.  The one-hot build + matmul then run at
    # width subwin instead of window — the VPU one-hot construction is
    # the measured kernel bottleneck (~17 of 25 ms at W=640) and scales
    # with T x W.  ``sub_off`` is (tiles * S, nwin) int32: the 8-aligned
    # slice offset of each (sub-tile, window-group) within its big
    # window, clamped to [0, window - subwin]; rb_local is then relative
    # to (start + sub_off) with sentinel == subwin.
    sub_off: Optional[jnp.ndarray] = None
    sub: int = flax.struct.field(pytree_node=False, default=0)
    subwin: int = flax.struct.field(pytree_node=False, default=0)
    # Active output prefix (0 = whole array): out rows beyond v_active are
    # ALL padding (invalid voxels -> all-sentinel rb rows); the device
    # wrappers shrink the kernel grid to v_active rows and zero-pad, so
    # capacity padding (~20% at bench L0) stops costing kernel time.
    # Multiple of the tile size; sticky-ratcheted on host for jit-shape
    # stability.
    v_active: int = flax.struct.field(pytree_node=False, default=0)


@flax.struct.dataclass
class WindowedGather:
    """Windowed one-hot evaluation of an arbitrary (V_out, K) rulebook.

    Generalizes :class:`Windowed27` to cross-level rulebooks whose source
    rows live in a DIFFERENT coordinate system (strided conv's down_rb
    into the fine level; deconv/unpool's parent map into the coarse
    level).  Source rows of consecutive output rows are spatially local
    under the shared b,z,y,x key sort, so all K taps of an output tile
    read from ONE shared window of the source array.

    starts:    (tiles,) int32   shared-window start per out-row tile,
                                8-aligned, in [0, V_src - window]
    rb_local:  (V_out, K) int32 src pos - start[tile], or == window
    res_ovf / ovf_v / ovf_count: spill list as in :class:`Windowed27`
                                (entries [v_out, tap, src])
    window:    static int
    v_src:     static int       source-array capacity (for sanity checks)
    """

    starts: jnp.ndarray
    rb_local: jnp.ndarray
    res_ovf: jnp.ndarray
    ovf_v: jnp.ndarray
    ovf_count: jnp.ndarray
    res_tile: Optional[jnp.ndarray] = None
    res_hent: Optional[jnp.ndarray] = None
    res_htile: Optional[jnp.ndarray] = None
    # tap-chunked companion (see Windowed27.res_tent/res_ttap/res_tperm)
    res_tent: Optional[jnp.ndarray] = None
    res_ttap: Optional[jnp.ndarray] = None
    res_tperm: Optional[jnp.ndarray] = None
    window: int = flax.struct.field(pytree_node=False, default=512)
    v_src: int = flax.struct.field(pytree_node=False, default=0)
    # Two-level sub-windows, exactly as in :class:`Windowed27` (the
    # cross-level windows auto-size to 1024-2560 rows, so the one-hot
    # width cut matters even more here): sub_off is
    # (tiles * (tile/sub), nwin) int32 slice offsets, rb_local is then
    # relative to (start + sub_off) with sentinel == subwin.
    sub_off: Optional[jnp.ndarray] = None
    sub: int = flax.struct.field(pytree_node=False, default=0)
    subwin: int = flax.struct.field(pytree_node=False, default=0)


@flax.struct.dataclass
class GridLevel:
    grid: SparseGrid
    subm_rb: jnp.ndarray                     # (V, K) neighbor idx or -1
    parent: Optional[jnp.ndarray]            # (V,) idx into next level (or None at coarsest)
    child_offset: Optional[jnp.ndarray]      # (V,) linearized offset within parent cell
    down_rb: Optional[jnp.ndarray]           # (V_next, f^3) idx into THIS level
    # host-built windowed-conv metadata (Windowed27), None at levels that
    # fall back to the plain gather path
    win: Optional[object] = None
    # windowed cross-level gathers (WindowedGather): down = this level's
    # down_rb (coarse out, fine src) for the strided conv / unpool-sum
    # direction; up = the (parent, child_offset) map as a (Vf, f^3)
    # rulebook (fine out, coarse src) for the deconv / unpool direction.
    wg_down: Optional[WindowedGather] = None
    wg_up: Optional[WindowedGather] = None


@flax.struct.dataclass
class LevelPlans:
    levels: Tuple[GridLevel, ...]
    downsample: Tuple[int, int] = flax.struct.field(pytree_node=False)

    def __len__(self) -> int:
        return len(self.levels)


def build_subm_rulebook(grid: SparseGrid, kernel_size: int = 3) -> jnp.ndarray:
    """(V, K) neighbor indices for a centred cubic submanifold kernel.

    All K offsets are looked up in ONE batched binary search (a per-offset
    python loop multiplies the traced graph by K and ballooned compile
    times); the centre tap is patched to the identity afterwards.
    """
    offsets = kernel_offsets(kernel_size)          # (K, 3)
    k = offsets.shape[0]
    v = grid.capacity
    off4 = np.concatenate([offsets, np.zeros((k, 1), np.int32)], axis=1)
    q = grid.coords[:, None, :] + jnp.asarray(off4)[None, :, :]   # (V, K, 4)
    q = q.reshape(v * k, 4)
    valid = jnp.repeat(grid.valid, k)
    qh, ql = make_query_keys(q, valid)
    rb = lookup_sorted(grid.key_hi, grid.key_lo, qh, ql).reshape(v, k)
    centre = int(np.where(~offsets.any(axis=1))[0][0])
    own = jnp.where(grid.valid, jnp.arange(v, dtype=jnp.int32), -1)
    return rb.at[:, centre].set(own)


def _linear_child_offset(coords: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Linearized offset of a fine voxel within its parent cell.

    Ordering matches :func:`tdwss.ops.coords.kernel_offsets` for even sizes:
    k = ox * f^2 + oy * f + oz.
    """
    ox = coords[:, 0] % stride
    oy = coords[:, 1] % stride
    oz = coords[:, 2] % stride
    return (ox * stride * stride + oy * stride + oz).astype(jnp.int32)


def downsample_level(
    grid: SparseGrid,
    num_voxels: int,
    filter_size: int,
    stride: int,
):
    """Derive the next-coarser level and the fine<->coarse maps.

    Returns (coarse_grid, parent (Vf,), child_offset (Vf,), down_rb (Vc, f^3)).
    Requires filter_size == stride (reference encoders only use [2,2]/[4,4]).
    """
    if filter_size != stride:
        raise NotImplementedError(
            "strided conv with filter != stride is not used by the reference "
            "models (downsample=[2,2] or [4,4]); general support is a planned "
            "lookup-based fallback"
        )
    coarse_coords = jnp.concatenate(
        [grid.coords[:, :3] // stride, grid.coords[:, 3:4]], axis=1
    )
    coarse_grid, _, parent = voxelize(coarse_coords, None, grid.valid, num_voxels)
    child_offset = _linear_child_offset(grid.coords, stride)
    k = filter_size ** 3
    vf = grid.capacity
    fine_idx = jnp.arange(vf, dtype=jnp.int32)
    down_rb = (
        jnp.full((num_voxels, k), -1, jnp.int32)
        .at[parent, child_offset]
        .set(fine_idx, mode="drop")
    )
    return coarse_grid, parent, child_offset, down_rb


def level_capacities(
    base_capacity: int,
    num_levels: int,
    shrink: int = 2,
    min_capacity: int = 2048,
    schedule: Optional[Sequence[int]] = None,
) -> Tuple[int, ...]:
    """Static voxel capacity per level: shrink each level, floor at min.

    ``schedule`` gives a per-transition divisor list overriding ``shrink``
    (last entry repeats if shorter than num_levels - 1).
    """
    caps = []
    cap = base_capacity
    for lvl in range(num_levels):
        caps.append(max(int(cap), min(min_capacity, base_capacity)))
        if schedule:
            div = schedule[min(lvl, len(schedule) - 1)]
        else:
            div = shrink
        cap = cap // max(int(div), 1)
    return tuple(caps)


def build_plans(
    grid0: SparseGrid,
    num_levels: int,
    capacities: Sequence[int],
    downsample: Tuple[int, int] = (2, 2),
    subm_kernel: int = 3,
) -> LevelPlans:
    """Build all coordinate levels + rulebooks for an encoder forward."""
    f, s = int(downsample[0]), int(downsample[1])
    levels = []
    grid = grid0
    for lvl in range(num_levels):
        subm_rb = build_subm_rulebook(grid, subm_kernel)
        if lvl + 1 < num_levels:
            coarse_grid, parent, child_offset, down_rb = downsample_level(
                grid, int(capacities[lvl + 1]), f, s
            )
        else:
            coarse_grid = None
            parent = child_offset = down_rb = None
        levels.append(
            GridLevel(
                grid=grid,
                subm_rb=subm_rb,
                parent=parent,
                child_offset=child_offset,
                down_rb=down_rb,
            )
        )
        if coarse_grid is not None:
            grid = coarse_grid
    return LevelPlans(levels=tuple(levels), downsample=(f, s))
