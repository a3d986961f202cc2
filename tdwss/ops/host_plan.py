"""Host-side (numpy) voxelization + rulebook construction.

Numerically identical to the on-device builders in
:mod:`tdwss.ops.voxelize` / :mod:`tdwss.ops.plan`, but computed on the host
CPU at collate time.  Rationale (TPU-first): rulebook construction is
irregular index work — sorts, uniques, binary searches — which XLA lowers to
bitonic sorting networks on TPU; moving it to the host removes every sort
from the jitted step, shrinking both compile time and step time, and
overlaps index work with device compute through the input pipeline.  The
device then executes pure gather-GEMM-scatter (MXU-bound).

The on-device path remains available (``build_plans``) for tests and for
single-call compile checks; both produce the same ``LevelPlans`` pytree, so
models accept either.

The reference has no analogue: SparseConvNet builds hash-table rulebooks on
GPU per layer (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from tdwss.ops.coords import COORD_BITS, INVALID_KEY, kernel_offsets
from tdwss.ops.plan import GridLevel, LevelPlans
from tdwss.ops.voxelize import SparseGrid

_MAXKEY = np.int64(np.iinfo(np.int64).max)


def _pack_keys_np(coords: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """(N,4) int32 [x,y,z,b] -> int64 lexicographic key; invalid -> MAXKEY."""
    x = coords[:, 0].astype(np.int64)
    y = coords[:, 1].astype(np.int64)
    z = coords[:, 2].astype(np.int64)
    b = coords[:, 3].astype(np.int64)
    hi = (b << COORD_BITS) | z
    lo = (y << COORD_BITS) | x
    key = (hi << 32) | lo
    return np.where(valid, key, _MAXKEY)


def _split_keys(key64: np.ndarray, valid: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    hi = (key64 >> 32).astype(np.int32)
    lo = (key64 & 0xFFFFFFFF).astype(np.int32)
    hi = np.where(valid, hi, INVALID_KEY)
    lo = np.where(valid, lo, INVALID_KEY)
    return hi, lo


def voxelize_np(
    coords: np.ndarray,
    feats: Optional[np.ndarray],
    valid: np.ndarray,
    num_voxels: int,
    mode: str = "mean",
    return_order: bool = False,
):
    """Numpy twin of :func:`tdwss.ops.voxelize.voxelize` (same contract).

    Hot path delegated to the native parallel sort-dedup
    (native/tdwss_native.cpp voxelize); numpy fallback below.
    """
    coords = np.asarray(coords, np.int32)
    valid = np.asarray(valid, bool)
    n = coords.shape[0]

    from tdwss import native as _native

    if feats is None or mode == "mean":
        res = _native.voxelize(coords, valid, num_voxels, feats)
        if res is not None:
            (vox_coords, key_hi, key_lo, vox_valid, counts, num_valid, p2v,
             vox_feats, order) = res
            grid = SparseGrid(coords=vox_coords, key_hi=key_hi,
                              key_lo=key_lo, valid=vox_valid, counts=counts,
                              num_valid=num_valid)
            if feats is not None and vox_feats is not None:
                vox_feats = vox_feats.astype(np.asarray(feats).dtype)
            if return_order:
                return grid, vox_feats, p2v, order
            return grid, vox_feats, p2v

    key = _pack_keys_np(coords, valid)

    uniq, first_idx, inv, cnt = np.unique(
        key, return_index=True, return_inverse=True, return_counts=True)
    has_invalid = bool(uniq.size) and uniq[-1] == _MAXKEY
    nuniq = int(uniq.size) - int(has_invalid)

    v = int(num_voxels)
    in_cap = (inv < nuniq) & (inv < v)
    vox_id = np.where(in_cap, inv, v).astype(np.int32)

    kept = min(nuniq, v)
    vox_coords = np.zeros((v, 4), np.int32)
    vox_coords[:kept] = coords[first_idx[:kept]]
    vox_valid = np.zeros((v,), bool)
    vox_valid[:kept] = True
    counts = np.zeros((v,), np.int32)
    counts[:kept] = cnt[:kept]
    key_hi, key_lo = _split_keys(
        np.concatenate([uniq[:kept], np.full((v - kept,), _MAXKEY)]),
        vox_valid,
    )

    grid = SparseGrid(
        coords=vox_coords, key_hi=key_hi, key_lo=key_lo, valid=vox_valid,
        counts=counts, num_valid=np.int32(nuniq),
    )

    vox_feats = None
    if feats is not None:
        feats = np.asarray(feats)
        vox_feats = np.zeros((v, feats.shape[1]), np.float64)
        if mode == "first":
            vox_feats[:kept] = feats[first_idx[:kept]]
        else:
            ok = vox_id < v
            np.add.at(vox_feats, vox_id[ok], feats[ok])
            if mode == "mean":
                vox_feats[:kept] /= np.maximum(counts[:kept, None], 1)
        vox_feats = vox_feats.astype(feats.dtype)

    if return_order:
        # stable key sort: kept voxel runs first (rank order), dropped and
        # invalid points at the tail — matches the native voxelize.
        order = np.argsort(key, kind="stable").astype(np.int32)
        return grid, vox_feats, vox_id, order
    return grid, vox_feats, vox_id


def _lookup_np(key_hi: np.ndarray, key_lo: np.ndarray, qkey: np.ndarray,
               num_valid: int) -> np.ndarray:
    """Index of each int64 query key among the first ``num_valid`` sorted
    voxel keys, or -1."""
    keys = (key_hi[:num_valid].astype(np.int64) << 32) | (
        key_lo[:num_valid].astype(np.int64) & 0xFFFFFFFF)
    pos = np.searchsorted(keys, qkey)
    pos_c = np.minimum(pos, max(num_valid - 1, 0))
    hit = (pos < num_valid) & (keys[pos_c] == qkey) if num_valid else np.zeros(
        qkey.shape, bool)
    return np.where(hit, pos, -1).astype(np.int32)


def build_subm_rulebook_np(grid: SparseGrid, kernel_size: int = 3) -> np.ndarray:
    """Numpy twin of :func:`tdwss.ops.plan.build_subm_rulebook`.

    Hot path: delegated to the native parallel hash-probe builder
    (native/tdwss_native.cpp subm_rulebook, ~300x the numpy searchsorted
    version on a 786k-voxel level); numpy fallback below keeps the pipeline
    compiler-free.
    """
    from tdwss import native as _native

    rb_native = _native.subm_rulebook(
        np.asarray(grid.coords), np.asarray(grid.valid), kernel_size)
    if rb_native is not None:
        return rb_native
    offsets = kernel_offsets(kernel_size)                   # (K, 3)
    k = offsets.shape[0]
    coords = np.asarray(grid.coords)
    valid = np.asarray(grid.valid)
    v = coords.shape[0]
    nv = min(int(grid.num_valid), v)

    q = coords[:, None, :3] + offsets[None, :, :]           # (V, K, 3)
    b = np.broadcast_to(coords[:, None, 3:4], (v, k, 1))
    in_range = ((q >= 0) & (q < (1 << COORD_BITS))).all(axis=-1)
    ok = in_range & valid[:, None]
    q4 = np.concatenate([q, b], axis=-1).reshape(v * k, 4)
    qkey = _pack_keys_np(q4.astype(np.int32), ok.reshape(-1))
    # Invalid queries carry MAXKEY, which never matches a valid voxel key.
    rb = _lookup_np(np.asarray(grid.key_hi), np.asarray(grid.key_lo),
                    qkey, nv).reshape(v, k)
    rb[~ok.reshape(v, k)] = -1
    centre = int(np.where(~offsets.any(axis=1))[0][0])
    rb[:, centre] = np.where(valid, np.arange(v, dtype=np.int32), -1)
    return rb


def downsample_level_np(grid: SparseGrid, num_voxels: int, filter_size: int,
                        stride: int):
    """Numpy twin of :func:`tdwss.ops.plan.downsample_level`."""
    if filter_size != stride:
        raise NotImplementedError("filter != stride unused by the reference")
    coords = np.asarray(grid.coords)
    coarse_coords = np.concatenate(
        [coords[:, :3] // stride, coords[:, 3:4]], axis=1)
    coarse_grid, _, parent = voxelize_np(
        coarse_coords, None, np.asarray(grid.valid), num_voxels)
    ox = coords[:, 0] % stride
    oy = coords[:, 1] % stride
    oz = coords[:, 2] % stride
    child_offset = (ox * stride * stride + oy * stride + oz).astype(np.int32)
    k = filter_size ** 3
    vf = coords.shape[0]
    down_rb = np.full((num_voxels, k), -1, np.int32)
    ok = parent < num_voxels
    down_rb[parent[ok], child_offset[ok]] = np.arange(vf, dtype=np.int32)[ok]
    return coarse_grid, parent, child_offset, down_rb


def downsample_plan_np(grid: SparseGrid, num_voxels: int, filter_size: int,
                       stride: int):
    """(coarse_grid, parent, child_offset, down_rb, rb_up) in one call.

    Fused native path (native/tdwss_native.cpp downsample_plan — one
    radix-sorted pass emits the coarse grid and BOTH cross-level
    rulebooks); falls back to downsample_level_np + parent_rulebook.
    """
    from tdwss import native as _native

    res = _native.downsample_plan(
        np.asarray(grid.coords), np.asarray(grid.valid), int(num_voxels),
        filter_size, stride)
    if res is not None:
        (vox_coords, key_hi, key_lo, vox_valid, counts, num_valid,
         parent, child_offset, down_rb, rb_up) = res
        coarse_grid = SparseGrid(coords=vox_coords, key_hi=key_hi,
                                 key_lo=key_lo, valid=vox_valid,
                                 counts=counts, num_valid=num_valid)
        return coarse_grid, parent, child_offset, down_rb, rb_up
    coarse_grid, parent, child_offset, down_rb = downsample_level_np(
        grid, num_voxels, filter_size, stride)
    rb_up = parent_rulebook(parent, child_offset, int(num_voxels),
                            filter_size ** 3)
    return coarse_grid, parent, child_offset, down_rb, rb_up


def level_geometry(v: int, tile: int = 512):
    """Per-level windowed-conv geometry: (tile, sub, subwin).

    The single source of the tile-halving and sub-window enablement
    policy — build_plans_np and the host-plan profiler
    (benchmarks/profile_host_plan.py) must agree or the profiler times a
    different geometry than production builds.  Sub-windows: measured
    32.5 -> 22.8 ms fwd (88 -> 61 fwd+bwd) at V=636k C=32 vs the flat
    big-window kernel.
    """
    t = tile
    while t > 32 and v % t != 0:
        t //= 2
    sub = 128 if t % 128 == 0 else 0
    # subwin 224 (not 256): every sub-local offset AND the == subwin
    # sentinel then fit uint8, halving the dominant host->device transfer
    # leaf again (rb_local: 104 -> 52 MB/batch measured; the axon
    # tunnel's ~77 MB/s device_put made transfer the e2e floor).  224 is
    # 8*p-aligned for every pack factor (p <= 4).  Spill-rate cost of
    # the narrower slice is small (r4: widening 256 -> 384 only cut
    # ~10% of heavy spills — the tail is far outliers either way).
    return t, sub, (224 if sub else 0)


def build_plans_np(
    grid0: SparseGrid,
    num_levels: int,
    capacities: Sequence[int],
    downsample: Tuple[int, int] = (2, 2),
    subm_kernel: int = 3,
    windowed: bool = True,
    tile: int = 512,
    window: int = 640,
    nwin: int = 9,
    form: str = "w27",
    fused: bool = False,
) -> LevelPlans:
    """Numpy twin of :func:`tdwss.ops.plan.build_plans` (+ windowed-conv
    metadata when ``windowed``; ``window <= 0`` means auto-sized).

    ``form`` must be "w27" (27-tap, tdwss.ops.plan.Windowed27; the older
    9-anchor x-triple form measured 1.8x slower at V=636k and was
    dropped).  The tile halves until it divides the level capacity;
    levels smaller than the window fall back to the plain gather path
    (win=None).

    ``fused`` (production: on via :func:`host_voxelize_and_plan`) builds
    the w27 metadata straight from the level coords with the native
    single-pass planner (native/tdwss_native.cpp subm_windowed_plan):
    the (V, 27) global rulebook is never materialized and ``subm_rb``
    ships as a (0, 27) placeholder at windowed levels — the device conv
    path only reads ``win`` there (tdwss.ops.sparse_conv), and host plan
    building was memory-bandwidth-bound on the ~85 MB rb27.
    """
    f, s = int(downsample[0]), int(downsample[1])
    levels = []
    grid = grid0
    for lvl in range(num_levels):
        subm_rb = None
        win = None
        if windowed and subm_kernel == 3:
            v = grid.coords.shape[0]
            t, sub, subwin = level_geometry(v, tile)
            if form == "w27":
                if nwin not in (9, 3):
                    raise ValueError(
                        f"form='w27' supports nwin in (9, 3), got {nwin}")
                if fused and window > 0:
                    win = build_windowed_subm27_fused(
                        grid, tile=t, window=window, nwin=nwin, sub=sub,
                        subwin=subwin)
                if win is None:
                    subm_rb = build_subm_rulebook_np(grid, subm_kernel)
                    win = build_windowed_subm27(subm_rb, grid, tile=t,
                                                window=max(window, 0),
                                                auto_window=window <= 0,
                                                nwin=nwin,
                                                sub=sub,
                                                subwin=subwin)
            else:
                raise ValueError(f"unknown windowed form {form!r}")
        if subm_rb is None:
            if win is not None and fused:
                # device contract: windowed levels never read the global
                # rulebook (see tdwss.data.plans.slim_plans_for_device)
                subm_rb = np.zeros((0, subm_kernel ** 3), np.int32)
            else:
                subm_rb = build_subm_rulebook_np(grid, subm_kernel)
        wg_down = wg_up = None
        if lvl + 1 < num_levels:
            coarse_grid, parent, child_offset, down_rb, rb_up = (
                downsample_plan_np(grid, int(capacities[lvl + 1]), f, s))
            if windowed:
                vf = grid.coords.shape[0]
                vc = down_rb.shape[0]
                # group children by fine-z parity (oz is the fastest
                # child_offset dim): a coarse tile's children straddle
                # ``s`` fine slabs, which blows a single window to the
                # slab distance (measured 4096 vs 1024 grouped).
                wg_down = build_windowed_gather(
                    down_rb, v_src=vf, tile=256, group_mod=s,
                    sticky_key=(vc, vf, f, s, "dn"),
                    sub=128, subwin=224)
                wg_up = build_windowed_gather(
                    rb_up, v_src=vc, tile=tile,
                    sticky_key=(vf, vc, f, "up"),
                    sub=128, subwin=224)
                if wg_down is None or wg_up is None:
                    wg_down = wg_up = None   # both or neither (paired VJP)
        else:
            coarse_grid = parent = child_offset = down_rb = None
        levels.append(GridLevel(grid=grid, subm_rb=subm_rb, parent=parent,
                                child_offset=child_offset, down_rb=down_rb,
                                win=win, wg_down=wg_down, wg_up=wg_up))
        if coarse_grid is not None:
            grid = coarse_grid
    return LevelPlans(levels=tuple(levels), downsample=(f, s))


def host_voxelize_and_plan(
    coords: np.ndarray,
    feats: np.ndarray,
    valid: np.ndarray,
    num_levels: int,
    capacities: Sequence[int],
    downsample: Tuple[int, int] = (2, 2),
    subm_kernel: int = 3,
):
    """One-call host pipeline: InputLayer voxelize + all level plans.

    Returns (plans, vox_feats (V0, C), point2voxel (N,), point_perm (N,)).
    ``point_perm`` orders points into contiguous per-voxel runs (see
    tdwss.ops.voxelize.devoxelize_seg).
    """
    grid, vox_feats, p2v, order = voxelize_np(
        coords, feats, valid, int(capacities[0]), mode="mean",
        return_order=True)
    plans = build_plans_np(grid, num_levels, capacities, downsample,
                           subm_kernel, fused=True)
    return plans, vox_feats, p2v, order


# ---------------------------------------------------------------------------
# Window starts / sub-offsets align to WIN_ALIGN source rows so the
# Pallas kernels can view (V, C<=64) sources as packed (V/p, 128)-lane
# rows (p in {2,4}) and DMA 8-aligned packed-row slices
# (tdwss/ops/pallas_subm).  Must match native kWinAlignM1 + 1.
WIN_ALIGN = 32

# Windowed-subm-conv metadata (see tdwss.ops.plan.Windowed27)
# ---------------------------------------------------------------------------

# Sticky residual capacities: static shapes must not flip between batches
# (pytree changes retrigger jit compilation), so per (V, tile, window) the
# capacity only ever grows.  Lock: collate worker threads must agree on the
# cap or concurrent batches get different pytrees.
import threading

_ECAP_REGISTRY: dict = {}
_ECAP_LOCK = threading.Lock()


def reset_sticky_plans() -> None:
    """Clear the sticky window/overflow-capacity registry.

    Window sizes and overflow caps only ever ratchet UP for the process
    lifetime (stable jit shapes across batches).  A long-lived process
    switching to a smaller dataset mid-run can call this to drop the
    inflated static shapes — at the cost of recompiles for the new sizes.
    """
    with _ECAP_LOCK:
        _ECAP_REGISTRY.clear()


def _window_rung(needed: int) -> int:
    """Quantize an auto window size onto a coarse ladder.

    Every distinct static shape costs a full-step XLA recompile (tens of
    seconds locally, ~15 min through the axon relay), while an extra 128
    window rows cost ~1 ms/conv — so sizes snap UP onto few rungs: 128
    steps to 768 (the sub-kernel VMEM cliff at 27 anchors sits there —
    geometric rungs would jump straight past it), ~1.3x geometric above.
    A 10% safety factor absorbs batch-to-batch quantile jitter so the
    first batch usually lands on the final rung already.
    """
    needed = int(needed * 1.1)
    if needed <= 768:
        return max(128, ((needed + 127) // 128) * 128)
    rung = 768
    while rung < needed:
        rung = ((int(rung * 1.3) + 127) // 128) * 128
    return rung


def _sticky_window(key, needed: int) -> int:
    """Monotone per-geometry auto-window size, ladder-quantized."""
    with _ECAP_LOCK:
        cap = max(_window_rung(needed), _ECAP_REGISTRY.get(key, 0))
        _ECAP_REGISTRY[key] = cap
    return cap


def _sticky_window_peek(key) -> Optional[int]:
    """Previously-ratcheted window for ``key`` (None on first sight)."""
    with _ECAP_LOCK:
        return _ECAP_REGISTRY.get(key)


def _sticky_small(key, needed: int, floor: int) -> int:
    """Sticky cap for SMALL counts (heavy-chunk rows: each unit is a
    _RES_HCHUNK-entry block, so the entry-tuned +256/512-align buckets of
    _sticky_ecap would turn needed=4 into 512 chunks = 262k rows).

    1.2x rungs: every heavy-tier row is walked by ~9 capacity-priced
    gathers per conv backward, and the 1.5x ladder left the production
    heavy tiers at 43% average fill (r4 measurement: 704k cap rows for
    300k real entries across the bench plans)."""
    cap = floor
    while cap < needed:
        cap = ((int(cap * 1.2) + 4) // 4) * 4
    with _ECAP_LOCK:
        cap = max(cap, _ECAP_REGISTRY.get(key, 0))
        _ECAP_REGISTRY[key] = cap
    return cap


def _sticky_ecap(key, needed: int, floor: int) -> int:
    # 1.25x geometric buckets (pow2 over-allocates gather rows by up to 2x,
    # and residual gathers are row-count-priced).  Alignment keeps the
    # device-side entry chunking even; small caps align to 512 — a 4096
    # floor made every tiny level pay a 4096-entry padded residual pass
    # (the (E, K*C) one-hot operand is megabytes even when 3 spills are
    # real).
    cap = floor
    while cap < needed:
        cap = int(cap * 1.25) + 256
    align = 4096 if cap > 8192 else 512
    cap = ((cap + align - 1) // align) * align
    with _ECAP_LOCK:
        cap = max(cap, _ECAP_REGISTRY.get(key, 0))
        _ECAP_REGISTRY[key] = cap
    return cap


def _sticky_raw(key, total: int) -> None:
    """Remember a native spill buffer size with 1.25x headroom.

    The native planners return the TOTAL spill count and must be
    re-invoked when the caller's buffer guess was too small — a whole
    second pass over the level (measured 651 -> 2178 ms at bench L0 when
    the guess lags the real count).  The raw total is recorded under its
    own key: the "ovf" keys below track only the post-grouping leftover
    (near zero), which silently starved the guess every batch.
    """
    cap = int(total * 1.25) + 512
    with _ECAP_LOCK:
        if cap > _ECAP_REGISTRY.get(key, 0):
            _ECAP_REGISTRY[key] = cap


def build_windowed_subm27_fused(
    grid: SparseGrid,
    tile: int = 512,
    window: int = 640,
    nwin: int = 9,
    sub: int = 0,
    subwin: int = 0,
):
    """Windowed27 metadata straight from key-sorted level coords.

    Single native pass (native/tdwss_native.cpp subm_windowed_plan):
    resolves the 27 neighbor columns per tile in cache, emits starts /
    sub offsets / int16 locals / v-sorted spills — identical semantics to
    ``build_subm_rulebook_np`` + ``build_windowed_subm27`` composed, with
    the (V, 27) int32 rulebook never hitting DRAM.  Returns None when the
    native library is unavailable or the level is unsuitable (callers
    fall back to the two-pass path).
    """
    from tdwss import native as _native

    if nwin not in (9, 3):
        raise ValueError("w27 nwin must be 9 or 3")
    v = grid.coords.shape[0]
    if v % tile != 0 or v % 8 != 0 or v < window + 2:
        return None
    if sub and (tile % sub or subwin % 8):
        raise ValueError("sub must divide tile; subwin must be 8-aligned")

    rawkey = (v, tile, window, 27, nwin, sub, "rawspill")
    guess = _ECAP_REGISTRY.get(rawkey, max(64, v // 64))
    nat = _native.subm_windowed_plan(
        np.asarray(grid.coords), np.asarray(grid.valid), tile, window,
        nwin, sub, subwin, e_cap=guess)
    if nat is None:
        return None
    _sticky_raw(rawkey, nat[3].shape[0])
    starts, sub_off, rb_local, ovf_entries = nat
    return _finish_w27(None, v, tile, window, nwin, sub, subwin,
                       starts, sub_off, rb_local, ovf_entries, None,
                       num_valid=int(grid.num_valid))


def build_windowed_subm27(
    rb27: np.ndarray,
    grid: SparseGrid,
    tile: int = 256,
    window: int = 512,
    res_cap: Optional[int] = None,
    auto_window: bool = False,
    auto_quantile: float = 0.97,
    auto_max: int = 4096,
    nwin: int = 9,
    sub: int = 0,
    subwin: int = 0,
):
    """Host-side 27-tap windowed decomposition (tdwss.ops.plan.Windowed27).

    ``sub``/``subwin`` enable two-level sub-windows (see Windowed27): rows
    split into ``sub``-row sub-tiles whose taps read a ``subwin``-wide
    8-aligned slice of the big window; entries outside their sub-window
    spill to the overflow list.

    Every rb27 entry is either covered by a (tile, group) shared window
    (group = tap % 9 — the (dy, dz) pair; the three dx taps of a group sit
    within +-1 physical row of each other) or recorded as a compact spill
    entry.  See Windowed27's docstring for why this beats the x-triple
    9-anchor form (structural residuals vanish).

    Returns None for structurally unsuitable levels.
    """
    from tdwss.ops.plan import Windowed27

    if nwin not in (9, 3):
        raise ValueError("w27 nwin must be 9 or 3")
    v = rb27.shape[0]
    if v % tile != 0 or v % 8 != 0 or (not auto_window and v < window + 2):
        return None
    tiles = v // tile

    # tap -> shared-window group: per-(dy,dz) at nwin=9; per-dz at nwin=3
    # (the dy shift moves physical rows by only ~one x-run under the
    # b,z,y,x key sort — measured spans: q50 626 vs 543 rows at tile=512,
    # spills 1.1% vs 0.88% at W=640 — so sharing across dy costs almost
    # nothing and cuts DMA descriptors 3x).
    gmap27 = (np.arange(27, dtype=np.int32) % 9 if nwin == 9
              else (np.arange(27, dtype=np.int32) % 9) % 3)

    if not auto_window:
        # fixed-window fast path: one parallel C++ pass builds starts /
        # sub offsets / locals / v-sorted spills (native/tdwss_native.cpp
        # windowed_rb — measured 8.2 s -> <1 s per bench batch; the numpy
        # section below is its reference implementation and the
        # auto-window / no-compiler fallback)
        if sub and subwin >= window:
            sub = subwin = 0
        if sub and (tile % sub or subwin % 8):
            raise ValueError("sub must divide tile; subwin must be 8-aligned")
        from tdwss import native as _native

        rawkey = (v, tile, window, 27, nwin, sub, "rawspill")
        guess = _ECAP_REGISTRY.get(rawkey, max(64, v // 64))
        nat = _native.windowed_rb(rb27, tile, window, nwin, sub, subwin,
                                  e_cap=guess)
        if nat is not None:
            starts, sub_off, rb_local, ovf_entries = nat
            _sticky_raw(rawkey, ovf_entries.shape[0])
            return _finish_w27(rb27, v, tile, window, nwin, sub, subwin,
                               starts, sub_off, rb_local, ovf_entries,
                               res_cap, num_valid=int(grid.num_valid))

    # int32 throughout + broadcast over a (tiles, tile, 27) view — int64
    # temporaries, np.repeat materializations and astype round-trips cost
    # ~30 s/batch at V=786k on one core (profiled).
    rb3 = rb27.reshape(tiles, tile, 27)
    live3 = rb3 >= 0
    masked3 = np.where(live3, rb3, np.int32(np.iinfo(np.int32).max))
    tapmin = masked3.min(axis=1)                             # (tiles, 27)
    starts = np.full((tiles, nwin), np.iinfo(np.int32).max, np.int32)
    for k in range(27):
        g = gmap27[k]
        np.minimum(starts[:, g], tapmin[:, k], out=starts[:, g])
    starts &= ~np.int32(WIN_ALIGN - 1)                                   # WIN_ALIGN-aligned
    if auto_window:
        loc3 = np.where(live3, rb3 - starts[:, None, gmap27], -1)
        span = (loc3.reshape(tiles, tile * 27).max(axis=1) + 1) if tiles \
            else np.zeros((1,), np.int64)
        need = float(np.quantile(span, auto_quantile))
        window = int(np.clip(need, 128, max(min(auto_max, v), 128)))
        window = ((window + 127) // 128) * 128
        window = _sticky_window((v, tile, 27, nwin, "win"), window)
        if v < window + 2:
            return None
    np.clip(starts, 0, max(v - window, 0), out=starts)

    sub_off = None
    if sub and subwin >= window:
        # auto-sized windows can land at/below the requested sub-window
        # width; the two-level split buys nothing there — run flat.
        sub = subwin = 0
    if sub:
        if tile % sub or subwin % 8:
            raise ValueError("sub must divide tile; subwin must be 8-aligned")
        nsub = v // sub
        rbs = rb27.reshape(nsub, sub, 27)
        lives = rbs >= 0
        ms = np.where(lives, rbs, np.int32(np.iinfo(np.int32).max))
        smin = ms.min(axis=1)                                # (nsub, 27)
        gm = np.full((nsub, nwin), np.iinfo(np.int32).max, np.int32)
        for k in range(27):
            g = gmap27[k]
            np.minimum(gm[:, g], smin[:, k], out=gm[:, g])
        spt = tile // sub                                    # subs per tile
        big = np.repeat(starts, spt, axis=0)                 # (nsub, nwin)
        sub_off = gm - big
        sub_off &= ~np.int32(WIN_ALIGN - 1)
        np.clip(sub_off, 0, window - subwin, out=sub_off)
        base = big + sub_off                                 # (nsub, nwin)
        local3 = rbs - base[:, None, gmap27]                 # (nsub,sub,27)
        cover3 = lives & (local3 >= 0) & (local3 < subwin)
        rb_local = np.where(cover3, local3,
                            np.int32(subwin)).reshape(v, 27)
        live3 = lives
    else:
        local3 = rb3 - starts[:, None, gmap27]               # (tiles,tile,27)
        cover3 = live3 & (local3 >= 0) & (local3 < window)
        rb_local = np.where(cover3, local3, np.int32(window)).reshape(v, 27)

    # Spills -> compact v-sorted overflow list (no aligned tier: the
    # aligned (V, R) tier costs O(V*R) on device regardless of how few
    # slots are real, and spills are ~0.3-0.7% of entries).
    sp_v, sp_t = np.nonzero((live3 & ~cover3).reshape(v, 27))
    sp_s = rb27[sp_v, sp_t]
    # np.nonzero already yields row-major (v-sorted) order
    ovf_entries = np.stack([sp_v, sp_t, sp_s], axis=1).astype(np.int32)
    return _finish_w27(rb27, v, tile, window, nwin, sub, subwin, starts,
                       sub_off, rb_local, ovf_entries, res_cap,
                       num_valid=int(grid.num_valid))


_RES_TILE = 512          # output rows per residual tile group
_RES_TILE_R1 = 16        # retired dense-tier slot count (layout compat)
_RES_HEAVY_MIN = 64      # entries per tile above which the chunk tier wins
_RES_HCHUNK = 512        # heavy-list entries per chunk row
_RES_HSPAN = 8           # tiles sharing one chunk's scatter window


def _tap_chunk(hent: np.ndarray, v_out: int, v_src: int, k: int,
               sticky_key):
    """Tap-chunked companion of the heavy spill list.

    (ent (NC*CHUNK, 2) [src, owner], tap (NC,), perm (EH,)): each
    _RES_HCHUNK-entry chunk holds entries of ONE tap, so the device
    evaluates contributions as a batched (CHUNK, C) @ (C, Cout) GEMM
    against a gathered per-chunk weight — the (E, K*C) one-hot-masked
    operand (27x traffic, chunked lax.map loops at big caps) goes away.
    ``perm[j]`` maps res_hent row j to its slot here (pad == NC*CHUNK) so
    the owner-chunked scatter side keeps its layout.
    """
    eh = hent.shape[0]
    live = np.nonzero(hent[:, 0] < v_out)[0]
    taps = hent[live, 1]
    order = np.argsort(taps, kind="stable")
    sidx = live[order]
    staps = taps[order].astype(np.int64)
    counts = np.bincount(staps, minlength=k)
    nchunks_t = -(-counts // _RES_HCHUNK)
    nc_need = int(nchunks_t.sum())
    nc = _sticky_small(sticky_key + ("tapchunk",), max(nc_need, 4), 4)
    chunk_base = np.concatenate([[0], np.cumsum(nchunks_t)[:-1]])
    tap_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(staps.shape[0], dtype=np.int64) - tap_start[staps]
    slot = ((chunk_base[staps] + within // _RES_HCHUNK) * _RES_HCHUNK
            + within % _RES_HCHUNK)
    ent = np.empty((nc * _RES_HCHUNK, 2), np.int32)
    ent[:, 0] = v_src
    ent[:, 1] = v_out
    ent[slot, 0] = hent[sidx, 2]
    ent[slot, 1] = hent[sidx, 0]
    tap = np.zeros((nc,), np.int32)
    tap[:nc_need] = np.repeat(np.arange(k, dtype=np.int32), nchunks_t)
    perm = np.full((eh,), nc * _RES_HCHUNK, np.int32)
    perm[sidx] = slot.astype(np.int32)
    return ent, tap, perm


def _group_spill_tiles(ovf_entries: np.ndarray, v_out: int, v_src: int,
                       sticky_key):
    """v-sorted spills -> (res_tile=None, res_hent, res_htile, leftover).

    Spill accumulation is priced by STATIC capacity, not real entries, so
    the split is by per-512-row-tile density (measured v5e, L0 real
    spills = 261 scattered + 17.5k clustered):

    - scattered tiles (<= _RES_HEAVY_MIN entries) go back to the caller's
      compact v-sorted overflow list — its per-owner scatter-add costs
      ~150 ns/row, trivial at real scattered counts, and its capacity now
      tracks the real count (a retired dense (T2, 16, 3) tier cost 6 ms
      at L0 for those 261 entries because every empty slot still paid the
      contribution gather);
    - heavy tiles (locality clusters, hundreds to thousands of entries)
      fill CHUNK-ALIGNED rows: res_hent is (H2 * _RES_HCHUNK, 3) with
      each chunk's entries at offset chunk_index * _RES_HCHUNK, so the
      device pass is a plain reshape — no row gathers — followed by a
      batched one-hot einsum and a block scatter.  A chunk PACKS entries
      from up to _RES_HSPAN consecutive heavy tiles (most heavy tiles
      hold only a few hundred entries; one 512-row chunk per tile wasted
      60-80% of the cap — measured bench L0 wg_down: 36k real entries in
      a 190k cap).  res_htile (H2, 2) carries [base tile_id, flat
      offset]; the device one-hots each entry's offset within the
      _RES_HSPAN * 512-row scatter window at the base tile.  Padding
      chunks use base tile_id == T2.

    Returns (None, None, None, entries) when the domain doesn't tile.
    """
    if v_out % _RES_TILE:
        return None, None, None, ovf_entries
    t2 = v_out // _RES_TILE
    e = ovf_entries.shape[0]
    key = sticky_key + ("rtile",)

    if e == 0:
        h2 = _sticky_small(key + ("htile",), 4, 4)
        hent = np.full((h2 * _RES_HCHUNK, 3), v_src, np.int32)
        hent[:, 0] = v_out
        htile = np.zeros((h2, 2), np.int32)
        htile[:, 0] = t2
        return None, hent, htile, ovf_entries[:0]

    tile_of = ovf_entries[:, 0] // _RES_TILE
    counts = np.bincount(tile_of, minlength=t2)
    heavy_tile = counts > _RES_HEAVY_MIN          # (t2,) bool
    is_heavy = heavy_tile[tile_of]

    hvy = ovf_entries[is_heavy]                   # tile-sorted already
    h_ids = np.nonzero(heavy_tile)[0].astype(np.int64)
    h_cnt = counts[heavy_tile].astype(np.int64)

    # Greedy chunk packing: a chunk accepts the next heavy tile's entries
    # while they fit in the remaining rows AND the tile sits within the
    # chunk's _RES_HSPAN-tile scatter window.
    chunks = []          # list of (base_tile, [slices into hvy])
    cur_base = cur_room = None
    off = 0
    for tid, cnt in zip(h_ids, h_cnt):
        take = 0
        while take < cnt:
            if (cur_base is None or cur_room == 0
                    or tid - cur_base >= _RES_HSPAN):
                chunks.append([int(tid), []])
                cur_base, cur_room = int(tid), _RES_HCHUNK
            amt = int(min(cnt - take, cur_room))
            chunks[-1][1].append((off + take, off + take + amt))
            cur_room -= amt
            take += amt
        off += int(cnt)

    h2 = _sticky_small(key + ("htile",), max(len(chunks), 4), 4)
    hent = np.full((h2 * _RES_HCHUNK, 3), v_src, np.int32)
    hent[:, 0] = v_out
    htile = np.zeros((h2, 2), np.int32)
    htile[:, 0] = t2
    for i, (base, slices) in enumerate(chunks):
        row = i * _RES_HCHUNK
        htile[i] = (base, row)
        for lo, hi in slices:
            hent[row: row + (hi - lo)] = hvy[lo:hi]
            row += hi - lo
    return None, hent, htile, ovf_entries[~is_heavy]


def _active_prefix(v: int, num_valid, tile: int, key) -> int:
    """Sticky active-output prefix: ceil(num_valid / quantum) rows.

    Rows past num_valid are all-padding (all-sentinel rb rows); the
    device shrinks the kernel grid to this prefix.  Quantized to 4 tiles
    and ratcheted UP per geometry so jit shapes stay stable across
    batches.  0 disables (unknown num_valid).
    """
    if num_valid is None:
        return 0
    q = 4 * tile
    va = min(v, ((int(num_valid) + q - 1) // q) * q)
    with _ECAP_LOCK:
        va = max(va, _ECAP_REGISTRY.get(key, 0))
        _ECAP_REGISTRY[key] = va
    return va if va < v else 0


def _finish_w27(rb27, v, tile, window, nwin, sub, subwin, starts, sub_off,
                rb_local, ovf_entries, res_cap, num_valid=None):
    """Group spills by output tile (+ legacy overflow) and assemble
    Windowed27."""
    from tdwss.ops.plan import Windowed27

    res_tile = res_hent = res_htile = None
    res_tent = res_ttap = res_tperm = None
    if res_cap is None:
        res_tile, res_hent, res_htile, ovf_entries = _group_spill_tiles(
            ovf_entries, v, v, (v, tile, window, 27, nwin, sub))
        if res_hent is not None:
            res_tent, res_ttap, res_tperm = _tap_chunk(
                res_hent, v, v, 27, (v, tile, window, 27, nwin, sub))
    heavy, heavy_counts = np.unique(ovf_entries[:, 0], return_counts=True)

    if res_cap is not None:
        if ovf_entries.shape[0] > res_cap:
            return None
        e2_cap = max(res_cap, 32)
        h_cap = max(res_cap, 32)
    else:
        # With chunk-tier grouping the compact list holds only scattered
        # spills — its cost is capacity-priced (contribution gather + a
        # per-owner scatter walk the CAP, not the real count), so the
        # floor tracks the grouped reality, not v.
        grouped = res_hent is not None
        # grouped tiers leave a near-zero leftover list; floor 0 lets the
        # device skip the whole ovf pass statically (it re-ratchets — one
        # recompile — if a later batch actually leaves scattered spills)
        e2_cap = _sticky_ecap((v, tile, window, 27, nwin, sub, "ovf"),
                              ovf_entries.shape[0],
                              0 if grouped else max(64, v // 64))
        h_cap = _sticky_ecap((v, tile, window, 27, nwin, sub, "heavy"),
                             heavy.shape[0],
                             0 if grouped else max(64, v // 128))

    res_ovf = np.full((e2_cap, 3), v, np.int32)
    res_ovf[: ovf_entries.shape[0]] = ovf_entries
    ovf_v = np.full((h_cap,), v, np.int32)
    ovf_count = np.zeros((h_cap,), np.int32)
    ovf_v[: heavy.shape[0]] = heavy
    ovf_count[: heavy.shape[0]] = heavy_counts

    return Windowed27(
        starts=starts, rb_local=rb_local, res_ovf=res_ovf, ovf_v=ovf_v,
        ovf_count=ovf_count, res_tile=res_tile, res_hent=res_hent,
        res_htile=res_htile, res_tent=res_tent, res_ttap=res_ttap,
        res_tperm=res_tperm, window=window,
        sub_off=sub_off, sub=int(sub), subwin=int(subwin),
        v_active=_active_prefix(v, num_valid, tile, (v, tile, "vactive")),
    )


def build_windowed_gather(
    rb: np.ndarray,
    v_src: int,
    tile: int = 512,
    window: int = 0,
    res_cap: Optional[int] = None,
    auto_quantile: float = 0.97,
    auto_max: int = 4096,
    sticky_key: Optional[tuple] = None,
    group_mod: int = 1,
    sub: int = 0,
    subwin: int = 0,
):
    """Windowed decomposition of an arbitrary (V_out, K) rulebook.

    Used for the cross-level maps (strided conv down_rb, deconv parent
    map): source rows of consecutive output rows are spatially local
    under the shared key sort, so the taps of an out-tile read shared
    source windows.  ``group_mod`` splits taps onto ``group_mod`` windows
    by tap % group_mod — for down_rb pass the stride: children in
    different fine z-slabs (child_offset has oz fastest) get their own
    window, since a coarse tile's children straddle ``stride`` fine
    slabs, which blows a single window up to the slab distance (measured
    W=4096 at 2.3% spills single-window vs W=1024 at 0.86% oz-grouped).
    ``window <= 0`` auto-sizes from per-tile span quantiles (spills fall
    to the overflow list).

    Returns tdwss.ops.plan.WindowedGather, or None for unsuitable shapes.
    """
    from tdwss.ops.plan import WindowedGather

    v_out, k = rb.shape
    if v_out == 0 or v_src % 8 != 0 or k % group_mod != 0:
        return None
    t = tile
    while t > 32 and v_out % t != 0:
        t //= 2
    if v_out % t != 0:
        return None
    tiles = v_out // t
    gmap = np.arange(k, dtype=np.int32) % group_mod
    key = sticky_key or (v_out, v_src, t, k, group_mod, "wg")
    auto = window <= 0

    from tdwss import native as _native

    have_native = _native.available()

    def _span_window():
        """Numpy starts + span-quantile window (ratchets the sticky)."""
        rb3 = rb.reshape(tiles, t, k)
        live3 = rb3 >= 0
        masked3 = np.where(live3, rb3, np.int32(np.iinfo(np.int32).max))
        tapmin = masked3.min(axis=1)                         # (tiles, k)
        st = np.full((tiles, group_mod), np.iinfo(np.int32).max, np.int32)
        for kk in range(k):
            g = gmap[kk]
            np.minimum(st[:, g], tapmin[:, kk], out=st[:, g])
        st &= ~np.int32(WIN_ALIGN - 1)
        if not auto:
            return st, window
        loc3 = np.where(live3, rb3 - st[:, None, gmap], -1)
        span = (loc3.reshape(tiles, t * k).max(axis=1) + 1) if tiles \
            else np.zeros((1,), np.int64)
        need = float(np.quantile(span, auto_quantile))
        w = int(np.clip(need, 128, max(min(auto_max, v_src), 128)))
        w = ((w + 127) // 128) * 128
        return st, _sticky_window(key, w)

    # Steady state skips the span pass: the sticky window converges after
    # the prewarm epoch, at which point the per-call numpy sizing section
    # (several (V, K)-sized temporaries) was pure overhead (~4 s/batch at
    # bench shapes on one core).  A deferred spill check below re-ratchets
    # if the data outgrows the remembered window.
    starts = None
    deferred = False
    prev = _sticky_window_peek(key) if auto else None
    if auto and prev is not None and have_native:
        window = prev
        deferred = True
    else:
        starts, window = _span_window()
    if v_src < window:
        return None
    if starts is not None:
        np.clip(starts, 0, max(v_src - window, 0), out=starts)

    if sub and (subwin >= window or t % sub or subwin % 8):
        sub = subwin = 0          # geometry unsuitable — run flat

    sub_off = None
    nat = None
    if have_native:
        # heavy passes in one native sweep now that the window is fixed
        # (any starts computed above are recomputed there — cheap)
        guess = _ECAP_REGISTRY.get(
            key + (window, sub, "rawspill"), max(64, v_out // 64))
        nat = _native.windowed_rb(rb, t, window, group_mod, sub, subwin,
                                  e_cap=guess, v_src=v_src)
        if nat is not None:
            _sticky_raw(key + (window, sub, "rawspill"), nat[3].shape[0])
        if nat is not None and deferred:
            # spill-ratio feedback: if this batch spills far beyond the
            # converged regime, re-run the exact sizing and redo the
            # native pass at the grown window (rare after prewarm)
            n_spill = nat[3].shape[0]
            if n_spill > max(2048, (v_out * k) // 50):
                starts, window = _span_window()
                if v_src < window:
                    return None
                np.clip(starts, 0, max(v_src - window, 0), out=starts)
                if sub and subwin >= window:
                    sub = subwin = 0
                guess = _ECAP_REGISTRY.get(
                    key + (window, sub, "rawspill"), max(64, v_out // 64))
                nat = _native.windowed_rb(rb, t, window, group_mod, sub,
                                          subwin, e_cap=guess, v_src=v_src)
                if nat is not None:
                    _sticky_raw(key + (window, sub, "rawspill"),
                                nat[3].shape[0])
    if nat is None and starts is None:
        starts, window = _span_window()
        if v_src < window:
            return None
        np.clip(starts, 0, max(v_src - window, 0), out=starts)
    if nat is not None:
        starts, sub_off, rb_local, ovf_entries = nat
    elif sub:
        nsub = v_out // sub
        rbs = rb.reshape(nsub, sub, k)
        lives = rbs >= 0
        ms = np.where(lives, rbs, np.int32(np.iinfo(np.int32).max))
        smin = ms.min(axis=1)                                # (nsub, k)
        gm = np.full((nsub, group_mod), np.iinfo(np.int32).max, np.int32)
        for kk in range(k):
            np.minimum(gm[:, gmap[kk]], smin[:, kk], out=gm[:, gmap[kk]])
        spt = t // sub
        big = np.repeat(starts, spt, axis=0)                 # (nsub, nwin)
        sub_off = gm - big
        sub_off &= ~np.int32(WIN_ALIGN - 1)
        np.clip(sub_off, 0, window - subwin, out=sub_off)
        base = big + sub_off
        local3 = rbs - base[:, None, gmap]
        cover3 = lives & (local3 >= 0) & (local3 < subwin)
        rb_local = np.where(cover3, local3, np.int32(subwin)).reshape(v_out, k)
        cover = cover3.reshape(v_out, k)
        sp_v, sp_t = np.nonzero((rb >= 0) & ~cover)
        sp_s = rb[sp_v, sp_t]
        ovf_entries = np.stack(
            [sp_v, sp_t, sp_s], axis=1).astype(np.int32)
    else:
        local3 = rb3 - starts[:, None, gmap]
        cover3 = live3 & (local3 >= 0) & (local3 < window)
        rb_local = np.where(cover3, local3, np.int32(window)).reshape(v_out, k)
        cover = cover3.reshape(v_out, k)

        sp_v, sp_t = np.nonzero((rb >= 0) & ~cover)
        sp_s = rb[sp_v, sp_t]
        order = np.argsort(sp_v, kind="stable")
        ovf_entries = np.stack(
            [sp_v[order], sp_t[order], sp_s[order]], axis=1).astype(np.int32)
    res_tile = res_hent = res_htile = None
    res_tent = res_ttap = res_tperm = None
    if res_cap is None:
        gkey = (sticky_key or (v_out, v_src, t, k, group_mod, "wg")) + (
            window, sub)
        res_tile, res_hent, res_htile, ovf_entries = _group_spill_tiles(
            ovf_entries, v_out, v_src, gkey)
        if res_hent is not None:
            res_tent, res_ttap, res_tperm = _tap_chunk(
                res_hent, v_out, v_src, k, gkey)
    heavy, heavy_counts = np.unique(ovf_entries[:, 0], return_counts=True)

    if res_cap is not None:
        if ovf_entries.shape[0] > res_cap:
            return None
        e2_cap = max(res_cap, 32)
        h_cap = max(res_cap, 32)
    else:
        key = (sticky_key or (v_out, v_src, t, k, group_mod, "wg")) + (
            window, sub)
        grouped = res_hent is not None
        e2_cap = _sticky_ecap(key + ("ovf",), ovf_entries.shape[0],
                              0 if grouped else max(64, v_out // 64))
        h_cap = _sticky_ecap(key + ("heavy",), heavy.shape[0],
                             0 if grouped else max(64, v_out // 128))

    res_ovf = np.full((e2_cap, 3), v_out, np.int32)
    res_ovf[:, 2] = v_src
    res_ovf[: ovf_entries.shape[0]] = ovf_entries
    ovf_v = np.full((h_cap,), v_out, np.int32)
    ovf_count = np.zeros((h_cap,), np.int32)
    ovf_v[: heavy.shape[0]] = heavy
    ovf_count[: heavy.shape[0]] = heavy_counts

    return WindowedGather(
        starts=starts, rb_local=rb_local, res_ovf=res_ovf, ovf_v=ovf_v,
        ovf_count=ovf_count, res_tile=res_tile, res_hent=res_hent,
        res_htile=res_htile, res_tent=res_tent, res_ttap=res_ttap,
        res_tperm=res_tperm, window=window,
        v_src=int(v_src), sub_off=sub_off, sub=int(sub), subwin=int(subwin),
    )


def parent_rulebook(parent: np.ndarray, child_offset: np.ndarray,
                    v_coarse: int, k: int) -> np.ndarray:
    """(Vf,) parent + (Vf,) child_offset -> (Vf, K) one-live-tap rulebook.

    Row f has parent[f] at column child_offset[f] and -1 elsewhere — the
    deconv's per-row tap selection expressed as a plain rulebook so the
    windowed gather machinery evaluates it (out[f] = sum_k rb-gather @ W_k
    has exactly one live term).

    Invariant the deconv/unpool appliers rely on (wg_conv_apply /
    wg_unpool_apply skip explicit fine_valid masking): an INVALID fine row
    must come out all -1, so its gathered contribution is exactly zero.
    ``downsample_level_np`` encodes invalid rows as parent == v_coarse
    (one-past-the-end), which the range filter below rejects — asserted so
    a future voxelize/parent encoding change cannot silently leak garbage
    rows into padded outputs.
    """
    vf = parent.shape[0]
    rbu = np.full((vf, k), -1, np.int32)
    ok = (parent >= 0) & (parent < v_coarse)
    # invalid rows may only carry the known sentinels (-1 or one-past-the-
    # end); anything else means the upstream encoding changed
    bad = parent[~ok]
    assert bad.size == 0 or np.isin(bad, (-1, v_coarse)).all(), (
        "unexpected parent sentinel values: "
        f"{np.unique(bad)[:5]} (v_coarse={v_coarse})")
    rbu[np.arange(vf)[ok], child_offset[ok]] = parent[ok]
    return rbu
