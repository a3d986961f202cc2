"""ctypes bindings for the native host-side data ops.

TPU-native equivalents of the reference's C++/CUDA data-prep components
(SURVEY.md §2.2): KPConv grid subsampling + radius neighbors (replacing
cpp_wrappers + nanoflann) and CGAL-style region-growing plane detection
(replacing ops/GeometricSelectiveSearch/shape_det).  The library is built
on demand with ``make -C native`` (g++, no pybind11 — C ABI via ctypes).

Every function has a pure-numpy fallback so the pipeline works without a
compiler; the native path is ~10-50x faster on full scenes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtdwss_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _abi_ok(lib: ctypes.CDLL) -> bool:
    """True iff the lib's window-alignment contract matches host_plan."""
    if not hasattr(lib, "tdwss_win_align"):
        return False
    lib.tdwss_win_align.restype = ctypes.c_int32
    from tdwss.ops.host_plan import WIN_ALIGN

    return int(lib.tdwss_win_align()) == WIN_ALIGN


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            if not hasattr(lib, "downsample_plan") or not _abi_ok(lib):
                # stale build: missing symbols OR an alignment contract
                # drift (a pre-WIN_ALIGN .so would emit 8-aligned starts
                # that the packed Pallas kernels silently mis-divide)
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "clean", "all"],
                    check=True, capture_output=True, timeout=120,
                )
                lib = ctypes.CDLL(_LIB_PATH)
                if not _abi_ok(lib):
                    raise RuntimeError(
                        "libtdwss_native.so win-align contract mismatch "
                        "after rebuild")
            lib.grid_subsample.restype = ctypes.c_int32
            lib.region_grow.restype = ctypes.c_int32
            lib.subm_rulebook.restype = None
            lib.voxelize.restype = ctypes.c_int32
            lib.windowed_rb.restype = ctypes.c_int64
            lib.windowed_rb16.restype = ctypes.c_int64
            lib.subm_windowed_plan.restype = ctypes.c_int64
            lib.downsample_plan.restype = ctypes.c_int32
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def _f32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, np.float32)


def _i32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, np.int32)


def grid_subsample(points: np.ndarray, features: Optional[np.ndarray] = None,
                   labels: Optional[np.ndarray] = None,
                   cell_size: float = 0.1):
    """Voxel-grid barycenter pooling (KPConv grid_subsampling parity).

    Returns (points (M,3), features (M,F) or None, labels (M,) or None).
    """
    n = points.shape[0]
    lib = _load()
    if lib is not None and n > 0:
        pts = _f32(points)
        fdim = features.shape[1] if features is not None else 0
        feat = _f32(features) if features is not None else None
        lab = _i32(labels) if labels is not None else None
        out_p = np.empty((n, 3), np.float32)
        out_f = np.empty((n, fdim), np.float32) if features is not None else None
        out_l = np.empty((n,), np.int32) if labels is not None else None
        m = lib.grid_subsample(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n),
            feat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if feat is not None else None,
            ctypes.c_int32(fdim),
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if lab is not None else None,
            ctypes.c_float(cell_size),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if out_f is not None else None,
            out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if out_l is not None else None,
        )
        return (
            out_p[:m],
            out_f[:m] if out_f is not None else None,
            out_l[:m] if out_l is not None else None,
        )
    return _grid_subsample_np(points, features, labels, cell_size)


def _grid_subsample_np(points, features, labels, cell_size):
    if points.shape[0] == 0:
        return points, features, labels
    cells = np.floor(points / cell_size).astype(np.int64)
    _, inverse, counts = np.unique(
        cells, axis=0, return_inverse=True, return_counts=True
    )
    m = counts.shape[0]
    out_p = np.zeros((m, 3), np.float64)
    np.add.at(out_p, inverse, points)
    out_p = (out_p / counts[:, None]).astype(np.float32)
    out_f = None
    if features is not None:
        out_f = np.zeros((m, features.shape[1]), np.float64)
        np.add.at(out_f, inverse, features)
        out_f = (out_f / counts[:, None]).astype(np.float32)
    out_l = None
    if labels is not None:
        out_l = np.full(m, -100, np.int32)
        for j in range(m):
            member = labels[inverse == j]
            vals, cnt = np.unique(member, return_counts=True)
            out_l[j] = vals[np.argmax(cnt)]
    return out_p, out_f, out_l


def radius_neighbors(queries: np.ndarray, supports: np.ndarray,
                     radius: float, max_neighbors: int = 64) -> np.ndarray:
    """Padded (Nq, max_neighbors) int32 neighbor idx, -1 padding
    (KPConv batch_neighbors parity; closest kept on overflow)."""
    nq, ns = queries.shape[0], supports.shape[0]
    lib = _load()
    if lib is not None:
        q = _f32(queries)
        s = _f32(supports)
        out = np.empty((nq, max_neighbors), np.int32)
        lib.radius_neighbors(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(nq),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(ns),
            ctypes.c_float(radius),
            ctypes.c_int32(max_neighbors),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    from scipy.spatial import cKDTree

    tree = cKDTree(supports)
    out = np.full((nq, max_neighbors), -1, np.int32)
    for i, idx in enumerate(tree.query_ball_point(queries, radius)):
        idx = np.asarray(idx, np.int64)
        if idx.shape[0] > max_neighbors:
            d = np.linalg.norm(supports[idx] - queries[i], axis=1)
            idx = idx[np.argsort(d)[:max_neighbors]]
        out[i, : idx.shape[0]] = idx
    return out


def region_grow(points: np.ndarray, normals: np.ndarray, k: int = 12,
                max_dist: float = 0.05, max_angle_deg: float = 20.0,
                min_region: int = 50,
                cell_size: Optional[float] = None) -> Tuple[np.ndarray, int]:
    """Plane-fitting region growing (CGAL shape-detection parity).

    Returns (region id per point with -1 unassigned, num_regions).
    """
    n = points.shape[0]
    if cell_size is None:
        # ~k points per cell on surface-like data
        extent = float(points.max(0).min() - points.min(0).min() + 1e-6)
        cell_size = max(extent / max(np.cbrt(n), 1.0) * 2.0, max_dist * 2, 1e-3)
    lib = _load()
    if lib is not None and n > 0:
        pts = _f32(points)
        nrm = _f32(normals)
        out = np.empty(n, np.int32)
        num = lib.region_grow(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n),
            ctypes.c_int32(k),
            ctypes.c_float(max_dist),
            ctypes.c_float(max_angle_deg),
            ctypes.c_int32(min_region),
            ctypes.c_float(cell_size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, int(num)
    return _region_grow_np(points, normals, k, max_dist, max_angle_deg, min_region)


def _region_grow_np(points, normals, k, max_dist, max_angle_deg, min_region):
    from scipy.spatial import cKDTree

    n = points.shape[0]
    tree = cKDTree(points)
    _, knn = tree.query(points, k=min(k + 1, n))
    knn = knn[:, 1:]
    cos_thresh = np.cos(np.deg2rad(max_angle_deg))
    region = np.full(n, -1, np.int32)
    num = 0
    for seed in range(n):
        if region[seed] != -1:
            continue
        members = [seed]
        region[seed] = num
        normal = normals[seed].astype(np.float64).copy()
        centroid = points[seed].astype(np.float64).copy()
        head = 0
        while head < len(members):
            cur = members[head]
            head += 1
            for nb in knn[cur]:
                if region[nb] != -1:
                    continue
                nlen = np.linalg.norm(normal) + 1e-12
                dot = float(normals[nb] @ normal) / nlen
                if abs(dot) < cos_thresh:
                    continue
                dist = abs(
                    float((points[nb] - centroid / len(members)) @ normal) / nlen
                )
                if dist > max_dist:
                    continue
                region[nb] = num
                members.append(int(nb))
                centroid += points[nb]
                normal += np.sign(dot) * normals[nb]
        if len(members) < min_region:
            region[np.asarray(members)] = -1
        else:
            num += 1
    return region, num


def subm_rulebook(coords: np.ndarray, valid: np.ndarray,
                  kernel_size: int = 3) -> Optional[np.ndarray]:
    """(V, k^3) submanifold rulebook via parallel hash probing, or None when
    the native library is unavailable (caller falls back to numpy).

    Semantics identical to tdwss.ops.host_plan.build_subm_rulebook_np for a
    key-sorted deduped grid (odd kernel sizes only).
    """
    lib = _load()
    if lib is None or kernel_size % 2 == 0:
        return None
    coords = _i32(coords)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    v = coords.shape[0]
    out = np.empty((v, kernel_size ** 3), np.int32)
    lib.subm_rulebook(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(v),
        ctypes.c_int32(kernel_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def voxelize(coords: np.ndarray, valid: np.ndarray, num_voxels: int,
             feats: Optional[np.ndarray] = None):
    """Key-sorted dedup of (x,y,z,b) coords (device voxelizer twin).

    Returns (vox_coords, key_hi, key_lo, vox_valid, counts, num_valid,
    point2voxel, vox_feats or None, sorted_order), or None if the native
    lib is unavailable.  ``sorted_order`` lists kept points in voxel-run
    order (each voxel's members contiguous), dropped/invalid points at the
    tail.
    """
    lib = _load()
    if lib is None:
        return None
    coords = _i32(coords)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    n = coords.shape[0]
    v = int(num_voxels)
    fdim = 0 if feats is None else int(feats.shape[1])
    feats_f = _f32(feats) if feats is not None else None
    vox_coords = np.empty((v, 4), np.int32)
    key_hi = np.empty((v,), np.int32)
    key_lo = np.empty((v,), np.int32)
    vox_valid = np.empty((v,), np.uint8)
    counts = np.empty((v,), np.int32)
    p2v = np.empty((n,), np.int32)
    vox_feats = np.empty((v, fdim), np.float32) if feats is not None else None
    sorted_order = np.empty((n,), np.int32)
    num_valid = lib.voxelize(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(v),
        feats_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if feats_f is not None else None,
        ctypes.c_int32(fdim),
        vox_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        key_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        key_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vox_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p2v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vox_feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if vox_feats is not None else None,
        sorted_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return (vox_coords, key_hi, key_lo, vox_valid.astype(bool), counts,
            np.int32(num_valid), p2v, vox_feats, sorted_order)


def downsample_plan(coords: np.ndarray, valid: np.ndarray, num_voxels: int,
                    filter_size: int, stride: int):
    """Fused strided-downsample plan from a key-sorted fine grid.

    Returns (vox_coords, key_hi, key_lo, vox_valid, counts, num_valid,
    parent, child_offset, down_rb, rb_up), or None when the native
    library is unavailable or filter != stride.  Semantics identical to
    tdwss.ops.host_plan.downsample_level_np followed by parent_rulebook —
    one radix-sorted pass instead of a general voxelize plus three
    full-size numpy scatter passes.
    """
    lib = _load()
    if lib is None or filter_size != stride:
        return None
    coords = _i32(coords)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    vf = coords.shape[0]
    vc = int(num_voxels)
    k = filter_size ** 3
    vox_coords = np.empty((vc, 4), np.int32)
    key_hi = np.empty((vc,), np.int32)
    key_lo = np.empty((vc,), np.int32)
    vox_valid = np.empty((vc,), np.uint8)
    counts = np.empty((vc,), np.int32)
    parent = np.empty((vf,), np.int32)
    child_offset = np.empty((vf,), np.int32)
    down_rb = np.empty((vc, k), np.int32)
    rb_up = np.empty((vf, k), np.int32)
    num_valid = lib.downsample_plan(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(vf), ctypes.c_int32(vc),
        ctypes.c_int32(filter_size), ctypes.c_int32(stride),
        vox_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        key_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        key_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vox_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        child_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        down_rb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rb_up.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return (vox_coords, key_hi, key_lo, vox_valid.astype(bool), counts,
            np.int32(num_valid), parent, child_offset, down_rb, rb_up)


def available() -> bool:
    return _load() is not None


def windowed_rb(rb: np.ndarray, tile: int, window: int, nwin: int,
                sub: int, subwin: int, e_cap: int,
                v_src: Optional[int] = None):
    """Native windowed-rulebook metadata: (starts, sub_off|None, rb_local,
    spills (n_spills, 3)) or None when the library is unavailable.

    Semantics identical to the fixed-window middle sections of
    tdwss.ops.host_plan.build_windowed_subm27 / build_windowed_gather
    (tap -> window group = tap % nwin); spills come back v-sorted.
    Re-invokes itself with the exact count when ``e_cap`` is too small.
    rb_local comes back int16 whenever the window fits (it is the
    dominant host->device plan leaf; the conv appliers upcast in-graph).
    """
    lib = _load()
    if lib is None:
        return None
    rb = _i32(rb)
    v, k = rb.shape
    if v_src is None:
        v_src = v
    tiles = v // tile
    use16 = window < 32768 and hasattr(lib, "windowed_rb16")
    starts = np.empty((tiles, nwin), np.int32)
    sub_off = np.empty((v // sub, nwin), np.int32) if sub else None
    rb_local = np.empty((v, k), np.int16 if use16 else np.int32)
    e_cap = max(int(e_cap), 1)
    spills = np.empty((e_cap, 3), np.int32)
    fn = lib.windowed_rb16 if use16 else lib.windowed_rb
    local_ct = ctypes.c_int16 if use16 else ctypes.c_int32
    args = (
        rb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(v), ctypes.c_int64(int(v_src)), ctypes.c_int32(k),
        ctypes.c_int32(tile), ctypes.c_int32(window),
        ctypes.c_int32(nwin), ctypes.c_int32(sub), ctypes.c_int32(subwin),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sub_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if sub_off is not None else None,
        rb_local.ctypes.data_as(ctypes.POINTER(local_ct)),
        spills.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    total = fn(*args, ctypes.c_int64(e_cap))
    if total > e_cap:
        spills = np.empty((int(total), 3), np.int32)
        fn(*args[:-1],
           spills.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           ctypes.c_int64(int(total)))
    return starts, sub_off, rb_local, spills[: int(total)]


def subm_windowed_plan(coords: np.ndarray, valid: np.ndarray, tile: int,
                       window: int, nwin: int, sub: int, subwin: int,
                       e_cap: int):
    """Fused 27-tap windowed plan straight from key-sorted coords.

    Returns (starts (tiles, nwin) i32, sub_off (v/sub, nwin) i32 | None,
    rb_local (v, 27) int16, spills (n, 3) i32 v-sorted) or None when the
    library is unavailable.  Equivalent to build_subm_rulebook_np followed
    by windowed_rb, but never materializes the (V, 27) global rulebook
    (~85 MB at bench L0) — plan building was memory-bandwidth-bound on it.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "subm_windowed_plan"):
        return None
    if window >= 32768:
        return None                      # locals must fit int16
    coords = _i32(coords)
    valid = np.ascontiguousarray(valid, np.uint8)
    v = coords.shape[0]
    tiles = v // tile
    starts = np.empty((tiles, nwin), np.int32)
    sub_off = np.empty((v // sub, nwin), np.int32) if sub else None
    rb_local = np.empty((v, 27), np.int16)
    e_cap = max(int(e_cap), 1)
    spills = np.empty((e_cap, 3), np.int32)
    args = (
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(v), ctypes.c_int32(tile), ctypes.c_int32(window),
        ctypes.c_int32(nwin), ctypes.c_int32(sub), ctypes.c_int32(subwin),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sub_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if sub_off is not None else None,
        rb_local.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        spills.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    total = lib.subm_windowed_plan(*args, ctypes.c_int64(e_cap))
    if total > e_cap:
        spills = np.empty((int(total), 3), np.int32)
        lib.subm_windowed_plan(
            *args[:-1],
            spills.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(int(total)))
    return starts, sub_off, rb_local, spills[: int(total)]
