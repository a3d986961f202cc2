"""Native C++ data-op tests vs numpy oracles (grid subsampling, radius
neighbors, region growing — SURVEY.md §2.2 rebuild targets)."""

import numpy as np
import pytest

from tdwss import native


def test_native_library_builds():
    assert native.available(), "native library failed to build (g++ required)"


def test_grid_subsample_matches_numpy_oracle(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    feats = rng.normal(size=(500, 4)).astype(np.float32)
    labels = rng.integers(0, 5, 500).astype(np.int32)

    p1, f1, l1 = native.grid_subsample(pts, feats, labels, cell_size=0.5)
    p2, f2, l2 = native._grid_subsample_np(pts, feats, labels, cell_size=0.5)

    assert p1.shape == p2.shape
    # match rows by cell (order may differ)
    def keyed(p, f, l):
        cells = np.floor(p / 0.5001).astype(int)
        return {tuple(c): (pp, ff, ll) for c, pp, ff, ll in zip(cells, p, f, l)}

    d1, d2 = keyed(p1, f1, l1), keyed(p2, f2, l2)
    assert set(d1) == set(d2)
    for key in d1:
        np.testing.assert_allclose(d1[key][0], d2[key][0], atol=1e-4)
        np.testing.assert_allclose(d1[key][1], d2[key][1], atol=1e-4)


def test_radius_neighbors_exact(rng):
    supports = rng.uniform(0, 4, (300, 3)).astype(np.float32)
    queries = rng.uniform(0, 4, (50, 3)).astype(np.float32)
    r = 0.7
    out = native.radius_neighbors(queries, supports, r, max_neighbors=64)
    for i in range(queries.shape[0]):
        d = np.linalg.norm(supports - queries[i], axis=1)
        expect = set(np.nonzero(d <= r)[0].tolist())
        got = set(int(x) for x in out[i] if x >= 0)
        if len(expect) <= 64:
            assert got == expect, i
        else:
            assert got <= expect and len(got) == 64


def test_radius_neighbors_overflow_keeps_closest(rng):
    supports = np.zeros((100, 3), np.float32)
    supports[:, 0] = np.linspace(0, 0.9, 100)
    queries = np.zeros((1, 3), np.float32)
    out = native.radius_neighbors(queries, supports, radius=1.0, max_neighbors=10)
    got = [int(x) for x in out[0] if x >= 0]
    assert sorted(got) == list(range(10))  # the 10 closest along the line


def test_region_grow_separates_planes():
    rng = np.random.default_rng(0)
    n = 400
    # two parallel planes far apart
    p1 = rng.uniform(0, 2, (n, 3)).astype(np.float32); p1[:, 2] = 0.0
    p2 = rng.uniform(0, 2, (n, 3)).astype(np.float32); p2[:, 2] = 5.0
    pts = np.concatenate([p1, p2])
    normals = np.zeros((2 * n, 3), np.float32); normals[:, 2] = 1.0
    region, num = native.region_grow(pts, normals, k=12, max_dist=0.1,
                                     max_angle_deg=20, min_region=50)
    assert num == 2
    assert region[:n].min() == region[:n].max()        # one region per plane
    assert region[n:].min() == region[n:].max()
    assert region[0] != region[n]


def test_region_grow_rejects_small_and_misaligned():
    rng = np.random.default_rng(1)
    n = 300
    plane = rng.uniform(0, 2, (n, 3)).astype(np.float32); plane[:, 2] = 0.0
    pn = np.zeros((n, 3), np.float32); pn[:, 2] = 1.0
    # a few isolated points with random normals
    noise = rng.uniform(4, 5, (10, 3)).astype(np.float32)
    nn = rng.normal(size=(10, 3)).astype(np.float32)
    nn /= np.linalg.norm(nn, axis=1, keepdims=True)
    pts = np.concatenate([plane, noise])
    normals = np.concatenate([pn, nn])
    region, num = native.region_grow(pts, normals, k=10, max_dist=0.1,
                                     max_angle_deg=20, min_region=50)
    assert num == 1
    assert (region[n:] == -1).all()


def test_native_windowed27_matches_numpy(monkeypatch):
    """The C++ windowed27 pass must reproduce the numpy reference bit-for-
    bit: starts, sub offsets, locals, and the v-sorted spill list."""
    import numpy as np

    from tdwss import native
    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_subm27, voxelize_np)

    if native._load() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    n = 20000
    coords = np.concatenate(
        [rng.integers(0, 96, (n, 3)), rng.integers(0, 2, (n, 1))],
        axis=1).astype(np.int32)
    valid = np.ones(n, bool)
    cap = 16384
    grid, _, _ = voxelize_np(coords, None, valid, cap)
    rb27 = build_subm_rulebook_np(grid, 3)

    for sub, subwin in ((0, 0), (128, 256)):
        nat = build_windowed_subm27(rb27, grid, tile=512, window=640,
                                    sub=sub, subwin=subwin)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_failed", True)
        ref = build_windowed_subm27(rb27, grid, tile=512, window=640,
                                    sub=sub, subwin=subwin)
        monkeypatch.setattr(native, "_lib_failed", False)
        assert (nat is None) == (ref is None)
        if nat is None:
            continue
        np.testing.assert_array_equal(nat.starts, ref.starts)
        np.testing.assert_array_equal(nat.rb_local, ref.rb_local)
        np.testing.assert_array_equal(nat.res_ovf, ref.res_ovf)
        np.testing.assert_array_equal(nat.ovf_v, ref.ovf_v)
        np.testing.assert_array_equal(nat.ovf_count, ref.ovf_count)
        if sub:
            np.testing.assert_array_equal(nat.sub_off, ref.sub_off)
        assert nat.window == ref.window and nat.sub == ref.sub
