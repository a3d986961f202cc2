"""Voxelizer unit tests vs a numpy oracle (SURVEY.md §4a).

Parity target: scn.InputLayer(dim, full_scale, mode=4) — duplicate integer
coordinates are averaged — and scn.OutputLayer per-point readback.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tdwss.ops import voxelize, devoxelize
from tdwss.ops.coords import make_keys, lookup_sorted


def _random_points(rng, n, extent=32, batch=3, c=5):
    coords = np.concatenate(
        [
            rng.integers(0, extent, size=(n, 3)),
            rng.integers(0, batch, size=(n, 1)),
        ],
        axis=1,
    ).astype(np.int32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    return coords, feats


def _oracle_mean(coords, feats, valid):
    table = {}
    for i in range(coords.shape[0]):
        if not valid[i]:
            continue
        key = tuple(coords[i])
        table.setdefault(key, []).append(feats[i])
    return {k: np.mean(v, axis=0) for k, v in table.items()}, {
        k: len(v) for k, v in table.items()
    }


def test_voxelize_mean_matches_oracle(rng):
    n = 512
    coords, feats = _random_points(rng, n, extent=8)  # force many duplicates
    valid = rng.random(n) > 0.1

    grid, vox_feats, p2v = jax.jit(
        lambda c, f, v: voxelize(c, f, v, num_voxels=n)
    )(coords, feats, valid)

    oracle, counts = _oracle_mean(coords, feats, valid)
    assert int(grid.num_valid) == len(oracle)

    vox_coords = np.asarray(grid.coords)
    vox_valid = np.asarray(grid.valid)
    vox_feats = np.asarray(vox_feats)
    vox_counts = np.asarray(grid.counts)
    seen = set()
    for i in range(n):
        if not vox_valid[i]:
            continue
        key = tuple(vox_coords[i])
        assert key in oracle, key
        np.testing.assert_allclose(vox_feats[i], oracle[key], rtol=1e-5, atol=1e-5)
        assert vox_counts[i] == counts[key]
        seen.add(key)
    assert seen == set(oracle.keys())


def test_voxel_keys_sorted(rng):
    n = 256
    coords, feats = _random_points(rng, n, extent=16)
    valid = np.ones(n, bool)
    grid, _, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    hi = np.asarray(grid.key_hi).astype(np.int64)
    lo = np.asarray(grid.key_lo).astype(np.int64)
    packed = hi * (2**32) + (lo.astype(np.uint32))
    assert np.all(np.diff(packed) >= 0)


def test_devoxelize_reads_owner_voxel(rng):
    n = 300
    coords, feats = _random_points(rng, n, extent=8)
    valid = rng.random(n) > 0.2
    grid, vox_feats, p2v = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n
    )
    pts = np.asarray(devoxelize(vox_feats, p2v))
    oracle, _ = _oracle_mean(coords, feats, valid)
    for i in range(n):
        if valid[i]:
            np.testing.assert_allclose(
                pts[i], oracle[tuple(coords[i])], rtol=1e-5, atol=1e-5
            )
        else:
            np.testing.assert_array_equal(pts[i], 0)


def test_voxelize_overflow_drops_excess(rng):
    n = 128
    coords, feats = _random_points(rng, n, extent=64)
    valid = np.ones(n, bool)
    cap = 16
    grid, vox_feats, p2v = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), cap
    )
    assert grid.coords.shape == (cap, 4)
    # num_valid reports the TRUE distinct-voxel count so overflow is observable
    assert int(grid.num_valid) > cap
    assert int(np.asarray(grid.valid).sum()) <= cap
    # overflowed points must map out of range, not alias slot 0
    p2v = np.asarray(p2v)
    assert np.all((p2v >= 0) & (p2v <= cap))


def test_lookup_sorted_hits_and_misses(rng):
    n = 200
    coords, feats = _random_points(rng, n, extent=16)
    valid = np.ones(n, bool)
    grid, _, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)

    qh, ql = make_keys(grid.coords, grid.valid)
    idx = np.asarray(lookup_sorted(grid.key_hi, grid.key_lo, qh, ql))
    v = int(grid.num_valid)
    np.testing.assert_array_equal(idx[:v], np.arange(v))

    # queries for coordinates that don't exist must miss
    missing = jnp.asarray([[4000, 4000, 4000, 0]], dtype=jnp.int32)
    mh, ml = make_keys(missing, jnp.ones(1, bool))
    assert int(lookup_sorted(grid.key_hi, grid.key_lo, mh, ml)[0]) == -1
