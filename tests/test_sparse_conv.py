"""Sparse convolution correctness vs dense oracles on tiny grids.

Parity targets (SURVEY.md §4a): scn.SubmanifoldConvolution == dense conv3d
evaluated at active sites (inactive neighbors contribute zero),
scn.Convolution (strided), scn.Deconvolution, scn.UnPooling, scn.MaxPooling.
Also checks autodiff (gather VJP = scatter-add) against the dense gradient.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdwss.ops import (
    voxelize,
    build_plans,
    subm_conv_apply,
    strided_conv_apply,
    deconv_apply,
    unpool,
    max_pool,
)
from tdwss.ops.coords import kernel_offsets


EXTENT = 12


def _sparse_scene(rng, n=160, cin=4, batch=2):
    coords = np.concatenate(
        [rng.integers(0, EXTENT, (n, 3)), rng.integers(0, batch, (n, 1))], axis=1
    ).astype(np.int32)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    valid = np.ones(n, bool)
    return coords, feats, valid


def _densify(grid, vox_feats, batch=2, extent=EXTENT):
    """Scatter sparse voxels into a dense (B, X, Y, Z, C) volume."""
    c = vox_feats.shape[1]
    dense = np.zeros((batch, extent, extent, extent, c), np.float32)
    active = np.zeros((batch, extent, extent, extent), bool)
    coords = np.asarray(grid.coords)
    valid = np.asarray(grid.valid)
    vf = np.asarray(vox_feats)
    for i in range(coords.shape[0]):
        if valid[i]:
            x, y, z, b = coords[i]
            dense[b, x, y, z] = vf[i]
            active[b, x, y, z] = True
    return dense, active


def _dense_conv(dense, weight_taps, offsets, stride=1):
    """Oracle: out[p] = sum_k W[k] @ in[stride*p + offset_k]."""
    b, ex, ey, ez, cin = dense.shape
    cout = weight_taps.shape[-1]
    ox = ex // stride if stride > 1 else ex
    out = np.zeros((b, ox, ox, ox, cout), np.float32)
    for k, (dx, dy, dz) in enumerate(offsets):
        for px in range(ox):
            for py in range(ox):
                for pz in range(ox):
                    qx, qy, qz = stride * px + dx, stride * py + dy, stride * pz + dz
                    if 0 <= qx < ex and 0 <= qy < ey and 0 <= qz < ez:
                        out[:, px, py, pz] += dense[:, qx, qy, qz] @ weight_taps[k]
    return out


def test_subm_conv_matches_dense(rng):
    coords, feats, valid = _sparse_scene(rng)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 1, [n])

    w = rng.normal(size=(27, 4, 6)).astype(np.float32)
    out = np.asarray(subm_conv_apply(vfeats, plans.levels[0].subm_rb, jnp.asarray(w)))

    dense, active = _densify(grid, vfeats)
    oracle = _dense_conv(dense, w, kernel_offsets(3))

    coords_np = np.asarray(grid.coords)
    for i in range(n):
        if np.asarray(grid.valid)[i]:
            x, y, z, b = coords_np[i]
            np.testing.assert_allclose(out[i], oracle[b, x, y, z], rtol=1e-4, atol=1e-4)


def test_strided_conv_matches_dense(rng):
    coords, feats, valid = _sparse_scene(rng)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 2, [n, n])
    lvl0, lvl1 = plans.levels

    w = rng.normal(size=(8, 4, 5)).astype(np.float32)
    out = np.asarray(strided_conv_apply(vfeats, lvl0.down_rb, jnp.asarray(w)))

    dense, _ = _densify(grid, vfeats)
    oracle = _dense_conv(dense, w, kernel_offsets(2), stride=2)

    ccoords = np.asarray(lvl1.grid.coords)
    cvalid = np.asarray(lvl1.grid.valid)
    checked = 0
    for i in range(ccoords.shape[0]):
        if cvalid[i]:
            x, y, z, b = ccoords[i]
            np.testing.assert_allclose(out[i], oracle[b, x, y, z], rtol=1e-4, atol=1e-4)
            checked += 1
    assert checked > 10


def test_coarse_coords_are_unique_floor_div(rng):
    coords, feats, valid = _sparse_scene(rng)
    n = coords.shape[0]
    grid, _, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 2, [n, n])
    fine = np.asarray(grid.coords)[np.asarray(grid.valid)]
    coarse = np.asarray(plans.levels[1].grid.coords)[np.asarray(plans.levels[1].grid.valid)]
    expect = {(x // 2, y // 2, z // 2, b) for x, y, z, b in fine}
    got = {tuple(r) for r in coarse}
    assert got == expect


def test_deconv_routes_parent_through_child_tap(rng):
    coords, feats, valid = _sparse_scene(rng)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 2, [n, n])
    lvl0, lvl1 = plans.levels

    cin, cout = 5, 3
    coarse_feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    out = np.asarray(
        deconv_apply(coarse_feats, lvl0.parent, lvl0.child_offset, jnp.asarray(w),
                     fine_valid=lvl0.grid.valid)
    )

    offsets = kernel_offsets(2)
    fine = np.asarray(grid.coords)
    fvalid = np.asarray(grid.valid)
    parent = np.asarray(lvl0.parent)
    cf = np.asarray(coarse_feats)
    for i in range(n):
        if not fvalid[i]:
            np.testing.assert_array_equal(out[i], 0)
            continue
        ox, oy, oz = fine[i, 0] % 2, fine[i, 1] % 2, fine[i, 2] % 2
        k = int(np.where((offsets == [ox, oy, oz]).all(axis=1))[0][0])
        expect = cf[parent[i]] @ w[k]
        np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-4)


def test_unpool_and_maxpool(rng):
    coords, feats, valid = _sparse_scene(rng)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 2, [n, n])
    lvl0, lvl1 = plans.levels

    coarse = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    up = np.asarray(unpool(coarse, lvl0.parent, fine_valid=lvl0.grid.valid))
    parent = np.asarray(lvl0.parent)
    fvalid = np.asarray(grid.valid)
    for i in range(n):
        if fvalid[i]:
            np.testing.assert_allclose(up[i], np.asarray(coarse)[parent[i]])

    mp = np.asarray(max_pool(vfeats, lvl0.down_rb))
    # oracle: group fine voxels by parent
    groups = {}
    vf = np.asarray(vfeats)
    for i in range(n):
        if fvalid[i]:
            groups.setdefault(parent[i], []).append(vf[i])
    for p, rows in groups.items():
        np.testing.assert_allclose(mp[p], np.max(rows, axis=0), rtol=1e-5, atol=1e-5)


def test_subm_conv_gradients_match_dense(rng):
    coords, feats, valid = _sparse_scene(rng, n=60, cin=3)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 1, [n])
    w = jnp.asarray(rng.normal(size=(27, 3, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))

    def f(feats_, w_):
        return jnp.sum(subm_conv_apply(feats_, plans.levels[0].subm_rb, w_) * cot)

    gf, gw = jax.grad(f, argnums=(0, 1))(vfeats, w)

    # numerical check on a few entries
    eps = 1e-3
    vf = np.asarray(vfeats)
    for (i, j) in [(0, 0), (5, 1), (17, 2)]:
        pert = vf.copy()
        pert[i, j] += eps
        up = float(f(jnp.asarray(pert), w))
        pert[i, j] -= 2 * eps
        dn = float(f(jnp.asarray(pert), w))
        num = (up - dn) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gf)[i, j], num, rtol=2e-2, atol=2e-2)
    wn = np.asarray(w)
    for (k, a, b) in [(0, 0, 0), (13, 2, 1), (26, 1, 0)]:
        pert = wn.copy()
        pert[k, a, b] += eps
        up = float(f(vfeats, jnp.asarray(pert)))
        pert[k, a, b] -= 2 * eps
        dn = float(f(vfeats, jnp.asarray(pert)))
        num = (up - dn) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gw)[k, a, b], num, rtol=2e-2, atol=2e-2)


def test_missing_neighbor_reads_zero_at_full_capacity(rng):
    """Regression: jnp.take(mode='fill') wraps -1 numpy-style; rulebook
    misses must NOT read the last voxel when the grid is at capacity."""
    import jax.numpy as jnp
    from tdwss.ops import voxelize, build_plans, subm_conv_apply

    # two isolated voxels, capacity exactly 2 -> last row is a REAL voxel
    coords = np.array([[0, 0, 0, 0], [10, 10, 10, 0]], np.int32)
    feats = np.array([[1.0], [100.0]], np.float32)
    grid, vfeats, _ = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones(2, bool), 2
    )
    assert bool(grid.valid.all())
    plans = build_plans(grid, 1, [2])
    w = np.zeros((27, 1, 1), np.float32)
    w[:, 0, 0] = 1.0  # every tap sums its neighbor
    out = np.asarray(subm_conv_apply(vfeats, plans.levels[0].subm_rb, jnp.asarray(w)))
    # each voxel has no active neighbors: output = its own value only
    np.testing.assert_allclose(np.sort(out[:, 0]), [1.0, 100.0])


def test_strided_and_deconv_grads_numeric(rng):
    """Custom-VJP backward passes vs numerical gradients."""
    import jax
    import jax.numpy as jnp
    from tdwss.ops import voxelize, build_plans, strided_conv_apply, deconv_apply

    coords, feats, valid = _sparse_scene(rng, n=50, cin=3)
    n = coords.shape[0]
    grid, vfeats, _ = voxelize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), n)
    plans = build_plans(grid, 2, [n, n])
    lvl0 = plans.levels[0]

    w = jnp.asarray(rng.normal(size=(8, 3, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))

    def f_strided(feats_, w_):
        return jnp.sum(strided_conv_apply(
            feats_, lvl0.down_rb, w_, lvl0.parent, lvl0.child_offset) * cot)

    gf, gw = jax.grad(f_strided, argnums=(0, 1))(vfeats, w)
    eps = 1e-3
    vf = np.asarray(vfeats)
    for (i, j) in [(0, 0), (11, 2)]:
        pert = vf.copy(); pert[i, j] += eps
        up = float(f_strided(jnp.asarray(pert), w))
        pert[i, j] -= 2 * eps
        dn = float(f_strided(jnp.asarray(pert), w))
        np.testing.assert_allclose(np.asarray(gf)[i, j], (up - dn) / (2 * eps),
                                   rtol=2e-2, atol=2e-2)

    cfeats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(8, 4, 2)).astype(np.float32))

    def f_deconv(cf, w_):
        return jnp.sum(
            deconv_apply(cf, lvl0.parent, lvl0.child_offset, w_,
                         fine_valid=lvl0.grid.valid,
                         down_rb=lvl0.down_rb) * cot
        )

    gc, gwd = jax.grad(f_deconv, argnums=(0, 1))(cfeats, wd)
    cf = np.asarray(cfeats)
    for (i, j) in [(0, 0), (7, 3)]:
        pert = cf.copy(); pert[i, j] += eps
        up = float(f_deconv(jnp.asarray(pert), wd))
        pert[i, j] -= 2 * eps
        dn = float(f_deconv(jnp.asarray(pert), wd))
        np.testing.assert_allclose(np.asarray(gc)[i, j], (up - dn) / (2 * eps),
                                   rtol=2e-2, atol=2e-2)
    wn = np.asarray(wd)
    for (k, a, b) in [(0, 0, 0), (5, 3, 1)]:
        pert = wn.copy(); pert[k, a, b] += eps
        up = float(f_deconv(cfeats, jnp.asarray(pert)))
        pert[k, a, b] -= 2 * eps
        dn = float(f_deconv(cfeats, jnp.asarray(pert)))
        np.testing.assert_allclose(np.asarray(gwd)[k, a, b], (up - dn) / (2 * eps),
                                   rtol=2e-2, atol=2e-2)


def test_pallas_dma_block_gather_interpret(rng):
    """Pallas DMA block gather == jnp.take (interpret mode on CPU)."""
    import jax
    from tdwss.ops.experimental.pallas_gather import dma_block_gather, gather_blocks

    src = jnp.asarray(rng.normal(size=(128, 8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, size=(64,)).astype(np.int32))
    out = dma_block_gather(src, idx, interpret=True)
    ref = jnp.take(src, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # dispatcher falls back to take off-TPU
    out2 = gather_blocks(src, idx)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))


def test_pallas_w27_interpret(rng):
    """27-tap fused kernel == einsum path (interpret mode), nwin 9 and 3."""
    from tdwss.ops.pallas_subm import pad_w9, windowed_dw, windowed_matmul
    from tdwss.ops.sparse_conv import _GMAP27, _win_dw, _win_matmul

    v, tile, window, c, cout = 64, 16, 24, 12, 8
    tiles = v // tile
    feats = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))
    rb_local = jnp.asarray(
        rng.integers(0, window + 1, size=(v, 27)).astype(np.int32))
    w2d = jnp.asarray(rng.normal(size=(27 * c, cout)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))

    for nwin in (9, 3):
        starts = jnp.asarray(
            (rng.integers(0, (v - window) // 8 + 1, size=(tiles * nwin,)) * 8)
            .astype(np.int32))
        gmap = _GMAP27 if nwin == 9 else _GMAP27 % 3
        starts27 = starts.reshape(tiles, nwin)[:, gmap]

        ref = _win_matmul(feats, rb_local, starts27, w2d, window)
        out = windowed_matmul(feats, starts, rb_local.T,
                              pad_w9(w2d.reshape(27, c, cout)),
                              window=window, tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        dref = _win_dw(feats, rb_local, starts27, dout, window)
        dw = windowed_dw(feats, starts, rb_local.T, dout,
                         window=window, tile=tile, interpret=True)
        np.testing.assert_allclose(
            np.asarray(dw[:, :c, :].reshape(27 * c, cout)), np.asarray(dref),
            rtol=1e-4, atol=1e-4)


def test_pallas_wg_cross_domain_interpret(rng):
    """nwin=1 cross-domain kernel (v_out != v_src) == einsum path."""
    from tdwss.ops.pallas_subm import pad_w9, windowed_dw, windowed_matmul
    from tdwss.ops.sparse_conv import _win_dw, _win_matmul

    v_src, v_out, tile, window, c, cout, k = 64, 32, 8, 24, 12, 8, 8
    tiles = v_out // tile
    src = jnp.asarray(rng.normal(size=(v_src, c)).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, (v_src - window) // 8 + 1, size=(tiles,)) * 8)
        .astype(np.int32))
    rb_local = jnp.asarray(
        rng.integers(0, window + 1, size=(v_out, k)).astype(np.int32))
    w2d = jnp.asarray(rng.normal(size=(k * c, cout)).astype(np.float32))

    ref = _win_matmul(src, rb_local,
                      jnp.repeat(starts[:, None], k, axis=1), w2d, window)
    out = windowed_matmul(src, starts, rb_local.T,
                          pad_w9(w2d.reshape(k, c, cout)),
                          window=window, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    dout = jnp.asarray(rng.normal(size=(v_out, cout)).astype(np.float32))
    dref = _win_dw(src, rb_local,
                   jnp.repeat(starts[:, None], k, axis=1), dout, window)
    dw = windowed_dw(src, starts, rb_local.T, dout,
                     window=window, tile=tile, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dw[:, :c, :].reshape(k * c, cout)), np.asarray(dref),
        rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_w27_sub_interpret(rng):
    """Two-level sub-window kernels == reconstructed einsum path."""
    from tdwss.ops.pallas_subm import (pad_w9, windowed_dw_sub,
                                       windowed_matmul_sub)
    from tdwss.ops.sparse_conv import (_w27_big_locals, _w27_expand,
                                       _win_dw, _win_matmul)

    v, tile, window, sub, swk, c, cout = 128, 32, 48, 8, 16, 12, 8
    tiles = v // tile
    nsub = tile // sub
    feats = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, (v - window) // 8 + 1, size=(tiles, 9)) * 8)
        .astype(np.int32))
    sub_off = jnp.asarray(
        (rng.integers(0, (window - swk) // 8 + 1, size=(tiles * nsub, 9)) * 8)
        .astype(np.int32))
    rb_sub = jnp.asarray(
        rng.integers(0, swk + 1, size=(v, 27)).astype(np.int32))
    w2d = jnp.asarray(rng.normal(size=(27 * c, cout)).astype(np.float32))

    rb_big = _w27_big_locals(rb_sub, sub_off, window, sub, swk)
    ref = _win_matmul(feats, rb_big, _w27_expand(starts), w2d, window)
    out = windowed_matmul_sub(
        feats, starts.reshape(-1), sub_off.reshape(-1), rb_sub.T,
        pad_w9(w2d.reshape(27, c, cout)), window=window, tile=tile,
        sub=sub, subwin=swk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    dout = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))
    dref = _win_dw(feats, rb_big, _w27_expand(starts), dout, window)
    dw = windowed_dw_sub(
        feats, starts.reshape(-1), sub_off.reshape(-1), rb_sub.T, dout,
        window=window, tile=tile, sub=sub, subwin=swk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dw[:, :c, :].reshape(27 * c, cout)), np.asarray(dref),
        rtol=1e-4, atol=1e-4)


def test_w27_sub_form_matches_plain(rng):
    """Sub-window Windowed27 == plain conv path (fwd + grads, CPU)."""
    from tests.test_host_plan import _random_coords
    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_subm27, voxelize_np)

    rng2 = np.random.default_rng(5)
    n = 1024
    coords, feats, valid = _random_coords(rng2, n=n, size=24,
                                          invalid_frac=0.05)
    grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
    rb = build_subm_rulebook_np(grid, 3)
    win = build_windowed_subm27(rb, grid, tile=128, window=256,
                                res_cap=27 * n, sub=32, subwin=64)
    assert win.sub_off is not None
    vf = jnp.asarray(rng2.normal(size=(n, 5)).astype(np.float32))
    w = jnp.asarray(rng2.normal(size=(27, 5, 4)).astype(np.float32))
    winj = jax.tree_util.tree_map(jnp.asarray, win)
    ref = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w))
    out = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w, winj))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_) ** 2), argnums=(0, 1))(vf, w)
    gw = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_, winj) ** 2),
        argnums=(0, 1))(vf, w)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                               rtol=2e-4, atol=2e-4)


def test_pallas_wg_sub_cross_domain_interpret(rng):
    """Two-level sub-window kernels on a cross-domain rulebook (K=8,
    nwin=2, v_out != v_src) == reconstructed flat einsum path."""
    from tdwss.ops.pallas_subm import (pad_w9, windowed_dw_sub,
                                       windowed_matmul_sub)
    from tdwss.ops.sparse_conv import (_sub_big_locals, _wg_expand,
                                       _win_dw, _win_matmul)

    v_src, v_out, tile, window, sub, swk = 128, 64, 16, 48, 8, 16
    c, cout, k, nwin = 12, 8, 8, 2
    tiles = v_out // tile
    nsub = tile // sub
    src = jnp.asarray(rng.normal(size=(v_src, c)).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, (v_src - window) // 8 + 1,
                      size=(tiles, nwin)) * 8).astype(np.int32))
    sub_off = jnp.asarray(
        (rng.integers(0, (window - swk) // 8 + 1,
                      size=(tiles * nsub, nwin)) * 8).astype(np.int32))
    rb_sub = jnp.asarray(
        rng.integers(0, swk + 1, size=(v_out, k)).astype(np.int32))
    w2d = jnp.asarray(rng.normal(size=(k * c, cout)).astype(np.float32))

    rb_big = _sub_big_locals(rb_sub, sub_off, window, sub, swk)
    ref = _win_matmul(src, rb_big, starts[:, np.arange(k) % nwin], w2d,
                      window)
    out = windowed_matmul_sub(
        src, starts.reshape(-1), sub_off.reshape(-1), rb_sub.T,
        pad_w9(w2d.reshape(k, c, cout)), window=window, tile=tile,
        sub=sub, subwin=swk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    dout = jnp.asarray(rng.normal(size=(v_out, cout)).astype(np.float32))
    dref = _win_dw(src, rb_big, starts[:, np.arange(k) % nwin], dout,
                   window)
    dw = windowed_dw_sub(
        src, starts.reshape(-1), sub_off.reshape(-1), rb_sub.T, dout,
        window=window, tile=tile, sub=sub, subwin=swk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dw[:, :c, :].reshape(k * c, cout)), np.asarray(dref),
        rtol=1e-4, atol=1e-4)


def test_wg_sub_form_matches_plain(rng):
    """Sub-window WindowedGather == plain strided/deconv paths (CPU)."""
    import jax

    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_gather,
                                     downsample_level_np, parent_rulebook,
                                     voxelize_np)
    from tdwss.ops.sparse_conv import strided_conv_apply, wg_conv_apply
    from tests.test_host_plan import _random_coords

    rng_np = np.random.default_rng(17)
    n, nc = 2048, 1024
    coords, feats, valid = _random_coords(rng_np, n=n, size=32,
                                          invalid_frac=0.05)
    grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
    cg, parent, child_off, down_rb = downsample_level_np(grid, nc, 2, 2)
    wgd = build_windowed_gather(down_rb, v_src=n, tile=256, group_mod=2,
                                res_cap=8 * n, sub=64, subwin=128)
    rbu = parent_rulebook(parent, child_off, nc, 8)
    wgu = build_windowed_gather(rbu, v_src=nc, tile=256, res_cap=8 * n,
                                sub=64, subwin=128)
    assert wgd is not None and wgu is not None
    assert wgd.sub == 64 and wgu.sub == 64      # sub form actually built
    jm = jax.tree_util.tree_map
    wgdj, wguj = jm(jnp.asarray, wgd), jm(jnp.asarray, wgu)

    fine = jnp.asarray(rng_np.normal(size=(n, 5)).astype(np.float32))
    w = jnp.asarray(rng_np.normal(size=(8, 5, 4)).astype(np.float32))
    pj, oj, dj = (jnp.asarray(parent), jnp.asarray(child_off),
                  jnp.asarray(down_rb))
    ref = np.asarray(strided_conv_apply(fine, dj, w, pj, oj))
    out = np.asarray(wg_conv_apply(fine, w, wgdj, wguj))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    gp = jax.grad(lambda f, w_: jnp.sum(
        strided_conv_apply(f, dj, w_, pj, oj) ** 2), argnums=(0, 1))(fine, w)
    gw = jax.grad(lambda f, w_: jnp.sum(
        wg_conv_apply(f, w_, wgdj, wguj) ** 2), argnums=(0, 1))(fine, w)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pallas_fused_bwd_sub_interpret(rng):
    """Fused backward kernel (dfeats + dW in one pass over the
    [feats|dout] concat) == the two separate einsum evaluations."""
    from tdwss.ops.pallas_subm import windowed_bwd_sub
    from tdwss.ops.sparse_conv import (_sub_big_locals, _w27_expand,
                                       _win_dw, _win_matmul)

    v, tile, window, sub, swk, cin, cout = 128, 32, 48, 8, 16, 12, 8
    tiles = v // tile
    nsub = tile // sub
    feats = jnp.asarray(rng.normal(size=(v, cin)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))
    weight = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, (v - window) // 8 + 1, size=(tiles, 9)) * 8)
        .astype(np.int32))
    sub_off = jnp.asarray(
        (rng.integers(0, (window - swk) // 8 + 1, size=(tiles * nsub, 9)) * 8)
        .astype(np.int32))
    rb_sub = jnp.asarray(
        rng.integers(0, swk + 1, size=(v, 27)).astype(np.int32))

    # reference: separate transposed-conv (dfeats) and dW einsum paths
    rb_big = _sub_big_locals(rb_sub, sub_off, window, sub, swk)
    wt2d = weight[::-1].transpose(0, 2, 1).reshape(27 * cout, cin)
    dx_ref = _win_matmul(dout, rb_big, _w27_expand(starts), wt2d, window)
    dw_ref = _win_dw(feats, rb_big, _w27_expand(starts), dout, window)

    ccat = cin + cout
    from tdwss.ops.pallas_subm import _lane_pad

    l = _lane_pad(ccat)
    src_cat = jnp.concatenate([feats, dout], axis=1)
    wt_full = jnp.zeros((27, l, cin), jnp.float32)
    wt_full = wt_full.at[:, cin:cin + cout, :].set(
        weight[::-1].transpose(0, 2, 1))
    dx, dw_l = windowed_bwd_sub(
        src_cat, starts.reshape(-1), sub_off.reshape(-1), rb_sub.T,
        wt_full, dout, window=window, tile=tile, sub=sub, subwin=swk,
        cin=cin, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw_l[:, :cin, :].reshape(27 * cin, cout)),
        np.asarray(dw_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_res_tile_grouping_matches_plain(rng):
    """Default (sticky-cap) builds now tile-group the spills; the conv
    must still equal the plain path exactly — fwd and both grads."""
    import jax

    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_subm27,
                                     reset_sticky_plans, voxelize_np)
    from tdwss.ops.sparse_conv import subm_conv_apply
    from tests.test_host_plan import _random_coords

    reset_sticky_plans()
    rng_np = np.random.default_rng(23)
    n = 4096
    coords, feats_raw, valid = _random_coords(rng_np, n=n, size=40,
                                              invalid_frac=0.05)
    grid, _, _ = voxelize_np(coords, feats_raw[:, :3], valid, n)
    rb = build_subm_rulebook_np(grid, 3)
    # tiny window forces MANY spills -> the tile grouping carries them
    win = build_windowed_subm27(rb, grid, tile=512, window=136,
                                sub=0, subwin=0)
    assert win is not None and win.res_hent is not None
    n_heavy = int((win.res_hent[:, 0] < n).sum())
    n_legacy = int((win.res_ovf[:, 0] < n).sum())
    assert n_legacy + n_heavy > 500, "spill layouts must carry the spills"
    assert n_heavy > 0, "tiny window should overflow some 512-row tiles"
    assert win.res_hent.shape[0] % 512 == 0, "heavy list is chunk-aligned"

    jm = jax.tree_util.tree_map
    winj = jm(jnp.asarray, win)
    vf = jnp.asarray(rng_np.normal(size=(n, 6)).astype(np.float32))
    w = jnp.asarray(rng_np.normal(size=(27, 6, 5)).astype(np.float32))
    ref = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w))
    out = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w, winj))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    gp = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_) ** 2), argnums=(0, 1))(vf, w)
    gw = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_, winj) ** 2),
        argnums=(0, 1))(vf, w)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                               rtol=2e-4, atol=2e-4)
    reset_sticky_plans()


def test_group_spill_tiles_layout():
    """Host grouping: light tiles -> leftover, heavy tiles chunk-aligned."""
    from tdwss.ops.host_plan import (_RES_HCHUNK, _RES_HEAVY_MIN, _RES_TILE,
                                     _group_spill_tiles, reset_sticky_plans)

    reset_sticky_plans()
    v_out, v_src = 2048, 4096
    # light spills in tiles 0/3, one HEAVY tile 1 (> _RES_HEAVY_MIN), one
    # heavy tile 2 spanning two chunks (> _RES_HCHUNK entries)
    light = np.array([[5, 1, 100], [5, 2, 101], [400, 0, 7],
                      [1600, 26, 9]], np.int32)
    nh1 = _RES_HEAVY_MIN + 10
    heavy1 = np.stack([
        512 + np.arange(nh1) % _RES_TILE,
        np.zeros(nh1, np.int64),
        np.arange(nh1) + 50,
    ], axis=1).astype(np.int32)
    nh2 = _RES_HCHUNK + 5
    heavy2 = np.stack([
        1024 + np.arange(nh2) % _RES_TILE,
        np.ones(nh2, np.int64),
        np.arange(nh2) + 9,
    ], axis=1).astype(np.int32)
    entries = np.concatenate([light[:3], heavy1, heavy2, light[3:]])
    res_tile, hent, htile, leftover = _group_spill_tiles(
        entries, v_out, v_src, ("t",))
    t2 = v_out // _RES_TILE
    assert res_tile is None
    # light entries come back as leftover, original order
    np.testing.assert_array_equal(leftover, light)
    # chunk-aligned heavy list; tiles 1+2 PACK into shared chunks (both
    # within one _RES_HSPAN scatter window): chunk 0 = all of tile 1 +
    # the head of tile 2, chunk 1 = the rest of tile 2
    assert hent.shape[0] % _RES_HCHUNK == 0
    assert hent.shape[0] == htile.shape[0] * _RES_HCHUNK
    np.testing.assert_array_equal(hent[:nh1], heavy1)
    head2 = _RES_HCHUNK - nh1
    np.testing.assert_array_equal(hent[nh1:_RES_HCHUNK], heavy2[:head2])
    rest = nh2 - head2
    np.testing.assert_array_equal(
        hent[_RES_HCHUNK:_RES_HCHUNK + rest], heavy2[head2:])
    assert (hent[_RES_HCHUNK + rest: 2 * _RES_HCHUNK, 0] == v_out).all()
    real = htile[htile[:, 0] < t2]
    np.testing.assert_array_equal(real, [[1, 0], [2, _RES_HCHUNK]])
    # every entry's owner sits inside its chunk's scatter window
    from tdwss.ops.host_plan import _RES_HSPAN
    for ci in range(htile.shape[0]):
        base = htile[ci, 0]
        rows = hent[ci * _RES_HCHUNK:(ci + 1) * _RES_HCHUNK, 0]
        live = rows < v_out
        if base < t2 and live.any():
            local = rows[live] - base * _RES_TILE
            assert (local >= 0).all()
            assert (local < _RES_HSPAN * _RES_TILE).all()
    reset_sticky_plans()


@pytest.mark.slow
def test_w27_v_active_prefix_matches_full(rng):
    """v_active grid shrink == full-grid evaluation (fwd + grads, CPU).

    A grid whose capacity is ~4x its valid rows gets a v_active prefix
    (host _active_prefix quantum = 4 tiles); the sliced kernel grid must
    reproduce the full path bit-for-bit including zero padding rows.
    """
    from tests.test_host_plan import _random_coords
    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_subm27,
                                     reset_sticky_plans, voxelize_np)

    reset_sticky_plans()
    rng2 = np.random.default_rng(11)
    n = 2048                                   # capacity
    coords, feats, valid = _random_coords(rng2, n=512, size=16,
                                          invalid_frac=0.05)
    coords = np.concatenate(
        [coords, np.zeros((n - 512, 4), coords.dtype)])
    feats = np.concatenate(
        [feats, np.zeros((n - 512, feats.shape[1]), feats.dtype)])
    valid = np.concatenate([valid, np.zeros(n - 512, bool)])
    grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
    assert int(grid.num_valid) < n // 2
    rb = build_subm_rulebook_np(grid, 3)
    win = build_windowed_subm27(rb, grid, tile=128, window=256,
                                sub=32, subwin=64)
    assert win.v_active and win.v_active < n, win.v_active
    vf = jnp.asarray(rng2.normal(size=(n, 5)).astype(np.float32))
    # zero out padding-row features like the real pipeline does
    vf = vf * jnp.asarray(grid.valid)[:, None]
    w = jnp.asarray(rng2.normal(size=(27, 5, 4)).astype(np.float32))
    winj = jax.tree_util.tree_map(jnp.asarray, win)
    full = winj.replace(v_active=0)
    ref = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w, full))
    out = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w, winj))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert not np.any(out[win.v_active:])
    ga = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_, winj) ** 2),
        argnums=(0, 1))(vf, w)
    gf = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_, full) ** 2),
        argnums=(0, 1))(vf, w)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gf[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gf[1]),
                               rtol=2e-4, atol=2e-4)
    reset_sticky_plans()


def test_gather_fused_bwd_matches_plain(rng, monkeypatch):
    """Symmetric gather-fused backward route (windowed_bwd_gather +
    FLIPPED spill dW) == plain conv gradients, end-to-end through
    subm_conv_apply's VJP on a REAL plan (the kernel's dW relies on the
    27-tap rulebook's flip-symmetry, so a random rb cannot test it)."""
    import functools

    from tests.test_host_plan import _random_coords
    from tdwss.ops import pallas_subm as ps
    from tdwss.ops import sparse_conv as sc
    from tdwss.ops.host_plan import (build_subm_rulebook_np,
                                     build_windowed_subm27,
                                     reset_sticky_plans, voxelize_np)

    reset_sticky_plans()
    rng2 = np.random.default_rng(11)
    n = 1024
    coords, feats, valid = _random_coords(rng2, n=n, size=20,
                                          invalid_frac=0.05)
    grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
    rb = build_subm_rulebook_np(grid, 3)
    # tight window/subwin -> a real spill population exercises the
    # flipped-orientation spill dW
    win = build_windowed_subm27(rb, grid, tile=128, window=256,
                                res_cap=27 * n, sub=32, subwin=64)
    assert win.sub_off is not None

    # route the conv through the kernels on CPU (interpret mode)
    monkeypatch.setattr(
        sc, "_use_pallas_kernel",
        lambda v, tiles, window, nanchor=27, c3=0, cout=0, v_out=0:
        tiles > 0 and v % tiles == 0 and window % 8 == 0 and v % 8 == 0)
    for name in ("windowed_bwd_gather", "windowed_matmul_sub",
                 "windowed_matmul", "windowed_dw_sub", "windowed_dw"):
        monkeypatch.setattr(ps, name, functools.partial(
            getattr(ps, name), interpret=True))

    c = 8    # c3 <= 32 -> pack p=4 inside the kernel
    vf = jnp.asarray(rng2.normal(size=(n, c)).astype(np.float32))
    vf = vf * jnp.asarray(grid.valid)[:, None]
    w = jnp.asarray(
        (rng2.normal(size=(27, c, c)) * 0.2).astype(np.float32))
    winj = jax.tree_util.tree_map(jnp.asarray, win)

    # the gather route must actually engage (guard against silent fallback)
    got = sc._w27_bwd_gather(
        vf, vf, w, winj.rb_local, winj.starts, winj.sub_off,
        win.window, win.sub, win.subwin, getattr(win, "v_active", 0))
    assert got is not None, "gather-fused route did not engage"

    gk = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_, winj) ** 2),
        argnums=(0, 1))(vf, w)
    gp = jax.grad(lambda f, w_: jnp.sum(
        subm_conv_apply(f, jnp.asarray(rb), w_) ** 2),
        argnums=(0, 1))(vf, w)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gp[1]),
                               rtol=2e-4, atol=2e-4)
    reset_sticky_plans()


def test_wg_gather_fused_bwd_matches_plain(rng, monkeypatch):
    """Fused wg backward (windowed_bwd_gather flip_taps=False + swapped
    B-side spill dW) == plain strided-conv gradients, end-to-end through
    wg_conv_apply's VJP on a REAL transposed-rulebook plan."""
    import functools

    import jax

    from tdwss.ops import pallas_subm as ps
    from tdwss.ops import sparse_conv as sc
    from tdwss.ops.host_plan import (build_windowed_gather,
                                     downsample_level_np, parent_rulebook,
                                     reset_sticky_plans, voxelize_np)
    from tdwss.ops.sparse_conv import strided_conv_apply, wg_conv_apply
    from tests.test_host_plan import _random_coords

    reset_sticky_plans()
    rng_np = np.random.default_rng(19)
    n, nc = 2048, 1024
    coords, feats, valid = _random_coords(rng_np, n=n, size=32,
                                          invalid_frac=0.05)
    grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
    cg, parent, child_off, down_rb = downsample_level_np(grid, nc, 2, 2)
    wgd = build_windowed_gather(down_rb, v_src=n, tile=256, group_mod=2,
                                res_cap=8 * n, sub=64, subwin=128)
    rbu = parent_rulebook(parent, child_off, nc, 8)
    wgu = build_windowed_gather(rbu, v_src=nc, tile=256, res_cap=8 * n,
                                sub=64, subwin=128)
    assert wgd is not None and wgu is not None and wgu.sub == 64
    jm = jax.tree_util.tree_map
    wgdj, wguj = jm(jnp.asarray, wgd), jm(jnp.asarray, wgu)

    # route through the kernels on CPU (interpret mode)
    monkeypatch.setattr(
        sc, "_use_pallas_wg",
        lambda v_src, v_out, tiles, window, k, c, cout, nwin=1:
        tiles > 0 and v_out % tiles == 0 and window % 8 == 0
        and v_src % 8 == 0)
    for name in ("windowed_bwd_gather", "windowed_matmul_sub",
                 "windowed_matmul", "windowed_dw_sub", "windowed_dw"):
        monkeypatch.setattr(ps, name, functools.partial(
            getattr(ps, name), interpret=True))

    fine = jnp.asarray(rng_np.normal(size=(n, 8)).astype(np.float32))
    fine = fine * jnp.asarray(grid.valid)[:, None]
    w = jnp.asarray((rng_np.normal(size=(8, 8, 8)) * 0.3
                     ).astype(np.float32))
    pj, oj, dj = (jnp.asarray(parent), jnp.asarray(child_off),
                  jnp.asarray(down_rb))

    # the fused route must engage for the strided conv's backward
    # (b-side = wgu)
    got = sc._wg_bwd_gather(fine, jnp.zeros((nc, 8), jnp.float32), w,
                            wguj.rb_local, wguj.starts, sc._wg_soff(wguj),
                            wgu.window, wgu.sub, wgu.subwin)
    assert got is not None, "wg gather-fused route did not engage"

    gp = jax.grad(lambda f, w_: jnp.sum(
        strided_conv_apply(f, dj, w_, pj, oj) ** 2), argnums=(0, 1))(fine, w)
    gw = jax.grad(lambda f, w_: jnp.sum(
        wg_conv_apply(f, w_, wgdj, wguj) ** 2), argnums=(0, 1))(fine, w)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                               rtol=2e-4, atol=2e-4)
    reset_sticky_plans()
