"""Host (numpy) plan builder must match the on-device builder exactly."""

import jax.numpy as jnp
import numpy as np

from tdwss.ops.host_plan import (
    build_plans_np,
    build_subm_rulebook_np,
    host_voxelize_and_plan,
    voxelize_np,
)
from tdwss.ops.plan import build_plans, build_subm_rulebook, level_capacities
from tdwss.ops.voxelize import voxelize


def _random_coords(rng, n=2000, size=48, batches=3, invalid_frac=0.1):
    coords = np.concatenate(
        [rng.integers(0, size, (n, 3)), rng.integers(0, batches, (n, 1))],
        axis=1).astype(np.int32)
    valid = rng.random(n) > invalid_frac
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    return coords, feats, valid


def test_voxelize_matches_device(rng):
    coords, feats, valid = _random_coords(rng)
    cap = coords.shape[0]
    g_np, f_np, p2v_np = voxelize_np(coords, feats, valid, cap)
    g_dev, f_dev, p2v_dev = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), cap)
    np.testing.assert_array_equal(g_np.coords, np.asarray(g_dev.coords))
    np.testing.assert_array_equal(g_np.key_hi, np.asarray(g_dev.key_hi))
    np.testing.assert_array_equal(g_np.key_lo, np.asarray(g_dev.key_lo))
    np.testing.assert_array_equal(g_np.valid, np.asarray(g_dev.valid))
    np.testing.assert_array_equal(g_np.counts, np.asarray(g_dev.counts))
    assert int(g_np.num_valid) == int(g_dev.num_valid)
    np.testing.assert_array_equal(p2v_np, np.asarray(p2v_dev))
    np.testing.assert_allclose(f_np, np.asarray(f_dev), rtol=1e-5, atol=1e-6)


def test_voxelize_overflow(rng):
    coords, feats, valid = _random_coords(rng, n=500, size=16)
    cap = 64  # force overflow
    g_np, _, p2v_np = voxelize_np(coords, feats, valid, cap)
    g_dev, _, p2v_dev = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), cap)
    assert int(g_np.num_valid) == int(g_dev.num_valid) > cap
    np.testing.assert_array_equal(p2v_np, np.asarray(p2v_dev))


def test_subm_rulebook_matches(rng):
    coords, feats, valid = _random_coords(rng, n=800, size=24)
    cap = coords.shape[0]
    g_np, _, _ = voxelize_np(coords, feats, valid, cap)
    g_dev, _, _ = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), cap)
    rb_np = build_subm_rulebook_np(g_np, 3)
    rb_dev = np.asarray(build_subm_rulebook(g_dev, 3))
    np.testing.assert_array_equal(rb_np, rb_dev)


def test_full_plans_match(rng):
    coords, feats, valid = _random_coords(rng, n=1500, size=64)
    cap = coords.shape[0]
    caps = level_capacities(cap, 4, 2, 64)
    g_np, _, _ = voxelize_np(coords, feats, valid, cap)
    g_dev, _, _ = voxelize(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), cap)
    p_np = build_plans_np(g_np, 4, caps)
    p_dev = build_plans(g_dev, 4, caps)
    for lvl_np, lvl_dev in zip(p_np.levels, p_dev.levels):
        np.testing.assert_array_equal(lvl_np.subm_rb, np.asarray(lvl_dev.subm_rb))
        np.testing.assert_array_equal(lvl_np.grid.coords,
                                      np.asarray(lvl_dev.grid.coords))
        if lvl_np.parent is not None:
            np.testing.assert_array_equal(lvl_np.parent,
                                          np.asarray(lvl_dev.parent))
            np.testing.assert_array_equal(lvl_np.child_offset,
                                          np.asarray(lvl_dev.child_offset))
            np.testing.assert_array_equal(lvl_np.down_rb,
                                          np.asarray(lvl_dev.down_rb))


def test_one_call_pipeline(rng):
    coords, feats, valid = _random_coords(rng, n=1000, size=32)
    caps = level_capacities(1000, 3, 2, 64)
    plans, vfeats, p2v, perm = host_voxelize_and_plan(
        coords, feats, valid, 3, caps)
    assert len(plans.levels) == 3
    assert vfeats.shape == (1000, 3)
    assert p2v.shape == (1000,)
    assert perm.shape == (1000,)


def test_devoxelize_seg_grad_matches_autodiff(rng):
    """Cumsum-run VJP == plain scatter VJP of the devoxelize gather."""
    import jax

    from tdwss.ops.voxelize import devoxelize, devoxelize_seg

    coords, feats, valid = _random_coords(rng, n=400, size=8)  # many dups
    cap = 128
    grid, vfeats, p2v, order = voxelize_np(coords, feats, valid, cap,
                                           return_order=True)
    vox = jnp.asarray(rng.normal(size=(cap, 6)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(coords.shape[0], 6)).astype(np.float32))

    g_ref = jax.grad(lambda v: jnp.sum(devoxelize(v, jnp.asarray(p2v)) * cot))(vox)
    g_seg = jax.grad(lambda v: jnp.sum(devoxelize_seg(
        v, jnp.asarray(p2v), jnp.asarray(order),
        jnp.asarray(grid.counts)) * cot))(vox)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_voxelize_sorted_order(rng):
    coords, feats, valid = _random_coords(rng, n=300, size=8)
    cap = 300
    grid, _, p2v, order = voxelize_np(coords, feats, valid, cap,
                                      return_order=True)
    # runs: voxel ids nondecreasing over the kept prefix
    kept = int(np.asarray(grid.counts).sum())
    run_ids = p2v[order[:kept]]
    assert (np.diff(run_ids) >= 0).all()
    assert (p2v[order[kept:]] >= cap).all()


class TestBrickPlan:
    def test_roundtrip_and_adjacency(self, rng):
        from tdwss.ops.experimental.brick_plan import build_brick_plan

        coords, feats, valid = _random_coords(rng, n=2000, size=48,
                                              invalid_frac=0.1)
        grid, _, _ = voxelize_np(coords, feats, valid, 2000)
        plan = build_brick_plan(grid, size=8)
        v = grid.capacity
        s3 = plan.size ** 3
        gc = np.asarray(grid.coords)
        gvalid = np.asarray(grid.valid)

        # voxel -> cell -> voxel roundtrip
        for i in np.nonzero(gvalid)[0][:200]:
            c = plan.vox2cell[i]
            assert c < plan.cell2vox.shape[0] * s3
            assert plan.cell2vox.reshape(-1)[c] == i
            b = c // s3
            np.testing.assert_array_equal(
                plan.brick_coords[b, :3], gc[i, :3] // 8)
            assert plan.brick_coords[b, 3] == gc[i, 3]

        # adjacency is geometric: neighbor brick coords differ by the offset
        from tdwss.ops.experimental.brick_plan import _NEIGHBOR_OFFSETS
        bvalid = np.asarray(plan.brick_valid)
        for b in np.nonzero(bvalid)[0][:50]:
            for j, off in enumerate(_NEIGHBOR_OFFSETS):
                nb = plan.neighbors[b, j]
                if nb < plan.brick_coords.shape[0]:
                    np.testing.assert_array_equal(
                        plan.brick_coords[nb, :3],
                        plan.brick_coords[b, :3] + off)
                    assert plan.brick_coords[nb, 3] == plan.brick_coords[b, 3]

        # every occupied brick pair that IS adjacent appears in the table
        bc = plan.brick_coords[bvalid]
        key = {tuple(r) for r in bc.tolist()}
        for b in np.nonzero(bvalid)[0][:30]:
            for j, off in enumerate(_NEIGHBOR_OFFSETS):
                t = tuple((plan.brick_coords[b, :3] + off).tolist()
                          + [int(plan.brick_coords[b, 3])])
                expected = t in key
                found = plan.neighbors[b, j] < plan.brick_coords.shape[0]
                assert expected == found

    def test_dense_fill_matches_take(self, rng):
        """Device-style brick fill == gather through cell2vox."""
        import jax.numpy as jnp

        from tdwss.ops.experimental.brick_plan import build_brick_plan

        coords, feats, valid = _random_coords(rng, n=800, size=24)
        grid, vfeats, _ = voxelize_np(coords, feats, valid, 800)
        plan = build_brick_plan(grid, size=8)
        x = jnp.take(jnp.asarray(vfeats), jnp.asarray(plan.cell2vox.reshape(-1)),
                     axis=0, mode="fill", fill_value=0)
        bricks = np.asarray(x).reshape(-1, 8, 8, 8, 3)
        # spot check one voxel lands in its cell
        i = int(np.nonzero(np.asarray(grid.valid))[0][0])
        c = int(plan.vox2cell[i])
        b, off = divmod(c, 512)
        np.testing.assert_allclose(
            bricks[b].reshape(512, 3)[off], np.asarray(vfeats)[i])


def test_brick_conv_matches_plain(rng):
    """Brick-form conv3d == the gather-GEMM submanifold conv."""
    import jax

    from tdwss.ops.experimental.brick_conv import brick_subm_conv
    from tdwss.ops.experimental.brick_plan import build_brick_plan
    from tdwss.ops.sparse_conv import subm_conv_apply

    coords, feats, valid = _random_coords(rng, n=1200, size=40,
                                          invalid_frac=0.08)
    grid, _, _ = voxelize_np(coords, feats, valid, 1200)
    rb = build_subm_rulebook_np(grid, 3)
    plan = build_brick_plan(grid, size=8, brick_cap=2048)
    assert plan.num_bricks <= 2048
    cin, cout = 6, 5
    vf = jnp.asarray(rng.normal(size=(1200, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    plan_j = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, plan)
    out = np.asarray(brick_subm_conv(vf, plan_j, w))
    ref = np.asarray(subm_conv_apply(vf, jnp.asarray(rb), w))
    valid_rows = np.asarray(grid.valid)
    np.testing.assert_allclose(out[valid_rows], ref[valid_rows],
                               rtol=1e-4, atol=1e-4)


class TestWindowed27:
    def _setup(self, rng, n=1024, size=24, cin=5, cout=4, window=256,
               tile=128):
        import jax

        from tdwss.ops.host_plan import build_windowed_subm27
        from tdwss.ops.sparse_conv import subm_conv_apply

        coords, feats, valid = _random_coords(rng, n=n, size=size,
                                              invalid_frac=0.05)
        grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
        rb = build_subm_rulebook_np(grid, 3)
        win = build_windowed_subm27(rb, grid, tile=tile, window=window,
                                    res_cap=27 * n)
        assert win is not None
        vf = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
        win = jax.tree_util.tree_map(jnp.asarray, win)
        return rb, win, vf, w, subm_conv_apply

    def test_forward_and_grads_match_plain(self, rng):
        import jax

        rb, win, vf, w, conv = self._setup(rng)
        ref = np.asarray(conv(vf, jnp.asarray(rb), w))
        out = np.asarray(conv(vf, jnp.asarray(rb), w, win))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

        cot = jnp.asarray(rng.normal(size=(vf.shape[0], 4)).astype(np.float32))
        gp = jax.grad(lambda f, w_: jnp.sum(conv(f, jnp.asarray(rb), w_) * cot),
                      argnums=(0, 1))(vf, w)
        gw = jax.grad(lambda f, w_: jnp.sum(conv(f, jnp.asarray(rb), w_, win) * cot),
                      argnums=(0, 1))(vf, w)
        np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                                   rtol=2e-4, atol=2e-4)

    def test_dense_data_exercises_spills(self, rng):
        import jax

        rb, win, vf, w, conv = self._setup(rng, n=512, size=6, cin=3,
                                           cout=2, window=128)
        assert int((np.asarray(win.res_ovf[:, 0]) < 512).sum()) > 0
        ref = np.asarray(conv(vf, jnp.asarray(rb), w))
        out = np.asarray(conv(vf, jnp.asarray(rb), w, win))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        gp = jax.grad(lambda f, w_: jnp.sum(conv(f, jnp.asarray(rb), w_) ** 2),
                      argnums=(0, 1))(vf, w)
        gw = jax.grad(lambda f, w_: jnp.sum(conv(f, jnp.asarray(rb), w_, win) ** 2),
                      argnums=(0, 1))(vf, w)
        np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                                   rtol=2e-4, atol=2e-4)


class TestWindowedGather:
    """Cross-level windowed ops == plain strided/deconv/unpool paths."""

    def _setup(self, rng, n=1024, nc=512, size=24, cin=5, cout=4):
        import jax

        from tdwss.ops.host_plan import (build_windowed_gather,
                                         downsample_level_np,
                                         parent_rulebook)

        coords, feats, valid = _random_coords(rng, n=n, size=size,
                                              invalid_frac=0.05)
        grid, _, _ = voxelize_np(coords, feats[:, :3], valid, n)
        cg, parent, child_off, down_rb = downsample_level_np(grid, nc, 2, 2)
        wgd = build_windowed_gather(down_rb, v_src=n, tile=64,
                                    res_cap=8 * n)
        rbu = parent_rulebook(parent, child_off, nc, 8)
        wgu = build_windowed_gather(rbu, v_src=nc, tile=64, res_cap=8 * n)
        assert wgd is not None and wgu is not None
        j = jax.tree_util.tree_map
        return (grid, jnp.asarray(parent), jnp.asarray(child_off),
                jnp.asarray(down_rb), j(jnp.asarray, wgd),
                j(jnp.asarray, wgu))

    def test_strided_matches_plain(self, rng):
        import jax

        from tdwss.ops.sparse_conv import strided_conv_apply, wg_conv_apply

        grid, parent, off, drb, wgd, wgu = self._setup(rng)
        n = drb.shape[0] * 2
        fine = jnp.asarray(rng.normal(size=(1024, 5)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(8, 5, 4)).astype(np.float32))
        ref = np.asarray(strided_conv_apply(fine, drb, w, parent, off))
        out = np.asarray(wg_conv_apply(fine, w, wgd, wgu))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        gp = jax.grad(lambda f, w_: jnp.sum(
            strided_conv_apply(f, drb, w_, parent, off) ** 2),
            argnums=(0, 1))(fine, w)
        gw = jax.grad(lambda f, w_: jnp.sum(
            wg_conv_apply(f, w_, wgd, wgu) ** 2), argnums=(0, 1))(fine, w)
        np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                                   rtol=2e-4, atol=2e-4)

    def test_deconv_and_unpool_match_plain(self, rng):
        import jax

        from tdwss.ops.sparse_conv import (deconv_apply, unpool,
                                           wg_conv_apply, wg_unpool_apply)

        grid, parent, off, drb, wgd, wgu = self._setup(rng)
        fval = jnp.asarray(grid.valid)
        coarse = jnp.asarray(rng.normal(size=(512, 5)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(8, 5, 4)).astype(np.float32))
        ref = np.asarray(deconv_apply(coarse, parent, off, w,
                                      fine_valid=fval, down_rb=drb))
        out = np.asarray(wg_conv_apply(coarse, w, wgu, wgd))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        gp = jax.grad(lambda c, w_: jnp.sum(deconv_apply(
            c, parent, off, w_, fine_valid=fval, down_rb=drb) ** 2),
            argnums=(0, 1))(coarse, w)
        gw = jax.grad(lambda c, w_: jnp.sum(
            wg_conv_apply(c, w_, wgu, wgd) ** 2), argnums=(0, 1))(coarse, w)
        np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gp[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gp[1]),
                                   rtol=2e-4, atol=2e-4)

        ref = np.asarray(unpool(coarse, parent, fine_valid=fval,
                                down_rb=drb))
        out = np.asarray(wg_unpool_apply(coarse, wgu, wgd))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        gpu = jax.grad(lambda c: jnp.sum(unpool(
            c, parent, fine_valid=fval, down_rb=drb) ** 2))(coarse)
        gwu = jax.grad(lambda c: jnp.sum(
            wg_unpool_apply(c, wgu, wgd) ** 2))(coarse)
        np.testing.assert_allclose(np.asarray(gwu), np.asarray(gpu),
                                   rtol=1e-4, atol=1e-4)

    def test_grouped_down_gather_matches_plain(self, rng):
        """oz-parity grouped down windows (group_mod=stride) stay exact."""
        import jax

        from tdwss.ops.host_plan import (build_windowed_gather,
                                         downsample_level_np,
                                         parent_rulebook)
        from tdwss.ops.sparse_conv import strided_conv_apply, wg_conv_apply

        coords, feats, valid = _random_coords(rng, n=1024, size=24,
                                              invalid_frac=0.05)
        grid, _, _ = voxelize_np(coords, feats[:, :3], valid, 1024)
        cg, parent, child_off, down_rb = downsample_level_np(grid, 512, 2, 2)
        wgd = build_windowed_gather(down_rb, v_src=1024, tile=64,
                                    group_mod=2, res_cap=8 * 1024)
        rbu = parent_rulebook(parent, child_off, 512, 8)
        wgu = build_windowed_gather(rbu, v_src=512, tile=64, res_cap=8 * 1024)
        assert wgd is not None and wgd.starts.shape[1] == 2
        j = jax.tree_util.tree_map
        wgdj, wguj = j(jnp.asarray, wgd), j(jnp.asarray, wgu)
        fine = jnp.asarray(rng.normal(size=(1024, 5)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(8, 5, 4)).astype(np.float32))
        ref = np.asarray(strided_conv_apply(
            fine, jnp.asarray(down_rb), w, jnp.asarray(parent),
            jnp.asarray(child_off)))
        out = np.asarray(wg_conv_apply(fine, w, wgdj, wguj))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestDownsamplePlanFused:
    """Native fused downsample_plan == downsample_level_np + parent_rulebook."""

    def _compare(self, rng, n, size, nc, f, s, invalid_frac=0.1):
        from tdwss.ops.host_plan import (downsample_level_np,
                                         downsample_plan_np,
                                         parent_rulebook)

        coords, feats, valid = _random_coords(rng, n=n, size=size,
                                              invalid_frac=invalid_frac)
        grid, _, _ = voxelize_np(coords, feats, valid, n)
        cg_ref, parent_ref, off_ref, drb_ref = downsample_level_np(
            grid, nc, f, s)
        rbu_ref = parent_rulebook(parent_ref, off_ref, nc, f ** 3)
        cg, parent, off, drb, rbu = downsample_plan_np(grid, nc, f, s)
        np.testing.assert_array_equal(np.asarray(cg.coords),
                                      np.asarray(cg_ref.coords))
        np.testing.assert_array_equal(np.asarray(cg.key_hi),
                                      np.asarray(cg_ref.key_hi))
        np.testing.assert_array_equal(np.asarray(cg.key_lo),
                                      np.asarray(cg_ref.key_lo))
        np.testing.assert_array_equal(np.asarray(cg.valid),
                                      np.asarray(cg_ref.valid))
        np.testing.assert_array_equal(np.asarray(cg.counts),
                                      np.asarray(cg_ref.counts))
        assert int(cg.num_valid) == int(cg_ref.num_valid)
        np.testing.assert_array_equal(parent, parent_ref)
        np.testing.assert_array_equal(off, off_ref)
        np.testing.assert_array_equal(drb, drb_ref)
        np.testing.assert_array_equal(rbu, rbu_ref)

    def test_matches_numpy_s2(self, rng):
        self._compare(rng, n=4096, size=40, nc=1024, f=2, s=2)

    def test_matches_numpy_s4(self, rng):
        self._compare(rng, n=4096, size=64, nc=512, f=4, s=4)

    def test_overflow_capacity(self, rng):
        # coarse capacity much smaller than the distinct coarse voxels:
        # overflowed fine rows must come out parent == nc in both paths
        self._compare(rng, n=4096, size=64, nc=64, f=2, s=2)

    def test_all_invalid(self, rng):
        from tdwss.ops.host_plan import downsample_plan_np

        coords = np.zeros((128, 4), np.int32)
        valid = np.zeros((128,), bool)
        grid, _, _ = voxelize_np(coords, None, valid, 128)
        cg, parent, off, drb, rbu = downsample_plan_np(grid, 32, 2, 2)
        assert not np.asarray(cg.valid).any()
        assert (parent == 32).all()
        assert (drb == -1).all() and (rbu == -1).all()
