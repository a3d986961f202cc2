"""Op-level costs at production scale: everything in the step EXCEPT the
submanifold convs (those are covered by micro_subm / probe_w27).

Times strided conv, deconv, unpool, max-pool, batch-norm, devoxelize and
segment pooling on an ScanNet-like L1->L2 transition, fwd and fwd+bwd.

Run: python -m benchmarks.probe_ops
"""

from __future__ import annotations

import time

import numpy as np


from benchmarks._timing import timed  # noqa: E402 — honest sync


def main():
    import jax
    import jax.numpy as jnp

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import build_plans_np, voxelize_np
    from tdwss.ops.sparse_conv import (deconv_apply, max_pool,
                                       strided_conv_apply, unpool)
    from tdwss.ops.segment import segment_mean_by_batch

    scenes = make_dataset(5, num_points=150_000, seed=7, with_text=False)
    pts, bidx = [], []
    for i, s in enumerate(scenes):
        xyz = s.points * 50.0
        xyz = xyz - xyz.min(axis=0)
        pts.append(np.round(xyz).astype(np.int32))
        bidx.append(np.full((xyz.shape[0],), i, np.int32))
    coords = np.concatenate(
        [np.concatenate(pts), np.concatenate(bidx)[:, None]], axis=1)
    valid = np.ones((coords.shape[0],), bool)
    gp, _, _ = voxelize_np(coords, None, valid, coords.shape[0])
    cap = ((int(gp.num_valid) + 1023) // 1024) * 1024
    grid, _, _ = voxelize_np(coords, None, valid, cap)
    cap2 = cap // 2
    plans = build_plans_np(grid, 2, [cap, cap2], windowed=False)
    lvl0, lvl1 = plans.levels
    print(f"V1={cap} V2={cap2} platform={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    cin, cout = 32, 64
    fine = jnp.asarray(rng.standard_normal((cap, cin)).astype(np.float32),
                       dtype=jnp.bfloat16)
    coarse = jnp.asarray(rng.standard_normal((cap2, cout)).astype(np.float32),
                         dtype=jnp.bfloat16)
    w_dn = jnp.asarray((rng.standard_normal((8, cin, cout)) * .05
                        ).astype(np.float32), dtype=jnp.bfloat16)
    w_up = jnp.asarray((rng.standard_normal((8, cout, cin)) * .05
                        ).astype(np.float32), dtype=jnp.bfloat16)
    down_rb = jnp.asarray(lvl0.down_rb)
    parent = jnp.asarray(lvl0.parent)
    child_off = jnp.asarray(lvl0.child_offset)
    fvalid = jnp.asarray(lvl0.grid.valid)

    results = {}

    f_str = jax.jit(lambda f, w: strided_conv_apply(f, down_rb, w, parent,
                                                    child_off))
    results["strided fwd"] = timed(f_str, fine, w_dn)
    g_str = jax.jit(jax.grad(
        lambda f, w: jnp.sum(strided_conv_apply(
            f, down_rb, w, parent, child_off).astype(jnp.float32) ** 2),
        argnums=(0, 1)))
    results["strided fwd+bwd"] = timed(g_str, fine, w_dn)

    f_dec = jax.jit(lambda c, w: deconv_apply(c, parent, child_off, w,
                                              fine_valid=fvalid,
                                              down_rb=down_rb))
    results["deconv fwd"] = timed(f_dec, coarse, w_up)
    g_dec = jax.jit(jax.grad(
        lambda c, w: jnp.sum(deconv_apply(
            c, parent, child_off, w, fine_valid=fvalid,
            down_rb=down_rb).astype(jnp.float32) ** 2), argnums=(0, 1)))
    results["deconv fwd+bwd"] = timed(g_dec, coarse, w_up)

    f_up = jax.jit(lambda c: unpool(c, parent, fine_valid=fvalid,
                                    down_rb=down_rb))
    results["unpool fwd"] = timed(f_up, coarse)
    g_up = jax.jit(jax.grad(lambda c: jnp.sum(unpool(
        c, parent, fine_valid=fvalid,
        down_rb=down_rb).astype(jnp.float32) ** 2)))
    results["unpool fwd+bwd"] = timed(g_up, coarse)

    f_mp = jax.jit(lambda f: max_pool(f, down_rb))
    results["maxpool fwd"] = timed(f_mp, fine)

    # segment mean over scenes (B=5)
    boffs = jnp.asarray(np.asarray(lvl0.grid.coords)[:, 3].astype(np.int32))
    f_seg = jax.jit(lambda f: segment_mean_by_batch(f, boffs, 5, fvalid))
    try:
        results["segment mean fwd"] = timed(f_seg, fine)
    except Exception as e:  # noqa: BLE001
        print("segment mean failed:", str(e)[:120])

    for k, v in results.items():
        print(f"{k:20s} {v*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
