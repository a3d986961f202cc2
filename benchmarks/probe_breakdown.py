"""Break down the windowed subm conv cost: Pallas kernel vs residual path.

Times, on the real chip at production L1 scale:
  - windowed_matmul (fused Pallas window DMA + Z + one-hot)
  - _res_apply (tiered residual corrections)
  - build_xtriples
  - full subm_conv_apply (windowed) and the plain 27-tap path

Run: python -m benchmarks.probe_breakdown [--cin 32] [--cout 32]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timed(fn, *args, steps=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--window", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import build_subm_rulebook_np, \
        build_windowed_subm, voxelize_np
    from tdwss.ops import sparse_conv as sc
    from tdwss.ops.pallas_subm import pad_w9, windowed_matmul, windowed_dw

    scenes = make_dataset(args.scenes, num_points=args.points, seed=7,
                          with_text=False)
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
    rb27 = build_subm_rulebook_np(grid, 3)
    win = build_windowed_subm(rb27, grid, tile=args.tile, window=args.window)
    winj = jax.tree_util.tree_map(jnp.asarray, win)
    n_pad = int((np.asarray(win.res_pad[..., 1]) < cap).sum())
    n_ovf = int((np.asarray(win.res_ovf[:, 0]) < cap).sum())
    print(f"V={int(gp.num_valid)} cap={cap} tile={args.tile} "
          f"window={args.window} pad={n_pad} ovf={n_ovf}")

    rng = np.random.default_rng(0)
    cin, cout = args.cin, args.cout
    feats = jnp.asarray(rng.standard_normal((cap, cin)).astype(np.float32),
                        dtype=jnp.bfloat16)
    weight = jnp.asarray(
        (rng.standard_normal((27, cin, cout)) * 0.05).astype(np.float32),
        dtype=jnp.bfloat16)
    w2d = weight.reshape(27 * cin, cout)
    w9 = sc._permute_taps(w2d, cin, sc._TRIPLE_PERM)
    w9p = pad_w9(w9.reshape(9, 3 * cin, cout))
    tiles = cap // args.tile
    rb = jnp.asarray(rb27)

    f_tri = jax.jit(lambda f: sc.build_xtriples(f, winj.xprev_ok, winj.xnext_ok))
    feats3 = f_tri(feats)
    t_tri = timed(f_tri, feats)

    f_pal = jax.jit(lambda f3: windowed_matmul(
        f3, winj.starts.reshape(-1), winj.rb_local.T, w9p,
        window=args.window, tile=args.tile))
    t_pal = timed(f_pal, feats3)

    f_ein = jax.jit(lambda f3: sc._win_matmul(
        f3, winj.rb_local, winj.starts, w9, args.window))
    t_ein = timed(f_ein, feats3)

    f_res = jax.jit(lambda f: sc._res_apply(
        f, winj.res_pad, winj.res_ovf, winj.ovf_v, winj.ovf_count, w2d))
    t_res = timed(f_res, feats)

    f_full = jax.jit(lambda f, w: sc.subm_conv_apply(f, rb, w, win=winj))
    t_full = timed(f_full, feats, weight)

    dout = jnp.asarray(rng.standard_normal((cap, cout)).astype(np.float32),
                       dtype=jnp.bfloat16)
    f_dw = jax.jit(lambda f3, d: windowed_dw(
        f3, winj.starts.reshape(-1), winj.rb_local.T, d,
        window=args.window, tile=args.tile))
    t_dw = timed(f_dw, feats3, dout)

    for k, v in [("build_xtriples", t_tri), ("pallas windowed_matmul", t_pal),
                 ("einsum _win_matmul", t_ein), ("_res_apply", t_res),
                 ("pallas windowed_dw", t_dw),
                 ("full windowed fwd", t_full)]:
        print(f"{k:26s} {v*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
