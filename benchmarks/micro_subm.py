"""Micro-benchmark: single submanifold conv at L1 scale on the real TPU.

Measures the windowed-MXU path at several (tile, window) geometries against
the plain 27-tap gather path, forward and forward+backward, on a realistic
ScanNet-like level-1 coordinate set (the same synthetic scenes bench.py
uses).  Run on the real chip:

    python benchmarks/micro_subm.py [--cin 32] [--cout 32] [--fwd-only]

This is an engineering tool, not part of bench.py's one-line output.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


from benchmarks._timing import timed  # noqa: E402 — honest sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--geometries", type=str,
                    default="128:256,256:384,512:640,1024:1280",
                    help="comma list of tile:window[:nwin[:sub[:subwin]]]")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import build_subm_rulebook_np, \
        build_windowed_subm27, voxelize_np
    from tdwss.ops.sparse_conv import subm_conv_apply
    from tdwss.ops.voxelize import SparseGrid

    # Build a realistic L1 grid: synthetic scenes -> 2cm voxels.
    scenes = make_dataset(args.scenes, num_points=args.points, seed=7,
                          with_text=False)
    pts, bidx = [], []
    for i, s in enumerate(scenes):
        xyz = s.points * 50.0  # scale=50 => 2cm voxels
        xyz = xyz - xyz.min(axis=0)
        pts.append(np.round(xyz).astype(np.int32))
        bidx.append(np.full((xyz.shape[0],), i, np.int32))
    coords = np.concatenate(
        [np.concatenate(pts), np.concatenate(bidx)[:, None]], axis=1)
    valid = np.ones((coords.shape[0],), bool)

    # pick capacity: next multiple of 1024 above the exact voxel count
    grid_probe, _, _ = voxelize_np(coords, None, valid, coords.shape[0])
    nvox = int(grid_probe.num_valid)
    cap = ((nvox + 1023) // 1024) * 1024
    grid, _, _ = voxelize_np(coords, None, valid, cap)
    rb27 = build_subm_rulebook_np(grid, 3)
    print(f"V={nvox} cap={cap} Cin={args.cin} Cout={args.cout} "
          f"platform={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((cap, args.cin)).astype(np.float32),
        dtype=jnp.bfloat16)
    weight = jnp.asarray(
        (rng.standard_normal((27, args.cin, args.cout)) * 0.05)
        .astype(np.float32), dtype=jnp.bfloat16)
    rb = jnp.asarray(rb27)

    def fwd_plain(f, w):
        return subm_conv_apply(f, rb, w)

    def loss_plain(f, w):
        return jnp.sum(subm_conv_apply(f, rb, w).astype(jnp.float32) ** 2)

    results = {}
    if not args.skip_plain:
        plain_fwd = timed(jax.jit(fwd_plain), feats, weight)
        results["plain fwd"] = plain_fwd
        if not args.fwd_only:
            g = jax.jit(jax.grad(loss_plain, argnums=(0, 1)))
            results["plain fwd+bwd"] = timed(g, feats, weight)

    for geom in args.geometries.split(","):
        parts = [int(x) for x in geom.split(":")]
        t, w = parts[0], parts[1]
        w27_nwin = parts[2] if len(parts) > 2 else 9
        sub = parts[3] if len(parts) > 3 else 0
        subwin = parts[4] if len(parts) > 4 else 0
        if cap % t or cap < w + 2:
            print(f"tile={t} window={w}: skipped (cap {cap})")
            continue
        win = build_windowed_subm27(rb27, grid, tile=t, window=max(w, 0),
                                    auto_window=w <= 0, nwin=w27_nwin,
                                    sub=sub, subwin=subwin)
        if win is None:
            print(f"tile={t} window={w}: builder returned None")
            continue
        w = win.window
        winj = jax.tree_util.tree_map(jnp.asarray, win)
        n_ovf = int((np.asarray(win.res_ovf[:, 0]) < cap).sum())

        def fwd_win(f, wgt, wj=winj):
            return subm_conv_apply(f, rb, wgt, win=wj)

        def loss_win(f, wgt, wj=winj):
            return jnp.sum(
                subm_conv_apply(f, rb, wgt, win=wj).astype(jnp.float32) ** 2)

        key = (f"win t={t} w={w} n={w27_nwin} s={sub}/{subwin} "
               f"(ovf={n_ovf})")
        results[key + " fwd"] = timed(jax.jit(fwd_win), feats, weight)
        if not args.fwd_only:
            gw = jax.jit(jax.grad(loss_win, argnums=(0, 1)))
            results[key + " fwd+bwd"] = timed(gw, feats, weight)

    for k, v in results.items():
        print(f"{k:48s} {v * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
