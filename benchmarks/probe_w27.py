"""Ablate the 27-tap fused kernel: DMA vs Z-GEMMs vs one-hot GEMMs.

Run: python -m benchmarks.probe_w27 [--tile 512] [--window 640]
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
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--window", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import build_subm_rulebook_np, \
        build_windowed_subm27, voxelize_np
    from tdwss.ops import sparse_conv as sc
    from tdwss.ops.pallas_subm import pad_w9, windowed_matmul

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
    win = build_windowed_subm27(rb27, grid, tile=args.tile,
                                window=args.window)
    winj = jax.tree_util.tree_map(jnp.asarray, win)
    n_ovf = int((np.asarray(win.res_ovf[:, 0]) < cap).sum())
    print(f"V={int(gp.num_valid)} cap={cap} tile={args.tile} "
          f"window={args.window} ovf={n_ovf}")

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((cap, args.cin)).astype(np.float32),
                        dtype=jnp.bfloat16)
    weight = jnp.asarray(
        (rng.standard_normal((27, args.cin, args.cout)) * 0.05)
        .astype(np.float32), dtype=jnp.bfloat16)
    w2d = weight.reshape(27 * args.cin, args.cout)
    w27p = pad_w9(w2d.reshape(27, args.cin, args.cout))
    starts = winj.starts.reshape(-1)
    rbt = winj.rb_local.T

    for mode in ("", "dma", "compute", "z"):
        fn = jax.jit(lambda f, m=mode: windowed_matmul(
            f, starts, rbt, w27p, window=args.window, tile=args.tile,
            ablate=m))
        dt = timed(fn, feats)
        print(f"ablate={mode or 'full':8s} {dt*1e3:8.2f} ms")

    f_res = jax.jit(lambda f: sc._res_ovf_apply(
        f, winj.res_ovf, winj.ovf_v, winj.ovf_count, w2d, args.cout))
    print(f"res_ovf_apply    {timed(f_res, feats)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
