"""Profile host-side plan building per stage (no TPU needed).

Breaks one bench-scale batch's host pipeline into voxelize / per-level
subm plan / per-level downsample+wg stages and prints ms per stage, so
the collate-side cost (which bounds end-to-end throughput on few-core
hosts) can be attributed and attacked.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python -m benchmarks.profile_host_plan [--points 150000 --scenes 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import (build_plans_np, build_subm_rulebook_np,
                                     build_windowed_subm27,
                                     build_windowed_subm27_fused,
                                     build_windowed_gather,
                                     downsample_level_np, parent_rulebook,
                                     voxelize_np)
    from tdwss.ops.plan import level_capacities

    scenes = make_dataset(args.scenes, num_points=args.points, seed=7,
                          with_text=False)
    pts, bidx, feats = [], [], []
    for i, s in enumerate(scenes):
        xyz = s.points * 50.0
        xyz = xyz - xyz.min(axis=0)
        pts.append(np.round(xyz).astype(np.int32))
        bidx.append(np.full((xyz.shape[0],), i, np.int32))
        feats.append(s.colors.astype(np.float32))
    coords = np.concatenate(
        [np.concatenate(pts), np.concatenate(bidx)[:, None]], axis=1)
    feats = np.concatenate(feats)
    valid = np.ones((coords.shape[0],), bool)
    n = coords.shape[0]
    caps = level_capacities(n, args.levels)

    def timed(label, fn, *a, reps=args.reps, **kw):
        out = fn(*a, **kw)                     # warm (sticky registries)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a, **kw)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label:44s} {dt:8.1f} ms")
        return out

    print(f"N={n} levels={args.levels} caps={list(caps)[:3]}...")

    grid, vf, p2v, order = timed(
        "voxelize L0 (native, mean, order)", voxelize_np,
        coords, feats, valid, int(caps[0]), mode="mean", return_order=True)

    t_all0 = time.perf_counter()
    g = grid
    for lvl in range(args.levels):
        v = g.coords.shape[0]
        t = 512
        while t > 32 and v % t:
            t //= 2
        sub = 128 if t % 128 == 0 else 0
        win = timed(f"L{lvl} fused w27 plan (V={v})",
                    build_windowed_subm27_fused, g, tile=t, window=640,
                    nwin=9, sub=sub, subwin=256 if sub else 0)
        if win is None:
            rb = timed(f"L{lvl} subm rulebook", build_subm_rulebook_np, g, 3)
            timed(f"L{lvl} w27 two-pass", build_windowed_subm27, rb, g,
                  tile=t, window=640, nwin=9, sub=sub,
                  subwin=256 if sub else 0)
        if lvl + 1 < args.levels:
            cg, parent, child_offset, down_rb = timed(
                f"L{lvl} downsample", downsample_level_np, g,
                int(caps[lvl + 1]), 2, 2)
            vf_, vc = g.coords.shape[0], down_rb.shape[0]
            timed(f"L{lvl} wg_down", build_windowed_gather, down_rb,
                  v_src=vf_, tile=256, group_mod=2,
                  sticky_key=(vc, vf_, 2, 2, "dn"), sub=128, subwin=256)
            rb_up = timed(f"L{lvl} parent_rulebook", parent_rulebook,
                          parent, child_offset, vc, 8)
            timed(f"L{lvl} wg_up", build_windowed_gather, rb_up,
                  v_src=vc, tile=512, sticky_key=(vf_, vc, 2, "up"),
                  sub=128, subwin=256)
            g = cg
    print(f"(sum of stages above x reps not comparable; end-to-end below)")

    t0 = time.perf_counter()
    for _ in range(args.reps):
        build_plans_np(grid, args.levels, caps, fused=True)
    print(f"  build_plans_np fused end-to-end {((time.perf_counter()-t0)/args.reps)*1e3:10.1f} ms")


if __name__ == "__main__":
    main()
