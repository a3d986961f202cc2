"""Ablate the sub-window fwd kernel at bench L0 scale on the real chip.

Decomposes windowed_matmul_sub's time into DMA / +Z / +one-hot-build /
full (and the packed block-select) so kernel tuning targets the real
dominator.  Run: python -m benchmarks.probe_sub_ablate [--cin 32]
"""

from __future__ import annotations

import argparse
import os



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=0, help="0 = same as cin")
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--window", type=int, default=640)
    ap.add_argument("--nwin", type=int, default=9)
    ap.add_argument("--subwin", type=int, default=256)
    ap.add_argument("--sub", type=int, default=128)
    args = ap.parse_args()
    cout = args.cout or args.cin

    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()
    import numpy as np

    from benchmarks._timing import timed
    from tdwss.data.synthetic import make_dataset
    from tdwss.ops import host_plan as hp
    from tdwss.ops import pallas_subm as ps

    rng = np.random.default_rng(0)
    scenes = make_dataset(args.scenes, num_points=args.points, seed=0)
    pts = np.concatenate([s.points for s in scenes])
    bidx = np.concatenate([np.full(len(s.points), i, np.int32)
                           for i, s in enumerate(scenes)])
    scale = 50.0
    coords = np.floor(pts * scale).astype(np.int32)
    coords -= coords.min(axis=0)
    cap = 786432 // 8 * 8
    n = coords.shape[0]
    c4 = np.concatenate([coords, bidx[:, None]], axis=1)[:cap]
    valid = np.ones(min(n, cap), bool)
    if n < cap:
        c4 = np.concatenate(
            [c4, np.zeros((cap - n, 4), np.int32)], axis=0)
        valid = np.concatenate([valid, np.zeros(cap - n, bool)])
    res = hp.voxelize_np(c4, None, valid, cap)
    grid = res[0]
    print(f"V={int(np.asarray(grid.num_valid))} cap={grid.capacity}")

    rb = hp.build_subm_rulebook_np(grid, 3)
    win = hp.build_windowed_subm27(np.asarray(rb), grid, tile=args.tile,
                                   window=args.window, nwin=args.nwin, sub=args.sub,
                                   subwin=args.subwin)
    assert win is not None

    c = args.cin
    feats = jnp.asarray(
        rng.standard_normal((cap, c)).astype(np.float32)).astype(
            jnp.bfloat16)
    w9 = np.zeros((27, ps._lane_pad(c), cout), np.float32)
    w9[:, :c, :] = rng.standard_normal((27, c, cout)) * 0.1
    w9 = jnp.asarray(w9)
    starts = jnp.asarray(np.asarray(win.starts).reshape(-1))
    soff = jnp.asarray(np.asarray(win.sub_off).reshape(-1))
    rbl = jnp.asarray(np.asarray(win.rb_local).astype(np.int32).T)

    p = ps._pack_p(c, cout, cap, args.window, args.subwin)
    print(f"pack={p}")
    for mode in ("dma", "compute", "z", "ohbuild", "noselect", ""):
        if p == 1 and mode == "noselect":
            continue
        def run(f):
            return ps.windowed_matmul_sub(
                f, starts, soff, rbl, w9, window=args.window,
                tile=args.tile, sub=args.sub, subwin=args.subwin, ablate=mode)
        sec = timed(run, feats)
        print(f"  ablate={mode or 'full':9s} {sec * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
