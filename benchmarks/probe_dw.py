"""Time the dW kernels at bench L0 scale on the real chip.

The round-3 step profile attributes 238 ms (windowed_dw_sub x30) + 30 ms
(windowed_dw x20) of the ~916 ms device step to the dW direction — the
single largest kernel bucket.  This probe times windowed_dw_sub /
windowed_dw for a given channel config so scatter-layout changes can be
measured in isolation.  Run: python -m benchmarks.probe_dw [--cin 32]
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
    ap.add_argument("--flat", action="store_true",
                    help="also time the flat (non-sub) dw kernel")
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
        c4 = np.concatenate([c4, np.zeros((cap - n, 4), np.int32)], axis=0)
        valid = np.concatenate([valid, np.zeros(cap - n, bool)])
    res = hp.voxelize_np(c4, None, valid, cap)
    grid = res[0]
    print(f"V={int(np.asarray(grid.num_valid))} cap={grid.capacity}")

    rb = hp.build_subm_rulebook_np(grid, 3)
    win = hp.build_windowed_subm27(np.asarray(rb), grid, tile=args.tile,
                                   window=args.window, nwin=args.nwin,
                                   sub=128, subwin=args.subwin)
    assert win is not None

    c = args.cin
    feats = jnp.asarray(
        rng.standard_normal((cap, c)).astype(np.float32)).astype(
            jnp.bfloat16)
    dout = jnp.asarray(
        rng.standard_normal((cap, cout)).astype(np.float32)).astype(
            jnp.bfloat16)
    starts = jnp.asarray(np.asarray(win.starts).reshape(-1))
    soff = jnp.asarray(np.asarray(win.sub_off).reshape(-1))
    rbl = jnp.asarray(np.asarray(win.rb_local).astype(np.int32).T)

    p = ps._pack_p(c, cout, cap, args.window, args.subwin)
    print(f"pack={p}")

    def run_sub(d):
        return ps.windowed_dw_sub(
            feats, starts, soff, rbl, d, window=args.window,
            tile=args.tile, sub=128, subwin=args.subwin)

    sec = timed(run_sub, dout)
    print(f"  windowed_dw_sub {sec * 1e3:7.2f} ms")

    if args.flat:
        big = np.asarray(win.rb_local).astype(np.int64)
        soff_np = np.asarray(win.sub_off)
        nsub = args.tile // 128
        gmap = np.arange(27) % args.nwin
        bigoff = np.repeat(soff_np.reshape(-1, args.nwin), 128,
                           axis=0)[:, gmap]
        rb_big = np.where(big == args.subwin, args.window, big + bigoff)
        rbl_big = jnp.asarray(rb_big.astype(np.int32).T)

        def run_flat(d):
            return ps.windowed_dw(feats, starts, rbl_big, d,
                                  window=args.window, tile=args.tile)

        sec = timed(run_flat, dout)
        print(f"  windowed_dw     {sec * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
