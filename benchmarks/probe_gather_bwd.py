"""Time the symmetric gather-fused backward vs the unfused pair (L0/L1).

The round-4 profile put the separate dW kernel at ~228 ms of the 902 ms
step.  windowed_bwd_gather folds dW into the dfeats kernel via rulebook
flip-symmetry (one oh_t + one window DMA set for both products); this
probe measures it against the production route (fwd kernel on the
cotangent + windowed_dw_sub) at bench scale.

Run: python -m benchmarks.probe_gather_bwd [--cin 32]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--window", type=int, default=640)
    ap.add_argument("--nwin", type=int, default=9)
    ap.add_argument("--subwin", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()  # noqa: E702
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
    coords = np.floor(pts * 50.0).astype(np.int32)
    coords -= coords.min(axis=0)
    cap = 786432
    n = coords.shape[0]
    c4 = np.concatenate([coords, bidx[:, None]], axis=1)[:cap]
    valid = np.ones(min(n, cap), bool)
    if n < cap:
        c4 = np.concatenate([c4, np.zeros((cap - n, 4), np.int32)], axis=0)
        valid = np.concatenate([valid, np.zeros(cap - n, bool)])
    grid = hp.voxelize_np(c4, None, valid, cap)[0]
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
        rng.standard_normal((cap, c)).astype(np.float32)).astype(
            jnp.bfloat16)
    w = jnp.asarray(
        (rng.standard_normal((27, c, c)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    starts = jnp.asarray(np.asarray(win.starts).reshape(-1))
    soff = jnp.asarray(np.asarray(win.sub_off).reshape(-1))
    rbl = jnp.asarray(np.asarray(win.rb_local).astype(np.int32).T)
    print(f"pack={ps._pack_p(c, c, cap, args.window, args.subwin)}")

    wt9 = ps.pad_w9(w[::-1].transpose(0, 2, 1))
    wt2d9 = ps.pad_w9(
        w[::-1].transpose(0, 2, 1).reshape(27, c, c))

    def run_pair(d):
        dx = ps.windowed_matmul_sub(
            d, starts, soff, rbl, wt2d9, window=args.window,
            tile=args.tile, sub=128, subwin=args.subwin)
        dw = ps.windowed_dw_sub(
            feats, starts, soff, rbl, d, window=args.window,
            tile=args.tile, sub=128, subwin=args.subwin)
        return dx, dw

    def run_gather(d):
        return ps.windowed_bwd_gather(
            d, feats, starts, soff, rbl, wt9, window=args.window,
            tile=args.tile, sub=128, subwin=args.subwin, cout=c)

    sec = timed(run_pair, dout)
    print(f"  unfused pair (dfeats + dW)   {sec * 1e3:7.2f} ms")
    sec = timed(run_gather, dout)
    print(f"  windowed_bwd_gather (fused)  {sec * 1e3:7.2f} ms")

    # numerical cross-check at full scale (windowed part only, both forms)
    dxp, dwp = run_pair(dout)
    dxg, dwg = run_gather(dout)
    dxp = np.asarray(dxp, np.float32)
    dxg = np.asarray(dxg, np.float32)
    print(f"  dfeats rel-max-diff {np.abs(dxp - dxg).max() / max(np.abs(dxp).max(), 1e-6):.2e}")
    # NOTE: dW differs between forms by the windowed/spill partition flip
    # (the gather form covers flip(W)) — equality holds only after adding
    # the matching spill orientation, checked by the parity gate instead.
    dwp = np.asarray(dwp[:, :c, :], np.float32).reshape(-1)
    dwg = np.asarray(dwg, np.float32).reshape(-1)
    print(f"  dW rel-max-diff (partition-flip noise expected) "
          f"{np.abs(dwp - dwg).max() / max(np.abs(dwp).max(), 1e-6):.2e}")


if __name__ == "__main__":
    main()
