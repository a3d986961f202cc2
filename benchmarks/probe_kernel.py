"""Correctness + perf check of the fused Pallas windowed conv kernel.

Compares tdwss.ops.pallas_subm.windowed_matmul / windowed_dw against the
XLA einsum path (tdwss.ops.sparse_conv._win_matmul / _win_dw) on real
windowed metadata from the synthetic L1 grid.

Run: python -m benchmarks.probe_kernel [--cin 32 --cout 32 --tile 256 --window 384]
"""

from __future__ import annotations

import argparse

import numpy as np

from benchmarks.micro_subm import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--window", type=int, default=384)
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import build_subm_rulebook_np, \
        build_windowed_subm, voxelize_np
    from tdwss.ops.pallas_subm import pad_w9, windowed_dw, windowed_matmul
    from tdwss.ops.sparse_conv import _TRIPLE_PERM, _permute_taps, \
        _win_dw, _win_matmul, build_xtriples

    if args.small:
        args.scenes, args.points = 1, 20_000

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
    grid_probe, _, _ = voxelize_np(coords, None, valid, coords.shape[0])
    nvox = int(grid_probe.num_valid)
    cap = ((nvox + args.tile - 1) // args.tile) * args.tile
    grid, _, _ = voxelize_np(coords, None, valid, cap)
    rb27 = build_subm_rulebook_np(grid, 3)
    win = build_windowed_subm(rb27, grid, tile=args.tile, window=args.window)
    assert win is not None
    print(f"V={nvox} cap={cap} tile={args.tile} window={args.window} "
          f"platform={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    dtype = jnp.float32 if args.interpret else jnp.bfloat16
    feats = jnp.asarray(rng.standard_normal((cap, args.cin)), dtype)
    weight = jnp.asarray(
        rng.standard_normal((27, args.cin, args.cout)) * 0.05, dtype)
    dout = jnp.asarray(rng.standard_normal((cap, args.cout)), dtype)

    w2d = weight.reshape(27 * args.cin, args.cout)
    w9 = _permute_taps(w2d, args.cin, _TRIPLE_PERM).reshape(
        9, 3 * args.cin, args.cout)
    w9p = pad_w9(w9)

    feats3 = build_xtriples(feats, jnp.asarray(win.xprev_ok),
                            jnp.asarray(win.xnext_ok))
    starts_flat = jnp.asarray(win.starts.reshape(-1))
    rb_t = jnp.asarray(np.ascontiguousarray(win.rb_local.T))

    # ---- forward
    ref = _win_matmul(feats3, jnp.asarray(win.rb_local),
                      jnp.asarray(win.starts), w9.reshape(-1, args.cout),
                      win.window)
    out = windowed_matmul(feats3, starts_flat, rb_t, w9p,
                          window=win.window, tile=args.tile,
                          interpret=args.interpret)
    err = float(jnp.max(jnp.abs(out - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"fwd rel-err vs einsum: {err:.3e}")

    # ---- dW
    ref_dw = _win_dw(feats3, jnp.asarray(win.rb_local),
                     jnp.asarray(win.starts), dout, win.window)
    dw = windowed_dw(feats3, starts_flat, rb_t, dout,
                     window=win.window, tile=args.tile,
                     interpret=args.interpret)
    dw_flat = dw[:, :3 * args.cin, :].reshape(9 * 3 * args.cin, args.cout)
    errw = float(jnp.max(jnp.abs(dw_flat - ref_dw)) /
                 (jnp.max(jnp.abs(ref_dw)) + 1e-9))
    print(f"dW  rel-err vs einsum: {errw:.3e}")

    if args.interpret:
        return

    t_ref = timed(lambda: _win_matmul(
        feats3, jnp.asarray(win.rb_local), jnp.asarray(win.starts),
        w9.reshape(-1, args.cout), win.window))
    t_ker = timed(lambda: windowed_matmul(
        feats3, starts_flat, rb_t, w9p, window=win.window, tile=args.tile))
    t_refw = timed(lambda: _win_dw(
        feats3, jnp.asarray(win.rb_local), jnp.asarray(win.starts), dout,
        win.window))
    t_kerw = timed(lambda: windowed_dw(
        feats3, starts_flat, rb_t, dout, window=win.window, tile=args.tile))
    print(f"fwd: einsum {t_ref*1e3:8.2f} ms   pallas {t_ker*1e3:8.2f} ms "
          f"({t_ref/t_ker:5.1f}x)")
    print(f"dW : einsum {t_refw*1e3:8.2f} ms   pallas {t_kerw*1e3:8.2f} ms "
          f"({t_refw/t_kerw:5.1f}x)")


if __name__ == "__main__":
    main()
