"""Isolate the residual-spill path cost and compare formulations.

Times, at L0 production scale (V=786k cap, C=Cout=32, E spills):
  - _res_ovf_apply (current: (E, 27C) one-hot-masked operand + prefix)
  - a mask-accumulate variant (27 masked (E,C)@(C,cout) GEMMs, no 27C
    operand materialization)
  - _res_ovf_dw current

Run (real TPU): python -m benchmarks.probe_residual [--entries 86016]
"""

from __future__ import annotations

import argparse
import os
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=786_432)
    ap.add_argument("--entries", type=int, default=86_016)
    ap.add_argument("--cap", type=int, default=102_400)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()

    from tdwss.ops import sparse_conv as sc

    rng = np.random.default_rng(0)
    v, e, cap, c, cout = args.v, args.entries, args.cap, args.c, args.cout
    feats = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32),
                        dtype=jnp.bfloat16)
    w2d = jnp.asarray(
        (rng.standard_normal((27 * c, cout)) * 0.05).astype(np.float32),
        dtype=jnp.bfloat16)
    # spills: ~1 per owner, v-sorted
    owners = np.sort(rng.choice(v, size=e, replace=False)).astype(np.int32)
    taps = rng.integers(0, 27, e).astype(np.int32)
    srcs = rng.integers(0, v, e).astype(np.int32)
    res_ovf = np.full((cap, 3), v, np.int32)
    res_ovf[:e] = np.stack([owners, taps, srcs], 1)
    heavy, counts = np.unique(res_ovf[:e, 0], return_counts=True)
    h_cap = ((heavy.shape[0] + 511) // 512) * 512
    ovf_v = np.full((h_cap,), v, np.int32)
    ovf_count = np.zeros((h_cap,), np.int32)
    ovf_v[: heavy.shape[0]] = heavy
    ovf_count[: heavy.shape[0]] = counts
    res_ovf = jnp.asarray(res_ovf)
    ovf_v = jnp.asarray(ovf_v)
    ovf_count = jnp.asarray(ovf_count)
    dout = jnp.asarray(rng.standard_normal((v, cout)).astype(np.float32),
                       dtype=jnp.bfloat16)

    cur = jax.jit(lambda f, w: sc._res_ovf_apply(f, res_ovf, ovf_v,
                                                 ovf_count, w, cout))
    t = timed(cur, feats, w2d) * 1e3
    print(f"_res_ovf_apply  (E={e} cap={cap}): {t:6.2f} ms", flush=True)

    cur_dw = jax.jit(lambda f, d: sc._res_ovf_dw(f, res_ovf, d))
    t = timed(cur_dw, feats, dout) * 1e3
    print(f"_res_ovf_dw     (E={e} cap={cap}): {t:6.2f} ms", flush=True)

    def alt_apply(f, w):
        """mask-accumulate: no (E, 27C) operand."""
        taps_ = res_ovf[:, 1]
        srcs_ = res_ovf[:, 2]
        fe = jnp.take(f, sc._oob(srcs_, v), axis=0, mode="fill",
                      fill_value=0)                       # (cap, C)
        w3 = w.reshape(27, c, cout)
        c2 = jnp.zeros((cap, cout), jnp.float32)
        for k in range(27):
            m = (taps_ == k).astype(f.dtype)[:, None]
            c2 = c2 + jnp.dot(fe * m, w3[k],
                              preferred_element_type=jnp.float32)
        prefix = sc._prefix_rows(c2)
        ends = jnp.cumsum(ovf_count)
        sums = (jnp.take(prefix, ends, axis=0)
                - jnp.take(prefix, ends - ovf_count, axis=0))
        out = jnp.zeros((v, cout), jnp.float32)
        return out.at[sc._oob(ovf_v, v)].add(sums, mode="drop")

    talt = timed(jax.jit(alt_apply), feats, w2d) * 1e3
    print(f"alt mask-accum  (E={e} cap={cap}): {talt:6.2f} ms", flush=True)

    # correctness
    a = np.asarray(cur(feats, w2d))
    b = np.asarray(jax.jit(alt_apply)(feats, w2d))
    print("apply max|diff|:", np.abs(a - b).max(), flush=True)

    def alt_gather_w(f, w):
        """per-entry weight-row gather: z = f[src] ; W rows by tap.

        out[i] = f[src_i] @ W[tap_i]: gather W[tap_i] (27 rows only —
        tiny) as (cap, C, cout)?  Too big.  Instead one-hot on taps at
        cout width: sel (cap, 27) @ (27, C*cout) -> per-entry flat weight
        — cap x C x cout bf16 = huge.  Skipped.
        """
        return None

    # sensitivity: how does cost scale with the padded cap?
    for cap2 in (4096, 32768):
        ro = np.full((cap2, 3), v, np.int32)
        keep = min(e, cap2 - 1)
        ro[:keep] = np.stack([owners[:keep], taps[:keep], srcs[:keep]], 1)
        roj = jnp.asarray(ro)
        f2 = jax.jit(lambda f, w: sc._res_ovf_apply(f, roj, ovf_v,
                                                    ovf_count, w, cout))
        t2 = timed(f2, feats, w2d) * 1e3
        print(f"_res_ovf_apply  (E={keep} cap={cap2}): {t2:6.2f} ms",
              flush=True)


if __name__ == "__main__" and "--tiered" not in __import__("sys").argv:
    main()


def main_tiered() -> None:
    """Time the two-tier (res_tile + heavy-scan) path on REAL L0/L1 spills."""
    import jax
    import jax.numpy as jnp

    import bench
    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans
    from tdwss.data.synthetic import make_dataset
    from tdwss.ops import sparse_conv as sc

    cfg = Config(
        training_name="p", model_name="MultiLabel", label="scene_level",
        pointcloud_data=PointcloudDataConfig(scale=50, batch_size=5),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=32, full_scale=4096, block_reps=2,
            residual_blocks=True),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=bench.MAX_POINTS,
                            level_capacity_schedule=[2, 3, 4, 4, 4, 4],
                            min_level_capacity=4096,
                            compute_dtype="bfloat16"))
    scenes = make_dataset(5, num_points=150_000, seed=7, with_text=False)
    batch = attach_host_plans(train_collate(scenes, cfg,
                                            np.random.default_rng(0)), cfg)
    rng = np.random.default_rng(1)
    for li in (0, 1):
        lvl = batch.plans.levels[li]
        win = jax.tree_util.tree_map(jnp.asarray, lvl.win)
        v = lvl.grid.capacity
        c = 32 * (li + 1)
        feats = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32),
                            dtype=jnp.bfloat16)
        w2d = jnp.asarray(
            (rng.standard_normal((27 * c, c)) * 0.05).astype(np.float32),
            dtype=jnp.bfloat16)
        dout = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32),
                           dtype=jnp.bfloat16)
        rtile = sc._pack_rtile(win)
        nt = int((np.asarray(win.res_ovf)[:, 0] < v).sum())
        nh = int((np.asarray(win.res_hent)[:, 0] < v).sum())
        f_apply = jax.jit(lambda f, w: sc._res_all_apply(
            f, rtile, win.res_ovf, win.ovf_v, win.ovf_count, w, c))
        t = timed(f_apply, feats, w2d) * 1e3
        f_dw = jax.jit(lambda f, d: sc._res_all_dw(
            f, rtile, win.res_ovf, d))
        t2 = timed(f_dw, feats, dout) * 1e3
        print(f"L{li} tiered: ovf={nt} heavy={nh} "
              f"apply={t:6.2f} ms  dw={t2:6.2f} ms", flush=True)
        # per-tier ablation: where does the apply cost live?
        f_ovf = jax.jit(lambda f, w: sc._res_ovf_apply(
            f, win.res_ovf, win.ovf_v, win.ovf_count, w, c))
        ta = timed(f_ovf, feats, w2d) * 1e3
        tb = 0.0
        if rtile[0].shape[0] and rtile[0].shape[1]:
            f_tile = jax.jit(lambda f, w: sc._res_tile_apply(
                f, rtile[0], w, c, v))
            tb = timed(f_tile, feats, w2d) * 1e3
        tc = 0.0
        if rtile[1].shape[0]:
            f_hvy = jax.jit(lambda f, w: sc._res_heavy_apply(
                f, rtile[1], rtile[2], w, c, v, v // sc._RES_TILE))
            tc = timed(f_hvy, feats, w2d) * 1e3
        no = int(np.asarray(win.res_ovf).shape[0])
        print(f"   tiers: ovf[{no}]={ta:6.2f}  tile[{rtile[0].shape[0]}x"
              f"{rtile[0].shape[1]}]={tb:6.2f}  heavy[{rtile[1].shape[0]}]"
              f"={tc:6.2f} ms", flush=True)


if __name__ == "__main__" and "--tiered" in __import__("sys").argv:
    main_tiered()
