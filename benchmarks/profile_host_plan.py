"""Profile host-side plan building per stage (no TPU needed).

Uses bench.py's exact config/collate path, then re-runs each plan stage
(voxelize / per-level fused w27 / downsample / wg builders) standalone
with the encoder's real capacities, so the collate-side cost (which
bounds end-to-end throughput on few-core hosts) can be attributed.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python -m benchmarks.profile_host_plan [--reps 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import (attach_host_plans, encoder_plan_spec,
                                  slim_plans_for_device)
    from tdwss.data.synthetic import make_dataset
    from tdwss.ops.host_plan import (build_plans_np,
                                     build_windowed_subm27_fused,
                                     build_windowed_gather,
                                     downsample_level_np, level_geometry,
                                     parent_rulebook, voxelize_np)

    cfg = Config(
        training_name="bench", model_name="MultiLabel", label="scene_level",
        has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=50,
                                             batch_size=args.scenes),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=32, full_scale=4096, block_reps=2,
            residual_blocks=True),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=786_432,
                            level_capacity_schedule=[2, 3, 4, 4, 4, 4],
                            min_level_capacity=4096,
                            compute_dtype="bfloat16"),
    )
    scenes = make_dataset(args.scenes, num_points=args.points, seed=7,
                          with_text=False)
    rng = np.random.default_rng(0)
    batch = train_collate(scenes, cfg, rng)
    coords = np.asarray(batch.coords)
    feats = np.asarray(batch.feats)
    valid = np.asarray(batch.valid)
    num_levels, caps, downsample = encoder_plan_spec(cfg, coords.shape[0])
    f, s = downsample
    print(f"N={coords.shape[0]} levels={num_levels} caps={list(caps)}")

    def timed(label, fn, *a, reps=args.reps, **kw):
        out = fn(*a, **kw)                     # warm (sticky registries)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a, **kw)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label:44s} {dt:8.1f} ms")
        return out

    grid, vf, p2v, order = timed(
        "voxelize L0 (native, mean, order)", voxelize_np,
        coords, feats, valid, int(caps[0]), mode="mean", return_order=True)

    g = grid
    for lvl in range(num_levels):
        v = g.coords.shape[0]
        t, sub, subwin = level_geometry(v)
        win = timed(f"L{lvl} fused w27 plan (V={v}, t={t})",
                    build_windowed_subm27_fused, g, tile=t, window=640,
                    nwin=9, sub=sub, subwin=subwin)
        if win is None:
            print(f"    (L{lvl} fused planner returned None)")
        if lvl + 1 < num_levels:
            cg, parent, child_offset, down_rb = timed(
                f"L{lvl} downsample", downsample_level_np, g,
                int(caps[lvl + 1]), f, s)
            vf_, vc = g.coords.shape[0], down_rb.shape[0]
            timed(f"L{lvl} wg_down", build_windowed_gather, down_rb,
                  v_src=vf_, tile=256, group_mod=s,
                  sticky_key=(vc, vf_, f, s, "dn"), sub=128, subwin=256)
            rb_up = timed(f"L{lvl} parent_rulebook", parent_rulebook,
                          parent, child_offset, vc, f ** 3)
            timed(f"L{lvl} wg_up", build_windowed_gather, rb_up,
                  v_src=vc, tile=512, sticky_key=(vf_, vc, f, "up"),
                  sub=128, subwin=256)
            g = cg

    t0 = time.perf_counter()
    for _ in range(args.reps):
        plans = build_plans_np(grid, num_levels, caps, downsample,
                               fused=True)
    print(f"  build_plans_np fused end-to-end   "
          f"{((time.perf_counter() - t0) / args.reps) * 1e3:8.1f} ms")

    t0 = time.perf_counter()
    for _ in range(args.reps):
        slim_plans_for_device(plans)
    print(f"  slim_plans_for_device             "
          f"{((time.perf_counter() - t0) / args.reps) * 1e3:8.1f} ms")

    b2 = batch.replace(plans=None)
    t0 = time.perf_counter()
    attach_host_plans(b2, cfg)
    print(f"  attach_host_plans (full, 1 rep)   "
          f"{(time.perf_counter() - t0) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
