"""Per-level cost table for the bench-config UNet: subm conv + transitions.

Builds the exact bench batch + host plans, then times, per level:
  - subm conv fwd and fwd+bwd (p -> p channels) under the default routing
    and with TDWSS_PALLAS_MIN_V forced low (Pallas everywhere it fits);
  - the windowed cross-level ops (wg strided conv and unpool).

Run (real TPU): python -m benchmarks.probe_levels [--min-v N]
"""

from __future__ import annotations

import argparse
import os
import time


import numpy as np


from benchmarks._timing import timed  # noqa: E402 — honest sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-v", type=int, default=None,
                    help="override TDWSS_PALLAS_MIN_V before importing")
    ap.add_argument("--levels", type=str, default="",
                    help="comma list of level indices (default all)")
    ap.add_argument("--no-bwd", action="store_true")
    ap.add_argument("--plain", action="store_true",
                    help="time the plain gather-GEMM path instead")
    args = ap.parse_args()
    if args.min_v is not None:
        os.environ["TDWSS_PALLAS_MIN_V"] = str(args.min_v)

    import jax
    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()

    import bench
    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans
    from tdwss.data.synthetic import make_dataset
    from tdwss.ops import sparse_conv as sc

    cfg = Config(
        training_name="probe",
        model_name="MultiLabel",
        label="scene_level",
        has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=50,
                                             batch_size=bench.NUM_SCENES),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=32, full_scale=4096, block_reps=2,
            residual_blocks=True,
        ),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(
            max_points=bench.MAX_POINTS,
            level_capacity_schedule=[2, 3, 4, 4, 4, 4],
            min_level_capacity=4096,
            compute_dtype="bfloat16",
        ),
    )
    rng = np.random.default_rng(0)
    scenes = make_dataset(bench.NUM_SCENES,
                          num_points=bench.POINTS_PER_SCENE, seed=7,
                          with_text=False)
    # --plain times the raw gather-GEMM on the global rulebook, which the
    # production slimming strips — keep the full plan for that mode
    batch = attach_host_plans(train_collate(scenes, cfg, rng), cfg,
                              slim=not args.plain)
    plans = jax.tree_util.tree_map(jnp.asarray, batch.plans)

    frng = np.random.default_rng(1)
    m = 32
    sel = ([int(x) for x in args.levels.split(",")] if args.levels
           else range(len(plans.levels)))
    from tdwss.ops.sparse_conv import _PALLAS_MIN_V

    print(f"min_v={_PALLAS_MIN_V}")
    for li in sel:
        lvl = plans.levels[li]
        v = lvl.grid.capacity
        c = m * (li + 1)
        feats = jnp.asarray(
            frng.standard_normal((v, c)).astype(np.float32),
            dtype=jnp.bfloat16)
        w = jnp.asarray(
            (frng.standard_normal((27, c, c)) * 0.05).astype(np.float32),
            dtype=jnp.bfloat16)

        use_win = lvl.win if not args.plain else None

        def fwd(f, wt):
            return sc.subm_conv_apply(f, lvl.subm_rb, wt, win=use_win)

        def fwdbwd(f, wt):
            def loss(f_, w_):
                return jnp.sum(sc.subm_conv_apply(
                    f_, lvl.subm_rb, w_, win=use_win).astype(jnp.float32))
            _, grads = jax.value_and_grad(loss, argnums=(0, 1))(f, wt)
            return grads

        jf = jax.jit(fwd)
        t_f = timed(jf, feats, w) * 1e3
        line = (f"L{li} V={int(np.asarray(lvl.grid.num_valid))}/{v} C={c} "
                f"win={'None' if lvl.win is None else type(lvl.win).__name__}"
                f" fwd={t_f:6.2f} ms")
        if not args.no_bwd:
            jb = jax.jit(fwdbwd)
            t_b = timed(jb, feats, w) * 1e3
            line += f"  fwd+bwd={t_b:6.2f} ms"
        print(line, flush=True)

        if lvl.wg_down is not None and lvl.down_rb is not None:
            vc = plans.levels[li + 1].grid.capacity
            cout = m * (li + 2)
            w2 = jnp.asarray(
                (frng.standard_normal((8, c, cout)) * 0.05).astype(np.float32),
                dtype=jnp.bfloat16)

            def wgf(f, wt):
                return sc.wg_conv_apply(f, wt, lvl.wg_down, lvl.wg_up)

            def wgb(f, wt):
                def loss(f_, w_):
                    return jnp.sum(sc.wg_conv_apply(
                        f_, w_, lvl.wg_down, lvl.wg_up).astype(jnp.float32))
                _, g = jax.value_and_grad(loss, argnums=(0, 1))(f, wt)
                return g

            t_wf = timed(jax.jit(wgf), feats, w2) * 1e3
            line = f"    wg strided {c}->{cout} fwd={t_wf:6.2f} ms"
            if not args.no_bwd:
                t_wb = timed(jax.jit(wgb), feats, w2) * 1e3
                line += f"  fwd+bwd={t_wb:6.2f} ms"
            print(line, flush=True)


if __name__ == "__main__":
    main()
