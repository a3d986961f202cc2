"""Throughput benchmark: sparse-UNet fwd+bwd Mpoints/sec on one TPU chip.

Config matches the reference README's 16-GB-GPU capacity anchor
(m=32, block_reps=2, residual_blocks=True, scale=50 / 2cm voxels,
batch_size=5 — reference README.md:13-21): one full jitted training step
(forward + backward + Adam) of the SparseConvUNet MultiLabel model on a
synthetic 5-scene ScanNet-sized batch.

Baseline: the reference publishes no throughput number (BASELINE.md).  The
denominator used for ``vs_baseline`` is a documented 2.0 Mpoints/s estimate
for GPU SparseConvNet fwd+bwd on this config (16 GB-class GPU; ~1M-point
batch in ~0.5 s).  BASELINE.json's target is >=5x GPU-SCN on a v5e-8, i.e.
``vs_baseline >= 5`` with 8-chip data parallelism.

Round-1 progression on one v5e chip: naive in-graph plan building never
finished compiling; host-built rulebooks + scatter-free
transposed-rulebook VJPs 0.063 Mpts/s; windowed-MXU x-triple engine
0.077-0.086; 27-tap windowed Pallas engine + windowed cross-level
transitions 0.46; two-level sub-window kernels + z-parity
grouped transition windows 0.602.
Round 2: sub-windows on the cross-level gathers (L0 strided 31.6 ->
12.8 ms fwd), fused dfeats+dW backward kernel, Pallas routing down to
8k-voxel levels, scatter-free two-tier residual spills, native C++
plan builder (host 9.6 -> ~1.3 s/batch) -> 0.678; then the packed-row
kernel layout (C<=64 sources as (V/p, 128) rows: full 128-lane DMA/MXU
use, subm fwd 22.5 -> 13.9 ms at L0), tap-chunked heavy-spill
contributions, MXU BatchNorm stats, bf16 branch accumulation, and
VJP-saved heavy gathers -> **0.828** (device step ~906 ms).  Remaining
levers (docs/DESIGN.md): the per-(sub-tile, anchor) dot chain in the
now compute-bound kernels, the ~100 ms of latency-bound spill-row
gathers, and 8-chip data parallelism.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpoints/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

# Persistent executable cache: the axon remote-compile relay costs ~20-40s
# per XLA compile; the full train step plus per-level Pallas kernels can
# exceed a 10-minute budget cold.  Cached, a re-run starts in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

GPU_SCN_BASELINE_MPTS = 2.0  # documented estimate, see module docstring

NUM_SCENES = 5
POINTS_PER_SCENE = 150_000
MAX_POINTS = 786_432  # static capacity (> 5 * 150k)
STEPS = 20
WARMUP = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdwss.config import (
        Config,
        EngineConfig,
        LossConfig,
        PointcloudDataConfig,
        PointcloudModelConfig,
    )
    from tdwss.data.collate import train_collate
    from tdwss.data.synthetic import make_dataset
    from tdwss.engine.steps import init_state, make_optimizer, make_train_step

    cfg = Config(
        training_name="bench",
        model_name="MultiLabel",
        label="scene_level",
        has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=50, batch_size=NUM_SCENES),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=32, full_scale=4096, block_reps=2,
            residual_blocks=True,
        ),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(
            max_points=MAX_POINTS,
            # measured voxel decay on 2cm ScanNet-like scenes is ~2x for the
            # first transition then ~3.5x — the schedule keeps padded
            # capacity within ~25% of the data at every level
            level_capacity_schedule=[2, 3, 4, 4, 4, 4],
            min_level_capacity=4096,
            compute_dtype="bfloat16",
        ),
    )

    rng = np.random.default_rng(0)
    scenes = make_dataset(NUM_SCENES, num_points=POINTS_PER_SCENE, seed=7,
                          with_text=False)
    # Converge sticky plan shapes over the e2e epochs' batch compositions
    # BEFORE any plan that feeds jit: every later window/cap ratchet
    # re-specializes the step (~15 min/compile via the relay).  With the
    # registry at its ceiling the timed loop and the e2e epochs share ONE
    # executable.
    import sys

    from tdwss.data.loader import warm_plan_shapes

    e2e_scenes = make_dataset(3 * NUM_SCENES, num_points=POINTS_PER_SCENE,
                              seed=11, with_text=False)
    t0 = time.perf_counter()
    warm_plan_shapes(e2e_scenes, cfg, epochs=(1, 2))
    print(f"shape prewarm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    batch = train_collate(scenes, cfg, rng)
    from tdwss.data.plans import attach_host_plans, slim_batch_for_train

    # Rulebooks are built on host (tdwss.ops.host_plan): the jitted step is
    # pure gather-GEMM-scatter with no device sorts.  Throughput below is
    # device-step-only; the host plan build overlaps via the input pipeline
    # in real training (tdwss.data.loader prefetch).
    t0 = time.perf_counter()
    batch = attach_host_plans(batch, cfg)
    plan_s = time.perf_counter() - t0
    print(f"plan build: {plan_s:.2f}s/batch", file=sys.stderr)
    valid_points = int(np.asarray(batch.valid).sum())

    # Parity gate (VERDICT r02 #5): every bench run re-proves the compiled
    # Mosaic kernels bit-match the einsum twin ON HARDWARE before timing;
    # a layout regression fails the bench loudly instead of corrupting loss.
    if jax.default_backend() == "tpu":
        from benchmarks.kernel_parity import run_checks

        parity_failures = run_checks(
            jax.tree_util.tree_map(jnp.asarray, batch.plans))
        if parity_failures:
            raise SystemExit(f"kernel parity FAILED ({parity_failures})")
    # same slimming the e2e loader applies — one executable for both loops
    batch = slim_batch_for_train(batch, cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    from tdwss.models import build_model

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = init_state(cfg, model, tx, batch)
    train_step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

    # compile + warmup
    import sys

    # Sync by fetching a scalar: with donate_argnums XLA may alias ANY
    # output (params and aux alike) into the donated input buffers, and
    # under the axon relay block_until_ready on an aliased buffer returns
    # immediately (measured: 0.05s "steps" vs the true ~1.2s step; probes
    # 2026-08-17/18).  jax.device_get of the loss must round-trip real
    # bytes, so it cannot complete before the execution does.
    t0 = time.perf_counter()
    for i in range(WARMUP):
        state, aux = train_step(state, batch)
        jax.device_get(aux["loss"])
        print(f"warmup {i}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    start = time.perf_counter()
    for _ in range(STEPS):
        state, aux = train_step(state, batch)
    jax.device_get(aux["loss"])
    elapsed = time.perf_counter() - start
    mpts = valid_points * STEPS / elapsed / 1e6

    # End-to-end: the real train_batches pipeline (augment + collate +
    # host plan building + prefetch overlap, cfg.engine.collate_workers
    # threads) feeding the same jitted step.  Sustained throughput counts
    # host time that the pipeline fails to hide; epoch 1 warms the sticky
    # plan-shape registry + compiles, epoch 2 is measured.  NOTE: this VM
    # exposes ONE core — real TPU hosts (~100 cores) overlap the ~1.3 s
    # plan build behind the step; the number below is the 1-core floor.
    from tdwss.data.loader import train_batches

    e2e_mpts = None
    try:
        from tdwss.data.collate import CollateStats

        for epoch in (1, 2):
            t0 = time.perf_counter()
            stats = CollateStats()
            nb = 0
            recent = []
            for b in train_batches(e2e_scenes, cfg, epoch=epoch, stats=stats,
                                   to_device=True):
                # point count comes from collate stats — touching b.valid
                # here would device_get 786k bools and sync every step;
                # the 4-deep sync caps in-flight device buffers on hosts
                # where collate outruns the device
                state, aux = train_step(state, b)
                recent.append(aux["loss"])
                if len(recent) > 4:
                    jax.device_get(recent.pop(0))
                nb += 1
            # fetch, don't block_until_ready: aliased buffers lie (above)
            jax.device_get(recent)
            pts = min(stats.total_points - stats.dropped_points,
                      nb * MAX_POINTS)
            e2e_mpts = pts / (time.perf_counter() - t0) / 1e6
            print(f"e2e epoch {epoch}: {nb} steps, {e2e_mpts:.3f} Mpts/s",
                  file=sys.stderr)
    except Exception as e:  # never lose the primary metric
        print(f"e2e measurement failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "sparse_unet_m32_train_throughput",
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / GPU_SCN_BASELINE_MPTS, 3),
        "device_only": round(mpts, 3),
        "end_to_end": round(e2e_mpts, 3) if e2e_mpts else None,
        "plan_s_per_batch": round(plan_s, 3),
        "workers": cfg.engine.collate_workers,
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
