"""DP step-dilation accounting on a virtual 8-device CPU mesh.

One chip is reachable from this environment, so the v5e-8 number in
BENCH_r*.json is a projection (bench.py `projected_v5e8_mpts`,
derivation in docs/DESIGN.md "v5e-8 projection").  This script measures
the one component of that projection that a virtual mesh CAN check: the
*relative* overhead the DP program structure adds over the single-device
step at EQUAL per-device batch — batch stacking, shard_map plumbing, and
the gradient/sync-BN all-reduces (on CPU these are memcpy-grade, so the
measured dilation is an upper bound on program-structure overhead, not an
ICI model — the ICI term is analytic in bench.py).

CPU wall-times do not transfer to TPU; only the ratio is informative.

Run:  python -m benchmarks.dp_dilation          (re-execs with the axon
plugin scrubbed and an 8-device CPU mesh; shrunk shapes — the production
step does not compile in reasonable time on 1 CPU core)

Output: one JSON line {"single_ms", "dp_per_device_ms", "dilation"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("PALLAS_AXON_POOL_IPS") or "cpu" not in os.environ.get(
        "JAX_PLATFORMS", ""):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PALLAS_AXON_REMOTE_COMPILE"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    env["XLA_FLAGS"] = flags
    os.execvpe(sys.executable, [sys.executable, "-m",
                                "benchmarks.dp_dilation"] + sys.argv[1:], env)

N_DEV = 8


def main() -> None:
    import jax
    import numpy as np

    from tdwss.config import (Config, EngineConfig, LossConfig, MeshConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans, slim_batch_for_train
    from tdwss.data.synthetic import make_dataset
    from tdwss.engine.steps import init_state, make_optimizer, make_train_step
    from tdwss.models import build_model
    from tdwss.ops.host_plan import reset_sticky_plans
    from tdwss.parallel.dp import (_harmonize_residual_caps, make_dp_train_step,
                                   make_mesh, shard_batch, stack_batches)

    assert jax.device_count() == N_DEV, jax.devices()

    cfg = Config(
        training_name="dp_dilation", model_name="MultiLabel",
        label="scene_level", has_text=False,
        mesh=MeshConfig(data=N_DEV),
        pointcloud_data=PointcloudDataConfig(scale=10, batch_size=2),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=8, full_scale=256, block_reps=1,
            residual_blocks=True),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=16384, min_level_capacity=512,
                            compute_dtype="bfloat16"),
    )
    reset_sticky_plans()
    rng = np.random.default_rng(0)
    scenes = make_dataset(2 * N_DEV, num_points=6000, seed=7,
                          with_text=False)

    def one_batch(i):
        b = train_collate(scenes[2 * i: 2 * i + 2], cfg, rng)
        b = attach_host_plans(b, cfg)
        return slim_batch_for_train(b, cfg)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)

    # single-device reference step on device 0
    b0 = jax.tree_util.tree_map(jax.numpy.asarray, one_batch(0))
    state = init_state(cfg, model, tx, b0)
    step1 = jax.jit(make_train_step(cfg, model, tx))

    def timed(fn, *args, reps=8):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    single_s = timed(lambda s, b: step1(s, b)[1]["loss"], state, b0)

    # DP step: same per-device batch shapes over the 8-device mesh
    mesh = make_mesh(N_DEV)
    batches = _harmonize_residual_caps([one_batch(i) for i in range(N_DEV)])
    stacked = shard_batch(stack_batches(batches), mesh)
    dp_state = init_state(cfg, model, tx, batches[0])
    dp_step = make_dp_train_step(cfg, model, tx, mesh)
    dp_s = timed(lambda s, b: dp_step(s, b)[1]["loss"], dp_state, stacked)

    # 8 virtual devices share this host's cores: per-device time is the
    # wall divided by min(cores, N_DEV) devices actually running in
    # parallel — report the raw wall too so the ratio's floor is visible.
    cores = os.cpu_count() or 1
    par = min(cores, N_DEV)
    dp_per_dev = dp_s * par / N_DEV if cores < N_DEV else dp_s
    record = {
        "single_ms": round(1e3 * single_s, 1),
        "dp_wall_ms": round(1e3 * dp_s, 1),
        "host_cores": cores,
        "dp_per_device_ms": round(1e3 * dp_per_dev, 1),
        "dilation": round(dp_per_dev / single_s, 3),
        "measured_at": time.strftime("%Y-%m-%d %H:%M"),
    }
    print(json.dumps(record))
    # Cached artifact: bench.py folds this into BENCH_r*.json when its
    # budget cannot afford a live re-measure (a full run takes ~10+ min
    # on this 1-core VM — the CPU compile of the DP step dominates).
    with open(os.path.join(os.path.dirname(__file__),
                           "dp_dilation_result.json"), "w") as f:
        json.dump(record, f)


if __name__ == "__main__":
    main()
