"""Trace one production bench train step and aggregate device op times.

Replicates bench.py's config exactly, warms up the jitted step (cached
executables load from .jax_cache), traces one step with jax.profiler, then
parses the perfetto trace to print a per-op-bucket cost table.

Run (real TPU, axon env untouched):
    python -m benchmarks.profile_step [--logdir /tmp/tdwss_prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time



def _bucket(name: str) -> str:
    """Collapse XLA/Mosaic op names into readable cost buckets."""
    n = name.lower()
    for key in ("windowed_bwd_gather", "windowed_matmul_sub",
                "windowed_dw_sub", "windowed_matmul", "windowed_dw"):
        if key in n:
            return key
    if "while" in n:
        return "while(einsum-fallback/chunks)"
    if "sort" in n:
        return "sort"
    if "cumsum" in n or "reduce-window" in n:
        return "cumsum/prefix"
    if "scatter" in n:
        return "scatter"
    if "gather" in n or "dynamic-slice" in n:
        return "gather/dyn-slice"
    if "fusion" in n:
        return "fusion"
    if "convolution" in n or "dot" in n:
        return "dot/conv"
    if "copy" in n or "bitcast" in n or "transpose" in n:
        return "copy/transpose"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def parse_trace(logdir: str, top: int = 28) -> None:
    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device track pids (exclude host threads)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname and "XLA Op" not in pname:
                dev_pids.add(e["pid"])
    # Duration events on device tracks whose thread is an op stream
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    agg = collections.defaultdict(lambda: [0.0, 0])
    raw = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[_bucket(name)][0] += dur
        agg[_bucket(name)][1] += 1
        raw[name][0] += dur
        raw[name][1] += 1
        total += dur
    print(f"\n== device op time by bucket (total {total:.0f} ms) ==")
    for k, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:36s} {ms:9.1f} ms  ({cnt} ops)")
    print(f"\n== top {top} individual ops ==")
    for k, (ms, cnt) in sorted(raw.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {ms:9.1f} ms  x{cnt:<4d} {k[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/tdwss_prof")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.logdir)
        return

    import jax
    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()
    import numpy as np

    import bench
    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans
    from tdwss.data.synthetic import make_dataset
    from tdwss.engine.steps import init_state, make_optimizer, make_train_step
    from tdwss.models import build_model

    cfg = Config(
        training_name="bench",
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
    # Mirror bench.py exactly (shape prewarm + slimming) so the jitted
    # step hits the SAME persistent-cache executable — a different jaxpr
    # means a cold ~15 min compile through the axon relay.
    from tdwss.data.loader import warm_plan_shapes
    from tdwss.data.plans import slim_batch_for_train

    e2e_scenes = make_dataset(6 * bench.NUM_SCENES,
                              num_points=bench.POINTS_PER_SCENE, seed=11,
                              with_text=False)
    warm_plan_shapes(e2e_scenes, cfg, epochs=(1, 2))
    batch = train_collate(scenes, cfg, rng)
    batch = attach_host_plans(batch, cfg)
    batch = slim_batch_for_train(batch, cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = init_state(cfg, model, tx, batch)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

    t0 = time.perf_counter()
    for i in range(2):
        state, aux = step(state, batch)
        jax.device_get(aux["loss"])
        print(f"warmup {i}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, aux = step(state, batch)
    jax.device_get(aux["loss"])
    print(f"steady step: {time.perf_counter()-t0:.3f}s", file=sys.stderr)

    jax.profiler.start_trace(args.logdir)
    state, aux = step(state, batch)
    jax.device_get(aux["loss"])
    jax.profiler.stop_trace()
    print("trace written", file=sys.stderr)
    parse_trace(args.logdir)


if __name__ == "__main__":
    main()
