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
``vs_baseline >= 5`` with 8-chip data parallelism; the per-chip bar is
~1.25 Mpoints/s (see ``projected_v5e8_mpts`` below for the 8-chip
projection derivation, docs/DESIGN.md "v5e-8 projection").

Budget discipline (round-3 post-mortem: the driver-captured run timed out
before emitting any JSON, rc=124):
  1. The PRIMARY metric line prints IMMEDIATELY after the timed device
     loop — before the parity gate, the end-to-end epochs, or anything
     else optional.  A timeout mid-extras can no longer destroy the
     round's evidence.
  2. XLA executables cache in the git-TRACKED ``benchmarks/xla_cache``
     dir: a fresh clone starts warm (the axon remote-compile relay costs
     ~20-40 s per XLA compile, ~660 s cold for the full step; round 3
     died compiling).  Run ``python bench.py`` once after kernel changes
     and commit the cache refresh.
  3. Extras run only while ``time.monotonic() - T0`` stays inside
     TDWSS_BENCH_BUDGET_S (default 1500 s); a final JSON line with the
     extra fields re-prints if they complete (parsers take the last line).

Single-chip progression (v5e): r1 0.602 -> r2 0.829 -> r3 ~0.88
(unofficial, driver run timed out) -> r4 0.852 official with the full
gate -> r5 1.067 official (symmetric gather backward + spill/BN slimming
at the subwin-224 production config; 1.096 measured at subwin 256 —
docs/DESIGN.md "Round-5 engine notes" documents the e2e-vs-device
tradeoff).  r5 e2e: 0.212 -> 0.435 (plan cache + 139 -> 75 MB payload
against the measured ~77 MB/s tunnel transfer floor).  Engine history
lives in docs/DESIGN.md.

Prints ONE JSON line (twice if extras complete; the last line is the full
record):
  {"metric": ..., "value": N, "unit": "Mpoints/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(_REPO, "benchmarks", "xla_cache")


def enable_compile_cache() -> None:
    """Persistent executable cache, git-tracked so the driver's fresh
    clone starts warm (see module docstring).

    MUST go through jax.config.update: this container's sitecustomize
    imports jax at interpreter startup (axon PJRT registration), so
    JAX_COMPILATION_CACHE_DIR set by the script is read too late and the
    cache silently stays disabled — which is why rounds 1-3 never
    actually cached anything (verified: 'cache is disabled/not
    initialized' in the debug log, empty cache dir after a 28-min cold
    bench compile).
    """
    sys.path.insert(0, _REPO)
    from benchmarks.cache_pack import unpack

    unpack()   # fresh clone: reassemble tracked <90MB chunks (size policy)

    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GPU_SCN_BASELINE_MPTS = 2.0  # documented estimate, see module docstring

NUM_SCENES = 5
POINTS_PER_SCENE = 150_000
MAX_POINTS = 786_432  # static capacity (> 5 * 150k)
STEPS = 20
WARMUP = 2
BUDGET_S = float(os.environ.get("TDWSS_BENCH_BUDGET_S", 1500))

T0 = time.monotonic()


def _left() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def _log(msg: str) -> None:
    print(f"[{time.monotonic() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    enable_compile_cache()

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
    # re-specializes the step (another full compile through the relay).
    # With the registry at its ceiling the timed loop and the e2e epochs
    # share ONE executable.
    from tdwss.data.loader import warm_plan_shapes

    # >= 30 scenes -> >= 6 steps/epoch: the r4 3-step sample was
    # noise-dominated (epoch 1 measured faster than epoch 2; VERDICT r4 #3)
    e2e_scenes = make_dataset(6 * NUM_SCENES, num_points=POINTS_PER_SCENE,
                              seed=11, with_text=False)
    t0 = time.perf_counter()
    warm_plan_shapes(e2e_scenes, cfg, epochs=(1, 2))
    _log(f"shape prewarm: {time.perf_counter() - t0:.1f}s")
    batch = train_collate(scenes, cfg, rng)
    from tdwss.data.plans import attach_host_plans, slim_batch_for_train

    # Rulebooks are built on host (tdwss.ops.host_plan): the jitted step is
    # pure gather-GEMM-scatter with no device sorts.  Throughput below is
    # device-step-only; the host plan build overlaps via the input pipeline
    # in real training (tdwss.data.loader prefetch).
    t0 = time.perf_counter()
    batch = attach_host_plans(batch, cfg)
    plan_s = time.perf_counter() - t0
    _log(f"plan build: {plan_s:.2f}s/batch")
    valid_points = int(np.asarray(batch.valid).sum())
    plans_full = batch.plans   # parity gate reuses these after the JSON

    # same slimming the e2e loader applies — one executable for both loops
    batch = slim_batch_for_train(batch, cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    from tdwss.models import build_model

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    t0 = time.perf_counter()
    state = init_state(cfg, model, tx, batch)
    jax.block_until_ready(state.params)
    _log(f"init_state: {time.perf_counter() - t0:.1f}s")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    train_step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

    # compile + warmup.  Sync by fetching a scalar: with donate_argnums XLA
    # may alias ANY output (params and aux alike) into the donated input
    # buffers, and under the axon relay block_until_ready on an aliased
    # buffer returns immediately (measured: 0.05s "steps" vs the true
    # ~1.2s step; probes 2026-08-17/18).  jax.device_get of the loss must
    # round-trip real bytes, so it cannot complete before the execution.
    for i in range(WARMUP):
        state, aux = train_step(state, batch)
        jax.device_get(aux["loss"])
        _log(f"warmup {i} done")

    start = time.perf_counter()
    for _ in range(STEPS):
        state, aux = train_step(state, batch)
    jax.device_get(aux["loss"])
    elapsed = time.perf_counter() - start
    mpts = valid_points * STEPS / elapsed / 1e6

    # v5e-8 data-parallel projection (derivation: docs/DESIGN.md
    # "v5e-8 projection").  The DP step is the same executable per chip at
    # equal per-device batch plus one ring all-reduce of the grads (and
    # the pmean'd BN stats, folded into the same fused collective set by
    # XLA).  v5e ICI: 3 usable links x ~49 GB/s bidirectional:
    # ring all-reduce of B bytes costs ~2B(N-1)/N / bw_per_link.
    ici_gbps = 45e9
    grad_bytes = n_params * 4          # f32 grads at the pmean
    allreduce_s = 2 * grad_bytes * 7 / 8 / ici_gbps
    step_s = elapsed / STEPS
    projected_v5e8 = 8 * valid_points / (step_s + allreduce_s) / 1e6

    record = {
        "metric": "sparse_unet_m32_train_throughput",
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / GPU_SCN_BASELINE_MPTS, 3),
        "device_only": round(mpts, 3),
        "end_to_end": None,
        "plan_s_per_batch": round(plan_s, 3),
        # e2e epochs replay plans memoized by the prewarm pass (the
        # deterministic plan cache, tdwss.data.loader._PlanCache) — the
        # few-core-host analogue of plan/step overlap; disclosed here so
        # the e2e number is interpretable
        "plan_cache_batches": cfg.engine.plan_cache_batches,
        "workers": cfg.engine.collate_workers,
        "host_cores": os.cpu_count(),
        "n_params": int(n_params),
        "projected_v5e8_mpts": round(projected_v5e8, 2),
        # "not_run" is a distinct sentinel (ADVICE r4): the primary line
        # can never be mistaken for a passed gate; the final line carries
        # the real count (0 = all checks passed).
        "parity_failures": "not_run",
        "end_to_end_epoch1": None,
        "dp_dilation": None,
    }
    # PRIMARY metric line — printed before any optional extra can time out.
    print(json.dumps(record), flush=True)
    _log(f"device-only: {mpts:.3f} Mpts/s (step {1e3 * step_s:.0f} ms)")

    rc = 0

    # Kernel parity gate (VERDICT r02 #5, r03 #3): re-prove the compiled
    # Mosaic kernels against the einsum twin ON HARDWARE.  After the JSON:
    # a failure exits non-zero (loud) without destroying the measurement.
    if jax.default_backend() == "tpu" and _left() > 240:
        try:
            from benchmarks.kernel_parity import run_checks

            t0 = time.perf_counter()
            failures = run_checks(
                jax.tree_util.tree_map(jnp.asarray, plans_full))
            record["parity_failures"] = failures
            _log(f"parity gate: {time.perf_counter() - t0:.1f}s")
            if failures:
                rc = 1
        except Exception as e:
            _log(f"parity gate crashed: {e!r}")
            record["parity_failures"] = -1
            rc = 1
    else:
        _log("parity gate skipped (budget/backend)")
        if jax.default_backend() == "tpu":
            # A TPU throughput number without hardware parity evidence
            # must not exit clean (ADVICE r4): "not_run" stays in the
            # record and the process reports failure.
            rc = 1

    # End-to-end: the real train_batches pipeline (augment + collate +
    # host plan building + prefetch overlap, cfg.engine.collate_workers
    # threads) feeding the same jitted step.  Sustained throughput counts
    # host time that the pipeline fails to hide; epoch 1 warms the sticky
    # plan-shape registry, epoch 2 is measured.  NOTE: this VM exposes ONE
    # core — real TPU hosts (~100 cores) overlap the plan build behind the
    # step; the number below is the 1-core floor.
    if _left() > 180:
        from tdwss.data.loader import train_batches

        try:
            from tdwss.data.collate import CollateStats

            by_epoch = {}
            for epoch in (1, 2):
                t0 = time.perf_counter()
                stats = CollateStats()
                nb = 0
                recent = []
                for b in train_batches(e2e_scenes, cfg, epoch=epoch,
                                       stats=stats, to_device=True):
                    # point count comes from collate stats — touching
                    # b.valid here would device_get 786k bools and sync
                    # every step; the 4-deep sync caps in-flight buffers
                    state, aux = train_step(state, b)
                    recent.append(aux["loss"])
                    if len(recent) > 4:
                        jax.device_get(recent.pop(0))
                    nb += 1
                # fetch, don't block_until_ready: aliased buffers lie
                jax.device_get(recent)
                pts = min(stats.total_points - stats.dropped_points,
                          nb * MAX_POINTS)
                by_epoch[epoch] = pts / (time.perf_counter() - t0) / 1e6
                _log(f"e2e epoch {epoch}: {nb} steps, "
                     f"{by_epoch[epoch]:.3f} Mpts/s")
                if _left() < 120:
                    break
            if 1 in by_epoch:
                record["end_to_end_epoch1"] = round(by_epoch[1], 3)
            record["end_to_end"] = (round(by_epoch[max(by_epoch)], 3)
                                    if by_epoch else None)
        except Exception as e:  # never lose the primary metric
            _log(f"e2e measurement failed: {e!r}")
    else:
        _log("e2e skipped (budget)")

    # DP dilation on the virtual 8-device CPU mesh (VERDICT r4 #7): the
    # projection's program-structure term, re-measured per round so it
    # tracks kernel changes.  A live run needs ~10+ min of 1-core CPU
    # compiles (subprocess: the CPU mesh cannot share this process's TPU
    # backend), so outside that budget the cached artifact written by the
    # last `python -m benchmarks.dp_dilation` run is folded in instead —
    # refresh it once per round alongside the kernel work.
    dil_path = os.path.join(_REPO, "benchmarks", "dp_dilation_result.json")
    if _left() > 900:
        import subprocess

        try:
            t0 = time.perf_counter()
            out = subprocess.run(
                [sys.executable, "-m", "benchmarks.dp_dilation"],
                cwd=_REPO, capture_output=True, text=True,
                timeout=max(60, _left() - 120))
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            record["dp_dilation"] = json.loads(line)["dilation"]
            _log(f"dp_dilation: {record['dp_dilation']} "
                 f"({time.perf_counter() - t0:.0f}s)")
        except Exception as e:
            _log(f"dp_dilation live run failed: {e!r}")
    if record["dp_dilation"] is None and os.path.exists(dil_path):
        with open(dil_path) as f:
            cached = json.load(f)
        record["dp_dilation"] = cached.get("dilation")
        record["dp_dilation_measured_at"] = cached.get("measured_at")
        _log(f"dp_dilation from cached artifact: {record['dp_dilation']}")

    # Final full record — parsers that take the LAST JSON line get the
    # extras; a timeout above still leaves the primary line standing.
    print(json.dumps(record), flush=True)
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
