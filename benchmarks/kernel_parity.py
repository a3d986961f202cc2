"""On-TPU numerical parity: compiled Pallas kernels vs the XLA einsum twin.

CI covers the kernels only in interpret mode (tests/test_sparse_conv.py);
this script runs the REAL Mosaic-compiled kernels on one production-scale
batch and asserts max-abs-diff within bf16 tolerance against the einsum
windowed path — catching Mosaic/layout regressions interpret mode cannot.

Run (real TPU): python -m benchmarks.kernel_parity
Exits non-zero on any parity failure; prints one line per check.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


RESULT_PATH = os.path.join(os.path.dirname(__file__),
                           "kernel_parity_result.txt")


def run_checks(plans) -> int:
    """Run compiled-kernel-vs-einsum parity on already-built plans.

    Returns the failure count and appends one timestamped line to
    ``kernel_parity_result.txt``.  Callable in-process from bench.py so the
    gate reuses the bench batch's plans instead of rebuilding them.
    """
    import jax
    import jax.numpy as jnp

    from tdwss.ops import sparse_conv as sc

    frng = np.random.default_rng(1)
    failures = 0

    def check(name, got, want, tol):
        nonlocal failures
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        scale = max(np.abs(want).max(), 1e-6)
        diff = np.abs(got - want).max() / scale
        ok = diff < tol
        failures += 0 if ok else 1
        print(f"{'OK ' if ok else 'FAIL'} {name}: rel-max-diff {diff:.3e} "
              f"(tol {tol})", flush=True)

    for li in (0, 2):      # production L0 + a deep Pallas level
        lvl = plans.levels[li]
        c = 32 * (li + 1)
        feats = jnp.asarray(
            frng.standard_normal((lvl.grid.capacity, c)).astype(np.float32),
            dtype=jnp.bfloat16)
        w = jnp.asarray(
            (frng.standard_normal((27, c, c)) * 0.05).astype(np.float32),
            dtype=jnp.bfloat16)
        win = lvl.win
        w2d = w.reshape(27 * c, c)

        # fwd: compiled kernel routing vs forced-einsum path
        got = jax.jit(lambda f: sc._w27_matmul_any(
            f, win.rb_local, win.starts, w2d, win.window, win.sub,
            win.subwin, win.sub_off))(feats)
        os.environ["TDWSS_NO_PALLAS"] = "1"
        want = jax.jit(lambda f: sc._w27_matmul_any(
            f, win.rb_local, win.starts, w2d, win.window, win.sub,
            win.subwin, win.sub_off))(feats)
        del os.environ["TDWSS_NO_PALLAS"]
        check(f"L{li} subm fwd kernel", got, want, 2e-2)

        dout = jnp.asarray(
            frng.standard_normal((lvl.grid.capacity, c)).astype(np.float32),
            dtype=jnp.bfloat16)
        got = jax.jit(lambda f, d: sc._w27_dw_any(
            f, win.rb_local, win.starts, d, win.window, win.sub,
            win.subwin, win.sub_off))(feats, dout)
        os.environ["TDWSS_NO_PALLAS"] = "1"
        want = jax.jit(lambda f, d: sc._w27_dw_any(
            f, win.rb_local, win.starts, d, win.window, win.sub,
            win.subwin, win.sub_off))(feats, dout)
        del os.environ["TDWSS_NO_PALLAS"]
        check(f"L{li} subm dW kernel", got, want, 2e-2)

        if lvl.wg_down is not None:
            wgd = lvl.wg_down
            cout = 32 * (li + 2)
            w8 = jnp.asarray(
                (frng.standard_normal((8 * c, cout)) * 0.05)
                .astype(np.float32), dtype=jnp.bfloat16)
            got = jax.jit(lambda f: sc._wg_matmul_any(
                f, wgd.rb_local, wgd.starts, w8, wgd.window, wgd.sub,
                wgd.subwin, wgd.sub_off))(feats)
            os.environ["TDWSS_NO_PALLAS"] = "1"
            want = jax.jit(lambda f: sc._wg_matmul_any(
                f, wgd.rb_local, wgd.starts, w8, wgd.window, wgd.sub,
                wgd.subwin, wgd.sub_off))(feats)
            del os.environ["TDWSS_NO_PALLAS"]
            check(f"L{li} wg-strided fwd kernel", got, want, 2e-2)

    with open(RESULT_PATH, "a") as f:
        f.write(f"{time.strftime('%Y-%m-%d %H:%M')} failures={failures}\n")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({failures} failures) "
          f"-> {RESULT_PATH}", flush=True)
    return failures


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans
    from tdwss.data.synthetic import make_dataset

    assert jax.default_backend() == "tpu", "run on the real chip"

    cfg = Config(
        training_name="parity", model_name="MultiLabel",
        label="scene_level", has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=50,
                                             batch_size=bench.NUM_SCENES),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=32, full_scale=4096, block_reps=2,
            residual_blocks=True),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=bench.MAX_POINTS,
                            level_capacity_schedule=[2, 3, 4, 4, 4, 4],
                            min_level_capacity=4096,
                            compute_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    scenes = make_dataset(bench.NUM_SCENES,
                          num_points=bench.POINTS_PER_SCENE, seed=7,
                          with_text=False)
    batch = attach_host_plans(train_collate(scenes, cfg, rng), cfg)
    plans = jax.tree_util.tree_map(jnp.asarray, batch.plans)
    sys.exit(1 if run_checks(plans) else 0)


if __name__ == "__main__":
    main()
