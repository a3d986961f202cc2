"""On-TPU numerical parity: compiled Pallas kernels vs the XLA einsum twin.

CI covers the kernels only in interpret mode (tests/test_sparse_conv.py);
this script runs the REAL Mosaic-compiled kernels on one production-scale
batch and asserts max-abs-diff within bf16 tolerance against the einsum
windowed path — catching Mosaic/layout regressions interpret mode cannot.

Coverage (VERDICT r03 #3): per level it checks the subm forward kernel,
the subm dW kernel, the subm dfeats direction (transposed-weight forward
kernel — the production backward at packed levels), the wg-strided
forward AND dW kernels, the deconv-direction wg forward (same kernel
family as unpool's identity-weight path), plus the fused backward
``windowed_bwd_sub`` at a packed (L0, ccat<=64) and an unpacked (L1,
ccat==128) shape — the escape-hatch route when TDWSS_PACK=0.

Run (real TPU): python -m benchmarks.kernel_parity
Exits non-zero on any parity failure; prints one line per check.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import numpy as np


RESULT_PATH = os.path.join(os.path.dirname(__file__),
                           "kernel_parity_result.txt")


@contextlib.contextmanager
def _forced_einsum():
    """Set TDWSS_NO_PALLAS for the 'want' trace, restoring the caller's
    prior value even on exceptions (an earlier version deleted the key
    unconditionally, leaking the flag on error and clobbering deliberate
    einsum-path runs)."""
    prior = os.environ.get("TDWSS_NO_PALLAS")
    os.environ["TDWSS_NO_PALLAS"] = "1"
    try:
        yield
    finally:
        if prior is None:
            os.environ.pop("TDWSS_NO_PALLAS", None)
        else:
            os.environ["TDWSS_NO_PALLAS"] = prior


def run_checks(plans, levels=(0, 2)) -> int:
    """Run compiled-kernel-vs-einsum parity on already-built plans.

    Returns the failure count and appends one timestamped line to
    ``kernel_parity_result.txt``.  Callable in-process from bench.py so the
    gate reuses the bench batch's plans instead of rebuilding them.
    """
    import jax
    import jax.numpy as jnp

    import bench

    bench.enable_compile_cache()
    from tdwss.ops import pallas_subm as ps
    from tdwss.ops import sparse_conv as sc

    frng = np.random.default_rng(1)
    failures = 0
    checks = 0

    def check(name, got, want, tol=2e-2):
        nonlocal failures, checks
        checks += 1
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        scale = max(np.abs(want).max(), 1e-6)
        diff = np.abs(got - want).max() / scale
        ok = diff < tol
        failures += 0 if ok else 1
        print(f"{'OK ' if ok else 'FAIL'} {name}: rel-max-diff {diff:.3e} "
              f"(tol {tol})", flush=True)

    def rnd(shape, scale=1.0):
        return jnp.asarray(
            (frng.standard_normal(shape) * scale).astype(np.float32),
            dtype=jnp.bfloat16)

    for li in levels:
        lvl = plans.levels[li]
        c = 32 * (li + 1)
        feats = rnd((lvl.grid.capacity, c))
        w = rnd((27, c, c), 0.05)
        win = lvl.win
        w2d = w.reshape(27 * c, c)

        def w27_mm(f, wmat):
            return sc._w27_matmul_any(
                f, win.rb_local, win.starts, wmat, win.window, win.sub,
                win.subwin, win.sub_off)

        # fwd: compiled kernel routing vs forced-einsum path
        got = jax.jit(w27_mm)(feats, w2d)
        with _forced_einsum():
            want = jax.jit(w27_mm)(feats, w2d)
        check(f"L{li} subm fwd kernel", got, want)

        dout = rnd((lvl.grid.capacity, c))
        got = jax.jit(lambda f, d: sc._w27_dw_any(
            f, win.rb_local, win.starts, d, win.window, win.sub,
            win.subwin, win.sub_off))(feats, dout)
        with _forced_einsum():
            want = jax.jit(lambda f, d: sc._w27_dw_any(
                f, win.rb_local, win.starts, d, win.window, win.sub,
                win.subwin, win.sub_off))(feats, dout)
        check(f"L{li} subm dW kernel", got, want)

        # FULL production VJP vs forced-einsum VJP: covers the composed
        # backward route on hardware — at L0/L1 the symmetric gather
        # kernel (windowed_bwd_gather) PLUS the flipped-orientation spill
        # dW whose sum must cover every rb entry exactly once.
        rtile = sc._pack_rtile(win)
        sub_off = (win.sub_off if win.sub_off is not None
                   else jnp.zeros((0, win.starts.shape[1]), jnp.int32))

        def conv_loss(f, w_):
            out = sc._subm_conv_w27(
                win.window, win.sub, win.subwin,
                int(getattr(win, "v_active", 0)), f, win.starts, sub_off,
                sc._rb32(win.rb_local), rtile, win.res_ovf, win.ovf_v,
                win.ovf_count, w_)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.grad(conv_loss, argnums=(0, 1)))
        gf_got, gw_got = grad_fn(feats, w)
        with _forced_einsum():
            gf_want, gw_want = jax.jit(
                jax.grad(conv_loss, argnums=(0, 1)))(feats, w)
        check(f"L{li} subm full-VJP dfeats", gf_got, gf_want)
        check(f"L{li} subm full-VJP dW", gw_got, gw_want)

        # dfeats direction: the production backward at packed levels is
        # the SAME forward kernel on the cotangent with flipped-transposed
        # weights — check it explicitly so a regression in that weight
        # layout cannot hide behind the fwd check's symmetric weights.
        wt2d = jnp.asarray(w)[::-1].transpose(0, 2, 1).reshape(27 * c, c)
        got = jax.jit(w27_mm)(dout, wt2d)
        with _forced_einsum():
            want = jax.jit(w27_mm)(dout, wt2d)
        check(f"L{li} subm dfeats kernel", got, want)

        if lvl.wg_down is not None:
            wgd = lvl.wg_down
            cout = 32 * (li + 2)
            w8 = rnd((8 * c, cout), 0.05)

            def wg_mm(f, wmat, wg=wgd):
                return sc._wg_matmul_any(
                    f, wg.rb_local, wg.starts, wmat, wg.window, wg.sub,
                    wg.subwin, wg.sub_off)

            got = jax.jit(wg_mm)(feats, w8)
            with _forced_einsum():
                want = jax.jit(wg_mm)(feats, w8)
            check(f"L{li} wg-strided fwd kernel", got, want)

            dcoarse = rnd((wgd.rb_local.shape[0], cout))
            got = jax.jit(lambda f, d: sc._wg_dw_any(
                f, wgd.rb_local, wgd.starts, d, wgd.window, wgd.sub,
                wgd.subwin, wgd.sub_off))(feats, dcoarse)
            with _forced_einsum():
                want = jax.jit(lambda f, d: sc._wg_dw_any(
                    f, wgd.rb_local, wgd.starts, d, wgd.window, wgd.sub,
                    wgd.subwin, wgd.sub_off))(feats, dcoarse)
            check(f"L{li} wg-strided dW kernel", got, want)

        if lvl.wg_up is not None:
            # deconv forward direction (and the identity-weight layout of
            # unpool) rides wg_up metadata: coarse -> fine
            wgu = lvl.wg_up
            cc = 32 * (li + 2)
            coarse = rnd((plans.levels[li + 1].grid.capacity, cc))
            w8u = rnd((8 * cc, c), 0.05)

            def wg_up_mm(f, wmat, wg=wgu):
                return sc._wg_matmul_any(
                    f, wg.rb_local, wg.starts, wmat, wg.window, wg.sub,
                    wg.subwin, wg.sub_off)

            got = jax.jit(wg_up_mm)(coarse, w8u)
            with _forced_einsum():
                want = jax.jit(wg_up_mm)(coarse, w8u)
            check(f"L{li} wg-deconv fwd kernel", got, want)

            # FULL wg VJP (strided conv): the production backward now
            # fuses dW into the b-side dfeats kernel (windowed_bwd_gather
            # flip_taps=False) with swapped-orientation spill dW — check
            # the composed route end-to-end on hardware.
            wgu_ = lvl.wg_up
            if wgu_ is not None and lvl.wg_down is not None:
                w8_3 = rnd((8, c, cout), 0.05)

                def wg_loss(f, w_):
                    out = sc.wg_conv_apply(f, w_, wgd, wgu_)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                gf_got, gw_got = jax.jit(
                    jax.grad(wg_loss, argnums=(0, 1)))(feats, w8_3)
                with _forced_einsum():
                    gf_want, gw_want = jax.jit(
                        jax.grad(wg_loss, argnums=(0, 1)))(feats, w8_3)
                check(f"L{li} wg full-VJP dfeats", gf_got, gf_want)
                check(f"L{li} wg full-VJP dW", gw_got, gw_want)

            # wg-deconv dW direction on hardware (VERDICT r4 #4): the
            # deconv backward accumulates dW over the SAME up metadata
            dfine = rnd((wgu.rb_local.shape[0], c))
            got = jax.jit(lambda f, d: sc._wg_dw_any(
                f, wgu.rb_local, wgu.starts, d, wgu.window, wgu.sub,
                wgu.subwin, wgu.sub_off))(coarse, dfine)
            with _forced_einsum():
                want = jax.jit(lambda f, d: sc._wg_dw_any(
                    f, wgu.rb_local, wgu.starts, d, wgu.window, wgu.sub,
                    wgu.subwin, wgu.sub_off))(coarse, dfine)
            check(f"L{li} wg-deconv dW kernel", got, want)

        # Heavy-spill-tier apply + dW (VERDICT r4 #4): einsum/XLA paths,
        # ~17% of the step, previously only interpret/CI-tested.  Oracle:
        # a direct numpy evaluation of the (owner, tap, src) entry list.
        if (win.res_hent is not None and win.res_hent.shape[0]
                and lvl.grid.capacity % sc._RES_TILE == 0):
            v = lvl.grid.capacity
            hent = np.asarray(win.res_hent)
            htile = np.asarray(win.res_htile)
            rtile = sc._pack_rtile(win)
            w2d_np = np.asarray(w2d, np.float32)
            feats_np = np.asarray(feats, np.float32)
            dout = rnd((v, c))
            dout_np = np.asarray(dout, np.float32)

            live = hent[:, 2] < v
            out_ref = np.zeros((v, c), np.float32)
            dw_ref = np.zeros((27 * c, c), np.float32)
            own, tap, src = (hent[live, 0], hent[live, 1], hent[live, 2])
            contrib = np.einsum(
                "ec,eco->eo", feats_np[src],
                w2d_np.reshape(27, c, c)[tap])
            np.add.at(out_ref, own[own < v], contrib[own < v])
            ok = own < v
            for t in range(27):
                m = ok & (tap == t)
                dw_ref[t * c:(t + 1) * c] = (
                    feats_np[src[m]].T @ dout_np[own[m]])

            got = jax.jit(lambda f: sc._res_heavy_apply(
                f, win.res_hent, win.res_htile, w2d, c, v,
                v // sc._RES_TILE, rtile[3], rtile[4], rtile[5]))(feats)
            check(f"L{li} heavy-spill apply", got, out_ref)
            got = jax.jit(lambda f, d: sc._res_heavy_dw(
                f, win.res_hent, d, 27, rtile[3], rtile[4]))(feats, dout)
            check(f"L{li} heavy-spill dW", got, dw_ref)

    # Fused backward windowed_bwd_sub: production-reachable only via the
    # TDWSS_PACK=0 escape hatch, but gate it on hardware anyway — at a
    # shape the packer would accept (L0: ccat = 64 -> packed p=2 inside
    # the kernel) and at the genuinely-unpacked L1 shape (ccat = 128).
    for li in (0, 1):
        lvl = plans.levels[li]
        c = 32 * (li + 1)
        win = lvl.win
        if win.sub == 0 or win.rb_local.shape[0] % 8:
            continue
        ccat = 2 * c
        from tdwss.ops.pallas_subm import _lane_pad

        if not sc._sub_vmem_fits(win.window, ccat, c, dw=True):
            print(f"SKIP L{li} fused bwd kernel: VMEM estimate", flush=True)
            continue
        v = win.rb_local.shape[0]
        tile = v // win.starts.shape[0]
        feats = rnd((v, c))
        dout = rnd((v, c))
        w = rnd((27, c, c), 0.05)
        l = _lane_pad(ccat)
        wt = jnp.asarray(w)[::-1].transpose(0, 2, 1)
        wt_full = jnp.zeros((27, l, c), w.dtype)
        wt_full = wt_full.at[:, c:ccat, :].set(wt)
        src_cat = jnp.concatenate([feats, dout], axis=1)
        rb_t = sc._rb32(win.rb_local).T
        dx, dw_l = ps.windowed_bwd_sub(
            src_cat, win.starts.reshape(-1), win.sub_off.reshape(-1),
            rb_t, wt_full, dout, window=win.window, tile=tile,
            sub=win.sub, subwin=win.subwin, cin=c)
        dw_got = dw_l[:, :c, :].reshape(27 * c, c)
        wt2d = wt.reshape(27 * c, c)
        with _forced_einsum():
            dx_want = jax.jit(lambda d: sc._w27_matmul_any(
                d, win.rb_local, win.starts, wt2d, win.window, win.sub,
                win.subwin, win.sub_off))(dout)
            dw_want = jax.jit(lambda f, d: sc._w27_dw_any(
                f, win.rb_local, win.starts, d, win.window, win.sub,
                win.subwin, win.sub_off))(feats, dout)
        check(f"L{li} fused bwd dfeats kernel", dx, dx_want)
        check(f"L{li} fused bwd dW kernel", dw_got, dw_want)

    with open(RESULT_PATH, "a") as f:
        f.write(f"{time.strftime('%Y-%m-%d %H:%M')} checks={checks} "
                f"failures={failures}\n")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({checks} checks, "
          f"{failures} failures) -> {RESULT_PATH}", flush=True)
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
