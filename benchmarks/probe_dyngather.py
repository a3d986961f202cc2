"""Can Mosaic's tpu.dynamic_gather replace the one-hot inner op?

The sub-window kernel's inner op per (anchor, sub-tile) is
    oh = (rbs[:, None] == iota(swk))          # (sub, swk) VPU build
    acc += oh @ zs                            # (sub, swk)@(swk, cout) MXU
i.e. a row gather of ``zs`` expressed as a matmul.  jax 0.9 Mosaic lowers
``jnp.take_along_axis(x, idx, axis=0)`` (x.shape == idx.shape, 2D) to
``tpu.dynamic_gather`` — if that is efficient on v5e at (256, 128) f32,
the one-hot build + matmul (the kernel's measured majority) collapses to
a VPU shuffle.

Times three standalone Pallas kernels over identical data at production
sub-kernel shape (sub=128, swk=256, cout=32, 27 anchors x 4 sub-tiles per
grid step, 1244 steps ~ L0):
  onehot  — the production inner op
  gather  — dynamic_gather + sentinel mask
  both    — correctness cross-check (max |diff|), small grid

Run (real TPU, AFTER any running chain): python -m benchmarks.probe_dyngather
"""

from __future__ import annotations

import argparse
import functools
import os
import time


import numpy as np


def build(kind: str, sub: int, swk: int, cout: int, nanchor: int,
          nsub: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(zs_ref, rb_ref, out_ref):
        # zs: (nanchor, swk, cout) "pre-transformed window slices";
        # rb:  (nanchor, nsub*sub) window-local rows, sentinel == swk.
        if kind in ("onehot_t", "onehot_tz"):
            # Transposed accumulate: acc^T (cout, sub) += Z^T @ oh^T.
            # N=sub=128 fills the MXU lanes that N=cout=32 wastes; the
            # one-hot build count is identical, orientation flipped.  In
            # production zbuf comes straight from the Z-transform and can
            # be STORED transposed ("onehot_tz"); "onehot_t" pays an
            # explicit per-anchor (swk, cout) transpose like a retrofit
            # would.
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (swk, sub), 0)
            if kind == "onehot_t":
                zts = [zs_ref[a].T for a in range(nanchor)]
            else:
                zts = [zs_ref[a] for a in range(nanchor)]      # (cout, swk)
            for s in range(nsub):
                acc_t = jnp.zeros((cout, sub), jnp.float32)
                for a in range(nanchor):
                    rbs = rb_ref[a, s * sub:(s + 1) * sub]
                    oh_t = (rbs[None, :] == iota_t).astype(zts[a].dtype)
                    acc_t = acc_t + jnp.dot(
                        zts[a], oh_t, preferred_element_type=jnp.float32)
                out_ref[s * sub:(s + 1) * sub] = acc_t.T
            return
        if kind == "onehot_merged":
            # Tap-merged: the m taps sharing a window group contract in
            # ONE dot with K = m*swk — 3x fewer MXU issues per sub-tile,
            # same compare volume (the per-tap one-hots stack along the
            # contraction dim and the tap sum happens inside the matmul).
            m = 3
            nwin = nanchor // m
            iota3 = jax.lax.broadcasted_iota(jnp.int32, (m, swk, sub), 1)
            for s in range(nsub):
                acc_t = jnp.zeros((cout, sub), jnp.float32)
                for g in range(nwin):
                    zcat = jnp.concatenate(
                        [zs_ref[g + j * nwin] for j in range(m)], axis=0)
                    rbs3 = jnp.stack(
                        [rb_ref[g + j * nwin, s * sub:(s + 1) * sub]
                         for j in range(m)])                 # (m, sub)
                    oh3 = (rbs3[:, None, :] == iota3).astype(zcat.dtype)
                    acc_t = acc_t + jax.lax.dot_general(
                        zcat, oh3.reshape(m * swk, sub),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out_ref[s * sub:(s + 1) * sub] = acc_t.T
            return
        if kind == "onehot_dg":
            # the production _OH_T kernel form: normal-orientation one-hot,
            # transposed accumulate via dot_general contracting (0, 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (sub, swk), 1)
            for s in range(nsub):
                acc_t = jnp.zeros((cout, sub), jnp.float32)
                for a in range(nanchor):
                    zs = zs_ref[a]
                    rbs = rb_ref[a, s * sub:(s + 1) * sub]
                    oh = (rbs[:, None] == iota).astype(zs.dtype)
                    acc_t = acc_t + jax.lax.dot_general(
                        zs, oh, (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out_ref[s * sub:(s + 1) * sub] = acc_t.T
            return
        if kind == "gatherL":
            # lane-dimension dynamic gather: operate on zs^T (cout, swk)
            # and gather along the minor axis — the orientation Mosaic's
            # tpu.dynamic_gather has historically supported.
            for s in range(nsub):
                acc_t = jnp.zeros((cout, sub), jnp.float32)
                for a in range(nanchor):
                    zt = zs_ref[a].T                         # (cout, swk)
                    rbs = rb_ref[a, s * sub:(s + 1) * sub]
                    idx = jnp.broadcast_to(
                        jnp.pad(jnp.minimum(rbs, swk - 1),
                                (0, swk - sub))[None, :], (cout, swk))
                    g = jnp.take_along_axis(zt, idx, axis=1,
                                            mode="promise_in_bounds")
                    live = (rbs < swk)[None, :]
                    acc_t = acc_t + jnp.where(live, g[:, :sub], 0.0
                                              ).astype(jnp.float32)
                out_ref[s * sub:(s + 1) * sub] = acc_t.T
            return
        iota = jax.lax.broadcasted_iota(jnp.int32, (sub, swk), 1)
        for s in range(nsub):
            if kind == "gather1":
                # transposed accumulate: per-anchor LANE gather (axis=1)
                # on Z^T, one (cout, sub) -> (sub, cout) transpose per
                # sub-tile at the end
                acc_t = jnp.zeros((cout, sub), jnp.float32)
                for a in range(nanchor):
                    zs_t = zs_ref[a].T                     # (cout, swk)
                    rbs = rb_ref[a, s * sub:(s + 1) * sub]
                    idx = jnp.minimum(jnp.pad(rbs, (0, swk - sub)), swk - 1)
                    g = jnp.take_along_axis(
                        zs_t, jnp.broadcast_to(idx[None, :], (cout, swk)),
                        axis=1, mode="promise_in_bounds")
                    live = (rbs < swk)[None, :]
                    acc_t = acc_t + jnp.where(live, g[:, :sub], 0.0
                                              ).astype(jnp.float32)
                out_ref[s * sub:(s + 1) * sub] = acc_t.T
                continue
            acc = jnp.zeros((sub, cout), jnp.float32)
            for a in range(nanchor):
                zs = zs_ref[a]
                rbs = rb_ref[a, s * sub:(s + 1) * sub]
                if kind == "onehot":
                    oh = (rbs[:, None] == iota).astype(zs.dtype)
                    acc = acc + jnp.dot(oh, zs,
                                        preferred_element_type=jnp.float32)
                else:
                    idx = jnp.pad(rbs, (0, swk - sub))
                    g = jnp.take_along_axis(
                        zs, jnp.broadcast_to(idx[:, None], (swk, cout)),
                        axis=0, mode="promise_in_bounds")
                    live = (rbs < swk)[:, None]
                    acc = acc + jnp.where(live, g[:sub], 0.0).astype(
                        jnp.float32)
            out_ref[s * sub:(s + 1) * sub] = acc

    t = nsub * sub

    @jax.jit
    def run(zs, rb):
        tiles = rb.shape[1] // t
        zspec = ((nanchor, cout, swk) if kind == "onehot_tz"
                 else (nanchor, swk, cout))
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(zspec, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nanchor, t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, cout), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rb.shape[1], cout), jnp.float32),
            interpret=interpret,
        )(zs, rb)

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=128)
    ap.add_argument("--swk", type=int, default=256)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--nanchor", type=int, default=27)
    ap.add_argument("--nsub", type=int, default=4)
    ap.add_argument("--tiles", type=int, default=1244)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t = args.nsub * args.sub
    v = args.tiles * t
    zs = jnp.asarray(
        rng.normal(size=(args.nanchor, args.swk, args.cout)), args.dtype)
    rb = rng.integers(0, args.swk, (args.nanchor, v)).astype(np.int32)
    rb[rng.random(rb.shape) < 0.1] = args.swk            # 10% sentinels
    rb = jnp.asarray(rb)

    runs = {}
    for kind in ("onehot", "onehot_t", "onehot_tz", "onehot_dg",
                 "onehot_merged", "gatherL", "gather", "gather1"):
        try:
            fn = build(kind, args.sub, args.swk, args.cout, args.nanchor,
                       args.nsub, args.interpret)
            zin = jnp.swapaxes(zs, 1, 2) if kind == "onehot_tz" else zs
            from benchmarks._timing import timed

            out = fn(zin, rb)
            dt = timed(fn, zin, rb, steps=10, warmup=1)
            runs[kind] = (dt, out)
            print(f"{kind:8s} {dt * 1e3:8.2f} ms")
        except Exception as e:
            print(f"{kind:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")
    for kind in ("onehot_t", "onehot_tz", "onehot_dg", "onehot_merged",
                 "gatherL", "gather", "gather1"):
        if "onehot" in runs and kind in runs:
            d = float(jnp.max(jnp.abs(runs["onehot"][1] - runs[kind][1])))
            print(f"max |onehot - {kind}| = {d:.3e}")


if __name__ == "__main__":
    main()
