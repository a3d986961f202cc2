"""Empirical probes for the fused windowed-conv Pallas kernel design.

Measures on the real chip:
  A. per-tile window DMA cost: 9 dynamic-offset (W, 3C) HBM->VMEM copies
     per grid step (the fused kernel's load pattern), vs 3, vs 1.
  B. in-VMEM one-hot build + MXU matmul throughput at conv shapes.
  C. whether Mosaic compiles an in-VMEM dynamic row gather, and its speed.

Run: python -m benchmarks.probe_pallas
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from benchmarks._timing import timed as _timed  # honest sync


def timed(fn, *args, steps=20, warmup=3):
    return _timed(fn, *args, steps=steps, warmup=warmup)


V = 635904
T = 256
W = 320
C3 = 96
CO = 32
TILES = V // T


# --------------------------------------------------------------- probe A
# Window loads as leading-dim slices of a (V/8, 8, C3) tile-block view —
# Mosaic rejects dynamic sublane offsets on a 2D source, but leading-dim
# dynamic offsets on tile-aligned 3D blocks work (cf. pallas_gather.py).
def make_dma_probe(n_dma: int, w8: int, double_buffer: bool):
    def kernel(starts_ref, src_ref, out_ref, win, sems):
        t = pl.program_id(0)

        def get_dma(slot, tile, j):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(starts_ref[tile * n_dma + j], w8)],
                win.at[slot, j], sems.at[slot, j],
            )

        if double_buffer:
            cur = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t == 0)
            def _():
                for j in range(n_dma):
                    get_dma(cur, t, j).start()

            @pl.when(t + 1 < pl.num_programs(0))
            def _():
                for j in range(n_dma):
                    get_dma(nxt, t + 1, j).start()
            for j in range(n_dma):
                get_dma(cur, t, j).wait()
            sel = cur
        else:
            for j in range(n_dma):
                get_dma(0, t, j).start()
            for j in range(n_dma):
                get_dma(0, t, j).wait()
            sel = 0

        acc = jnp.zeros((8, C3), jnp.float32)
        for j in range(n_dma):
            acc = acc + win[sel, j, 0].astype(jnp.float32)
        out_ref[:] = acc

    nbuf = 2 if double_buffer else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, C3), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, n_dma, w8, 8, C3), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf, n_dma)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, C3), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def probe_a():
    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.standard_normal((V // 8, 8, C3)), jnp.bfloat16)
    for n_dma, w8, db in [(9, W // 8, False), (9, W // 8, True),
                          (3, 3 * W // 8, True), (1, 9 * W // 8, True),
                          (18, W // 8, True)]:
        starts = jnp.asarray(
            rng.integers(0, V // 8 - w8 - 1, TILES * n_dma).astype(np.int32))
        try:
            fn = jax.jit(make_dma_probe(n_dma, w8, db))
            dt = timed(fn, starts, src)
            per_tile = dt / TILES * 1e6
            gbs = TILES * n_dma * w8 * 8 * C3 * 2 / dt / 1e9
            print(f"A: {n_dma:2d} DMAs x ({w8}x8,{C3}) db={int(db)}: "
                  f"{dt*1e3:7.2f} ms  {per_tile:6.2f} us/tile  {gbs:6.1f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"A: {n_dma} DMAs x ({w8}x8,{C3}) db={int(db)}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


# --------------------------------------------------------------- probe B
def make_onehot_probe(nblocks: int):
    """Per grid step: build (T, nblocks*W) one-hot, matmul against Z."""

    def kernel(rb_ref, z_ref, out_ref):
        acc = jnp.zeros((T, CO), jnp.float32)
        for j in range(nblocks):
            iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh = (rb_ref[:, j][:, None] == iota).astype(jnp.bfloat16)
            acc = acc + jnp.dot(oh, z_ref[j],
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    grid_spec = pl.GridSpec(
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((T, nblocks), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, W, CO), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, CO), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, CO), jnp.float32),
        grid_spec=grid_spec,
    )


def probe_b():
    rng = np.random.default_rng(0)
    for nblocks in (9, 27):
        rb = jnp.asarray(
            rng.integers(0, W + 1, (V, nblocks)).astype(np.int32))
        z = jnp.asarray(rng.standard_normal((nblocks, W, CO)), jnp.bfloat16)
        try:
            fn = jax.jit(make_onehot_probe(nblocks))
            dt = timed(fn, rb, z)
            macs = V * nblocks * W * CO
            print(f"B: one-hot x{nblocks} (T={T},W={W},Co={CO}): "
                  f"{dt*1e3:7.2f} ms  {dt/TILES*1e6:6.2f} us/tile  "
                  f"{macs/dt/1e12:5.1f} TMAC/s")
        except Exception as e:  # noqa: BLE001
            print(f"B: x{nblocks}: FAILED {type(e).__name__}: {str(e)[:200]}")


# --------------------------------------------------------------- probe C
def make_vmem_gather_probe(mode: str):
    def kernel(rb_ref, z_ref, out_ref):
        if mode == "take":
            out_ref[:] = jnp.take(z_ref[:], rb_ref[:, 0], axis=0,
                                  mode="clip")
        elif mode == "take_along":
            idx = rb_ref[:, 0][:, None]
            out_ref[:] = jnp.take_along_axis(
                z_ref[:], jnp.clip(idx, 0, W - 1), axis=0)
        else:  # loop of dynamic row reads
            def body(i, acc):
                row = z_ref[rb_ref[i, 0], :]
                return acc.at[i, :].set(row)
            out_ref[:] = jax.lax.fori_loop(
                0, T, body, jnp.zeros((T, CO), jnp.float32))

    grid_spec = pl.GridSpec(
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((T, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, CO), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, CO), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, CO), jnp.float32),
        grid_spec=grid_spec,
    )


def probe_c():
    rng = np.random.default_rng(0)
    rb = jnp.asarray(rng.integers(0, W, (V, 8)).astype(np.int32))
    z = jnp.asarray(rng.standard_normal((W, CO)), jnp.float32)
    for mode in ("take", "take_along", "loop"):
        try:
            fn = jax.jit(make_vmem_gather_probe(mode))
            dt = timed(fn, rb, z)
            print(f"C: vmem gather [{mode}] (T={T} rows/tile): "
                  f"{dt*1e3:7.2f} ms  {dt/TILES*1e6:6.2f} us/tile  "
                  f"{V/dt/1e6:7.1f} Mrows/s")
        except Exception as e:  # noqa: BLE001
            print(f"C: [{mode}] FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform} TILES={TILES}")
    probe_a()
    probe_b()
    probe_c()
