"""Per-kernel roofline: measured ms vs analytic floors at L0/L1/L2.

VERDICT r4 #1(b): for each production kernel family (fwd / fused
backward / remaining dW) at each Pallas level, print the measured time,
the analytic floor per resource, and the binding resource — so "the
1.25 Mpts/s bar is (un)reachable on this algorithm" is a calculation.

Floors modeled per kernel instance (one conv at bench scale):
  MXU    total MACs / 98.5e12 MACs/s      (v5e ~197 TFLOPs bf16)
  HBM    bytes in+out / 819e9 B/s         (window reads count the PACKED
                                           rows actually DMA'd, not V)
  VPU    one-hot compare+convert lanes / ~3.9e12 lane-ops/s
         (8x128 lanes x 940 MHz x ~4 port-limited ops/cycle)
  DMA    descriptors x ~0.8 us effective issue (measured r4: the 2 us
         architectural rate pipelines ~2.5x under double buffering)

Measured component stacks come from the kernels' ablate modes where
available (dma / z / ohbuild / full).

Run (real TPU): python -m benchmarks.roofline
"""

from __future__ import annotations

MACS_PER_S = 98.5e12          # v5e bf16
HBM_BPS = 819e9
VPU_OPS = 3.9e12
DMA_US = 0.8e-6


def main():
    import jax.numpy as jnp

    import bench; bench.enable_compile_cache()  # noqa: E702
    import numpy as np

    from benchmarks._timing import timed
    from tdwss.data.synthetic import make_dataset
    from tdwss.ops import host_plan as hp
    from tdwss.ops import pallas_subm as ps

    rng = np.random.default_rng(0)
    scenes = make_dataset(5, num_points=150_000, seed=0)
    pts = np.concatenate([s.points for s in scenes])
    bidx = np.concatenate([np.full(len(s.points), i, np.int32)
                           for i, s in enumerate(scenes)])
    coords0 = np.floor(pts * 50.0).astype(np.int32)
    coords0 -= coords0.min(axis=0)

    rows = []
    caps = {0: 786432, 1: 393216, 2: 131072}
    tile, window, subwin, sub = 512, 640, 256, 128

    grid = None
    for li in (0, 1, 2):
        cap = caps[li]
        c = 32 * (li + 1)
        if li == 0:
            c4 = np.concatenate([coords0, bidx[:, None]], axis=1)[:cap]
            valid = np.ones(min(len(c4), cap), bool)
            if len(c4) < cap:
                pad = cap - len(c4)
                c4 = np.concatenate([c4, np.zeros((pad, 4), np.int32)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            grid = hp.voxelize_np(c4, None, valid, cap)[0]
        else:
            grid = hp.downsample_level_np(grid, cap, 2, 2)[0]
        v = grid.capacity
        nv = int(np.asarray(grid.num_valid))
        rb = hp.build_subm_rulebook_np(grid, 3)
        win = hp.build_windowed_subm27(np.asarray(rb), grid, tile=tile,
                                       window=window, nwin=9, sub=sub,
                                       subwin=subwin)
        if win is None:
            print(f"L{li}: no windowed plan (V={nv})")
            continue
        p = ps._pack_p(c, c, v, window, subwin)
        feats = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        dout = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal((27, c, c)) * 0.1
                         ).astype(np.float32)).astype(jnp.bfloat16)
        starts = jnp.asarray(np.asarray(win.starts).reshape(-1))
        soff = jnp.asarray(np.asarray(win.sub_off).reshape(-1))
        rbl = jnp.asarray(np.asarray(win.rb_local).astype(np.int32).T)
        w9 = ps.pad_w9(w.reshape(27, c, c))
        wt9 = ps.pad_w9(w[::-1].transpose(0, 2, 1))

        tiles = np.asarray(win.starts).shape[0]
        va = tiles * tile
        nsub = tile // sub
        swk_p = subwin // p           # packed rows per sub-window slice
        w_p = window // p

        # ---- analytic floors (per conv instance) ----
        # fwd kernel: 9 window DMAs/tile; Z grouped (w_p x 128 x 27*slot
        # MACs -> counted at the packed width); per (sub, anchor): oh
        # build swk_p x sub lanes + one (zcols x swk_p x sub) dot (+
        # blk-select p x c x sub).
        zslot = ps._lane_pad(p * c)
        z_macs = tiles * 9 * w_p * 128 * (27 // 9) * zslot
        oh_macs = tiles * nsub * 27 * (p * c) * swk_p * sub
        mxu_fwd = (z_macs + oh_macs) / MACS_PER_S
        hbm_fwd = (tiles * 9 * w_p * 128 * 2      # window DMAs (packed)
                   + va * 27 * 2                  # rb int16
                   + va * c * 2 * 2) / HBM_BPS    # out write (+dout read)
        vpu_fwd = (tiles * nsub * 27 * (swk_p * sub      # oh build
                                        + 3 * p * c * sub)  # blk select
                   ) / VPU_OPS
        dma_fwd = tiles * 9 * DMA_US
        floor_fwd = max(mxu_fwd, hbm_fwd, vpu_fwd, dma_fwd)

        # fused backward (gather form): fwd-kernel work + per (sub,
        # anchor) raw-window gather lanes in the SAME dot (cat) + per
        # sub-tile (27c x sub x c) dW GEMM + feats tile reads.
        cat_extra = tiles * nsub * 27 * 128 * swk_p * sub
        dw_gemm = tiles * nsub * (27 * c) * sub * c
        mxu_bwd = (z_macs + oh_macs + cat_extra + dw_gemm) / MACS_PER_S
        hbm_bwd = hbm_fwd + (va * c * 2) / HBM_BPS      # feats tiles
        vpu_bwd = vpu_fwd + (tiles * nsub * 27 * 3 * p * c * sub) / VPU_OPS
        floor_bwd = max(mxu_bwd, hbm_bwd, vpu_bwd, dma_fwd)

        # ---- measured ----
        def fwd():
            return ps.windowed_matmul_sub(
                feats, starts, soff, rbl, w9, window=window, tile=tile,
                sub=sub, subwin=subwin)

        def bwd():
            return ps.windowed_bwd_gather(
                dout, feats, starts, soff, rbl, wt9, window=window,
                tile=tile, sub=sub, subwin=subwin, cout=c)

        m_fwd = timed(fwd) * 1e3
        m_bwd = timed(bwd) * 1e3
        abl = {}
        for mode in ("dma", "z", "ohbuild"):
            abl[mode] = timed(lambda mode=mode: ps.windowed_matmul_sub(
                feats, starts, soff, rbl, w9, window=window, tile=tile,
                sub=sub, subwin=subwin, ablate=mode)) * 1e3

        rows.append((li, v, nv, c, p, m_fwd, abl, floor_fwd * 1e3,
                     (mxu_fwd, hbm_fwd, vpu_fwd, dma_fwd),
                     m_bwd, floor_bwd * 1e3,
                     (mxu_bwd, hbm_bwd, vpu_bwd, dma_fwd)))

    def bind(fl):
        names = ("MXU", "HBM", "VPU", "DMA-issue")
        i = int(np.argmax(fl))
        return names[i]

    print("\n| lvl | V (valid/cap) | C | p | fwd ms (dma/z/oh stack) | "
          "fwd floor ms (bound) | bwd ms | bwd floor ms (bound) |")
    print("|---|---|---|---|---|---|---|---|")
    for (li, v, nv, c, p, mf, abl, ff, flf, mb, fb, flb) in rows:
        print(f"| L{li} | {nv}/{v} | {c} | {p} "
              f"| {mf:.1f} ({abl['dma']:.1f}/{abl['z']:.1f}/"
              f"{abl['ohbuild']:.1f}) "
              f"| {ff:.1f} ({bind(flf)}) | {mb:.1f} "
              f"| {fb:.1f} ({bind(flb)}) |")
    print("\nfloors per resource (fwd, ms):")
    for (li, v, nv, c, p, mf, abl, ff, flf, mb, fb, flb) in rows:
        print(f"  L{li}: MXU {flf[0]*1e3:.2f}  HBM {flf[1]*1e3:.2f}  "
              f"VPU {flf[2]*1e3:.2f}  DMA {flf[3]*1e3:.2f}")


if __name__ == "__main__":
    main()
