"""Fused Pallas kernel for the windowed-MXU submanifold convolution.

Replaces the XLA einsum path in :mod:`tdwss.ops.sparse_conv`
(`_win_matmul` / `_win_dw`) on TPU.  The einsum path materializes the
per-tile one-hot tensors and gathered windows in HBM (~GBs per conv) and
issues tiles x 9 slice-gathers; this kernel keeps everything in VMEM:

  per grid step (one tile of T voxel rows):
    1. nwin window DMAs  feats3[starts[t,j] : +W]  (HBM -> VMEM, double
       buffered across steps; feats3 is the (V, C) source padded to 128
       lanes and viewed (V/8, 8, L) so the copies are tile-aligned
       leading-dim slices — Mosaic requires lane counts % 128 == 0).
    2. per anchor j: Z_j = win_j @ W9_j          (W, L) @ (L, Cout)  MXU
    3. out_tile = sum_j onehot(rb_local[:, j]) @ Z_j   (T, W) @ (W, Cout)
       with the one-hot built in-register from an iota comparison
       (sentinel rb_local == W compares false everywhere -> zero row).

The Z-first ordering ("transform the window, then gather") costs
9W(3C + T)·Cout MACs per tile versus the einsum path's gather-first
9TW·3C + T·27C·Cout — cheaper whenever Cout < 3C, and every operand it
touches stays on-chip.

The kernels are generic over the tap count (= rb rows): the 27-tap subm
form (tdwss.ops.plan.Windowed27) rides 9 shared (dy,dz) windows (taps of
a group differ by +-1 physical row) and leaves only ~0.1M window spills
at V=636k; the cross-level WindowedGather forms reuse them at f^3 taps.
(An earlier 9-anchor x-triple form left 1.2M structural residual entries
whose correction dominated the conv — 64 ms of a 59 ms fwd — and was
dropped.)

The backward pass reuses this same kernel for dfeats (transposed conv ==
same windows/rulebook with flipped-transposed weights, see
tdwss/ops/sparse_conv.py) plus a dW kernel accumulating
  dW9_j += win_j^T @ (onehot_j^T @ dout_tile)
across the sequential grid in a VMEM scratch, emitted at the last step.

Reference parity: this computes scn.SubmanifoldConvolution's rulebook
gather-GEMM (reference models/SparseConvNet.py usage) exactly; the
residual-correction entries (window spills, missing-anchor diagonals) are
applied OUTSIDE this kernel by tdwss.ops.sparse_conv's spill tiers
(_res_tile_apply / _res_heavy_apply / _res_ovf_apply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_pad(c: int) -> int:
    return ((c + 127) // 128) * 128


# Experimental: build the one-hot compare in bf16 (window-local values
# <= 2048 are exact in bf16's 8-bit mantissa... only up to 256; subwin
# defaults to 256 so sub-kernels qualify).  Whether Mosaic packs bf16
# VPU compares 2-per-lane on v5e is measured, not assumed.
_OH_BF16 = bool(__import__("os").environ.get("TDWSS_OH_BF16"))


def _onehot(rbs, iota, dtype, axis_expand):
    """(len(rbs), len(iota)) or transposed one-hot in ``dtype``.

    axis_expand=1: oh[i, j] = rbs[i] == iota[j] (iota pre-broadcast);
    the caller passes broadcast-ready operands — this helper only picks
    the compare dtype.
    """
    if _OH_BF16 and iota.shape[-1] <= 256:
        return (rbs.astype(jnp.bfloat16) == iota.astype(jnp.bfloat16)
                ).astype(dtype)
    return (rbs == iota).astype(dtype)


# Replace the one-hot build + MXU matmul of the gather direction (fwd,
# dfeats) with Mosaic's tpu.dynamic_gather (jnp.take_along_axis at equal
# 2D shapes): out[i] = z[rb[i]] as a VPU row shuffle.  The one-hot build
# is the kernel's measured majority (VPU compare+convert scales with
# T x width), so this is worth a flag until on-chip numbers pick the
# winner.  dW keeps the one-hot (scatter direction has no gather form).
_GATHER_INNER = bool(__import__("os").environ.get("TDWSS_GATHER_INNER"))

# Transposed-accumulate form: compute acc^T (cout, sub) += zs^T-contraction
# via dot_general((0,),(0,)) so the one-hot matmul's N dimension is sub
# (=128, full MXU lanes) instead of cout (=32 at L0 -> 25% lanes), and the
# one-hot build broadcasts rb along SUBLANES (cheap) instead of lanes.
# Measured on v5e (bench L0-L2 probes): f+b 73.4 -> 37.3 ms at C=32,
# 42.6 -> 26.0 at C=64, but the fwd LOSES at C=96 (6.8 -> 9.8 ms) where
# the plain form's N=cout already fills most lanes.  Default: auto by
# cout; TDWSS_OH_T=1/0 forces.
_OH_T_ENV = __import__("os").environ.get("TDWSS_OH_T", "").strip()

# Force the sub kernels to transform Z per sub-window slice instead of
# once into the shared zbuf (probe knob: trades ~1.6x more Z MXU work for
# zero zbuf write/read traffic).
_Z_ONDEMAND = bool(__import__("os").environ.get("TDWSS_Z_ONDEMAND"))
# Force the shared zbuf even when nsub*swk < window (probe knob: the
# on-demand Z at wide group layouts pays f32->bf16 converts + stack
# temporaries per (sub, group) that the MXU-work heuristic ignores).
_Z_FORCE_BUF = bool(__import__("os").environ.get("TDWSS_Z_BUF"))


def _oh_t(n_chan: int) -> bool:
    if _OH_T_ENV:
        return _OH_T_ENV not in ("0", "false", "off")
    return n_chan <= 64


# Packed-row layout: view a (V, C) source with C <= 64 as (V/p, 128)
# rows holding p voxels each (p = 128 / lane_pad32(C)).  Window DMAs, the
# Z-transform and the one-hot matmuls then run at FULL 128-lane width
# instead of the 25% (C=32) / 50% (C=64) utilization of the naive
# lane-padded layout — the (8,128)-tiled HBM layout of a (V, 32) array
# physically stores 128 lanes per row anyway, so the unpacked window DMA
# moves 4x more bytes for the same voxels.  Requires window starts and
# sub-offsets aligned to 8*p source rows (host_plan.WIN_ALIGN == 32
# covers p <= 4) and window/subwin multiples of 8*p.  Implemented on the
# transposed-accumulate (_oh_t) path only, which already owns cout <= 64.
_PACK = __import__("os").environ.get("TDWSS_PACK", "1").strip() not in (
    "0", "false", "off")


def _pack_p(c3: int, cout: int, v_src: int, *aligned_dims: int) -> int:
    """Voxels per 128-lane packed row (1 = unpacked legacy layout).

    ``aligned_dims``: every width/offset-granularity the caller DMAs at
    (window, subwin, ...) — each must be a multiple of 8*p, as must the
    source capacity.  Window starts / sub-offsets are 8*p-aligned by
    construction (host_plan.WIN_ALIGN == 32 >= 8*4).
    """
    # _OH_BF16 is incompatible (Mosaic rejects the bf16 compare shapes
    # the packed iotas produce: "Target does not support this
    # comparison") — the experimental knob falls back to unpacked.
    if not _PACK or not _oh_t(cout) or _GATHER_INNER or _OH_BF16:
        return 1
    if c3 <= 32:
        p = 4
    elif c3 <= 64:
        p = 2
    else:
        return 1
    if v_src % (8 * p) or any(d % (8 * p) for d in aligned_dims if d):
        return 1
    return p


def _pack_src(feats3: jnp.ndarray, p: int) -> jnp.ndarray:
    """(V, C) -> (V/p, 128): p voxels per row, channels padded to 128/p."""
    v, c3 = feats3.shape
    cpad = 128 // p
    if c3 != cpad:
        feats3 = jnp.pad(feats3, ((0, 0), (0, cpad - c3)))
    return feats3.reshape(v // p, 128)


def _pack_w(w9: jnp.ndarray, p: int) -> jnp.ndarray:
    """(na, 128, Cout) lane-padded weights -> (na, 128, p*Cout) block-diag.

    w9p[a, b*cpad + i, d*cout + o] = (b == d) * w9[a, i, o] so the packed
    Z-transform win_p (W/p, 128) @ w9p[a] emits p voxels' transforms side
    by side in the lane dim: Z[r, b*cout:(b+1)*cout] = feats[p*r+b] @ W_a.
    """
    na, _, cout = w9.shape
    cpad = 128 // p
    wblk = w9[:, :cpad, :]                             # (na, cpad, cout)
    idx = jnp.arange(p)
    w9p = jnp.zeros((na, p, cpad, p, cout), w9.dtype)
    w9p = w9p.at[:, idx, :, idx, :].set(
        jnp.broadcast_to(wblk[None], (p, na, cpad, cout)))
    return w9p.reshape(na, 128, p * cout)


def _group_w(w9: jnp.ndarray, nwin: int) -> jnp.ndarray:
    """(nanchor, L, zc) per-tap weights -> (nwin, L, m*slot) group layout.

    The m = nanchor/nwin taps sharing window group g (tap a -> group
    a % nwin, _anchor_gmap) concatenate along lanes so the kernel's
    Z-transform runs ONE (W, L) @ (L, m*slot) matmul per group instead
    of m small ones.  Each tap's block is padded to slot = lane_pad(zc)
    so the kernel's per-tap lane slices stay 128-tile-aligned; the MXU
    pads N to 128-lane groups anyway, so the padding adds no MXU time.
    """
    na, l, zc = w9.shape
    m = na // nwin
    slot = _lane_pad(zc)
    if slot != zc:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, slot - zc)))
    idx = np.arange(na).reshape(m, nwin).T.reshape(-1)   # [g*m + j] = g+j*nwin
    return w9[idx].reshape(nwin, m, l, slot).transpose(
        0, 2, 1, 3).reshape(nwin, l, m * slot)


def _blk_select(res, blk, p: int, cout: int, sub: int):
    """(p*cout, sub) packed-transform columns -> (cout, sub) per-row block.

    res rows hold p voxel-blocks' channels; output row i must take block
    ``blk[i]``.  Sublane-dim reshape (p*cout -> (p, cout)) is a free view;
    the select is p masked adds on the VPU.
    """
    res3 = res.reshape(p, cout, sub)
    biota = jax.lax.broadcasted_iota(jnp.int32, (p, sub), 0)
    bm = (blk[None, :] == biota).astype(res.dtype)
    return (res3 * bm[:, None, :]).sum(axis=0)


def _gather_rows(zs, rbs, nrows: int, width: int):
    """(nrows, C): zs[rbs[i]] for live rows, 0 where rbs[i] >= width.

    ``zs`` is (width, C); ``rbs`` (nrows,) window-local rows with
    sentinel == width.  Requires nrows <= width (take_along_axis needs
    indices.shape == operand.shape, so rbs is padded up to width).
    """
    c = zs.shape[-1]
    idx = jnp.minimum(rbs, width - 1)
    g = jnp.take_along_axis(
        zs, jnp.broadcast_to(idx[:, None], (nrows, c)), axis=0,
        mode="promise_in_bounds")
    return jnp.where((rbs < width)[:, None], g, 0)


def _anchor_gmap(nanchor: int, nwin: int) -> tuple:
    """Static anchor->window map: group = tap % nwin.

    One rule covers every form because tap orderings put the
    smallest-row-shift dimension fastest: the 27-tap subm form (x fastest
    -> k%9 is the (dy,dz) pair, k%3 the dz), and cross-level gathers
    grouped by the child z parity
    (child_offset has oz fastest, so k % stride separates the fine
    z-slabs a coarse tile's children straddle).
    """
    if nanchor % nwin:
        raise ValueError(f"nwin {nwin} must divide anchor count {nanchor}")
    return tuple(k % nwin for k in range(nanchor))


def _win_fwd_kernel(gmap: tuple, w8: int, t: int, zcols: int, ablate: str,
                    pack: int,
                    starts_ref, src_ref, rb_ref, w9_ref, out_ref,
                    win, sems):
    """One tile: DMA the shared windows, grouped Z-transform, one-hot
    matmuls.

    ``gmap[a]`` is the shared-window slot for tap ``a`` (tap %% nwin) —
    len(set(gmap)) DMAs feed all taps; the scalar core pays ~2 us per DMA
    descriptor, so fewer windows win even though each is wider.  Z runs
    one (W, L) @ (L, m*slot) matmul per window group (w9_ref is the
    _group_w layout — see _sub_fwd_kernel).

    ``ablate`` is a benchmarking aid ("" production): "dma" skips the
    matmuls, "compute" skips the DMAs (reads whatever is in scratch),
    "z" runs DMAs + Z-transforms but no one-hot matmuls.
    """
    step = pl.program_id(0)
    w = w8 * 8
    nwin = max(gmap) + 1
    m = len(gmap) // nwin

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(starts_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    if ablate != "compute":
        @pl.when(step == 0)
        def _():
            for j in range(nwin):
                get_dma(0, 0, j).start()

        @pl.when(step + 1 < pl.num_programs(0))
        def _():
            for j in range(nwin):
                get_dma(nxt, step + 1, j).start()

        for j in range(nwin):
            get_dma(cur, step, j).wait()

    l = win.shape[-1]
    cout = zcols // pack
    slot = w9_ref.shape[-1] // m
    shift = pack.bit_length() - 1
    if ablate == "dma":
        out_ref[:] = (win[cur, 0, :1].reshape(8, l)[:1, :cout]
                      * jnp.zeros((t, cout), jnp.float32)
                      ).astype(out_ref.dtype)
        return
    if _oh_t(cout) and ablate == "":
        # Transposed accumulate (see _sub_fwd_kernel): the one-hot build
        # broadcasts rb along SUBLANES (cheap) instead of lanes, and the
        # matmul's N dim is t (128+) instead of cout (often 32).
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
        acc_t = jnp.zeros((cout, t), jnp.float32)
        for g in range(nwin):
            win_g = win[cur, g].reshape(w, l)
            zg = jnp.dot(win_g, w9_ref[g],
                         preferred_element_type=jnp.float32
                         ).astype(win_g.dtype)
            for j in range(m):
                a = g + j * nwin
                z = zg[:, j * slot:j * slot + zcols]
                rbs = rb_ref[a, :]
                rows = rbs >> shift if pack > 1 else rbs
                oh_t = _onehot(rows[None, :], iota_t, win_g.dtype, 0)
                res = jax.lax.dot_general(
                    z, oh_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if pack > 1:
                    res = _blk_select(res, rbs & (pack - 1), pack, cout, t)
                acc_t = acc_t + res
        out_ref[:] = acc_t.T.astype(out_ref.dtype)
        return
    acc = jnp.zeros((t, cout), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    for g in range(nwin):
        win_g = win[cur, g].reshape(w, l)
        zg = jnp.dot(win_g, w9_ref[g],
                     preferred_element_type=jnp.float32).astype(win_g.dtype)
        for j in range(m):
            a = g + j * nwin
            z = zg[:, j * slot:j * slot + zcols]
            if ablate == "z":
                acc = acc + z[:t, :cout].astype(jnp.float32)
                continue
            if _GATHER_INNER and t <= w:
                acc = acc + _gather_rows(z, rb_ref[a, :], t, w).astype(
                    jnp.float32)
                continue
            oh = _onehot(rb_ref[a, :][:, None], iota, win_g.dtype, 1)
            acc = acc + jnp.dot(oh, z, preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "interpret", "ablate"))
def windowed_matmul(feats3: jnp.ndarray, starts: jnp.ndarray,
                    rb_local_t: jnp.ndarray, w9: jnp.ndarray,
                    window: int, tile: int,
                    interpret: bool = False, ablate: str = "") -> jnp.ndarray:
    """sum_a onehot(rb_local[:, a], W) @ (window_{g(a)} @ w9[a]) -> (V, Cout).

    feats3     (V, C3)  source rows (feats fwd, cotangents in the
               transposed-conv backward); V % 8 == 0
    starts     (tiles * nwin,) int32 shared-window starts, multiples of 8,
               in [0, V - window]; anchor->window map: _anchor_gmap
    rb_local_t (nanchor, V) int32 window-local positions (sentinel >=
               window); nanchor in {9, 27}
    w9         (nanchor, C3p, Cout) weight blocks, C3p = lane-padded C3
               (zero rows beyond C3)
    """
    v_src, c3 = feats3.shape
    v_out = rb_local_t.shape[1]
    cout = w9.shape[-1]
    nanchor = rb_local_t.shape[0]
    if v_out % tile or window % 8 or v_src % 8:
        raise ValueError("v_out % tile, window % 8, v_src % 8 must be 0")
    tiles = v_out // tile
    nwin = starts.shape[0] // tiles
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(c3, cout, v_src, window) if ablate == "" else 1
    if p > 1:
        feats3 = _pack_src(feats3, p)
        w9 = _pack_w(w9, p)
        l = 128
    else:
        l = _lane_pad(c3)
        if w9.shape[1] != l:
            raise ValueError(f"w9 second dim must be lane-padded to {l}")
        if c3 != l:
            feats3 = jnp.pad(feats3, ((0, 0), (0, l - c3)))
    w9 = w9.astype(feats3.dtype)   # bf16 halves the VMEM weight block
    src = feats3.reshape(v_src // p // 8, 8, l)
    starts = starts // (8 * p)  # block index into the (V/p/8, 8, L) view
    w8p = window // (8 * p)
    zcols = p * cout
    m = nanchor // nwin
    slot = _lane_pad(zcols)
    w9g = _group_w(w9, nwin)       # (nwin, l, m*slot) group layout

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((nwin, l, m * slot), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w9 (grouped)
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nwin, w8p, 8, l), feats3.dtype),
            pltpu.SemaphoreType.DMA((2, nwin)),
        ],
    )
    kernel = functools.partial(_win_fwd_kernel, gmap, w8p, tile,
                               zcols, ablate, p)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, src, rb_local_t, w9g)


def _win_dw_kernel(gmap: tuple, w8: int, t: int, pack: int,
                   starts_ref, src_ref, rb_ref, dout_ref, dw_ref,
                   win, acc, sems):
    """dW9_a += win_{g(a)}^T @ (onehot_a^T @ dout_tile), emitted at last
    step.  ``gmap`` as in :func:`_win_fwd_kernel`; ``pack`` as in
    :func:`_sub_dw_kernel` (per-block one-hots into acc slot (a, b))."""
    step = pl.program_id(0)
    w = w8 * 8
    nwin = max(gmap) + 1

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(starts_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        for j in range(nwin):
            get_dma(0, 0, j).start()
        acc[...] = jnp.zeros_like(acc)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        for j in range(nwin):
            get_dma(nxt, step + 1, j).start()

    for j in range(nwin):
        get_dma(cur, step, j).wait()

    l = win.shape[-1]
    shift = pack.bit_length() - 1
    cout = dout_ref.shape[-1]
    dout = dout_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
    for a in range(len(gmap)):
        win_a = win[cur, gmap[a]].reshape(w, l)
        rbs = rb_ref[a, :]
        rows = rbs >> shift if pack > 1 else rbs
        oh_t = _onehot(rows[None, :], iota, dout.dtype, 0)
        # block index in the LANE dim (see _sub_dw_kernel / _blk_expand):
        # one full-lane scatter matmul + one full-lane window GEMM per
        # anchor replace pack per-block pairs at cout lanes each
        dexp = (_blk_expand(dout, rbs & (pack - 1), pack, cout, t)
                if pack > 1 else dout)
        s = jnp.dot(oh_t, dexp,
                    preferred_element_type=jnp.float32).astype(dout.dtype)
        acc[a] += jax.lax.dot_general(
            win_a, s, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(step + 1 == pl.num_programs(0))
    def _():
        dw_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "interpret"))
def windowed_dw(feats3: jnp.ndarray, starts: jnp.ndarray,
                rb_local_t: jnp.ndarray, dout: jnp.ndarray,
                window: int, tile: int,
                interpret: bool = False) -> jnp.ndarray:
    """dW (nanchor, C3p, Cout) f32 = sum_v windows^T (x) dout rows."""
    v_src, c3 = feats3.shape
    v_out = rb_local_t.shape[1]
    cout = dout.shape[-1]
    nanchor = rb_local_t.shape[0]
    if v_out % tile or window % 8 or v_src % 8:
        raise ValueError("v_out % tile, window % 8, v_src % 8 must be 0")
    tiles = v_out // tile
    nwin = starts.shape[0] // tiles
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(c3, cout, v_src, window)
    if p > 1:
        feats3 = _pack_src(feats3, p)
        l = 128
    else:
        l = _lane_pad(c3)
        if c3 != l:
            feats3 = jnp.pad(feats3, ((0, 0), (0, l - c3)))
    src = feats3.reshape(v_src // p // 8, 8, l)
    starts = starts // (8 * p)  # block index into the (V/p/8, 8, L) view
    dout = dout.astype(feats3.dtype)
    w8p = window // (8 * p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),              # dout
        ],
        out_specs=pl.BlockSpec((nanchor, l, p * cout),
                               lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nwin, w8p, 8, l), feats3.dtype),
            pltpu.VMEM((nanchor, l, p * cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nwin)),
        ],
    )
    kernel = functools.partial(_win_dw_kernel, gmap, w8p, tile, p)
    dwf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nanchor, l, p * cout),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, src, rb_local_t, dout)
    if p == 1:
        return dwf
    # diagonal block extraction — see windowed_dw_sub
    dw5 = dwf.reshape(nanchor, p, l // p, p, cout)
    return sum(dw5[:, b, :, b, :] for b in range(p))


def pad_w9(w9: jnp.ndarray) -> jnp.ndarray:
    """(9, C3, Cout) -> (9, lane_pad(C3), Cout) with zero padding rows."""
    c3 = w9.shape[1]
    l = _lane_pad(c3)
    if l == c3:
        return w9
    return jnp.pad(w9, ((0, 0), (0, l - c3), (0, 0)))


def _sub_fwd_kernel(gmap: tuple, w8: int, t: int, sub: int, swk8: int,
                    soff_base: int, pack: int, zcols: int, ablate: str,
                    scal_ref, src_ref, rb_ref, w9_ref, out_ref,
                    win, zbuf, sems):
    """Two-level tile: big-window DMAs + grouped Z, sub-window one-hots.

    The one-hot construction (VPU) and its matmul scale with T x width;
    sub-tiles of ``sub`` rows read a ``swk8*8``-wide slice of the Z
    buffer (measured: the one-hot build is ~17 ms of the 25 ms kernel at
    W=640 — sub-windows cut that width 2.5-5x at ~equal spill rates).

    ``pack`` > 1: the source rows hold ``pack`` voxels each (see _PACK);
    ``w8``/``swk8`` count PACKED rows, rb_ref stays voxel-local (row =
    rb >> log2(pack), block = rb & (pack-1)), and the Z output carries
    pack voxel-blocks in the lane dim, resolved by _blk_select.

    Z-transforms batch per WINDOW GROUP: the m = nanchor/nwin taps that
    share window g transform in ONE (W, L) @ (L, m*zslot) matmul; w9_ref
    carries the lane-concatenated group layout (_group_w) with slot
    width ``zslot`` = zcols rounded up to 128 so per-tap slices stay
    lane-tile-aligned (the MXU pads N to 128-lane groups anyway, so the
    slot padding costs nothing).  Measured motivation: the 27 per-tap Z
    matmuls at L0 ran ~180 ns each — small-op issue overhead, not FLOPs
    (~6 ms of a 10 ms forward).
    """
    step = pl.program_id(0)
    w = w8 * 8
    swk = swk8 * 8
    nwin = max(gmap) + 1
    m = len(gmap) // nwin            # taps per window group
    nsub = t // sub
    shift = pack.bit_length() - 1    # log2(pack); voxel rb -> packed row
    nbuf = win.shape[0]              # DMA pipeline depth (>= 2)

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(scal_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, nbuf)

    if ablate != "compute":
        @pl.when(step == 0)
        def _():
            for k in range(nbuf - 1):
                @pl.when(k < pl.num_programs(0))
                def _():
                    for j in range(nwin):
                        get_dma(k, k, j).start()

        @pl.when(step + nbuf - 1 < pl.num_programs(0))
        def _():
            nxt = jax.lax.rem(step + nbuf - 1, nbuf)
            for j in range(nwin):
                get_dma(nxt, step + nbuf - 1, j).start()

        for j in range(nwin):
            get_dma(cur, step, j).wait()

    l = win.shape[-1]
    cout = zcols // pack
    if ablate == "dma":
        out_ref[:] = (win[cur, 0, :1].reshape(8, l)[:1, :cout]
                      * jnp.zeros((t, cout), jnp.float32)
                      ).astype(out_ref.dtype)
        return
    # The full-width Z-transform costs nanchor x W rows of MXU work but
    # only nsub x swk rows are ever read through the sub-window slices —
    # for the cross-level gathers (tile 256, sub 128, W 1024-2560) that is
    # a 2-5x overshoot, so transform each slice on demand instead.  The
    # subm form (tile 512, W 640) keeps the shared buffer: its slices
    # overlap enough that the full transform is cheaper.
    z_ondemand = (nsub * swk < w or _Z_ONDEMAND) and not _Z_FORCE_BUF
    gz = w9_ref.shape[-1]             # m * slot
    slot = gz // m                    # per-tap lane slot (zcols -> 128-pad)

    if not z_ondemand:
        for g in range(nwin):
            win_g = win[cur, g].reshape(w, l)
            z = jnp.dot(win_g, w9_ref[g], preferred_element_type=jnp.float32)
            zbuf[g] = z.astype(win_g.dtype).reshape(w8, 8, gz)

    def get_zs_g(g, off8):
        """(swk, m*slot) group Z slice; tap j at lanes [j*slot, +zcols)."""
        if z_ondemand:
            sl = win[cur, g, pl.ds(off8, swk8)].reshape(swk, l)
            return jnp.dot(sl, w9_ref[g],
                           preferred_element_type=jnp.float32
                           ).astype(sl.dtype)
        return zbuf[g, pl.ds(off8, swk8)].reshape(swk, gz)

    if _oh_t(cout):
        # Transposed accumulate: acc^T (cout, sub) += zs^T @ oh^T.  The
        # plain form's one-hot matmul has N=cout (32 at L0 -> 25% MXU
        # lanes); flipped, N=sub=128 fills the lanes.  Costs one (swk,
        # cout) -> (cout, swk) transpose per (anchor, sub-tile) and a
        # (cout, sub) -> (sub, cout) transpose per sub-tile, both tiny
        # next to the sub x swk one-hot build.
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (swk, sub), 0)
        for s_i in range(nsub):
            acc_t = jnp.zeros((cout, sub), jnp.float32)
            for g in range(nwin):
                off8 = scal_ref[soff_base
                                + (step * nsub + s_i) * nwin + g]
                zs_g = get_zs_g(g, off8)
                for j in range(m):
                    a = g + j * nwin
                    zs = zs_g[:, j * slot:j * slot + zcols]
                    rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
                    rows = rbs >> shift if pack > 1 else rbs
                    if ablate == "z":        # DMAs + Z-transforms only
                        acc_t = acc_t + zs[:cout, :1].astype(jnp.float32)
                        continue
                    oh_t = _onehot(rows[None, :], iota_t, zs.dtype, 0)
                    if ablate == "ohbuild":  # + one-hot build, no matmul
                        acc_t = (acc_t + oh_t[:cout].astype(jnp.float32)
                                 + zs[:cout, :1].astype(jnp.float32))
                        continue
                    res = jax.lax.dot_general(
                        zs, oh_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if pack > 1 and ablate != "noselect":
                        res = _blk_select(res, rbs & (pack - 1), pack,
                                          cout, sub)
                    if pack > 1 and ablate == "noselect":
                        res = res[:cout]
                    acc_t = acc_t + res
            out_ref[s_i * sub:(s_i + 1) * sub] = acc_t.T.astype(
                out_ref.dtype)
        return

    iota = jax.lax.broadcasted_iota(jnp.int32, (sub, swk), 1)
    for s_i in range(nsub):
        acc = jnp.zeros((sub, cout), jnp.float32)
        for g in range(nwin):
            off8 = scal_ref[soff_base + (step * nsub + s_i) * nwin + g]
            zs_g = get_zs_g(g, off8)
            for j in range(m):
                a = g + j * nwin
                zs = zs_g[:, j * slot:j * slot + zcols]
                rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
                if _GATHER_INNER and sub <= swk:
                    acc = acc + _gather_rows(zs, rbs, sub, swk).astype(
                        jnp.float32)
                    continue
                oh = _onehot(rbs[:, None], iota, zs.dtype, 1)
                acc = acc + jnp.dot(oh, zs,
                                    preferred_element_type=jnp.float32)
        out_ref[s_i * sub:(s_i + 1) * sub] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "sub", "subwin",
                                    "interpret", "ablate"))
def windowed_matmul_sub(feats3: jnp.ndarray, starts: jnp.ndarray,
                        soff: jnp.ndarray, rb_local_t: jnp.ndarray,
                        w9: jnp.ndarray, window: int, tile: int, sub: int,
                        subwin: int, interpret: bool = False,
                        ablate: str = "") -> jnp.ndarray:
    """Two-level windowed gather-GEMM -> (V_out, Cout) in feats3's dtype
    (f32 accumulation inside the kernel; bf16 out under production).

    soff (tiles * (tile/sub) * nwin,) int32 8-aligned sub-window offsets
    within the big window; rb_local_t (nanchor, V_out) relative to
    (start + soff), sentinel >= subwin.
    """
    v_src, c3 = feats3.shape
    v_out = rb_local_t.shape[1]
    cout = w9.shape[-1]
    nanchor = rb_local_t.shape[0]
    if (v_out % tile or window % 8 or v_src % 8 or tile % sub
            or subwin % 8 or subwin > window):
        raise ValueError("bad sub-window geometry")
    tiles = v_out // tile
    nsub = tile // sub
    nwin = soff.shape[0] // (tiles * nsub)
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(c3, cout, v_src, window, subwin)
    if p > 1:
        feats3 = _pack_src(feats3, p)
        w9 = _pack_w(w9, p)
        l = 128
    else:
        l = _lane_pad(c3)
        if w9.shape[1] != l:
            raise ValueError(f"w9 second dim must be lane-padded to {l}")
        if c3 != l:
            feats3 = jnp.pad(feats3, ((0, 0), (0, l - c3)))
    w9 = w9.astype(feats3.dtype)   # bf16 halves the VMEM weight block
    src = feats3.reshape(v_src // p // 8, 8, l)
    scal = jnp.concatenate([starts // (8 * p), soff // (8 * p)])
    nstarts = starts.shape[0]
    w8p, swk8p = window // (8 * p), subwin // (8 * p)
    zcols = p * cout
    nwin_g = max(gmap) + 1
    m = nanchor // nwin_g
    slot = _lane_pad(zcols)
    w9g = _group_w(w9, nwin_g)     # (nwin, l, m*slot) group layout

    kernel = functools.partial(_sub_fwd_kernel, gmap, w8p, tile,
                               sub, swk8p, nstarts, p, zcols, ablate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((nwin_g, l, m * slot), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w9 (grouped)
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # packed windows are 1/p the bytes — spend the headroom on a
            # deeper DMA pipeline (the 2-buffer lookahead left the packed
            # kernel ~50% DMA-bound at ~110 GB/s)
            pltpu.VMEM((4 if p > 1 else 2, nwin_g, w8p, 8, l),
                       feats3.dtype),
            # on-demand Z (nsub*swk < window) never touches zbuf
            pltpu.VMEM((nwin_g, w8p, 8, m * slot), feats3.dtype)
            if ((tile // sub) * subwin >= window or _Z_FORCE_BUF)
            else pltpu.VMEM((1, 1, 8, m * slot), feats3.dtype),
            pltpu.SemaphoreType.DMA((4 if p > 1 else 2, nwin_g)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, src, rb_local_t, w9g)


def _sub_bwd_gather_kernel(gmap: tuple, w8: int, t: int, sub: int,
                          swk8: int, soff_base: int, pack: int, cin: int,
                          zcols: int,
                          scal_ref, src_ref, rb_ref, w9_ref, feats_ref,
                          dx_ref, dw_ref, win, zbuf, acc, sems):
    """Fused backward via rulebook flip-symmetry: dfeats AND dW from ONE
    window-DMA set over the COTANGENT source and ONE transposed one-hot
    per (sub-tile, anchor).

    The 27-tap submanifold rulebook satisfies rb[v,k] = u <=>
    rb[u, 26-k] = v (centred kernel over one coordinate set), so the dW
    sum over forward entries re-indexes over BACKWARD entries:

        dW[26-k] = sum_v feats[v] (x) dout[rb[v, k]]

    i.e. exactly the rows the dfeats evaluation already gathers — before
    the Z-transform.  Per (sub, anchor) the kernel therefore adds to the
    dfeats product only: one raw-window one-hot matmul (reusing the oh_t
    already built), a pack-block select, and a batched (nanchor*cout, sub)
    @ (sub, cin) GEMM per sub-tile against the tile's OWN feats rows
    (plain BlockSpec input — output-domain order, no gather, no sbuf
    scatter, no [feats | dout] concat, so p=4 packing survives, unlike
    windowed_bwd_sub whose concat halves the pack and whose scatter
    machinery made it lose to the unfused pair).

    The spill-tier dW/dfeats corrections stay OUTSIDE (same partition of
    rb as the forward: windowed entries here, spill entries in
    tdwss.ops.sparse_conv._res_all_*, so every rb entry is counted
    exactly once).

    ``src``/windows carry the packed cotangent (c3 = cout); ``w9_ref`` is
    the grouped flipped-transposed weight layout (zcols = pack * cin);
    ``feats_ref`` the (tile, cin) primal rows; ``acc`` (nanchor*cout,
    cin) f32, emitted at the last grid step.  The caller maps slot a ->
    dW[26-a]^T.
    """
    step = pl.program_id(0)
    w = w8 * 8
    swk = swk8 * 8
    nwin = max(gmap) + 1
    m = len(gmap) // nwin
    nsub = t // sub
    shift = pack.bit_length() - 1
    nbuf = win.shape[0]

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(scal_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, nbuf)

    @pl.when(step == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        for k in range(nbuf - 1):
            @pl.when(k < pl.num_programs(0))
            def _():
                for j in range(nwin):
                    get_dma(k, k, j).start()

    @pl.when(step + nbuf - 1 < pl.num_programs(0))
    def _():
        nxt = jax.lax.rem(step + nbuf - 1, nbuf)
        for j in range(nwin):
            get_dma(nxt, step + nbuf - 1, j).start()

    for j in range(nwin):
        get_dma(cur, step, j).wait()

    l = win.shape[-1]
    cpad = l // pack                 # lanes per packed voxel block
    nanchor = len(gmap)
    z_ondemand = (nsub * swk < w) and not _Z_FORCE_BUF
    gz = w9_ref.shape[-1]
    slot = gz // m

    if not z_ondemand:
        for g in range(nwin):
            win_g = win[cur, g].reshape(w, l)
            z = jnp.dot(win_g, w9_ref[g], preferred_element_type=jnp.float32)
            zbuf[g] = z.astype(win_g.dtype).reshape(w8, 8, gz)

    def get_zs_g(g, off8):
        if z_ondemand:
            sl = win[cur, g, pl.ds(off8, swk8)].reshape(swk, l)
            return jnp.dot(sl, w9_ref[g],
                           preferred_element_type=jnp.float32
                           ).astype(sl.dtype)
        return zbuf[g, pl.ds(off8, swk8)].reshape(swk, gz)

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (swk, sub), 0)
    biota = jax.lax.broadcasted_iota(jnp.int32, (pack, sub), 0)
    for s_i in range(nsub):
        fts = feats_ref[s_i * sub:(s_i + 1) * sub, :]       # (sub, cin)
        dx_acc_t = jnp.zeros((cin, sub), jnp.float32)
        cout = dw_ref.shape[0] // nanchor
        g_rows = [None] * nanchor
        for g in range(nwin):
            off8 = scal_ref[soff_base + (step * nsub + s_i) * nwin + g]
            zs_g = get_zs_g(g, off8)
            wsl = win[cur, g, pl.ds(off8, swk8)].reshape(swk, l)
            for j in range(m):
                a = g + j * nwin
                zs = zs_g[:, j * slot:j * slot + zcols]
                rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
                rows = rbs >> shift if pack > 1 else rbs
                oh_t = _onehot(rows[None, :], iota_t, zs.dtype, 0)
                # ONE dot drives both products: the Z-transformed slice
                # (dfeats) and the raw window rows (dW gather) share the
                # contraction dim, so lane-concatenation halves the
                # small-matmul issue count (the 27 per-tap Z matmuls at
                # L0 measured ~180 ns each of pure issue overhead)
                cat = jnp.concatenate([zs, wsl.astype(zs.dtype)], axis=1)
                both = jax.lax.dot_general(
                    cat, oh_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                res, graw = both[:zs.shape[1]], both[zs.shape[1]:]
                if pack > 1:
                    res = _blk_select(res, rbs & (pack - 1), pack, cin,
                                      sub)
                dx_acc_t = dx_acc_t + res
                if pack > 1:
                    g3 = graw.reshape(pack, cpad, sub)[:, :cout, :]
                    bm = ((rbs[None, :] & (pack - 1)) == biota).astype(
                        graw.dtype)
                    gsel = (g3 * bm[:, None, :]).sum(axis=0)
                else:
                    gsel = graw[:cout]
                # bf16 round-trip is lossless: each gsel element is one
                # one-hot-selected bf16 cotangent value (or zero)
                g_rows[a] = gsel.astype(fts.dtype)
        gcat = jnp.concatenate(g_rows, axis=0)   # (nanchor*cout, sub)
        acc[...] += jax.lax.dot_general(
            gcat, fts, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[s_i * sub:(s_i + 1) * sub] = dx_acc_t.T.astype(dx_ref.dtype)

    @pl.when(step + 1 == pl.num_programs(0))
    def _():
        dw_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "sub", "subwin",
                                    "cout", "flip_taps", "interpret"))
def windowed_bwd_gather(dout: jnp.ndarray, feats: jnp.ndarray,
                        starts: jnp.ndarray, soff: jnp.ndarray,
                        rb_local_t: jnp.ndarray, wt9: jnp.ndarray,
                        window: int, tile: int, sub: int, subwin: int,
                        cout: int, flip_taps: bool = True,
                        interpret: bool = False):
    """Fused symmetric backward -> (dfeats (V_out, cin) in dout's dtype,
    dW (K, cin, cout) f32).

    dout (V_src, cout): the cotangent — the gather source (windows/DMA).
    feats (V_out, cin): the primal rows, consumed tile-aligned for dW.
    wt9 (nanchor, Lp, cin): lane-padded transposed weights feeding the
    dfeats product (subm: wt9[a] = W[26-a]^T; wg: wt9[a] = W[a]^T).
    ``flip_taps``: rb-slot -> dW-tap mapping.  True for the submanifold
    form (rb[v,a] entries contribute to dW[26-a] via the centred-kernel
    flip symmetry); False for cross-level WindowedGather backwards,
    where the tap index (child_offset) is identical in both rulebook
    directions (tdwss.ops.sparse_conv module docstring).
    Returns dW in RAW tap order (k, cin, cout), mapping already applied.
    """
    v_src, c3 = dout.shape
    cin = wt9.shape[-1]
    v_out = rb_local_t.shape[1]
    nanchor = rb_local_t.shape[0]
    if (v_out % tile or window % 8 or v_src % 8 or tile % sub
            or subwin % 8 or subwin > window):
        raise ValueError("bad sub-window geometry")
    tiles = v_out // tile
    nsub = tile // sub
    nwin = soff.shape[0] // (tiles * nsub)
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(c3, cin, v_src, window, subwin)
    if p > 1:
        dout_p = _pack_src(dout, p)
        wt9 = _pack_w(wt9, p)
        l = 128
    else:
        l = _lane_pad(c3)
        if wt9.shape[1] != l:
            raise ValueError(f"wt9 second dim must be lane-padded to {l}")
        dout_p = (jnp.pad(dout, ((0, 0), (0, l - c3)))
                  if c3 != l else dout)
    wt9 = wt9.astype(dout.dtype)
    src = dout_p.reshape(v_src // p // 8, 8, l)
    scal = jnp.concatenate([starts // (8 * p), soff // (8 * p)])
    nstarts = starts.shape[0]
    w8p, swk8p = window // (8 * p), subwin // (8 * p)
    zcols = p * cin
    nwin_g = max(gmap) + 1
    m = nanchor // nwin_g
    slot = _lane_pad(zcols)
    w9g = _group_w(wt9, nwin_g)
    feats = feats[:v_out].astype(dout.dtype)

    kernel = functools.partial(_sub_bwd_gather_kernel, gmap, w8p, tile,
                               sub, swk8p, nstarts, p, cin, zcols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src (dout)
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((nwin_g, l, m * slot), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # wt (grouped)
            pl.BlockSpec((tile, cin), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),              # feats tile
        ],
        out_specs=(
            pl.BlockSpec((tile, cin), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),              # dfeats
            pl.BlockSpec((nanchor * cout, cin), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # dW slots
        ),
        scratch_shapes=[
            pltpu.VMEM((4 if p > 1 else 2, nwin_g, w8p, 8, l),
                       dout.dtype),
            pltpu.VMEM((nwin_g, w8p, 8, m * slot), dout.dtype)
            if ((tile // sub) * subwin >= window or _Z_FORCE_BUF)
            else pltpu.VMEM((1, 1, 8, m * slot), dout.dtype),
            pltpu.VMEM((nanchor * cout, cin), jnp.float32),
            pltpu.SemaphoreType.DMA((4 if p > 1 else 2, nwin_g)),
        ],
    )
    dx, dwg = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((v_out, cin), dout.dtype),
                   jax.ShapeDtypeStruct((nanchor * cout, cin),
                                        jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, src, rb_local_t, w9g, feats)
    # slot a accumulated dout[rb[v,a]] (x) feats[v] = dW[26-a]^T (subm
    # flip symmetry) or dW[a]^T (wg: tap == child_offset both ways)
    dw3 = dwg.reshape(nanchor, cout, cin)
    if flip_taps:
        dw3 = dw3[::-1]
    return dx, dw3.transpose(0, 2, 1)            # (K, cin, cout) raw order


def _blk_expand(dsub, blk, pack: int, cout: int, sub: int):
    """dout rows masked into block-column lanes: (sub, pack*cout).

    dexp[j, b*cout + o] = (blk[j] == b) * dsub[j, o] — the block index
    moves into the LANE dimension so one full-128-lane matmul per anchor
    replaces ``pack`` per-block one-hot matmuls at cout lanes each.
    ``cout`` need not be a power of two (iota // cout folds on constants).
    """
    qiota = jax.lax.broadcasted_iota(jnp.int32, (sub, pack * cout), 1)
    bm = (blk[:, None] == qiota // cout).astype(dsub.dtype)
    wide = pltpu.repeat(dsub, pack, axis=1)      # [dsub | dsub | ...]
    return wide * bm


def _sub_dw_kernel(gmap: tuple, w8: int, t: int, sub: int, swk8: int,
                   soff_base: int, pack: int,
                   scal_ref, src_ref, rb_ref, dout_ref, dw_ref,
                   win, sbuf, acc, sems):
    """Two-level dW: per-sub scatter-accumulate oh^T @ dexp into a
    full-width per-anchor buffer, then win^T @ sbuf per anchor.

    ``pack`` > 1 (see _PACK): packed source rows.  The block index rides
    the LANE dimension (_blk_expand): the scatter one-hot targets packed
    ROWS only (p-x smaller compare than the old block-major row fold),
    its matmul and the per-anchor window GEMM run at full 128 output
    lanes, and the accumulator holds (l, pack*cout) per anchor whose
    (b, b) diagonal blocks the caller extracts (off-diagonals pair
    block-b feats with block-b' douts — garbage by construction).
    Measured v5e L0 (V=640k, C=32, p=4): 22.9 -> (see probe_dw) ms."""
    step = pl.program_id(0)
    w = w8 * 8
    swk = swk8 * 8
    nwin = max(gmap) + 1
    nsub = t // sub
    shift = pack.bit_length() - 1    # log2(pack); voxel rb -> packed row

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(scal_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        for j in range(nwin):
            get_dma(0, 0, j).start()
        acc[...] = jnp.zeros_like(acc)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        for j in range(nwin):
            get_dma(nxt, step + 1, j).start()

    for j in range(nwin):
        get_dma(cur, step, j).wait()

    l = win.shape[-1]
    cout = dout_ref.shape[-1]
    zcols = pack * cout
    sbuf[...] = jnp.zeros_like(sbuf)
    iota = jax.lax.broadcasted_iota(jnp.int32, (swk, sub), 0)
    for s_i in range(nsub):
        dsub = dout_ref[s_i * sub:(s_i + 1) * sub, :]
        for a in range(len(gmap)):
            off8 = scal_ref[soff_base + (step * nsub + s_i) * nwin + gmap[a]]
            rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
            rows = rbs >> shift if pack > 1 else rbs
            oh_t = (rows[None, :] == iota).astype(dsub.dtype)
            if pack > 1:
                dexp = _blk_expand(dsub, rbs & (pack - 1), pack, cout, sub)
            else:
                dexp = dsub
            contrib = jnp.dot(oh_t, dexp,
                              preferred_element_type=jnp.float32)
            curs = sbuf[a, pl.ds(off8, swk8)]
            sbuf[a, pl.ds(off8, swk8)] = curs + contrib.reshape(
                swk8, 8, zcols)

    for a in range(len(gmap)):
        win_a = win[cur, gmap[a]].reshape(w, l)
        s_a = sbuf[a].reshape(w, zcols).astype(win_a.dtype)
        acc[a] += jax.lax.dot_general(
            win_a, s_a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(step + 1 == pl.num_programs(0))
    def _():
        dw_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "sub", "subwin",
                                    "interpret"))
def windowed_dw_sub(feats3: jnp.ndarray, starts: jnp.ndarray,
                    soff: jnp.ndarray, rb_local_t: jnp.ndarray,
                    dout: jnp.ndarray, window: int, tile: int, sub: int,
                    subwin: int, interpret: bool = False) -> jnp.ndarray:
    """Two-level dW (nanchor, C3p, Cout) f32."""
    v_src, c3 = feats3.shape
    v_out = rb_local_t.shape[1]
    cout = dout.shape[-1]
    nanchor = rb_local_t.shape[0]
    if (v_out % tile or window % 8 or v_src % 8 or tile % sub
            or subwin % 8 or subwin > window):
        raise ValueError("bad sub-window geometry")
    tiles = v_out // tile
    nsub = tile // sub
    nwin = soff.shape[0] // (tiles * nsub)
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(c3, cout, v_src, window, subwin)
    if p > 1:
        feats3 = _pack_src(feats3, p)
        l = 128
    else:
        l = _lane_pad(c3)
        if c3 != l:
            feats3 = jnp.pad(feats3, ((0, 0), (0, l - c3)))
    src = feats3.reshape(v_src // p // 8, 8, l)
    scal = jnp.concatenate([starts // (8 * p), soff // (8 * p)])
    nstarts = starts.shape[0]
    dout = dout.astype(feats3.dtype)
    w8p, swk8p = window // (8 * p), subwin // (8 * p)

    kernel = functools.partial(_sub_dw_kernel, gmap, w8p, tile,
                               sub, swk8p, nstarts, p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),              # dout
        ],
        out_specs=pl.BlockSpec((nanchor, l, p * cout),
                               lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, max(gmap) + 1, w8p, 8, l), feats3.dtype),
            pltpu.VMEM((nanchor, w8p, 8, p * cout), jnp.float32),
            pltpu.VMEM((nanchor, l, p * cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2, max(gmap) + 1)),
        ],
    )
    dwf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nanchor, l, p * cout),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, src, rb_local_t, dout)
    if p == 1:
        return dwf
    # block b's true dW sits at rows [b*cpad, (b+1)*cpad) x lanes
    # [b*cout, (b+1)*cout) — the off-diagonal blocks pair block-b feats
    # with block-b' douts and are discarded here
    dw5 = dwf.reshape(nanchor, p, l // p, p, cout)
    return sum(dw5[:, b, :, b, :] for b in range(p))


def _sub_bwd_kernel(gmap: tuple, w8: int, t: int, sub: int, swk8: int,
                    soff_base: int, cin: int, pack: int,
                    scal_ref, src_ref, rb_ref, wt_ref, dout_ref,
                    dx_ref, dw_ref, win, zbuf, acc, sems):
    """Fused backward tile: ONE window DMA set + shared one-hot machinery
    for BOTH backward products.

    ``src`` is the channel-concatenated [feats | dout] array; ``wt_ref``
    (nanchor, L, cin) holds the flipped-transposed weights in the DOUT
    lane rows and ZEROS in the feats rows, so the full-width transform
    ``win_a @ wt_ref[a]`` touches only the cotangent channels:

      dfeats_sub += oh_a @ (win_{g(a)} @ Wt[a])[soff slice]
      dW[a]      += win_slice^T @ (oh_a^T @ dout_sub)

    dW rows beyond the feats channels are garbage (they fold the dout
    lanes) — the caller slices [:, :cin_pad_slot].

    ``pack`` > 1 (see _PACK): src rows carry ``pack`` voxels' [feats|dout]
    pairs, w8/swk8 count packed rows, wt_ref is the block-diag expansion
    (L, pack*cin), and the dW scatter splits into per-block one-hots so
    the acc slot (a, b) pairs block-b window lanes with block-b dout rows.
    """
    step = pl.program_id(0)
    w = w8 * 8
    swk = swk8 * 8
    nwin = max(gmap) + 1
    nsub = t // sub
    shift = pack.bit_length() - 1    # log2(pack); voxel rb -> packed row

    def get_dma(buf, tile, j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(scal_ref[tile * nwin + j], w8)],
            win.at[buf, j], sems.at[buf, j])

    cur = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        for j in range(nwin):
            get_dma(0, 0, j).start()
        acc[...] = jnp.zeros_like(acc)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        for j in range(nwin):
            get_dma(nxt, step + 1, j).start()

    for j in range(nwin):
        get_dma(cur, step, j).wait()

    l = win.shape[-1]
    zcols = wt_ref.shape[-1]          # pack * cin (== cin unpacked)
    cout = dout_ref.shape[-1]
    # see _sub_fwd_kernel: transform only the read slices when that is
    # less MXU work than the full window
    z_ondemand = (nsub * swk < w) and not _Z_FORCE_BUF

    if not z_ondemand:
        for a in range(len(gmap)):
            win_a = win[cur, gmap[a]].reshape(w, l)
            z = jnp.dot(win_a, wt_ref[a], preferred_element_type=jnp.float32)
            zbuf[a] = z.astype(win_a.dtype).reshape(w8, 8, zcols)

    def get_zs(a, off8):
        if z_ondemand:
            sl = win[cur, gmap[a], pl.ds(off8, swk8)].reshape(swk, l)
            return jnp.dot(sl, wt_ref[a],
                           preferred_element_type=jnp.float32
                           ).astype(sl.dtype)
        return zbuf[a, pl.ds(off8, swk8)].reshape(swk, zcols)

    iota = jax.lax.broadcasted_iota(jnp.int32, (sub, swk), 1)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (swk, sub), 0)
    for s_i in range(nsub):
        dsub = dout_ref[s_i * sub:(s_i + 1) * sub, :]
        if _oh_t(cin):
            # One transposed one-hot per (sub, anchor) drives BOTH
            # products: dx via zs^T-contraction (full N=sub lanes, no
            # second build in the expensive lane-broadcast orientation)
            # and the dW scatter as before.
            dx_acc_t = jnp.zeros((cin, sub), jnp.float32)
            for a in range(len(gmap)):
                off8 = scal_ref[soff_base
                                + (step * nsub + s_i) * nwin + gmap[a]]
                rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
                rows = rbs >> shift if pack > 1 else rbs
                zs = get_zs(a, off8)
                oh_t = _onehot(rows[None, :], iota_t, dsub.dtype, 0)
                res = jax.lax.dot_general(
                    zs, oh_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if pack > 1:
                    res = _blk_select(res, rbs & (pack - 1), pack, cin, sub)
                dx_acc_t = dx_acc_t + res
                fslice = win[cur, gmap[a], pl.ds(off8, swk8)].reshape(
                    swk, l)
                # dW via the SAME oh_t that drove dx: the block index
                # rides the LANE dim of dout (_blk_expand) so one
                # full-lane scatter matmul + one full-lane window
                # contraction replace the per-block one-hot splits that
                # made the fused form lose to the unfused pair (measured
                # r2: 68 vs 45 ms) — the caller extracts the (b, b)
                # diagonal blocks.
                if pack > 1:
                    dexp = _blk_expand(dsub, rbs & (pack - 1), pack,
                                       cout, sub)
                else:
                    dexp = dsub
                s = jnp.dot(oh_t, dexp,
                            preferred_element_type=jnp.float32)
                acc[a] += jax.lax.dot_general(
                    fslice, s.astype(fslice.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dx_ref[s_i * sub:(s_i + 1) * sub] = dx_acc_t.T.astype(
                dx_ref.dtype)
            continue
        dx_acc = jnp.zeros((sub, cin), jnp.float32)
        for a in range(len(gmap)):
            off8 = scal_ref[soff_base + (step * nsub + s_i) * nwin + gmap[a]]
            rbs = rb_ref[a, s_i * sub:(s_i + 1) * sub]
            zs = get_zs(a, off8)
            if _GATHER_INNER and sub <= swk:
                dx_acc = dx_acc + _gather_rows(zs, rbs, sub, swk).astype(
                    jnp.float32)
            else:
                oh = _onehot(rbs[:, None], iota, dsub.dtype, 1)
                dx_acc = dx_acc + jnp.dot(oh, zs,
                                          preferred_element_type=jnp.float32)
            oh_t = _onehot(rbs[None, :], iota_t, dsub.dtype, 0)
            s = jnp.dot(oh_t, dsub, preferred_element_type=jnp.float32)
            fslice = win[cur, gmap[a], pl.ds(off8, swk8)].reshape(swk, l)
            acc[a] += jax.lax.dot_general(
                fslice, s.astype(fslice.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[s_i * sub:(s_i + 1) * sub] = dx_acc.astype(dx_ref.dtype)

    @pl.when(step + 1 == pl.num_programs(0))
    def _():
        dw_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "sub", "subwin",
                                    "cin", "interpret"))
def windowed_bwd_sub(src_cat: jnp.ndarray, starts: jnp.ndarray,
                     soff: jnp.ndarray, rb_local_t: jnp.ndarray,
                     wt_full: jnp.ndarray, dout: jnp.ndarray,
                     window: int, tile: int, sub: int, subwin: int,
                     cin: int, interpret: bool = False):
    """Fused backward: (dfeats (V, cin) in the source dtype, dW
    (nanchor, L, cout) f32).  dfeats accumulates in f32 inside the kernel
    and is emitted in src_cat's dtype (bf16 under the production config).

    src_cat (V, Ccat) = [feats | dout] channel-concat (Ccat <= 128 lanes
    after padding — the caller gates on that); wt_full (nanchor, L, cin)
    flipped-transposed weights living in the dout lane rows (zeros in the
    feats rows); dout (V, cout) the raw cotangent for the dW side.
    dW's useful rows are [0:cin-slot] of L; the caller slices.
    """
    v_src, ccat = src_cat.shape
    v_out = rb_local_t.shape[1]
    cout = dout.shape[-1]
    nanchor = rb_local_t.shape[0]
    if (v_out % tile or window % 8 or v_src % 8 or tile % sub
            or subwin % 8 or subwin > window):
        raise ValueError("bad sub-window geometry")
    tiles = v_out // tile
    nsub = tile // sub
    nwin = soff.shape[0] // (tiles * nsub)
    gmap = _anchor_gmap(nanchor, nwin)
    p = _pack_p(ccat, cin, v_src, window, subwin)
    if p > 1:
        src_cat = _pack_src(src_cat, p)
        wt_full = _pack_w(wt_full, p)
        l = 128
    else:
        l = _lane_pad(ccat)
        if wt_full.shape[1] != l:
            raise ValueError(
                f"wt_full second dim must be lane-padded to {l}")
        if ccat != l:
            src_cat = jnp.pad(src_cat, ((0, 0), (0, l - ccat)))
    src = src_cat.reshape(v_src // p // 8, 8, l)
    scal = jnp.concatenate([starts // (8 * p), soff // (8 * p)])
    nstarts = starts.shape[0]
    dout = dout.astype(src_cat.dtype)
    wt_full = wt_full.astype(src_cat.dtype)
    w8p, swk8p = window // (8 * p), subwin // (8 * p)

    kernel = functools.partial(_sub_bwd_kernel, gmap, w8p, tile,
                               sub, swk8p, nstarts, cin, p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # src
            pl.BlockSpec((nanchor, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),              # rb_local_t
            pl.BlockSpec((nanchor, l, p * cin), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # wt_full
            pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),              # dout
        ],
        out_specs=(
            pl.BlockSpec((tile, cin), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nanchor, l, p * cout),
                         lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, max(gmap) + 1, w8p, 8, l), src_cat.dtype),
            pltpu.VMEM((nanchor, w8p, 8, p * cin), src_cat.dtype),
            pltpu.VMEM((nanchor, l, p * cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2, max(gmap) + 1)),
        ],
    )
    dx, dwf = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((v_out, cin), src_cat.dtype),
                   jax.ShapeDtypeStruct((nanchor, l, p * cout),
                                        jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, src, rb_local_t, wt_full, dout)
    if p == 1:
        return dx, dwf
    # block b's true dW sits at rows [b*(l//p), +l//p) x lanes
    # [b*cout, +cout) of the full-lane accumulator (off-diagonals pair
    # block-b feats with block-b' douts — garbage by construction); each
    # block's rows are its voxel's [feats | dout] lane-rows, so the feats
    # channels sit at rows [0, cin) of the extracted slice and the caller
    # slices [:, :cin, :].
    dw5 = dwf.reshape(nanchor, p, l // p, p, cout)
    return dx, sum(dw5[:, b, :, b, :] for b in range(p))
