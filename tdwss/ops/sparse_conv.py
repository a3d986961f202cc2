"""Sparse convolution applications: gather -> GEMM -> gather-transpose.

TPU-native replacements for SparseConvNet's CUDA rulebook execution
(``scn.SubmanifoldConvolution``, strided ``scn.Convolution``,
``scn.Deconvolution``, ``scn.UnPooling``, ``scn.MaxPooling`` — reference
models/SparseConvNet.py usage).  All functions are pure on arrays, take
precomputed rulebooks from :mod:`tdwss.ops.plan` /
:mod:`tdwss.ops.host_plan`, and keep static shapes.

Layout choices for the MXU:
- a (V, K) rulebook gathers into a single (V, K*Cin) operand so each conv is
  ONE large matmul instead of K skinny ones;
- rows are processed in ``lax.map`` chunks: a full-size (V, K, Cin) gather
  with a narrow Cin tile-pads up to 4x on TPU (2.5 GB -> 11 GB observed);
  chunking bounds the live padded transient to ~128 MB;
- accumulation in float32 (``preferred_element_type``) from bf16 operands.

NO LARGE SCATTERS: XLA lowers scatter-add with potentially-colliding
indices to a serial loop on TPU (minutes per conv at 786k voxels).  Every
backward pass is expressed as a *gather*-GEMM through the transposed
rulebook instead (the only scatter left is the tiny heavy-voxel overflow
add in the residual path):
- submanifold: the rulebook is symmetric — ``rb[v,k] = u  <=>
  rb[u, K-1-k] = v`` (centred kernel, negated offset), so
  ``dfeats = gather_matmul(dout, rb, weight[::-1].T)``;
- strided conv fine->coarse: each fine voxel occupies exactly one
  (parent, child_offset) slot, so ``dfine[f] = dout[parent[f]] @
  W[child_offset[f]]^T`` — the deconv forward pattern;
- deconv coarse->fine: children of a coarse voxel are enumerated by the
  strided rulebook ``down_rb``, so ``dcoarse = gather_matmul(dout,
  down_rb, W^T)`` (tap index == child_offset, no flip);
- unpool: ``dcoarse[c] = sum_k dfine[down_rb[c,k]]``.

Backward gathers run behind ``lax.optimization_barrier`` fences tying them
to the incoming cotangent — without the fence XLA's latency-hiding
scheduler hoists every recomputed gather to program start (57 GB live).

Index hygiene: missing neighbors are encoded as -1 in rulebooks.  They are
remapped to V (definitely out-of-bounds) before every gather —
``jnp.take(mode='fill')`` WRAPS negative indices numpy-style rather than
filling them, so passing -1 through would silently read the last voxel.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0

# Trace-local Pallas kill switch: init_state forces the einsum path for
# its one-shot trace WITHOUT mutating process-global env (a concurrent
# trace in a loader thread would otherwise bake the einsum path into a
# cached train/eval executable).  contextvars give per-thread scoping.
_NO_PALLAS_CTX = contextvars.ContextVar("tdwss_no_pallas", default=False)


@contextlib.contextmanager
def force_einsum():
    """Route every conv traced in this context through the XLA einsum
    path (no Mosaic kernel compiles).  Thread-local, unlike the
    TDWSS_NO_PALLAS env var which remains as a process-wide override."""
    tok = _NO_PALLAS_CTX.set(True)
    try:
        yield
    finally:
        _NO_PALLAS_CTX.reset(tok)


def _oob(rulebook: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map -1 'missing' entries to a true out-of-bounds index."""
    return jnp.where(rulebook >= 0, rulebook, size)


# Target bytes for one gathered (rows, K*Cin) chunk (see module docstring).
_CHUNK_BYTES = 128 * 1024 * 1024


def _num_chunks(v: int, row_bytes: int) -> int:
    """Largest divisor of v so that one chunk's gather stays under budget."""
    want = max(1, (v * row_bytes + _CHUNK_BYTES - 1) // _CHUNK_BYTES)
    if want == 1:
        return 1
    best = 1
    for d in range(1, int(v**0.5) + 1):
        if v % d == 0:
            for cand in (d, v // d):
                if cand >= want and (best < want or cand < best):
                    best = cand
    return best if best >= want else 1


def gather_neighbors(feats: jnp.ndarray, rulebook: jnp.ndarray) -> jnp.ndarray:
    """(V, Cin), (Vo, K) -> (Vo, K*Cin); missing neighbors read zeros."""
    ids = _oob(rulebook, feats.shape[0])
    g = jnp.take(feats, ids, axis=0, mode="fill", fill_value=0)
    return g.reshape(rulebook.shape[0], -1)


def _gather_matmul_impl(feats: jnp.ndarray, rulebook: jnp.ndarray,
                        w2d: jnp.ndarray) -> jnp.ndarray:
    """out = concat_k feats[rb[:,k]] @ w2d, row-chunked.  w2d (K*Cin, Cout)."""
    v, k = rulebook.shape
    cin = feats.shape[-1]
    w2d = w2d.astype(feats.dtype)
    chunks = _num_chunks(v, k * cin * feats.dtype.itemsize)
    if chunks == 1:
        g = gather_neighbors(feats, rulebook)
        return jnp.dot(g, w2d, preferred_element_type=jnp.float32
                       ).astype(feats.dtype)

    def chunk_fn(rb):
        g = gather_neighbors(feats, rb)
        return jnp.dot(g, w2d, preferred_element_type=jnp.float32
                       ).astype(feats.dtype)

    out = jax.lax.map(chunk_fn, rulebook.reshape(chunks, v // chunks, k))
    return out.reshape(v, -1)


def _gather_matmul_dw(feats: jnp.ndarray, rulebook: jnp.ndarray,
                      dout: jnp.ndarray) -> jnp.ndarray:
    """dW2d = sum_v gathered_v^T dout_v, row-chunked, f32."""
    v, k = rulebook.shape
    cin = feats.shape[-1]
    cout = dout.shape[-1]
    chunks = _num_chunks(v, k * cin * feats.dtype.itemsize)
    if chunks == 1:
        g = gather_neighbors(feats, rulebook)
        return jnp.dot(g.T, dout.astype(feats.dtype),
                       preferred_element_type=jnp.float32)
    cv = v // chunks
    rb3 = rulebook.reshape(chunks, cv, k)
    dout3 = dout.astype(feats.dtype).reshape(chunks, cv, cout)

    def body(i, acc):
        g = gather_neighbors(
            feats, jax.lax.dynamic_index_in_dim(rb3, i, keepdims=False))
        dc = jax.lax.dynamic_index_in_dim(dout3, i, keepdims=False)
        return acc + jnp.dot(g.T, dc, preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(
        0, chunks, body, jnp.zeros((k * cin, cout), jnp.float32))


@jax.custom_vjp
def _subm_conv(feats: jnp.ndarray, rulebook: jnp.ndarray,
               weight: jnp.ndarray) -> jnp.ndarray:
    """out[v] = concat_k feats[rulebook[v,k]] @ weight.reshape(K*Cin, Cout)."""
    return _gather_matmul_impl(
        feats, rulebook, weight.reshape(-1, weight.shape[-1]))


def _subm_conv_fwd(feats, rulebook, weight):
    return _subm_conv(feats, rulebook, weight), (feats, rulebook, weight)


def _subm_conv_bwd(res, dout):
    feats, rulebook, weight = res
    k, cin, cout = weight.shape
    feats, dout = jax.lax.optimization_barrier((feats, dout))
    dout_c = dout.astype(feats.dtype)
    # dW (gather recomputed, not stored)
    dw = _gather_matmul_dw(feats, rulebook, dout_c)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    # dfeats via the transposed (flipped-tap) rulebook: scatter-free.
    w_t = weight[::-1].transpose(0, 2, 1).reshape(k * cout, cin)
    dfeats = _gather_matmul_impl(dout_c, rulebook, w_t).astype(feats.dtype)
    drb = np.zeros(rulebook.shape, dtype=float0)
    return dfeats, drb, dw


_subm_conv.defvjp(_subm_conv_fwd, _subm_conv_bwd)




# ---------------------------------------------------------------------------
# Windowed-MXU submanifold convolution (metadata: tdwss.ops.plan.Windowed27)
# ---------------------------------------------------------------------------
# TPU gathers are row-count-bound (~62M rows/s measured on v5e regardless of
# row width), which made plain 27-tap gathers ~90% of the train step.  This
# path eliminates them: each of the 27 taps becomes a per-tile contiguous
# window load + one-hot matmul on the MXU (tap indices are monotone within a
# tile, so a tile's taps live in a narrow window; taps sharing (dy, dz)
# ride the same window), and a compact host-built spill list supplies the
# exact entries the windows miss.  The spill run-sums use the
# cumsum-difference trick — no scatters.


def _pick_group(tiles: int, limit: int = 8) -> int:
    for g in range(min(limit, tiles), 0, -1):
        if tiles % g == 0:
            return g
    return 1


def _win_gather_groups(src3, rb_local, starts, window, group):
    """Yields the windowed gather machinery shared by fwd / dW.

    ``src3`` is the (V, C) gather source (feats fwd, cotangents in the
    transposed-conv backward); the tap count comes from rb_local's last
    dim (27 for the subm conv, f^3 / k for WindowedGather forms).
    """
    tiles = starts.shape[0]
    t = rb_local.shape[0] // tiles          # out rows per tile
    c3 = src3.shape[1]
    na = rb_local.shape[-1]

    def gather_group(st, rl):
        win = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(src3, (s, 0), (window, c3))
        ))(st)                                              # (G, na, W, C)
        oh = jax.nn.one_hot(rl, window, dtype=src3.dtype)   # (G, T, na, W)
        g = jnp.einsum('gtkw,gkwc->gtkc', oh, win)
        return g.reshape(group * t, na * c3)

    st3 = starts.reshape(tiles // group, group, na)
    rl4 = rb_local.reshape(tiles // group, group, t, na)
    return gather_group, st3, rl4


def _win_matmul(src3, rb_local, starts, w9, window):
    """Windowed gather + GEMM -> (V, Cout) f32."""
    tiles = starts.shape[0]
    group = _pick_group(tiles)
    gather_group, st3, rl4 = _win_gather_groups(
        src3, rb_local, starts, window, group)

    def per_group(args):
        g = gather_group(*args)
        return jnp.dot(g, w9.astype(src3.dtype),
                       preferred_element_type=jnp.float32)

    out = jax.lax.map(per_group, (st3, rl4))
    return out.reshape(rb_local.shape[0], -1)


def _win_dw(src3, rb_local, starts, dout, window):
    """sum_v gathered_v^T dout_v over windowed taps -> (K*C, Cout) f32."""
    tiles = starts.shape[0]
    group = _pick_group(tiles)
    gather_group, st3, rl4 = _win_gather_groups(
        src3, rb_local, starts, window, group)
    t = rb_local.shape[0] // tiles
    cout = dout.shape[-1]
    d3 = dout.astype(src3.dtype).reshape(tiles // group, group * t, cout)

    def body(i, acc):
        g = gather_group(jax.lax.dynamic_index_in_dim(st3, i, keepdims=False),
                         jax.lax.dynamic_index_in_dim(rl4, i, keepdims=False))
        dc = jax.lax.dynamic_index_in_dim(d3, i, keepdims=False)
        return acc + jnp.dot(g.T, dc, preferred_element_type=jnp.float32)

    init = jnp.zeros((rb_local.shape[-1] * src3.shape[1], cout), jnp.float32)
    return jax.lax.fori_loop(0, tiles // group, body, init)


def _prefix_rows(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """(E, C) -> (E+1, C) exclusive prefix sums, two-level blocked.

    XLA's flat 1D cumsum over millions of rows is slow on TPU; cumsum
    within blocks + a short cumsum over block totals forces the parallel
    structure.
    """
    e, c = x.shape
    pad = (-e) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, c), x.dtype)], axis=0)
    xb = x.reshape(-1, block, c)
    within = jnp.cumsum(xb, axis=1)                          # inclusive
    totals = within[:, -1]
    block_off = jnp.concatenate(
        [jnp.zeros((1, c), x.dtype), jnp.cumsum(totals, axis=0)], axis=0)
    inclusive = (within + block_off[:-1, None, :]).reshape(-1, c)[:e]
    return jnp.concatenate([jnp.zeros((1, c), x.dtype), inclusive], axis=0)


def _entry_z(feats, taps, srcs, k=27):
    """One-hot-masked (E, K*C) operand for per-entry tap selection."""
    f = jnp.take(feats, _oob(srcs, feats.shape[0]), axis=0,
                 mode="fill", fill_value=0)                  # (E, C)
    oh = jax.nn.one_hot(taps, k, dtype=feats.dtype)          # (E, K)
    return (oh[:, :, None] * f[:, None, :]).reshape(taps.shape[0], -1)


def _entry_contrib(feats, taps, srcs, w2d):
    """(E,) taps + (E,) srcs -> (E, Cout) f32 contributions f[src] @ W[tap].

    Chunked over entries: the (Ec, 27C) tap-masked operand is O(E*27C) —
    per-entry weight tables would be O(E*C^2) and OOM at C>=128.
    """
    cin = feats.shape[-1]
    k = w2d.shape[0] // cin
    e = taps.shape[0]
    chunks = _num_chunks(e, k * cin * feats.dtype.itemsize)
    if chunks == 1:
        z = _entry_z(feats, taps, srcs, k)
        return jnp.dot(z, w2d.astype(feats.dtype),
                       preferred_element_type=jnp.float32)

    def chunk_fn(args):
        t, s = args
        z = _entry_z(feats, t, s, k)
        return jnp.dot(z, w2d.astype(feats.dtype),
                       preferred_element_type=jnp.float32)

    out = jax.lax.map(chunk_fn, (taps.reshape(chunks, -1),
                                 srcs.reshape(chunks, -1)))
    return out.reshape(e, -1)


def _res_ovf_apply(feats, res_ovf, ovf_v, ovf_count, w2d, cout,
                   out_len=None):
    """Overflow-list-only residual corrections -> (out_len, Cout) f32.

    The compact spill list of the windowed forms (Windowed27 /
    WindowedGather): per-entry contributions, blocked-prefix run sums per
    owning row, one small scatter-add into the owners.  ``out_len``
    defaults to the source length (submanifold case); cross-level gathers
    pass the output-domain capacity.
    """
    v = out_len if out_len is not None else feats.shape[0]
    c2 = _entry_contrib(feats, res_ovf[:, 1], res_ovf[:, 2], w2d)
    prefix = _prefix_rows(c2)
    ends = jnp.cumsum(ovf_count)
    sums = (jnp.take(prefix, ends, axis=0)
            - jnp.take(prefix, ends - ovf_count, axis=0))    # (H, Cout)
    out = jnp.zeros((v, cout), jnp.float32)
    return out.at[_oob(ovf_v, v)].add(sums, mode="drop")


def _res_ovf_dw(feats, res_ovf, dout, k=27, flip=False, tap_flip=True):
    """Spill-list dW contribution -> (K*C, Cout) f32 (raw tap order).

    ``flip``: evaluate each entry in the FLIPPED orientation
    (feats[owner] (x) dout[src] into slot K-1-tap) — required when the
    windowed dW was computed by the symmetric gather kernel
    (pallas_subm.windowed_bwd_gather), whose windowed set is the flip of
    the forward partition; flipping the spill set too makes the union
    cover rb exactly once (flip is an involution on the full entry set).
    """
    v = feats.shape[0]
    cin = feats.shape[-1]
    cout = dout.shape[-1]
    if flip:
        # sentinel taps (>= k) go negative -> zero one-hot row; sentinel
        # owners/srcs fall out through the fill-gathers.  tap_flip=False
        # (cross-level wg): tap == child_offset in both rulebook
        # directions, so only the row roles swap.
        taps = ((k - 1) - res_ovf[:, 1]) if tap_flip else res_ovf[:, 1]
        srcs = res_ovf[:, 0]
        # cross-domain safe: srcs here index the DOUT domain
        tgts = _oob(res_ovf[:, 2], dout.shape[0])
    else:
        taps = res_ovf[:, 1]
        srcs = res_ovf[:, 2]
        tgts = jnp.where(srcs < v, res_ovf[:, 0], dout.shape[0])
    e = taps.shape[0]
    chunks = _num_chunks(e, k * cin * feats.dtype.itemsize)
    if chunks <= 1 or e % chunks != 0:
        z = _entry_z(feats, taps, srcs, k)
        dv = jnp.take(dout, tgts, axis=0, mode="fill",
                      fill_value=0).astype(feats.dtype)
        return jnp.dot(z.T, dv, preferred_element_type=jnp.float32)

    cv = e // chunks
    t3 = taps.reshape(chunks, cv)
    s3 = srcs.reshape(chunks, cv)
    g3 = tgts.reshape(chunks, cv)

    def body(i, acc):
        z = _entry_z(feats,
                     jax.lax.dynamic_index_in_dim(t3, i, keepdims=False),
                     jax.lax.dynamic_index_in_dim(s3, i, keepdims=False), k)
        dv = jnp.take(dout,
                      jax.lax.dynamic_index_in_dim(g3, i, keepdims=False),
                      axis=0, mode="fill", fill_value=0).astype(feats.dtype)
        return acc + jnp.dot(z.T, dv, preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(
        0, chunks, body, jnp.zeros((k * cin, cout), jnp.float32))


def _res_tile_apply(feats, res_tile, w2d, cout, v_out):
    """Tile-grouped spill corrections -> (v_out, Cout), compute dtype — scatter-free.

    res_tile (T2, R, 3) [local, tap, src] per 512-row output tile (host
    layout, tdwss.ops.host_plan._group_spill_tiles).  Contributions are
    the usual per-entry tap-masked GEMM; the per-voxel accumulation is a
    per-tile one-hot MATMUL instead of the (V,)-domain scatter-add the
    legacy run-sum layout needs (~150 ns/row serialized on TPU — 14 ms at
    86k spills).
    """
    t2, r, _ = res_tile.shape
    t_res = v_out // t2
    k = w2d.shape[0] // feats.shape[-1]
    taps = res_tile[..., 1].reshape(-1)
    srcs = res_tile[..., 2].reshape(-1)
    c2 = _entry_contrib(feats, taps, srcs, w2d)          # (T2*R, Cout)
    local = res_tile[..., 0]                             # (T2, R)
    iota = jnp.arange(t_res, dtype=jnp.int32)
    oh = (local[:, :, None] == iota[None, None, :]).astype(feats.dtype)
    out = jnp.einsum("trf,trc->tfc", oh, c2.reshape(t2, r, cout)
                     .astype(feats.dtype))
    # stay in the compute dtype: the caller sums tiers and casts to the
    # feats dtype anyway — the old f32 materialization of this (V, C)
    # intermediate was ~100 MB of pure HBM waste per apply (r5 profile)
    return out.reshape(v_out, cout)


def _res_tile_dw(feats, res_tile, dout, k=27, flip=False, tap_flip=True):
    """Tile-grouped spill dW contribution -> (K*C, Cout) f32.

    ``flip``: flipped-orientation evaluation (see :func:`_res_ovf_dw`).
    """
    t2, r, _ = res_tile.shape
    v_out = dout.shape[0]
    t_res = v_out // t2
    taps = res_tile[..., 1].reshape(-1)
    srcs = res_tile[..., 2].reshape(-1)
    local = res_tile[..., 0].reshape(-1)
    tile_ids = jnp.repeat(jnp.arange(t2, dtype=jnp.int32), r)
    owners = jnp.where(local < t_res, tile_ids * t_res + local, v_out)
    if flip:
        taps = (k - 1) - taps
        srcs, owners = owners, srcs
    z = _entry_z(feats, taps, srcs, k)
    dv = jnp.take(dout, _oob(owners, dout.shape[0]), axis=0, mode="fill",
                  fill_value=0).astype(feats.dtype)
    return jnp.dot(z.T, dv, preferred_element_type=jnp.float32)


_RES_HCHUNK = 512     # must match tdwss.ops.host_plan._RES_HCHUNK
_RES_TILE = 512       # must match tdwss.ops.host_plan._RES_TILE
_RES_HSPAN = 8        # must match tdwss.ops.host_plan._RES_HSPAN


def _tap_contrib(feats, tent, ttap, w2d):
    """Tap-chunked contributions -> (NC*CHUNK, Cout) f32 in tap order.

    Every _RES_HCHUNK-entry chunk holds ONE tap's entries
    (host_plan._tap_chunk), so the per-entry tap selection becomes a
    batched (CHUNK, C) @ (C, Cout) GEMM against a gathered per-chunk
    weight — no (E, K*C) one-hot operand (27x the traffic, chunked
    lax.map loops at the big heavy caps).
    """
    cin = feats.shape[-1]
    cout = w2d.shape[-1]
    nc = ttap.shape[0]
    f = jnp.take(feats, _oob(tent[:, 0], feats.shape[0]), axis=0,
                 mode="fill", fill_value=0)             # (NC*CHUNK, C)
    w3 = w2d.reshape(-1, cin, cout).astype(feats.dtype)
    wsel = jnp.take(w3, ttap, axis=0)                   # (NC, C, Cout)
    return jax.lax.dot_general(
        f.reshape(nc, _RES_HCHUNK, cin), wsel,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(-1, cout)


def _res_heavy_apply(feats, res_hent, res_htile, w2d, cout, v_out, t2,
                     tent=None, ttap=None, tperm=None):
    """Heavy-tile spill corrections -> (v_out, Cout), compute dtype — scatter-free.

    ``res_hent`` is CHUNK-ALIGNED by the host (H2 * _RES_HCHUNK rows,
    chunk i's entries at offset i * _RES_HCHUNK, sentinel-padded), so the
    per-chunk view is a plain reshape — the row gathers a compact layout
    needed cost ~2 ms at L0's caps.  A chunk packs entries from up to
    _RES_HSPAN consecutive heavy tiles (host_plan._group_spill_tiles);
    each chunk one-hot scatters into its (_RES_HSPAN, t_res, Cout)
    window with a batched einsum, and the windows land via an
    (H2, _RES_HSPAN) block scatter — still tens of block rows, never a
    per-owner scatter.

    With the tap-chunked companion (``tent``/``ttap``/``tperm``) the
    contributions come from :func:`_tap_contrib` + a permutation gather
    back to the owner-chunked layout.
    """
    t_res = v_out // t2
    taps = res_hent[:, 1]
    srcs = res_hent[:, 2]
    if tent is not None and ttap is not None and tperm is not None:
        c_tap = _tap_contrib(feats, tent, ttap, w2d)
        c2 = jnp.take(c_tap, tperm, axis=0, mode="fill",
                      fill_value=0).astype(feats.dtype)
    else:
        c2 = _entry_contrib(feats, taps, srcs, w2d).astype(feats.dtype)
    h2 = res_htile.shape[0]
    span = _RES_HSPAN * t_res
    rows = c2.reshape(h2, _RES_HCHUNK, cout)
    own = res_hent[:, 0].reshape(h2, _RES_HCHUNK)
    base = res_htile[:, 0:1] * t_res                     # (h2, 1) row base
    local = own - base
    ok = (local >= 0) & (local < span)
    # Decomposed one-hot scatter: a flat (E, span) one-hot costs
    # span * 2 bytes per entry slot (bandwidth-dominant at span >= 2048);
    # split local = hi * t_res + lo and contract the (E, t_res) LO
    # one-hot against HI-expanded rows (E, HSPAN * Cout) instead — the
    # per-slot bytes drop to t_res*2 + HSPAN*Cout*2 regardless of span.
    lo = jnp.where(ok, local % t_res, t_res)
    hi = jnp.where(ok, local // t_res, _RES_HSPAN)
    iota = jnp.arange(t_res, dtype=jnp.int32)
    oh_lo = (lo[:, :, None] == iota[None, None, :]).astype(rows.dtype)
    oh_hi = jax.nn.one_hot(hi, _RES_HSPAN, dtype=rows.dtype)
    rows_hi = (oh_hi[..., None] * rows[:, :, None, :]).reshape(
        h2, _RES_HCHUNK, _RES_HSPAN * cout)
    # bf16 end-to-end: the MXU accumulates in f32 internally either way,
    # the caller casts the result to the feats dtype, and the old f32
    # tmp + (h2, t_res, HSPAN, cout) transpose cost ~1.1 GB of HBM
    # traffic per apply (r5 profile: three ~1.7 ms data-formatting ops).
    tmp = jnp.einsum("her,hej->hrj", oh_lo, rows_hi)
    tmp4 = tmp.reshape(h2, t_res, _RES_HSPAN, cout)
    out = jnp.zeros((t2, t_res, cout), rows.dtype)
    base = res_htile[:, 0]                               # (h2,)
    # per-s lane-slice scatters avoid materializing the transposed
    # (h2, HSPAN, t_res, cout) block tensor; _RES_HSPAN static slices
    for s in range(_RES_HSPAN):
        out = out.at[base + s].add(tmp4[:, :, s, :], mode="drop")
    return out.reshape(v_out, cout)


def _res_heavy_dw(feats, res_hent, dout, k=27, tent=None, ttap=None,
                  f_tap=None, flip=False, tap_flip=True):
    """Heavy-list dW contribution — compact, gather-based (no layout
    tricks needed: dW accumulates over entries, not owners).

    ``f_tap``: the tap-ordered feats gather saved by the conv forward
    (identical expression, CSE'd there) — passing it skips re-gathering
    the 36-84k rows (~10-20 ns/row latency-bound) in the backward.
    ``flip``: flipped-orientation evaluation (see :func:`_res_ovf_dw`);
    f_tap is a src-side gather and does not apply."""
    v = feats.shape[0]
    if tent is not None and ttap is not None:
        # tap-chunked: per-chunk (C, Cout) outer-product GEMMs summed
        # into tap slots by a tiny one-hot matmul (see _tap_contrib)
        cin = feats.shape[-1]
        cout = dout.shape[-1]
        nc = ttap.shape[0]
        fcol, dcol = (1, 0) if flip else (0, 1)
        tapv = ((k - 1) - ttap) if (flip and tap_flip) else ttap
        f = f_tap if (f_tap is not None and not flip) else jnp.take(
            feats, _oob(tent[:, fcol], v), axis=0, mode="fill",
            fill_value=0)
        dv = jnp.take(dout, _oob(tent[:, dcol], dout.shape[0]), axis=0,
                      mode="fill", fill_value=0).astype(feats.dtype)
        g = jax.lax.dot_general(
            f.reshape(nc, _RES_HCHUNK, cin), dv.reshape(nc, _RES_HCHUNK,
                                                        cout),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (NC, C, Cout)
        oh = (jnp.arange(k, dtype=jnp.int32)[:, None]
              == tapv[None, :]).astype(jnp.float32)      # (K, NC)
        dw = jnp.dot(oh, g.reshape(nc, cin * cout),
                     preferred_element_type=jnp.float32)
        return dw.reshape(k * cin, cout)
    taps = res_hent[:, 1]
    srcs = res_hent[:, 2]
    owners = jnp.where(srcs < v, res_hent[:, 0], dout.shape[0])
    if flip:
        if tap_flip:
            taps = (k - 1) - taps
        srcs, owners = owners, srcs
    z = _entry_z(feats, taps, srcs, k)
    dv = jnp.take(dout, _oob(owners, dout.shape[0]), axis=0, mode="fill",
                  fill_value=0).astype(feats.dtype)
    return jnp.dot(z.T, dv, preferred_element_type=jnp.float32)


def _res_all_apply(feats, rtile, res_ovf, ovf_v, ovf_count, w2d, cout,
                   out_len=None):
    """Tiled tiers (when present) + legacy overflow part.

    ``rtile`` = (res_tile, res_hent, res_htile) or Nones.
    """
    v = out_len if out_len is not None else feats.shape[0]
    # tier outputs and their sum stay in the compute dtype (bf16 under
    # production): every caller casts to feats.dtype before the main add,
    # so f32 here only materialized extra (V, C)-sized HBM intermediates
    out = jnp.zeros((v, cout), feats.dtype)
    if res_ovf.shape[0]:        # zero-capacity tier: statically absent
        out = _res_ovf_apply(feats, res_ovf, ovf_v, ovf_count, w2d, cout,
                             out_len=v).astype(feats.dtype)
    res_tile, res_hent, res_htile, tent, ttap, tperm = rtile
    if tent is not None and not tent.shape[0]:
        tent = ttap = tperm = None
    if res_tile is not None and res_tile.shape[0] and res_tile.shape[1]:
        out = out + _res_tile_apply(feats, res_tile, w2d, cout, v)
    if (res_hent is not None and res_htile is not None
            and res_hent.shape[0] and v % _RES_TILE == 0):
        out = out + _res_heavy_apply(feats, res_hent, res_htile, w2d,
                                     cout, v, v // _RES_TILE,
                                     tent, ttap, tperm)
    return out


def _res_all_dw(feats, rtile, res_ovf, dout, k=27, f_tap=None,
                flip=False, tap_flip=True):
    """``flip``: flipped-orientation spill dW (see :func:`_res_ovf_dw`) —
    set when the windowed dW came from the symmetric gather kernel."""
    cin = feats.shape[-1]
    dw = jnp.zeros((k * cin, dout.shape[-1]), jnp.float32)
    if res_ovf.shape[0]:        # zero-capacity tier: statically absent
        dw = _res_ovf_dw(feats, res_ovf, dout, k, flip, tap_flip)
    res_tile, res_hent, res_htile, tent, ttap, tperm = rtile
    if tent is not None and not tent.shape[0]:
        tent = ttap = f_tap = None
    if res_tile is not None and res_tile.shape[0] and res_tile.shape[1]:
        dw = dw + _res_tile_dw(feats, res_tile, dout, k, flip, tap_flip)
    if res_hent is not None and res_hent.shape[0]:
        dw = dw + _res_heavy_dw(feats, res_hent, dout, k, tent, ttap,
                                f_tap, flip, tap_flip)
    return dw


from functools import partial


_VMEM_BUDGET = 13 * 1024 * 1024   # ~16 MB physical minus pipeline slack


def _kernel_vmem_fits(nanchor: int, window: int, c3: int, cout: int,
                      tile: int, nwin: int = 9) -> bool:
    """Conservative VMEM estimate for the fused windowed kernels.

    Counts the double-buffered window scratch, the weight / dW-accumulator
    block, and the pipelined rb/dout/out blocks.  Wide deep-level convs
    (L=384, Cout=160) overflow the 16 MB VMEM otherwise (observed compile
    failure: 18.56M > 16M in windowed_dw).  Packed-row kernels
    (pallas_subm._pack_p) shrink the window scratch p x but grow the
    weight block p x.
    """
    from tdwss.ops.pallas_subm import _pack_p

    p = _pack_p(c3, cout, window * 8, window)  # v_src unknown: 8*window
    l = ((c3 + 127) // 128) * 128
    scratch = 2 * nwin * (window // p) * l * 2         # bf16 windows
    w9 = nanchor * l * p * cout * 2                    # bf16 fwd weight block
    acc = nanchor * l * cout * 4                       # dw f32 accumulator
    blocks = 2 * (nanchor * tile * 4 + tile * cout * 6)
    return scratch + max(w9, acc + cout * l * 2) + blocks < _VMEM_BUDGET


# Fused kernels only where they pay: each distinct kernel shape costs a
# Mosaic compile (slow through the remote relay; the persistent cache
# amortizes it).  Measured per-conv fwd+bwd on v5e (bench UNet levels):
# V=32k C=128 12.5 -> 4.9 ms, V=8k C=160 5.8 -> 4.4 ms under the kernel,
# but V<=4k levels LOSE (4.5 -> 6.7 ms at V=4096/C=224) — padding and
# launch overhead dominate and the einsum path is cheaper.
_PALLAS_MIN_V = int(__import__("os").environ.get("TDWSS_PALLAS_MIN_V",
                                                 8192))


def _use_pallas_kernel(v: int, tiles: int, window: int,
                       nanchor: int = 27, c3: int = 0, cout: int = 0,
                       v_out: int = 0) -> bool:
    """Route the windowed conv through the fused Pallas kernel on TPU.

    Requires host-aligned metadata (starts % 8 == 0, guaranteed by
    tdwss.ops.host_plan builders), tile-divisible capacity, a kernel
    instance that fits VMEM, and a large enough out domain (else the XLA
    einsum path runs).
    """
    import os

    if _NO_PALLAS_CTX.get() or os.environ.get("TDWSS_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if max(v_out or v, v) < _PALLAS_MIN_V:
        return False
    if not (tiles > 0 and v % tiles == 0 and window % 8 == 0 and v % 8 == 0):
        return False
    if c3 and cout:
        return _kernel_vmem_fits(nanchor, window, c3, cout, v // tiles)
    return True


_GMAP27 = np.arange(27, dtype=np.int32) % 9   # tap -> (dy,dz) window group


def _w27_expand(starts):
    """(tiles, nwin) shared starts -> (tiles, 27) per-tap starts."""
    nwin = starts.shape[1]
    return starts[:, _GMAP27 if nwin == 9 else _GMAP27 % 3]


def _sub_big_locals(rb_local, sub_off, window, sub, subwin):
    """Sub-relative (V, K) locals -> big-window-relative (einsum path).

    Tap -> window group is the universal ``tap % nwin`` rule (for K=27,
    (k %% 9) %% 3 == k %% 3 since 3 | 9, so this covers both w27 forms and
    the cross-level gathers).
    """
    k = rb_local.shape[1]
    nwin = sub_off.shape[1]
    gmap = np.arange(k, dtype=np.int32) % nwin
    big = jnp.repeat(sub_off, sub, axis=0)[:, gmap]          # (V, K)
    return jnp.where(rb_local == subwin, window, rb_local + big)


_w27_big_locals = _sub_big_locals     # historical alias


def _sub_vmem_fits(window: int, c: int, cout: int, dw: bool,
                   nanchor: int = 27, nwin: int = 9) -> bool:
    """Extra scratch of the sub-window kernels (zbuf / f32 sbuf + acc).

    Budget is tighter than _VMEM_BUDGET: the unrolled per-sub loops add
    Mosaic stack temporaries the estimate cannot see (observed: the
    declared ~8 MB of scratch at tile=1024/window=1280 compiled to a
    20.9 MB scoped allocation at nanchor=27).  The stack pressure tracks
    nanchor x window, so the window cap scales with 27 / nanchor.
    """
    from tdwss.ops.pallas_subm import _pack_p

    p = _pack_p(c, cout, window * 8, window)  # v_src unknown: 8*window
    if nanchor * (window // p) > 27 * 768:  # stack blow-up at 27 x 1280
        return False                        # (packed rows: window / p)
    l = ((c + 127) // 128) * 128
    zbuf = nanchor * (window // p) * p * cout * 2
    # dw accumulators are (nanchor, l, p*cout) f32 when the kernel packs
    # (windowed_dw_sub / windowed_bwd_sub acc) — the p factor is real VMEM
    sbuf = (nanchor * (window // p) * p * cout * 4
            + nanchor * l * p * cout * 4 if dw else 0)
    # the packed fwd kernel runs a 4-deep DMA pipeline
    win = (4 if p > 1 else 2) * nwin * (window // p) * l * 2
    # The weight block (bf16: the wrappers cast to feats dtype) and the
    # double-buffered rb/out pipeline blocks are real VMEM too (observed:
    # a fwd sub instance at l=128/cout=192/window=640 passed the
    # scratch-only estimate at ~10.6 MB but allocated 16.34 MB scoped ->
    # stack OOM; the missing ~6 MB was w9 + io blocks + Z/one-hot
    # temporaries).
    w9 = nanchor * l * cout * 2
    tile = 512
    io = 2 * (nanchor * tile * 4 + tile * cout * 4)
    # Mosaic keeps a few full-width f32 Z temporaries live across the
    # unrolled anchor loop beyond the declared scratch (observed: a wg dw
    # at nanchor=8/window~1900/cout=160 declared ~12.5 MB but allocated
    # 17.88 MB scoped -> ~4 window x cout f32 buffers of stack).
    stack = 4 * window * cout * 4
    return win + max(zbuf, sbuf) + w9 + io + stack < _VMEM_BUDGET


def _gather_vmem_fits(window: int, c3: int, cin: int, nanchor: int = 27,
                      nwin: int = 9, sub: int = 128,
                      tile: int = 512) -> bool:
    """VMEM/stack estimate for the symmetric gather-backward kernel.

    Beyond the fwd-kernel scratch it holds: the f32 dW slot accumulator,
    the feats tile blocks, the per-anchor concatenated both-product f32
    dot outputs that Mosaic keeps live across the unrolled anchor loop,
    and the gcat staging rows.  Calibrated against observed scoped
    allocations: L2 (c3=96, window 640) compiled at <= 16 MB, L3
    (c3=128, window 640) blew the 16 MB limit at 18.4 MB.
    """
    from tdwss.ops.pallas_subm import _lane_pad, _pack_p

    p = _pack_p(c3, cin, window * 8, window)
    l = 128 if p > 1 else _lane_pad(c3)
    zcols = p * cin
    slot = _lane_pad(zcols)
    m = nanchor // nwin
    w_p = window // p
    win = (4 if p > 1 else 2) * nwin * w_p * l * 2
    zbuf = nwin * w_p * m * slot * 2
    w9 = nwin * l * m * slot * 2
    acc = nanchor * c3 * _lane_pad(cin) * 4
    io = 2 * (nanchor * tile * 4 + 2 * tile * _lane_pad(cin) * 2)
    stack = nanchor * (slot + l) * sub * 4
    gcat = nanchor * c3 * sub * 2
    return (win + zbuf + w9 + acc + io + stack + gcat
            < 14_500_000)


def _w27_active_slice(va, v, tile_sz, starts, sub_off, rb_local, sub,
                      *rows):
    """Slice plan arrays (+ any V-length ``rows``) to the active output
    prefix ``va`` (host-computed multiple of the tile; rows past it are
    all-padding).  Returns (starts, sub_off, rb_local, *rows)."""
    if not va or va >= v or va % tile_sz:
        return (starts, sub_off, rb_local) + rows
    ta = va // tile_sz
    starts = starts[:ta]
    if sub and sub_off is not None and sub_off.shape[0]:
        sub_off = sub_off[:ta * (tile_sz // sub)]
    rb_local = rb_local[:va]
    return (starts, sub_off, rb_local) + tuple(r[:va] for r in rows)


def _pad_active(out, v):
    """Zero-pad an active-prefix kernel result back to the V domain."""
    if out.shape[0] == v:
        return out
    return jnp.pad(out, ((0, v - out.shape[0]), (0, 0)))


def _w27_matmul_any(feats, rb_local, starts, w2d, window, sub=0, subwin=0,
                    sub_off=None, v_active=0):
    """27-tap windowed gather-GEMM -> (V, Cout); kernel route returns the
    feats dtype (f32 accumulation in-kernel), einsum fallback f32.

    feats (V, C); rb_local (V, 27); starts (tiles, nwin) per-group shared
    windows; w2d (27C, Cout) raw-tap-order weights.  With ``sub``, locals
    are sub-window-relative and ``sub_off`` carries slice offsets; if the
    sub kernel's extra scratch would overflow VMEM the flat kernel (or
    einsum) evaluates the reconstructed big-window locals instead.
    ``v_active``: the kernel grid runs only over the active output
    prefix; trailing all-padding rows come back as zeros.
    """
    rb_local = _rb32(rb_local)
    v = feats.shape[0]
    tile_sz = v // starts.shape[0]
    starts, sub_off, rb_local = _w27_active_slice(
        v_active, v, tile_sz, starts, sub_off, rb_local, sub)
    tiles = starts.shape[0]
    va = tiles * tile_sz          # active output rows (== v when unsliced)
    c = feats.shape[1]
    cout = w2d.shape[-1]
    if _use_pallas_kernel(va, tiles, window, 27, c, cout):
        from tdwss.ops.pallas_subm import (pad_w9, windowed_matmul,
                                           windowed_matmul_sub)

        w27p = pad_w9(w2d.reshape(27, c, -1))
        if sub and _sub_vmem_fits(window, c, cout, dw=False):
            return _pad_active(windowed_matmul_sub(
                feats, starts.reshape(-1), sub_off.reshape(-1),
                rb_local.T, w27p, window=window, tile=tile_sz,
                sub=sub, subwin=subwin), v)
        if sub:
            rb_local = _sub_big_locals(rb_local, sub_off, window, sub,
                                       subwin)
        return _pad_active(windowed_matmul(
            feats, starts.reshape(-1), rb_local.T, w27p,
            window=window, tile=tile_sz), v)
    if sub:
        rb_local = _sub_big_locals(rb_local, sub_off, window, sub, subwin)
    return _pad_active(
        _win_matmul(feats, rb_local, _w27_expand(starts), w2d, window), v)


def _w27_dw_any(feats, rb_local, starts, dout, window, sub=0, subwin=0,
                sub_off=None, v_active=0):
    """27-tap windowed dW -> (27C, Cout) f32 (raw tap order)."""
    rb_local = _rb32(rb_local)
    v = feats.shape[0]
    tile_sz = v // starts.shape[0]
    starts, sub_off, rb_local, dout = _w27_active_slice(
        v_active, v, tile_sz, starts, sub_off, rb_local, sub, dout)
    tiles = starts.shape[0]
    va = tiles * tile_sz
    c = feats.shape[1]
    cout = dout.shape[-1]
    if _use_pallas_kernel(va, tiles, window, 27, c, cout):
        from tdwss.ops.pallas_subm import windowed_dw, windowed_dw_sub

        if sub and _sub_vmem_fits(window, c, cout, dw=True):
            dw = windowed_dw_sub(
                feats, starts.reshape(-1), sub_off.reshape(-1),
                rb_local.T, dout, window=window, tile=tile_sz,
                sub=sub, subwin=subwin)
        else:
            rb = (_sub_big_locals(rb_local, sub_off, window, sub, subwin)
                  if sub else rb_local)
            dw = windowed_dw(feats, starts.reshape(-1), rb.T, dout,
                             window=window, tile=tile_sz)
        return dw[:, :c, :].reshape(27 * c, -1)
    if sub:
        rb_local = _sub_big_locals(rb_local, sub_off, window, sub, subwin)
    return _win_dw(feats, rb_local, _w27_expand(starts), dout, window)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _subm_conv_w27(window, sub, subwin, v_active, feats, starts, sub_off,
                   rb_local, rtile, res_ovf, ovf_v, ovf_count, weight):
    """27-tap windowed submanifold conv (tdwss.ops.plan.Windowed27)."""
    k, cin, cout = weight.shape
    w2d = weight.reshape(k * cin, cout)
    out = _w27_matmul_any(feats, rb_local, starts, w2d, window, sub, subwin,
                          sub_off, v_active)
    out = out.astype(feats.dtype) + _res_all_apply(
        feats, rtile, res_ovf, ovf_v, ovf_count,
        w2d, cout).astype(feats.dtype)
    return out


def _subm_conv_w27_fwd(window, sub, subwin, v_active, feats, starts,
                       sub_off, rb_local, rtile, res_ovf, ovf_v, ovf_count,
                       weight):
    out = _subm_conv_w27(window, sub, subwin, v_active, feats, starts,
                         sub_off, rb_local, rtile, res_ovf, ovf_v,
                         ovf_count, weight)
    # Save the tap-ordered heavy-list feats gather for the backward's dW
    # (CSE'd with the identical gather inside the primal — free here; the
    # backward sits behind an optimization_barrier so re-gathering there
    # costs the full 36-84k-row latency again).
    tent = rtile[3]
    f_tap = (jnp.take(feats, _oob(tent[:, 0], feats.shape[0]), axis=0,
                      mode="fill", fill_value=0)
             if tent.shape[0] else None)
    return out, (feats, starts, sub_off, rb_local, rtile, res_ovf,
                 ovf_v, ovf_count, weight, f_tap)


def _w27_bwd_gather(feats, dout_c, weight, rb_local, starts, sub_off,
                    window, sub, subwin, v_active=0):
    """Symmetric gather-fused backward route, or None when inapplicable.

    Exploits the 27-tap rulebook's flip-symmetry (rb[v,k]=u <=>
    rb[u,26-k]=v) to evaluate dW as an OUTPUT-DOMAIN gather inside the
    dfeats kernel (tdwss.ops.pallas_subm.windowed_bwd_gather): one window
    DMA set + one transposed one-hot per (sub-tile, anchor) drive both
    products, with no [feats|dout] concat (p=4 packing survives) and no
    scatter buffer.  Applies on the packed _oh_t levels (cin, cout <= 64)
    where the separate dW kernel was the step's largest term (~228 ms of
    902, DESIGN.md round-4 profile).
    """
    import os

    if os.environ.get("TDWSS_NO_GATHER_BWD"):  # bisect/ablation knob
        return None
    v = feats.shape[0]
    tiles = starts.shape[0]
    k, cin, cout = weight.shape
    from tdwss.ops.pallas_subm import pad_w9

    # dfeats direction sizes: source = cotangent (cout), out = cin.
    # The kernel always runs the transposed-accumulate orientation; at
    # C=96 that costs the dfeats side ~2 ms vs the plain fwd kernel but
    # still beats the unfused pair by ~3-4 ms (roofline r5: fused 7.1 ms
    # vs 4.6 + ~6 unfused at L2), so the gate is channel-width only.
    if not (sub and k == 27 and cin <= 128 and cout <= 128
            and _use_pallas_kernel(v, tiles, window, k, cout, cin)
            and _sub_vmem_fits(window, cout, cin, dw=False, nanchor=k)
            and _gather_vmem_fits(window, cout, cin, nanchor=k, sub=sub,
                                  tile=v // tiles)):
        return None
    from tdwss.ops.pallas_subm import windowed_bwd_gather

    tile_sz = v // tiles
    rb_local = _rb32(rb_local)
    starts, sub_off, rb_local, feats_a = _w27_active_slice(
        v_active, v, tile_sz, starts, sub_off, rb_local, sub, feats)
    wt9 = pad_w9(weight[::-1].transpose(0, 2, 1))       # (K, Lp, cin)
    dfeats, dw3 = windowed_bwd_gather(
        dout_c, feats_a, starts.reshape(-1), sub_off.reshape(-1),
        rb_local.T, wt9, window=window, tile=tile_sz, sub=sub,
        subwin=subwin, cout=cout)
    return _pad_active(dfeats, v), dw3.reshape(k * cin, cout)


def _w27_bwd_fused(feats, dout_c, weight, rb_local, starts, sub_off,
                   window, sub, subwin, v_active=0):
    """Fused backward kernel route, or None when it does not apply.

    One window-DMA set + shared one-hot machinery produce dfeats AND dW
    (tdwss.ops.pallas_subm.windowed_bwd_sub) over the channel-concatenated
    [feats | dout] source.  Applies when the sub form is active on the
    Pallas route and the concat does not grow the lane padding (C <= 64
    levels — exactly the expensive ones).
    """
    import os

    if os.environ.get("TDWSS_NO_FUSED_BWD"):   # bisect/ablation knob
        return None
    v = feats.shape[0]
    tiles = starts.shape[0]
    k, cin, cout = weight.shape
    ccat = cin + cout
    from tdwss.ops.pallas_subm import _lane_pad, _pack_p

    if (_pack_p(cout, cin, v, window, subwin) > 1
            or _pack_p(cin, cout, v, window, subwin) > 1):
        # The packed-row layout (pallas_subm._PACK) beats the fused kernel
        # through the UNFUSED pair: dfeats rides the p=4 fwd kernel on the
        # cotangent and dW the packed dw kernel, while the fused form's
        # per-block one-hot splits forfeit its shared-one-hot economy
        # (measured v5e L0 f+b: unfused-packed 45.1 ms vs fused-packed
        # 68.4, fused-unpacked 51.3).
        return None
    if not (sub and _use_pallas_kernel(v, tiles, window, k, ccat, cout)
            and _lane_pad(ccat) == _lane_pad(max(cin, cout))
            and _sub_vmem_fits(window, ccat, max(cin, cout), dw=True,
                               nanchor=k)):
        return None
    from tdwss.ops.pallas_subm import windowed_bwd_sub

    l = _lane_pad(ccat)
    tile_sz = v // tiles
    starts, sub_off, rb_local, dout_k = _w27_active_slice(
        v_active, v, tile_sz, starts, sub_off, rb_local, sub, dout_c)
    src_cat = jnp.concatenate([feats, dout_c], axis=1)
    wt = weight[::-1].transpose(0, 2, 1)                  # (K, cout, cin)
    wt_full = jnp.zeros((k, l, cin), weight.dtype)
    wt_full = wt_full.at[:, cin:cin + cout, :].set(wt)
    dfeats, dw_l = windowed_bwd_sub(
        src_cat, starts.reshape(-1), sub_off.reshape(-1), rb_local.T,
        wt_full, dout_k, window=window, tile=tile_sz, sub=sub,
        subwin=subwin, cin=cin)
    dw = dw_l[:, :cin, :].reshape(k * cin, cout)
    return _pad_active(dfeats, v), dw


def _subm_conv_w27_bwd(window, sub, subwin, v_active, res, dout):
    (feats, starts, sub_off, rb_local, rtile, res_ovf, ovf_v, ovf_count,
     weight, f_tap) = res
    k, cin, cout = weight.shape
    if f_tap is not None:
        feats, dout, f_tap = jax.lax.optimization_barrier(
            (feats, dout, f_tap))
    else:
        feats, dout = jax.lax.optimization_barrier((feats, dout))
    dout_c = dout.astype(feats.dtype)

    # Symmetric gather route: its windowed dW covers the FLIP of the
    # forward windowed entry set, so the spill dW below must evaluate in
    # flipped orientation too (flip is an involution on the full rb entry
    # set — the union then covers every entry exactly once).
    flip_spill = False
    fused = _w27_bwd_gather(feats, dout_c, weight, rb_local, starts,
                            sub_off, window, sub, subwin, v_active)
    if fused is not None:
        flip_spill = True
        f_tap = None          # src-side gather — unusable when flipped
    else:
        fused = _w27_bwd_fused(feats, dout_c, weight, rb_local, starts,
                               sub_off, window, sub, subwin, v_active)
    if fused is not None:
        dfeats, dw = fused
    else:
        dw = _w27_dw_any(feats, rb_local, starts, dout_c, window, sub,
                         subwin, sub_off, v_active)
        # dfeats: the decomposition exactly covers rb27, and the
        # transposed conv runs over the SAME rulebook with
        # Wt[m] = W[26-m]^T — so the same windows / locals / spill list
        # evaluate it (plain-path backward derivation, tdwss/ops/plan.py
        # Windowed27 docstring).
        wt2d_ = weight[::-1].transpose(0, 2, 1).reshape(k * cout, cin)
        dfeats = _w27_matmul_any(dout_c, rb_local, starts, wt2d_, window,
                                 sub, subwin, sub_off, v_active)

    dw = dw + _res_all_dw(feats, rtile, res_ovf, dout_c, f_tap=f_tap,
                          flip=flip_spill)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)

    wt2d = weight[::-1].transpose(0, 2, 1).reshape(k * cout, cin)
    # accumulate branches in the feats dtype: the f32 (V, C) pad+add
    # fusions were ~1.7 ms each at L0 and the result is cast anyway
    dfeats = dfeats.astype(feats.dtype) + _res_all_apply(
        dout_c, rtile, res_ovf, ovf_v,
        ovf_count, wt2d, cin).astype(feats.dtype)

    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    zt = jax.tree_util.tree_map(zeros, rtile)
    return (dfeats, zeros(starts), zeros(sub_off), zeros(rb_local),
            zt, zeros(res_ovf), zeros(ovf_v),
            zeros(ovf_count), dw)


_subm_conv_w27.defvjp(_subm_conv_w27_fwd, _subm_conv_w27_bwd)


def _rb32(rb):
    """rb_local ships host->device as int16 (tdwss.data.plans slimming);
    kernels and einsum fallbacks index with int32 — one fused upcast."""
    rb = jnp.asarray(rb)
    return rb if rb.dtype == jnp.int32 else rb.astype(jnp.int32)


def subm_conv_apply(feats: jnp.ndarray, rulebook: jnp.ndarray,
                    weight: jnp.ndarray, win=None) -> jnp.ndarray:
    """Submanifold convolution: output sites == input sites.

    feats (V, Cin); rulebook (V, K) — must come from a centred odd cubic
    kernel over a single coordinate set (the transpose-symmetry the
    backward relies on); weight (K, Cin, Cout) -> (V, Cout).  ``win``
    (tdwss.ops.plan.Windowed27, host-built) selects the windowed-MXU
    path; without it the plain gather-GEMM path runs.
    """
    if win is not None and rulebook.shape[-1] == 27:
        sub_off = (win.sub_off if win.sub_off is not None
                   else jnp.zeros((0, win.starts.shape[1]), jnp.int32))
        rtile = _pack_rtile(win)
        return _subm_conv_w27(
            win.window, win.sub, win.subwin, getattr(win, "v_active", 0),
            feats, win.starts, sub_off, _rb32(win.rb_local), rtile,
            win.res_ovf, win.ovf_v, win.ovf_count, weight)
    return _subm_conv(feats, rulebook, weight)


def _tap_select_matmul(g: jnp.ndarray, taps: jnp.ndarray, w_t: jnp.ndarray,
                       k: int) -> jnp.ndarray:
    """rows g[f] @ W[taps[f]]^T as one 2D GEMM.

    g (N, Cout); taps (N,) in [0,K); w_t (K*Cout, Cin) = W.transpose(0,2,1)
    flattened.  Builds the (N, K*Cout) one-hot-masked operand (2D, so no
    tile-padding blowup) and runs a single MXU GEMM.
    """
    n, cout = g.shape
    onehot = jax.nn.one_hot(taps, k, dtype=g.dtype)            # (N, K)
    z = (onehot[:, :, None] * g[:, None, :]).reshape(n, k * cout)
    return jnp.dot(z, w_t.astype(g.dtype),
                   preferred_element_type=jnp.float32)


@jax.custom_vjp
def _strided_conv(fine_feats, down_rb, parent, child_offset, weight):
    return _gather_matmul_impl(
        fine_feats, down_rb, weight.reshape(-1, weight.shape[-1]))


def _strided_conv_fwd(fine_feats, down_rb, parent, child_offset, weight):
    out = _strided_conv(fine_feats, down_rb, parent, child_offset, weight)
    return out, (fine_feats, down_rb, parent, child_offset, weight)


def _strided_conv_bwd(res, dout):
    fine_feats, down_rb, parent, child_offset, weight = res
    k, cin, cout = weight.shape
    fine_feats, dout = jax.lax.optimization_barrier((fine_feats, dout))
    dout_c = dout.astype(fine_feats.dtype)
    dw = _gather_matmul_dw(fine_feats, down_rb, dout_c)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    # dfine[f] = dout[parent[f]] @ W[child_offset[f]]^T — pure gather.
    g = jnp.take(dout_c, _oob(parent, dout_c.shape[0]), axis=0,
                 mode="fill", fill_value=0)                    # (Vf, Cout)
    w_t = weight.transpose(0, 2, 1).reshape(k * cout, cin)
    dfine = _tap_select_matmul(g, child_offset, w_t, k).astype(
        fine_feats.dtype)
    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    return dfine, zeros(down_rb), zeros(parent), zeros(child_offset), dw


_strided_conv.defvjp(_strided_conv_fwd, _strided_conv_bwd)


def strided_conv_apply(fine_feats: jnp.ndarray, down_rb: jnp.ndarray,
                       weight: jnp.ndarray,
                       parent: Optional[jnp.ndarray] = None,
                       child_offset: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Strided convolution fine -> coarse (filter == stride).

    fine_feats (Vf, Cin); down_rb (Vc, f^3) indices into the fine level;
    weight (f^3, Cin, Cout) -> (Vc, Cout).  ``parent``/``child_offset``
    (both (Vf,)) enable the scatter-free backward; required under AD.
    """
    if parent is None or child_offset is None:
        # plain-autodiff fallback (scatter VJP through the gather)
        return _gather_matmul_impl(
            fine_feats, down_rb, weight.reshape(-1, weight.shape[-1]))
    return _strided_conv(fine_feats, down_rb, parent, child_offset, weight)


def _deconv_raw(coarse_feats, parent, child_offset, weight):
    k, cin, cout = weight.shape
    cdt = coarse_feats.dtype
    ids = _oob(parent, coarse_feats.shape[0])
    g = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    # fine[f] = coarse[parent[f]] @ W[child_offset[f]] — tap-select GEMM on
    # W (not W^T): w2d rows are (k, cin) pairs.
    onehot = jax.nn.one_hot(child_offset, k, dtype=cdt)        # (Vf, K)
    z = (onehot[:, :, None] * g[:, None, :]).reshape(-1, k * cin)
    out = jnp.dot(z, weight.reshape(k * cin, cout).astype(cdt),
                  preferred_element_type=jnp.float32)
    return out.astype(cdt)


@jax.custom_vjp
def _deconv(coarse_feats, parent, child_offset, down_rb, weight):
    return _deconv_raw(coarse_feats, parent, child_offset, weight)


def _deconv_fwd(coarse_feats, parent, child_offset, down_rb, weight):
    out = _deconv(coarse_feats, parent, child_offset, down_rb, weight)
    return out, (coarse_feats, parent, child_offset, down_rb, weight)


def _deconv_bwd(res, dout):
    coarse_feats, parent, child_offset, down_rb, weight = res
    k, cin, cout = weight.shape
    cdt = coarse_feats.dtype
    coarse_feats, dout = jax.lax.optimization_barrier((coarse_feats, dout))
    dout_c = dout.astype(cdt)
    # dW[k] = sum_{f: off=k} coarse[parent[f]]^T dout[f] — one-hot-expanded
    # (Vf, K*Cin) operand, ONE GEMM.
    ids = _oob(parent, coarse_feats.shape[0])
    g = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    onehot = jax.nn.one_hot(child_offset, k, dtype=cdt)
    z = (onehot[:, :, None] * g[:, None, :]).reshape(-1, k * cin)
    dw = jnp.dot(z.T, dout_c, preferred_element_type=jnp.float32)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    # dcoarse = gather-GEMM over the strided rulebook (children by tap).
    w_t = weight.transpose(0, 2, 1).reshape(k * cout, cin)
    dcoarse = _gather_matmul_impl(dout_c, down_rb, w_t).astype(cdt)
    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    return dcoarse, zeros(parent), zeros(child_offset), zeros(down_rb), dw


_deconv.defvjp(_deconv_fwd, _deconv_bwd)


def deconv_apply(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
                 child_offset: jnp.ndarray, weight: jnp.ndarray,
                 fine_valid: Optional[jnp.ndarray] = None,
                 down_rb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed convolution coarse -> fine (filter == stride).

    Each fine site receives exactly one contribution: its parent's features
    through the filter tap it occupies.

    coarse_feats (Vc, Cin); parent (Vf,); child_offset (Vf,);
    weight (K, Cin, Cout); down_rb (Vc, K) enables the scatter-free
    backward -> (Vf, Cout).
    """
    if down_rb is None:
        # plain-autodiff fallback: correct gradients via XLA scatter (slow
        # on TPU) — training paths must supply down_rb.
        out = _deconv_raw(coarse_feats, parent, child_offset, weight)
    else:
        out = _deconv(coarse_feats, parent, child_offset, down_rb, weight)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


@jax.custom_vjp
def _unpool(coarse_feats, parent, down_rb):
    ids = _oob(parent, coarse_feats.shape[0])
    return jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)


def _unpool_fwd(coarse_feats, parent, down_rb):
    return _unpool(coarse_feats, parent, down_rb), (parent, down_rb,
                                                    coarse_feats.shape[0])


def _unpool_bwd(res, dout):
    parent, down_rb, vc = res
    # dcoarse[c] = sum_k dout[down_rb[c,k]] — gather, not scatter.
    ids = _oob(down_rb, dout.shape[0])
    g = jnp.take(dout, ids, axis=0, mode="fill", fill_value=0)  # (Vc, K, C)
    dcoarse = jnp.sum(g.astype(jnp.float32), axis=1).astype(dout.dtype)
    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    return dcoarse, zeros(parent), zeros(down_rb)


_unpool.defvjp(_unpool_fwd, _unpool_bwd)


def unpool(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
           fine_valid: Optional[jnp.ndarray] = None,
           down_rb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """scn.UnPooling parity: copy the parent voxel's features to children.

    ``down_rb`` (Vc, f^3) enables the scatter-free backward.
    """
    if down_rb is None:
        # plain-autodiff fallback (scatter VJP); training supplies down_rb.
        ids = _oob(parent, coarse_feats.shape[0])
        out = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    else:
        out = _unpool(coarse_feats, parent, down_rb)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


def max_pool(fine_feats: jnp.ndarray, down_rb: jnp.ndarray) -> jnp.ndarray:
    """scn.MaxPooling parity (filter == stride): gather-max over children.

    fine_feats (Vf, C); down_rb (Vc, f^3) -> (Vc, C).  Gather-based (the
    transposed formulation) so fwd AND autodiff bwd stay scatter-free.
    """
    ids = _oob(down_rb, fine_feats.shape[0])
    neg = jnp.finfo(fine_feats.dtype).min
    g = jnp.take(fine_feats, ids, axis=0, mode="fill",
                 fill_value=neg)                               # (Vc, K, C)
    out = jnp.max(g, axis=1)
    return jnp.where(out == neg, 0, out)


def avg_pool(fine_feats: jnp.ndarray, down_rb: jnp.ndarray) -> jnp.ndarray:
    """scn.AveragePooling parity: gather-mean over children."""
    ids = _oob(down_rb, fine_feats.shape[0])
    g = jnp.take(fine_feats, ids, axis=0, mode="fill", fill_value=0)
    cnt = jnp.sum((down_rb >= 0).astype(jnp.float32), axis=1)
    summed = jnp.sum(g.astype(jnp.float32), axis=1)
    return (summed / jnp.maximum(cnt, 1.0)[:, None]).astype(fine_feats.dtype)


# ---------------------------------------------------------------------------
# Windowed cross-level convolution (metadata: tdwss.ops.plan.WindowedGather)
# ---------------------------------------------------------------------------
# Strided conv, deconv and unpool all evaluate a (V_out, K) rulebook whose
# source rows live in the OTHER level's coordinate system.  Source rows of
# consecutive output rows are spatially local under the shared key sort, so
# all K taps of an output tile read one shared source window — the same
# one-hot-matmul machinery as the submanifold conv, with nwin=1.  The
# backward direction is the transposed rulebook, which the host provides
# as its own WindowedGather (down_rb <-> the (parent, child_offset) map),
# with weights W[k]^T and NO tap flip (tap index == child_offset on both
# sides).


def _use_pallas_wg(v_src, v_out, tiles, window, k, c, cout,
                   nwin=1) -> bool:
    import os

    if _NO_PALLAS_CTX.get() or os.environ.get("TDWSS_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if max(v_src, v_out) < _PALLAS_MIN_V:
        return False
    if not (tiles > 0 and v_out % tiles == 0 and window % 8 == 0
            and v_src % 8 == 0):
        return False
    return _kernel_vmem_fits(k, window, c, cout, v_out // tiles, nwin=nwin)


def _wg_expand(starts, k):
    """(tiles, nwin) shared-window starts -> (tiles, K) per-tap starts."""
    if starts.ndim == 1:
        starts = starts[:, None]
    nwin = starts.shape[1]
    return starts[:, np.arange(k, dtype=np.int32) % nwin]


def _wg_matmul_any(src, rb_local, starts, w2d, window, sub=0, subwin=0,
                   sub_off=None):
    """Windowed rulebook eval -> (V_out, Cout) f32.  starts (tiles, nwin)
    with tap -> window group = tap % nwin (z-parity grouped children).
    With ``sub``, locals are sub-window-relative (see Windowed27)."""
    rb_local = _rb32(rb_local)
    v_src, c = src.shape
    v_out, k = rb_local.shape
    tiles = starts.shape[0]
    nwin = starts.shape[1] if starts.ndim > 1 else 1
    cout = w2d.shape[-1]
    if _use_pallas_wg(v_src, v_out, tiles, window, k, c, cout, nwin):
        from tdwss.ops.pallas_subm import (pad_w9, windowed_matmul,
                                           windowed_matmul_sub)

        wp = pad_w9(w2d.reshape(k, c, -1))
        if sub and _sub_vmem_fits(window, c, cout, dw=False, nanchor=k,
                                  nwin=nwin):
            return windowed_matmul_sub(
                src, starts.reshape(-1), sub_off.reshape(-1), rb_local.T,
                wp, window=window, tile=v_out // tiles, sub=sub,
                subwin=subwin)
        if sub:
            rb_local = _sub_big_locals(rb_local, sub_off, window, sub,
                                       subwin)
        return windowed_matmul(src, starts.reshape(-1), rb_local.T, wp,
                               window=window, tile=v_out // tiles)
    if sub:
        rb_local = _sub_big_locals(rb_local, sub_off, window, sub, subwin)
    return _win_matmul(src, rb_local, _wg_expand(starts, k), w2d, window)


def _wg_dw_any(src, rb_local, starts, dout, window, sub=0, subwin=0,
               sub_off=None):
    """Windowed rulebook dW -> (K*C, Cout) f32 (raw tap order)."""
    rb_local = _rb32(rb_local)
    v_src, c = src.shape
    v_out, k = rb_local.shape
    tiles = starts.shape[0]
    nwin = starts.shape[1] if starts.ndim > 1 else 1
    cout = dout.shape[-1]
    if _use_pallas_wg(v_src, v_out, tiles, window, k, c, cout, nwin):
        from tdwss.ops.pallas_subm import windowed_dw, windowed_dw_sub

        if sub and _sub_vmem_fits(window, c, cout, dw=True, nanchor=k,
                                  nwin=nwin):
            dw = windowed_dw_sub(
                src, starts.reshape(-1), sub_off.reshape(-1), rb_local.T,
                dout, window=window, tile=v_out // tiles, sub=sub,
                subwin=subwin)
            return dw[:, :c, :].reshape(k * c, -1)
        rb = (_sub_big_locals(rb_local, sub_off, window, sub, subwin)
              if sub else rb_local)
        dw = windowed_dw(src, starts.reshape(-1), rb.T, dout,
                         window=window, tile=v_out // tiles)
        return dw[:, :c, :].reshape(k * c, -1)
    if sub:
        rb_local = _sub_big_locals(rb_local, sub_off, window, sub, subwin)
    return _win_dw(src, rb_local, _wg_expand(starts, k), dout, window)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _wg_conv(window_f, window_b, sub_f, subwin_f, sub_b, subwin_b, feats,
             f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
             b_starts, b_soff, b_rb, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt,
             weight):
    """Forward-direction windowed rulebook conv with transposed backward.

    ``f_*`` metadata evaluates the forward rulebook (out domain = f_rb
    rows, src domain = feats rows); ``b_*`` is the host-built transposed
    rulebook used only in the backward for dfeats.
    """
    k, cin, cout = weight.shape
    w2d = weight.reshape(k * cin, cout)
    out = _wg_matmul_any(feats, f_rb, f_starts, w2d, window_f, sub_f,
                         subwin_f, f_soff)
    out = out.astype(feats.dtype) + _res_all_apply(
        feats, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
        w2d, cout, out_len=f_rb.shape[0]).astype(feats.dtype)
    return out


def _wg_conv_fwd(window_f, window_b, sub_f, subwin_f, sub_b, subwin_b,
                 feats, f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v,
                 f_ovf_cnt, b_starts, b_soff, b_rb, b_rtile, b_ovf,
                 b_ovf_v, b_ovf_cnt, weight):
    out = _wg_conv(window_f, window_b, sub_f, subwin_f, sub_b, subwin_b,
                   feats, f_starts, f_soff, f_rb, f_rtile, f_ovf,
                   f_ovf_v, f_ovf_cnt, b_starts, b_soff, b_rb, b_rtile,
                   b_ovf, b_ovf_v, b_ovf_cnt, weight)
    tent = f_rtile[3]
    f_tap = (jnp.take(feats, _oob(tent[:, 0], feats.shape[0]), axis=0,
                      mode="fill", fill_value=0)
             if tent.shape[0] else None)   # see _subm_conv_w27_fwd
    return out, (feats, f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v,
                 f_ovf_cnt, b_starts, b_soff, b_rb, b_rtile, b_ovf,
                 b_ovf_v, b_ovf_cnt, weight, f_tap)


def _wg_bwd_gather(feats, dout_c, weight, b_rb, b_starts, b_soff,
                   window_b, sub_b, subwin_b):
    """Fused wg backward via the transposed rulebook, or None.

    The cross-level rulebook pair is a bijection per tap (filter ==
    stride): entry (o, k, i) of the forward book is entry (i, k, o) of
    the transposed book with the SAME tap, so the dfeats kernel's raw
    gather of dout rows drives dW too (windowed_bwd_gather with
    flip_taps=False) — one window DMA set + one-hot per (sub, tap)
    replaces the separate f-side dW kernel.  The spill dW must then ride
    the B-side spill list in swapped orientation (feats[owner] (x)
    dout[src] into slot tap — _res_all_dw(flip=True, tap_flip=False)).
    """
    import os

    if os.environ.get("TDWSS_NO_GATHER_BWD"):
        return None
    k, cin, cout = weight.shape
    rb_local = _rb32(b_rb)
    v_out = rb_local.shape[0]
    v_src = dout_c.shape[0]
    tiles = b_starts.shape[0]
    nwin = b_starts.shape[1] if b_starts.ndim > 1 else 1
    if not (sub_b and cin <= 128 and cout <= 128 and v_out % tiles == 0
            and _use_pallas_wg(v_src, v_out, tiles, window_b, k, cout,
                               cin, nwin)
            and _sub_vmem_fits(window_b, cout, cin, dw=False, nanchor=k,
                               nwin=nwin)
            and _gather_vmem_fits(window_b, cout, cin, nanchor=k,
                                  nwin=nwin, sub=sub_b,
                                  tile=v_out // tiles)):
        return None
    from tdwss.ops.pallas_subm import pad_w9, windowed_bwd_gather

    wt9 = pad_w9(weight.transpose(0, 2, 1))        # (k, Lp(cout), cin)
    dfeats, dw3 = windowed_bwd_gather(
        dout_c, feats, b_starts.reshape(-1), b_soff.reshape(-1),
        rb_local.T, wt9, window=window_b, tile=v_out // tiles, sub=sub_b,
        subwin=subwin_b, cout=cout, flip_taps=False)
    return dfeats, dw3.reshape(k * cin, cout)


def _wg_conv_bwd(window_f, window_b, sub_f, subwin_f, sub_b, subwin_b, res,
                 dout):
    (feats, f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
     b_starts, b_soff, b_rb, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt,
     weight, f_tap) = res
    k, cin, cout = weight.shape
    if f_tap is not None:
        feats, dout, f_tap = jax.lax.optimization_barrier(
            (feats, dout, f_tap))
    else:
        feats, dout = jax.lax.optimization_barrier((feats, dout))
    dout_c = dout.astype(feats.dtype)

    wt2d = weight.transpose(0, 2, 1).reshape(k * cout, cin)
    fused = _wg_bwd_gather(feats, dout_c, weight, b_rb, b_starts, b_soff,
                           window_b, sub_b, subwin_b)
    if fused is not None:
        dfeats, dw = fused
        # spill dW in the B-side partition, swapped roles, same taps
        dw = dw + _res_all_dw(feats, b_rtile, b_ovf, dout_c, k,
                              flip=True, tap_flip=False)
    else:
        dw = _wg_dw_any(feats, f_rb, f_starts, dout_c, window_f, sub_f,
                        subwin_f, f_soff)
        dw = dw + _res_all_dw(feats, f_rtile, f_ovf, dout_c, k,
                              f_tap=f_tap)
        # dfeats via the transposed rulebook: tap index (child_offset) is
        # the same on both sides, so W transposes WITHOUT the tap flip.
        dfeats = _wg_matmul_any(dout_c, b_rb, b_starts, wt2d, window_b,
                                sub_b, subwin_b, b_soff)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    dfeats = dfeats.astype(feats.dtype) + _res_all_apply(
        dout_c, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt, wt2d, cin,
        out_len=b_rb.shape[0]).astype(feats.dtype)

    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    zt = jax.tree_util.tree_map(zeros, (f_rtile, b_rtile))
    return (dfeats, zeros(f_starts), zeros(f_soff), zeros(f_rb),
            zt[0], zeros(f_ovf), zeros(f_ovf_v), zeros(f_ovf_cnt),
            zeros(b_starts), zeros(b_soff), zeros(b_rb), zt[1],
            zeros(b_ovf), zeros(b_ovf_v), zeros(b_ovf_cnt), dw)


_wg_conv.defvjp(_wg_conv_fwd, _wg_conv_bwd)


def _wg_soff(wg):
    """sub_off array or a (0, nwin) placeholder (custom_vjp needs arrays)."""
    if wg.sub_off is not None:
        return wg.sub_off
    nwin = wg.starts.shape[1] if wg.starts.ndim > 1 else 1
    return jnp.zeros((0, nwin), jnp.int32)


def _pack_rtile(win):
    """(res_tile, res_hent, res_htile, res_tent, res_ttap, res_tperm)
    with array placeholders for Nones (custom_vjp needs concrete array
    leaves)."""
    rt = (win.res_tile if win.res_tile is not None
          else jnp.zeros((0, 0, 3), jnp.int32))
    he = (win.res_hent if win.res_hent is not None
          else jnp.zeros((0, 3), jnp.int32))
    ht = (win.res_htile if win.res_htile is not None
          else jnp.zeros((0, 2), jnp.int32))
    te = (win.res_tent if getattr(win, "res_tent", None) is not None
          else jnp.zeros((0, 2), jnp.int32))
    tt = (win.res_ttap if getattr(win, "res_ttap", None) is not None
          else jnp.zeros((0,), jnp.int32))
    tp = (win.res_tperm if getattr(win, "res_tperm", None) is not None
          else jnp.zeros((0,), jnp.int32))
    return (rt, he, ht, te, tt, tp)


_wg_rtile = _pack_rtile


def wg_conv_apply(feats: jnp.ndarray, weight: jnp.ndarray, wg_fwd,
                  wg_bwd) -> jnp.ndarray:
    """Cross-level conv through WindowedGather metadata.

    strided conv: ``wg_conv_apply(fine_feats, W, lvl.wg_down, lvl.wg_up)``
    deconv:       ``wg_conv_apply(coarse_feats, W, lvl.wg_up, lvl.wg_down)``
    with W (f^3, Cin, Cout) in child-offset tap order either way.
    """
    return _wg_conv(wg_fwd.window, wg_bwd.window,
                    wg_fwd.sub, wg_fwd.subwin, wg_bwd.sub, wg_bwd.subwin,
                    feats,
                    wg_fwd.starts, _wg_soff(wg_fwd), _rb32(wg_fwd.rb_local),
                    _wg_rtile(wg_fwd),
                    wg_fwd.res_ovf, wg_fwd.ovf_v, wg_fwd.ovf_count,
                    wg_bwd.starts, _wg_soff(wg_bwd), _rb32(wg_bwd.rb_local),
                    _wg_rtile(wg_bwd),
                    wg_bwd.res_ovf, wg_bwd.ovf_v, wg_bwd.ovf_count, weight)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _wg_unpool(window_f, window_b, c, sub_f, subwin_f, sub_b, subwin_b,
               feats,
               f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
               b_starts, b_soff, b_rb, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt):
    """Windowed unpool: out[f] = feats[parent[f]] via the up rulebook.

    Tap-tiled identity weights ride the generic machinery; the backward
    (sum over children) is the transposed rulebook with the same identity.
    """
    k = f_rb.shape[1]
    eye = jnp.tile(jnp.eye(c, dtype=feats.dtype), (k, 1))
    out = _wg_matmul_any(feats, f_rb, f_starts, eye, window_f, sub_f,
                         subwin_f, f_soff)
    out = out.astype(feats.dtype) + _res_all_apply(
        feats, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
        eye, c, out_len=f_rb.shape[0]).astype(feats.dtype)
    return out


def _wg_unpool_fwd(window_f, window_b, c, sub_f, subwin_f, sub_b, subwin_b,
                   feats, f_starts, f_soff, f_rb, f_rtile, f_ovf,
                   f_ovf_v, f_ovf_cnt, b_starts, b_soff, b_rb, b_rtile,
                   b_ovf, b_ovf_v, b_ovf_cnt):
    out = _wg_unpool(window_f, window_b, c, sub_f, subwin_f, sub_b,
                     subwin_b, feats, f_starts, f_soff, f_rb, f_rtile,
                     f_ovf, f_ovf_v, f_ovf_cnt, b_starts, b_soff, b_rb,
                     b_rtile, b_ovf, b_ovf_v, b_ovf_cnt)
    return out, (feats, f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v,
                 f_ovf_cnt, b_starts, b_soff, b_rb, b_rtile, b_ovf,
                 b_ovf_v, b_ovf_cnt)


def _wg_unpool_bwd(window_f, window_b, c, sub_f, subwin_f, sub_b, subwin_b,
                   res, dout):
    (feats, f_starts, f_soff, f_rb, f_rtile, f_ovf, f_ovf_v, f_ovf_cnt,
     b_starts, b_soff, b_rb, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt) = res
    k = b_rb.shape[1]
    dout_c = jax.lax.optimization_barrier(dout).astype(feats.dtype)
    eye = jnp.tile(jnp.eye(c, dtype=dout_c.dtype), (k, 1))
    dfeats = _wg_matmul_any(dout_c, b_rb, b_starts, eye, window_b, sub_b,
                            subwin_b, b_soff)
    dfeats = dfeats.astype(feats.dtype) + _res_all_apply(
        dout_c, b_rtile, b_ovf, b_ovf_v, b_ovf_cnt, eye, c,
        out_len=b_rb.shape[0]).astype(feats.dtype)
    zeros = lambda a: np.zeros(a.shape, dtype=float0)  # noqa: E731
    zt = jax.tree_util.tree_map(zeros, (f_rtile, b_rtile))
    return (dfeats, zeros(f_starts), zeros(f_soff), zeros(f_rb),
            zt[0], zeros(f_ovf), zeros(f_ovf_v), zeros(f_ovf_cnt),
            zeros(b_starts), zeros(b_soff), zeros(b_rb), zt[1],
            zeros(b_ovf), zeros(b_ovf_v), zeros(b_ovf_cnt))


_wg_unpool.defvjp(_wg_unpool_fwd, _wg_unpool_bwd)


def wg_unpool_apply(coarse_feats: jnp.ndarray, wg_up, wg_down) -> jnp.ndarray:
    """Unpool coarse -> fine through WindowedGather metadata."""
    return _wg_unpool(wg_up.window, wg_down.window, coarse_feats.shape[-1],
                      wg_up.sub, wg_up.subwin, wg_down.sub, wg_down.subwin,
                      coarse_feats,
                      wg_up.starts, _wg_soff(wg_up), _rb32(wg_up.rb_local),
                      _wg_rtile(wg_up),
                      wg_up.res_ovf, wg_up.ovf_v, wg_up.ovf_count,
                      wg_down.starts, _wg_soff(wg_down),
                      _rb32(wg_down.rb_local), _wg_rtile(wg_down),
                      wg_down.res_ovf, wg_down.ovf_v, wg_down.ovf_count)
