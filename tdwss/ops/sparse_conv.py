"""Sparse convolution applications: gather -> GEMM -> (implicit) scatter.

TPU-native replacements for SparseConvNet's CUDA rulebook execution
(``scn.SubmanifoldConvolution``, strided ``scn.Convolution``,
``scn.Deconvolution``, ``scn.UnPooling``, ``scn.MaxPooling`` — reference
models/SparseConvNet.py usage).  All functions are pure on arrays, take
precomputed rulebooks from :mod:`tdwss.ops.plan`, and keep static shapes.

Layout choices for the MXU:
- a (V, K) rulebook gathers into a single (V, K*Cin) operand so each conv is
  ONE large matmul (K*Cin is 432 for a 3^3 kernel at Cin=16) instead of 27
  skinny ones;
- accumulation in float32 (``preferred_element_type``) regardless of the
  bf16/f32 compute dtype.

Memory: the convolutions carry a **custom VJP** that recomputes the gathered
(V, K*Cin) operand in the backward pass instead of letting autodiff save it
as a residual (SCN's CUDA backward does the same).  Residuals are only the
(V, Cin) activations + rulebooks; without this, a 7-level m=32 UNet at 786k
points OOMs a 16 GB chip.

Index hygiene: missing neighbors are encoded as -1 in rulebooks.  They are
remapped to V (definitely out-of-bounds) before every gather/scatter —
``jnp.take(mode='fill')`` WRAPS negative indices numpy-style rather than
filling them, so passing -1 through would silently read the last voxel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0


def _oob(rulebook: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map -1 'missing' entries to a true out-of-bounds index."""
    return jnp.where(rulebook >= 0, rulebook, size)


def gather_neighbors(feats: jnp.ndarray, rulebook: jnp.ndarray) -> jnp.ndarray:
    """(V, Cin), (Vo, K) -> (Vo, K*Cin); missing neighbors read zeros."""
    ids = _oob(rulebook, feats.shape[0])
    g = jnp.take(feats, ids, axis=0, mode="fill", fill_value=0)
    return g.reshape(rulebook.shape[0], -1)


@jax.custom_vjp
def _gather_matmul(feats: jnp.ndarray, rulebook: jnp.ndarray,
                   weight: jnp.ndarray) -> jnp.ndarray:
    """out[v] = concat_k feats[rulebook[v,k]] @ weight.reshape(K*Cin, Cout)."""
    g = gather_neighbors(feats, rulebook)
    w = weight.reshape(-1, weight.shape[-1])
    out = jnp.dot(g, w.astype(g.dtype), preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def _gather_matmul_fwd(feats, rulebook, weight):
    return _gather_matmul(feats, rulebook, weight), (feats, rulebook, weight)


def _gather_matmul_bwd(res, dout):
    """Two large GEMMs in the compute dtype with f32 accumulation.

    Materializing f32 copies of the (Vo, K*Cin) operands (einsum with
    .astype(float32)) peaked at ~57 GB HBM on the m=32 UNet bench batch;
    keeping operands bf16 and accumulating in f32 via
    ``preferred_element_type`` gives the same numerics the MXU produces in
    the forward pass at ~1/4 the transient memory.
    """
    feats, rulebook, weight = res
    k, cin, cout = weight.shape
    # The gather recompute depends only on forward inputs, so without a
    # barrier XLA's latency-hiding scheduler hoists EVERY backward gather to
    # the start of the program — ~28 live (V, K*Cin) buffers = 57 GB HBM on
    # the m=32 UNet bench.  Tying feats to the incoming cotangent forces
    # each recompute to run inside its own backward step.
    feats, dout = jax.lax.optimization_barrier((feats, dout))
    ids = _oob(rulebook, feats.shape[0])
    # dW = gathered^T @ dout  (gather recomputed, not stored)
    g2d = gather_neighbors(feats, rulebook)                  # (Vo, K*Cin)
    dout_c = dout.astype(g2d.dtype)
    dw = jnp.dot(g2d.T, dout_c, preferred_element_type=jnp.float32)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    # dfeats[rb[v,k]] += dout[v] @ W[k]^T  — one (Vo, Cout)x(Cout, K*Cin) GEMM
    w2d = weight.reshape(k * cin, cout).astype(dout_c.dtype)
    contrib = jnp.dot(
        dout_c, w2d.T, preferred_element_type=jnp.float32
    ).astype(feats.dtype).reshape(-1, k, cin)
    dfeats = jnp.zeros_like(feats).at[ids].add(contrib, mode="drop")
    drb = np.zeros(rulebook.shape, dtype=float0)
    return dfeats, drb, dw


_gather_matmul.defvjp(_gather_matmul_fwd, _gather_matmul_bwd)


def subm_conv_apply(feats: jnp.ndarray, rulebook: jnp.ndarray,
                    weight: jnp.ndarray) -> jnp.ndarray:
    """Submanifold convolution: output sites == input sites.

    feats (V, Cin); rulebook (V, K); weight (K, Cin, Cout) -> (V, Cout).
    """
    return _gather_matmul(feats, rulebook, weight)


def strided_conv_apply(fine_feats: jnp.ndarray, down_rb: jnp.ndarray,
                       weight: jnp.ndarray) -> jnp.ndarray:
    """Strided convolution fine -> coarse.

    fine_feats (Vf, Cin); down_rb (Vc, f^3) indices into the fine level;
    weight (f^3, Cin, Cout) -> (Vc, Cout).
    """
    return _gather_matmul(fine_feats, down_rb, weight)


@jax.custom_vjp
def _deconv(coarse_feats, parent, child_offset, weight):
    k, cin, cout = weight.shape
    ids = _oob(parent, coarse_feats.shape[0])
    g = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    res = jnp.dot(
        g, weight.transpose(1, 0, 2).reshape(cin, k * cout).astype(g.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(-1, k, cout)
    onehot = jax.nn.one_hot(child_offset, k, dtype=res.dtype)
    return jnp.einsum("vk,vko->vo", onehot, res).astype(coarse_feats.dtype)


def _deconv_fwd(coarse_feats, parent, child_offset, weight):
    out = _deconv(coarse_feats, parent, child_offset, weight)
    return out, (coarse_feats, parent, child_offset, weight)


def _deconv_bwd(res, dout):
    coarse_feats, parent, child_offset, weight = res
    k, cin, cout = weight.shape
    cdt = coarse_feats.dtype
    # See _gather_matmul_bwd: barrier keeps the recomputed gather inside its
    # backward step instead of hoisted-to-front by the scheduler.
    coarse_feats, dout = jax.lax.optimization_barrier((coarse_feats, dout))
    ids = _oob(parent, coarse_feats.shape[0])
    g = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    onehot = jax.nn.one_hot(child_offset, k, dtype=cdt)
    dout_c = dout.astype(cdt)
    # dW[k] = sum_{v: off=k} g[v]^T dout[v]: expand to (Vf, K*Cin) with the
    # one-hot mask, then ONE GEMM against dout (f32 accumulation).
    g_k = (onehot[:, :, None] * g[:, None, :]).reshape(-1, k * cin)
    dw = jnp.dot(g_k.T, dout_c, preferred_element_type=jnp.float32)
    dw = dw.reshape(k, cin, cout).astype(weight.dtype)
    # dcoarse[parent[v]] += dout[v] @ W[off[v]]^T
    tmp = jnp.dot(
        dout_c, weight.reshape(k * cin, cout).astype(cdt).T,
        preferred_element_type=jnp.float32,
    ).astype(cdt).reshape(-1, k, cin)
    contrib = jnp.take_along_axis(
        tmp, child_offset[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    dcoarse = jnp.zeros_like(coarse_feats).at[ids].add(contrib, mode="drop")
    dparent = np.zeros(parent.shape, dtype=float0)
    doff = np.zeros(child_offset.shape, dtype=float0)
    return dcoarse, dparent, doff, dw


_deconv.defvjp(_deconv_fwd, _deconv_bwd)


def deconv_apply(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
                 child_offset: jnp.ndarray, weight: jnp.ndarray,
                 fine_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed convolution coarse -> fine (filter == stride).

    Each fine site receives exactly one contribution: its parent's features
    through the filter tap it occupies.

    coarse_feats (Vc, Cin); parent (Vf,); child_offset (Vf,);
    weight (K, Cin, Cout) -> (Vf, Cout).
    """
    out = _deconv(coarse_feats, parent, child_offset, weight)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


def unpool(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
           fine_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """scn.UnPooling parity: copy the parent voxel's features to children."""
    ids = _oob(parent, coarse_feats.shape[0])
    out = jnp.take(coarse_feats, ids, axis=0, mode="fill", fill_value=0)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


def max_pool(fine_feats: jnp.ndarray, parent: jnp.ndarray,
             num_coarse: int) -> jnp.ndarray:
    """scn.MaxPooling parity (filter == stride): segment max over parents.

    Invalid fine rows must carry parent >= num_coarse (dropped by scatter).
    """
    neg = jnp.finfo(fine_feats.dtype).min
    ids = _oob(parent, num_coarse)
    out = (
        jnp.full((num_coarse, fine_feats.shape[1]), neg, fine_feats.dtype)
        .at[ids]
        .max(fine_feats, mode="drop")
    )
    return jnp.where(out == neg, 0, out)


def avg_pool(fine_feats: jnp.ndarray, parent: jnp.ndarray,
             num_coarse: int) -> jnp.ndarray:
    """scn.AveragePooling parity: segment mean over parents."""
    ids = _oob(parent, num_coarse)
    summed = (
        jnp.zeros((num_coarse, fine_feats.shape[1]), fine_feats.dtype)
        .at[ids]
        .add(fine_feats, mode="drop")
    )
    counts = jnp.zeros((num_coarse,), jnp.int32).at[ids].add(1, mode="drop")
    return summed / jnp.maximum(counts, 1).astype(summed.dtype)[:, None]
