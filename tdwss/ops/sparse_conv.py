"""Sparse convolution applications: gather -> GEMM -> (implicit) scatter.

TPU-native replacements for SparseConvNet's CUDA rulebook execution
(``scn.SubmanifoldConvolution``, strided ``scn.Convolution``,
``scn.Deconvolution``, ``scn.UnPooling``, ``scn.MaxPooling`` — reference
models/SparseConvNet.py usage).  All functions are pure on arrays, take
precomputed rulebooks from :mod:`tdwss.ops.plan`, keep static shapes, and are
differentiable through JAX autodiff (gather VJP = scatter-add, which XLA
lowers natively on TPU).

Layout choices for the MXU:
- a (V, K) rulebook gathers into a single (V, K*Cin) operand so each conv is
  ONE large matmul (K*Cin is 432 for a 3^3 kernel at Cin=16) instead of 27
  skinny ones;
- accumulation in float32 (``preferred_element_type``) regardless of the
  bf16/f32 compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather_neighbors(feats: jnp.ndarray, rulebook: jnp.ndarray) -> jnp.ndarray:
    """(V, Cin), (Vo, K) -> (Vo, K*Cin); missing neighbors (-1) read zeros."""
    g = jnp.take(feats, rulebook, axis=0, mode="fill", fill_value=0)
    return g.reshape(rulebook.shape[0], -1)


def _matmul(g: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    w = weight.reshape(-1, weight.shape[-1])
    out = jnp.dot(g, w.astype(g.dtype), preferred_element_type=jnp.float32)
    return out.astype(g.dtype)


def subm_conv_apply(feats: jnp.ndarray, rulebook: jnp.ndarray,
                    weight: jnp.ndarray) -> jnp.ndarray:
    """Submanifold convolution: output sites == input sites.

    feats (V, Cin); rulebook (V, K); weight (K, Cin, Cout) -> (V, Cout).
    """
    return _matmul(gather_neighbors(feats, rulebook), weight)


def strided_conv_apply(fine_feats: jnp.ndarray, down_rb: jnp.ndarray,
                       weight: jnp.ndarray) -> jnp.ndarray:
    """Strided convolution fine -> coarse.

    fine_feats (Vf, Cin); down_rb (Vc, f^3) indices into the fine level;
    weight (f^3, Cin, Cout) -> (Vc, Cout).
    """
    return _matmul(gather_neighbors(fine_feats, down_rb), weight)


def deconv_apply(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
                 child_offset: jnp.ndarray, weight: jnp.ndarray,
                 fine_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed convolution coarse -> fine (filter == stride).

    Each fine site receives exactly one contribution: its parent's features
    through the filter tap it occupies.  Computed as one (Vf, Cin) x
    (Cin, K*Cout) GEMM followed by a one-hot tap selection (keeps the MXU
    busy; K is only 8 or 64).

    coarse_feats (Vc, Cin); parent (Vf,); child_offset (Vf,);
    weight (K, Cin, Cout) -> (Vf, Cout).
    """
    k, cin, cout = weight.shape
    g = jnp.take(coarse_feats, parent, axis=0, mode="fill", fill_value=0)
    res = jnp.dot(
        g, weight.transpose(1, 0, 2).reshape(cin, k * cout).astype(g.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(-1, k, cout)
    onehot = jax.nn.one_hot(child_offset, k, dtype=res.dtype)
    out = jnp.einsum("vk,vko->vo", onehot, res).astype(g.dtype)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


def unpool(coarse_feats: jnp.ndarray, parent: jnp.ndarray,
           fine_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """scn.UnPooling parity: copy the parent voxel's features to children."""
    out = jnp.take(coarse_feats, parent, axis=0, mode="fill", fill_value=0)
    if fine_valid is not None:
        out = jnp.where(fine_valid[:, None], out, 0)
    return out


def max_pool(fine_feats: jnp.ndarray, parent: jnp.ndarray,
             num_coarse: int) -> jnp.ndarray:
    """scn.MaxPooling parity (filter == stride): segment max over parents.

    Invalid fine rows must carry parent >= num_coarse (dropped by scatter).
    """
    neg = jnp.finfo(fine_feats.dtype).min
    out = (
        jnp.full((num_coarse, fine_feats.shape[1]), neg, fine_feats.dtype)
        .at[parent]
        .max(fine_feats, mode="drop")
    )
    return jnp.where(out == neg, 0, out)


def avg_pool(fine_feats: jnp.ndarray, parent: jnp.ndarray,
             num_coarse: int) -> jnp.ndarray:
    """scn.AveragePooling parity: segment mean over parents."""
    summed = (
        jnp.zeros((num_coarse, fine_feats.shape[1]), fine_feats.dtype)
        .at[parent]
        .add(fine_feats, mode="drop")
    )
    counts = (
        jnp.zeros((num_coarse,), jnp.int32).at[parent].add(1, mode="drop")
    )
    return summed / jnp.maximum(counts, 1).astype(summed.dtype)[:, None]
