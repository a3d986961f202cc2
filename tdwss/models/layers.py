"""Flax building blocks for sparse voxel networks.

TPU-native equivalents of the scn layer vocabulary used by the reference
encoders (models/SparseConvNet.py): ``SubmanifoldConvolution``, strided
``Convolution``, ``Deconvolution``, ``BatchNormReLU``/``BatchNormLeakyReLU``,
``NetworkInNetwork``.  Each module operates on a (V, C) active-voxel feature
matrix plus the precomputed rulebooks from :mod:`tdwss.ops.plan`.

Conventions matching scn:
- convolutions are bias-free (the reference always passes bias=False);
- BN: eps 1e-4, running-average momentum 0.9 (scn defaults), computed over
  *valid* voxels only (padding rows are masked out of the statistics);
- weight init: He-normal over fan_in = K * Cin (scn's normal(0, sqrt(2/fan))).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdwss.ops.sparse_conv import deconv_apply, strided_conv_apply, subm_conv_apply


def _conv_init(key, shape, dtype=jnp.float32):
    # shape (K, Cin, Cout): fan_in = K * Cin
    k, cin, _ = shape
    std = (2.0 / (k * cin)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SubmConv(nn.Module):
    """Submanifold convolution over a fixed coordinate set (scn parity).

    ``win`` (host-built Windowed27) selects the windowed-MXU fast path.
    """

    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats: jnp.ndarray, rulebook: jnp.ndarray,
                 win=None) -> jnp.ndarray:
        w = self.param(
            "kernel", _conv_init,
            (self.kernel_volume, feats.shape[-1], self.out_channels),
        )
        return subm_conv_apply(feats, rulebook, w, win)


class StridedConv(nn.Module):
    """Downsampling convolution fine -> coarse (scn.Convolution parity).

    ``parent``/``child_offset`` carry the transposed map for the
    scatter-free backward (tdwss.ops.sparse_conv).
    """

    out_channels: int
    kernel_volume: int = 8

    @nn.compact
    def __call__(self, fine_feats: jnp.ndarray, down_rb: jnp.ndarray,
                 parent=None, child_offset=None, wg_down=None,
                 wg_up=None) -> jnp.ndarray:
        w = self.param(
            "kernel", _conv_init,
            (self.kernel_volume, fine_feats.shape[-1], self.out_channels),
        )
        if wg_down is not None and wg_up is not None:
            from tdwss.ops.sparse_conv import wg_conv_apply

            return wg_conv_apply(fine_feats, w, wg_down, wg_up)
        return strided_conv_apply(fine_feats, down_rb, w, parent,
                                  child_offset)


class Deconv(nn.Module):
    """Transposed convolution coarse -> fine (scn.Deconvolution parity).

    ``down_rb`` carries the transposed map for the scatter-free backward.
    """

    out_channels: int
    kernel_volume: int = 8

    @nn.compact
    def __call__(self, coarse_feats, parent, child_offset, fine_valid,
                 down_rb=None, wg_up=None, wg_down=None):
        w = self.param(
            "kernel", _conv_init,
            (self.kernel_volume, coarse_feats.shape[-1], self.out_channels),
        )
        if wg_up is not None and wg_down is not None:
            from tdwss.ops.sparse_conv import wg_conv_apply

            return wg_conv_apply(coarse_feats, w, wg_up, wg_down)
        return deconv_apply(coarse_feats, parent, child_offset, w,
                            fine_valid, down_rb)


class NetworkInNetwork(nn.Module):
    """1x1 channel mixing without bias (scn.NetworkInNetwork parity)."""

    out_channels: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape)
            * (2.0 / shape[0]) ** 0.5,
            (feats.shape[-1], self.out_channels),
        )
        return jnp.dot(feats, w.astype(feats.dtype), preferred_element_type=jnp.float32).astype(feats.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels with scn defaults (eps 1e-4, momentum 0.9).

    Padding rows are excluded from the batch statistics; their outputs are
    zeroed so downstream scatters/pools stay clean.
    """

    momentum: float = 0.9
    eps: float = 1e-4
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = feats.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            count = jnp.maximum(
                jnp.sum(valid.astype(jnp.float32)), 1.0)
            # Batch stats as MXU matmuls: ones @ x and diag(x^T x) with
            # f32 accumulation read x once each near HBM peak, where the
            # masked VPU column-reduces ran ~4x below it.  No mask
            # multiply is needed: padding rows are zero by construction
            # (the conv kernels emit zeros past the rulebook sentinels
            # and this layer re-zeroes ~valid on output).  Numerics match
            # the two-pass form: feats are bf16 either way and both
            # accumulate in f32; E[x^2] - mean^2 loses only when
            # |mean| >> std (not a BN input regime).
            # E[x], E[x^2] via ones @ x and ones @ x*x instead of
            # diag(x^T x): the gram's dim-0/dim-0 contraction forced XLA
            # to materialize a column-major copy of feats per BN (~14 ms
            # of {1,0}->{0,1} layout copies across the step, r5 profile).
            # The square runs in f32 (a bf16 square would round each
            # product before accumulation, unlike the MXU gram) — the
            # convert+square fuse into the dot's operand read.
            ones = jnp.ones((feats.shape[0],), jnp.float32)
            xf = feats.astype(jnp.float32)
            s1 = jnp.dot(ones, xf, preferred_element_type=jnp.float32)
            s2 = jnp.dot(ones, jnp.square(xf),
                         preferred_element_type=jnp.float32)
            mean = s1 / count
            var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch.nn.BatchNorm1d semantics: running_var tracks the
                # UNBIASED batch variance (n/(n-1)) while normalization uses
                # the biased one.
                var_unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var_unbiased

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (feats.astype(jnp.float32) - mean) * inv + bias
        out = out.astype(feats.dtype)
        return jnp.where(valid[:, None], out, 0)


class BatchNormReLU(nn.Module):
    """scn.BatchNormReLU / BatchNormLeakyReLU parity (leakiness 0 default)."""

    leakiness: float = 0.0
    momentum: float = 0.9
    eps: float = 1e-4

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = MaskedBatchNorm(momentum=self.momentum, eps=self.eps, name="bn")(
            feats, valid, use_running_average=not train
        )
        if self.leakiness == 0.0:
            return nn.relu(h)
        return nn.leaky_relu(h, negative_slope=self.leakiness)
