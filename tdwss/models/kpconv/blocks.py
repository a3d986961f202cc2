"""Flax blocks for the KPConv backbone.

Parity with reference models/KPConv/blocks.py:386-694 (UnaryBlock,
SimpleBlock, ResnetBottleneckBlock, MaxPoolBlock, NearestUpsampleBlock,
GlobalAverageBlock, block_decider) on top of the pure-jax KPConv op in
:mod:`tdwss.models.kpconv.ops`.

Every block is a pure function of (features, batch) with static shapes;
batch is a :class:`KPBatch` of padded per-layer arrays.  Deformable-conv
side outputs (min_d2 / deformed kernel points, needed by the fitting
regularizer, reference architectures.py:26-58) are threaded explicitly as
an aux list.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tdwss.models.kpconv.kernel_points import load_kernels
from tdwss.models.kpconv.ops import (
    KPConvAux,
    closest_pool,
    global_average,
    kpconv_apply,
    max_pool,
)
from tdwss.models.layers import MaskedBatchNorm


class KPBatch(NamedTuple):
    """Static-shape multi-layer input pyramid (reference 'batch' object,
    dataset/dataset_utils/KPConv/KPConv_Scannet.py:1293-1330).

    Per layer l: points[l] (Nl, 3) with padding rows at SHADOW_COORD;
    neighbors[l] (Nl, n); pools[l] (N_{l+1}, n) indices into layer l;
    upsamples[l] (Nl, n) indices into layer l+1 (valid for l < L-1);
    batch_ids[l] (Nl,) scene index; valids[l] (Nl,) bool.
    Shadow neighbor entries hold the layer's row capacity (out of bounds).
    """

    points: Tuple[jnp.ndarray, ...]
    neighbors: Tuple[jnp.ndarray, ...]
    pools: Tuple[jnp.ndarray, ...]
    upsamples: Tuple[jnp.ndarray, ...]
    batch_ids: Tuple[jnp.ndarray, ...]
    valids: Tuple[jnp.ndarray, ...]
    features: jnp.ndarray
    labels: jnp.ndarray
    num_scenes: int


def _kp_init(key, shape, dtype=jnp.float32):
    # Kaiming-uniform over fan_in = K * Cin (reference blocks.py:216).
    import jax

    k, cin, _ = shape
    bound = np.sqrt(6.0 / (k * cin))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class KPConvLayer(nn.Module):
    """One kernel-point convolution (reference blocks.py:142-378)."""

    out_channels: int
    radius: float                   # kernel-point disposition radius
    kp_extent: float
    num_kernel_points: int = 15
    influence: str = "linear"
    aggregation: str = "sum"
    fixed_kernel_points: str = "center"
    deformable: bool = False
    modulated: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x
                 ) -> Tuple[jnp.ndarray, KPConvAux]:
        k = self.num_kernel_points
        cin = x.shape[-1]
        kp = jnp.asarray(load_kernels(
            self.radius, k, dimension=3, fixed=self.fixed_kernel_points))
        weights = self.param("weights", _kp_init, (k, cin, self.out_channels))

        offsets = modulations = None
        if self.deformable:
            offset_dim = (4 if self.modulated else 3) * k
            raw, _ = KPConvLayer(
                out_channels=offset_dim, radius=self.radius,
                kp_extent=self.kp_extent, num_kernel_points=k,
                influence=self.influence, aggregation=self.aggregation,
                fixed_kernel_points=self.fixed_kernel_points,
                name="offset_conv",
            )(q_pts, s_pts, neighb_inds, x)
            raw = raw + self.param(
                "offset_bias", nn.initializers.zeros, (offset_dim,))
            if self.modulated:
                unscaled = raw[:, : 3 * k].reshape(-1, k, 3)
                modulations = 2.0 * nn.sigmoid(raw[:, 3 * k:])
            else:
                unscaled = raw.reshape(-1, k, 3)
            offsets = unscaled * self.kp_extent

        return kpconv_apply(
            q_pts, s_pts, neighb_inds, x, kp, weights,
            kp_extent=self.kp_extent, influence=self.influence,
            aggregation=self.aggregation, offsets=offsets,
            modulations=modulations,
        )


class BatchNormBlock(nn.Module):
    """BN over valid rows, or a learned bias when BN is off (ref :429-467)."""

    use_bn: bool = True
    bn_momentum: float = 0.98  # torch convention; flax momentum = 1 - this

    @nn.compact
    def __call__(self, x, valid, train: bool):
        if self.use_bn:
            return MaskedBatchNorm(momentum=1.0 - self.bn_momentum,
                                   eps=1e-5, name="bn")(
                x, valid, use_running_average=not train)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x + bias


class UnaryBlock(nn.Module):
    """Linear (no bias) + BN + LeakyReLU(0.1) (ref :470-505)."""

    out_dim: int
    use_bn: bool = True
    bn_momentum: float = 0.98
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, valid, train: bool):
        x = nn.Dense(self.out_dim, use_bias=False, name="mlp")(x)
        x = BatchNormBlock(self.use_bn, self.bn_momentum, name="bn")(
            x, valid, train)
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


def _layer_io(batch: KPBatch, layer_ind: int, strided: bool):
    """(q_pts, s_pts, neighb_inds, out_layer) for a conv at this layer."""
    if strided:
        return (batch.points[layer_ind + 1], batch.points[layer_ind],
                batch.pools[layer_ind], layer_ind + 1)
    return (batch.points[layer_ind], batch.points[layer_ind],
            batch.neighbors[layer_ind], layer_ind)


class SimpleBlock(nn.Module):
    """KPConv -> BN -> LeakyReLU, out_dim//2 channels (ref :508-548)."""

    block_name: str
    out_dim: int
    radius: float
    layer_ind: int
    config: Any  # KPConvConfig

    @nn.compact
    def __call__(self, x, batch: KPBatch, train: bool
                 ) -> Tuple[jnp.ndarray, List]:
        cfg = self.config
        extent = self.radius * cfg.KP_extent / cfg.conv_radius
        strided = "strided" in self.block_name
        q, s, inds, out_l = _layer_io(batch, self.layer_ind, strided)
        out, aux = KPConvLayer(
            out_channels=self.out_dim // 2, radius=self.radius,
            kp_extent=extent, num_kernel_points=cfg.num_kernel_points,
            influence=cfg.KP_influence, aggregation=cfg.aggregation_mode,
            fixed_kernel_points=cfg.fixed_kernel_points,
            deformable="deform" in self.block_name, modulated=cfg.modulated,
            name="KPConv",
        )(q, s, inds, x)
        out = BatchNormBlock(cfg.use_batch_norm, cfg.batch_norm_momentum,
                             name="bn")(out, batch.valids[out_l], train)
        auxes = [(aux, extent)] if aux.min_d2 is not None else []
        return nn.leaky_relu(out, 0.1), auxes


class ResnetBottleneckBlock(nn.Module):
    """unary -> KPConv -> unary with (max-pooled) shortcut (ref :551-634)."""

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    config: Any

    @nn.compact
    def __call__(self, x, batch: KPBatch, train: bool
                 ) -> Tuple[jnp.ndarray, List]:
        cfg = self.config
        extent = self.radius * cfg.KP_extent / cfg.conv_radius
        strided = "strided" in self.block_name
        q, s, inds, out_l = _layer_io(batch, self.layer_ind, strided)
        valid_out = batch.valids[out_l]
        use_bn, mom = cfg.use_batch_norm, cfg.batch_norm_momentum

        h = x
        if self.in_dim != self.out_dim // 4:
            h = UnaryBlock(self.out_dim // 4, use_bn, mom, name="unary1")(
                h, batch.valids[self.layer_ind], train)
        h, aux = KPConvLayer(
            out_channels=self.out_dim // 4, radius=self.radius,
            kp_extent=extent, num_kernel_points=cfg.num_kernel_points,
            influence=cfg.KP_influence, aggregation=cfg.aggregation_mode,
            fixed_kernel_points=cfg.fixed_kernel_points,
            deformable="deform" in self.block_name, modulated=cfg.modulated,
            name="KPConv",
        )(q, s, inds, h)
        h = BatchNormBlock(use_bn, mom, name="bn_conv")(h, valid_out, train)
        h = nn.leaky_relu(h, 0.1)
        h = UnaryBlock(self.out_dim, use_bn, mom, no_relu=True,
                       name="unary2")(h, valid_out, train)

        shortcut = max_pool(x, inds) if strided else x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, use_bn, mom, no_relu=True,
                                  name="unary_shortcut")(
                shortcut, valid_out, train)

        auxes = [(aux, extent)] if aux.min_d2 is not None else []
        return nn.leaky_relu(h + shortcut, 0.1), auxes


class MaxPoolBlock(nn.Module):
    """Max pool to the next layer (ref :676-694)."""

    layer_ind: int

    def __call__(self, x, batch: KPBatch, train: bool):
        return max_pool(x, batch.pools[self.layer_ind]), []


class NearestUpsampleBlock(nn.Module):
    """Closest-neighbor upsample to the previous layer (ref :655-673)."""

    layer_ind: int

    def __call__(self, x, batch: KPBatch, train: bool):
        return closest_pool(x, batch.upsamples[self.layer_ind - 1]), []


class GlobalAverageBlock(nn.Module):
    """Per-cloud average over the last layer (ref :637-652)."""

    def __call__(self, x, batch: KPBatch, train: bool):
        return global_average(
            x, batch.batch_ids[-1], batch.valids[-1], batch.num_scenes), []


def block_decider(block_name: str, radius: float, in_dim: int, out_dim: int,
                  layer_ind: int, config) -> nn.Module:
    """Name -> block module (reference blocks.py:386-426)."""
    if block_name == "unary":
        return _UnaryAdapter(out_dim=out_dim, config=config,
                             layer_ind=layer_ind)
    if block_name.startswith("simple"):
        return SimpleBlock(block_name=block_name, out_dim=out_dim,
                           radius=radius, layer_ind=layer_ind, config=config)
    if block_name.startswith("resnetb"):
        return ResnetBottleneckBlock(
            block_name=block_name, in_dim=in_dim, out_dim=out_dim,
            radius=radius, layer_ind=layer_ind, config=config)
    if block_name in ("max_pool", "max_pool_wide"):
        return MaxPoolBlock(layer_ind=layer_ind)
    if block_name == "global_average":
        return GlobalAverageBlock()
    if block_name == "nearest_upsample":
        return NearestUpsampleBlock(layer_ind=layer_ind)
    raise ValueError(f"unknown block name {block_name!r}")


class _UnaryAdapter(nn.Module):
    """UnaryBlock with the (x, batch, train) block calling convention."""

    out_dim: int
    config: Any
    layer_ind: int

    @nn.compact
    def __call__(self, x, batch: KPBatch, train: bool):
        cfg = self.config
        out = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                         cfg.batch_norm_momentum, name="unary")(
            x, batch.valids[self.layer_ind], train)
        return out, []
