"""KPFCNN: encoder/decoder kernel-point FCN for semantic segmentation.

Parity with reference models/KPConv/architectures.py:61-251 — encoder built
from the config architecture list with skip connections at every
downsampling, decoder of nearest-upsample + unary blocks with skip concat,
two-unary head, masked cross-entropy loss plus the point2point deformable
fitting regularizer.

TPU notes: the whole network is static-shape over the padded KPBatch
pyramid; each block is wrapped in ``jax.checkpoint`` via flax remat so the
(N, nmax, C) neighbor gathers are recomputed in the backward pass instead
of stored.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdwss.models.kpconv.blocks import KPBatch, UnaryBlock, block_decider
from tdwss.models.kpconv.config import KPConvConfig
from tdwss.models.kpconv.ops import p2p_fitting_regularizer
from tdwss.registry import MODEL_REGISTRY


def _plan_blocks(cfg: KPConvConfig):
    """Replicate the construction loops of reference architectures.py:80-172.

    Returns (encoder_specs, decoder_specs, encoder_skips, decoder_concats,
    encoder_skip_dims, head_in_dim); each spec is
    (block_name, radius, in_dim, out_dim, layer_ind).
    """
    layer = 0
    r = cfg.first_subsampling_dl * cfg.conv_radius
    in_dim = cfg.in_features_dim
    out_dim = cfg.first_features_dim

    encoder_specs, encoder_skips, encoder_skip_dims = [], [], []
    for block_i, block in enumerate(cfg.architecture):
        if any(t in block for t in ("pool", "strided", "upsample", "global")):
            encoder_skips.append(block_i)
            encoder_skip_dims.append(in_dim)
        if "upsample" in block:
            break
        encoder_specs.append((block, r, in_dim, out_dim, layer))
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if "pool" in block or "strided" in block:
            layer += 1
            r *= 2
            out_dim *= 2

    start_i = next(
        (i for i, b in enumerate(cfg.architecture) if "upsample" in b),
        len(cfg.architecture),
    )
    decoder_specs, decoder_concats = [], []
    for block_i, block in enumerate(cfg.architecture[start_i:]):
        if block_i > 0 and "upsample" in cfg.architecture[start_i + block_i - 1]:
            in_dim += encoder_skip_dims[layer]
            decoder_concats.append(block_i)
        decoder_specs.append((block, r, in_dim, out_dim, layer))
        in_dim = out_dim
        if "upsample" in block:
            layer -= 1
            r *= 0.5
            out_dim = out_dim // 2

    return (encoder_specs, decoder_specs, encoder_skips, decoder_concats,
            out_dim)


@MODEL_REGISTRY.register()
class KPFCNN(nn.Module):
    """Kernel Point Fully Convolutional Network (reference KPFCNN)."""

    config: KPConvConfig = KPConvConfig()

    @nn.compact
    def __call__(self, batch: KPBatch, train: bool = False
                 ) -> Tuple[jnp.ndarray, List]:
        cfg = self.config
        (enc_specs, dec_specs, enc_skips, dec_concats, head_in
         ) = _plan_blocks(cfg)

        x = batch.features
        auxes: List = []
        skip_x = []
        enc_spec_i = 0
        for block_i, block in enumerate(cfg.architecture):
            if "upsample" in block:
                break
            if block_i in enc_skips:
                skip_x.append(x)
            name, r, in_dim, out_dim, layer = enc_specs[enc_spec_i]
            enc_spec_i += 1
            mod = block_decider(name, r, in_dim, out_dim, layer, cfg)
            x, aux = mod(x, batch, train)
            auxes.extend(aux)

        for block_i, (name, r, in_dim, out_dim, layer) in enumerate(dec_specs):
            if block_i in dec_concats:
                x = jnp.concatenate([x, skip_x.pop()], axis=1)
            mod = block_decider(name, r, in_dim, out_dim, layer, cfg)
            x, aux = mod(x, batch, train)
            auxes.extend(aux)

        x = UnaryBlock(cfg.first_features_dim, use_bn=False, name="head_mlp")(
            x, batch.valids[0], train)
        logits = UnaryBlock(cfg.num_classes, use_bn=False, no_relu=True,
                            name="head_softmax")(x, batch.valids[0], train)
        return logits, auxes


def kpfcnn_loss(logits: jnp.ndarray, labels: jnp.ndarray, auxes: List,
                cfg: KPConvConfig) -> jnp.ndarray:
    """Masked CE (+ class weights) + p2p fitting regularizer
    (reference architectures.py:221-251)."""
    num_classes = logits.shape[-1]
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    if cfg.class_w:
        w = jnp.asarray(np.array(cfg.class_w, np.float32))[safe]
        nll = nll * w
        denom = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        denom = jnp.maximum(jnp.sum(valid), 1)
    ce = jnp.sum(jnp.where(valid, nll, 0.0)) / denom

    reg = 0.0
    if auxes and cfg.deform_fitting_mode == "point2point":
        min_d2s = [a.min_d2 for a, _ in auxes]
        dkps = [a.deformed_kp for a, _ in auxes]
        extents = [e for _, e in auxes]
        reg = p2p_fitting_regularizer(
            min_d2s, dkps, extents,
            repulse_extent=cfg.repulse_extent,
            deform_fitting_power=cfg.deform_fitting_power,
        )
    return ce + reg


def deform_param_labels(params) -> Any:
    """'deform'/'main' label tree for optax.multi_transform, realizing the
    reference's deform_lr_factor 0.1 on offset parameters
    (reference train loop param groups, config.py:167)."""
    flat = jax.tree_util.tree_leaves_with_path(params)

    def label(path):
        return "deform" if any(
            getattr(p, "key", None) in ("offset_conv", "offset_bias")
            or "offset" in str(getattr(p, "key", ""))
            for p in path
        ) else "main"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label(path), params)
