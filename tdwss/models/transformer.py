"""CLIP-style text transformer (flax).

Capability parity with the reference's ``models/Transformer.py``:

- ``TextTransformer`` (ref :64-120): token embedding (vocab 49408) + learned
  positional embedding + N pre-LN residual attention blocks with a causal
  mask + final LayerNorm; the sequence feature is the hidden state at the
  EOT position (argmax of token ids, ref Transformer.py:116).
- ``ResidualAttentionBlock`` / ``QuickGELU`` (ref models/utils.py:33-59).
- ``CLIPTransformer`` (ref :123-140): frozen pretrained CLIP text tower.
  This image has no network egress; weights load from a local
  ``clip_weights_path`` (npz) when provided, otherwise construction fails
  with a clear error.

Everything is vanilla XLA (SURVEY.md §2.5: a 12-layer/256-wide text encoder
needs no model parallelism; it rides the MXU as plain batched GEMMs).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdwss.registry import MODEL_REGISTRY


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attention + QuickGELU MLP block (reference models/utils.py:33-50)."""

    width: int
    heads: int
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (B, L, D)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        mask = None
        if self.causal:
            mask = nn.make_causal_mask(x[..., 0])
        attn_std = self.width ** -0.5
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.width,
            kernel_init=nn.initializers.normal(attn_std),
            name="attn",
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        fc_std = (2 * self.width) ** -0.5
        h = nn.Dense(self.width * 4, kernel_init=nn.initializers.normal(fc_std),
                     name="c_fc")(h)
        h = QuickGELU(name="gelu")(h)
        proj_std = attn_std  # scaled by depth at the Transformer level in CLIP
        h = nn.Dense(self.width, kernel_init=nn.initializers.normal(proj_std),
                     name="c_proj")(h)
        return x + h


@MODEL_REGISTRY.register()
class TextTransformer(nn.Module):
    """Trainable CLIP-architecture text encoder (reference Transformer.py:64-120)."""

    context_length: int = 120
    width: int = 256
    layers: int = 12
    vocab_size: int = 49408

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        """text (B, L) int32 token ids -> (B, width) EOT features."""
        heads = max(1, self.width // 64)
        tok = nn.Embed(
            self.vocab_size, self.width,
            embedding_init=nn.initializers.normal(0.02),
            name="token_embedding",
        )(text)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok + pos[: text.shape[1]][None, :, :]
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, heads, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT pooling: hidden state at the highest-valued token position
        eot = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]


@MODEL_REGISTRY.register()
class CLIPTransformer(nn.Module):
    """Frozen pretrained CLIP text tower (reference Transformer.py:123-140).

    Zero-egress image: weights must be supplied locally as an .npz whose
    arrays follow this module's parameter tree (see
    ``tdwss/models/clip_import.py`` for the converter).  The output is
    detached (stop_gradient), matching the reference's ``.detach_()``.
    """

    context_length: int = 77
    width: int = 512
    layers: int = 12
    vocab_size: int = 49408
    clip_weights_path: Optional[str] = None

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        inner = TextTransformer(
            context_length=self.context_length,
            width=self.width,
            layers=self.layers,
            vocab_size=self.vocab_size,
            name="clip_text",
        )
        out = inner(text)
        return jax.lax.stop_gradient(out)

    @staticmethod
    def load_pretrained_params(path: str):
        """Load a converted CLIP text-tower .npz into a param pytree."""
        flat = dict(np.load(path))
        tree: dict = {}
        for key, value in flat.items():
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(value)
        return tree
