"""Encoder / meta-architecture forward tests (shapes, finiteness, contracts).

Checks the reference model contracts (SURVEY.md §1 models row): encoder
``[coords, feats] -> per-point features`` with istrain pooling; meta-arch
``model(batch, istrain=True) -> (scene_logits, meta)`` and eval per-point
logits; registry ``embed_length`` metadata parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdwss import NUM_CLASSES
from tdwss.config import Config, PointcloudModelConfig, TextModelConfig, EngineConfig
from tdwss.data.batch import PointBatch, TextBatch
from tdwss.models import build_model
from tdwss.models.sparse_encoders import SparseConvFCNet, embed_length_of
from tdwss.registry import MODEL_REGISTRY


def _batch(rng, n=2048, b=2, with_text=False, t=2, length=16):
    coords = np.concatenate(
        [rng.integers(0, 48, (n, 3)), rng.integers(0, b, (n, 1))], 1
    ).astype(np.int32)
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-100:] = False
    scene_label = np.zeros((b, NUM_CLASSES), np.float32)
    scene_label[:, :3] = 1
    point_label = rng.integers(0, NUM_CLASSES, n).astype(np.int32)
    text = None
    if with_text:
        tokens = rng.integers(1, 1000, (b, t, length)).astype(np.int32)
        text = TextBatch(
            tokens=jnp.asarray(tokens),
            has_text=jnp.arange(b, dtype=jnp.int32),
            valid=jnp.ones(b, bool),
        )
    return PointBatch(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        valid=jnp.asarray(valid),
        scene_label=jnp.asarray(scene_label),
        scene_mask=jnp.ones(b, bool),
        point_label=jnp.asarray(point_label),
        point_ids=jnp.full(n, -1, jnp.int32),
        text=text,
    )


def test_embed_length_metadata():
    assert embed_length_of("SparseConvUNet", 16) == 16
    assert embed_length_of("SparseConvFCNet", 16) == 7 * 8 * 16 // 2
    assert embed_length_of("SparseConvFCNetNarrow", 16) == 16 + 64 + 128 + 192 + 256
    assert embed_length_of("SparseConvFCNetDirectUpPool", 16) == 256
    assert embed_length_of("SparseConvFCNetDirectUpPoolLight", 16) == 128


def test_fcnet_encoder_shapes(rng):
    batch = _batch(rng, n=1024)
    enc = SparseConvFCNet(m=4, full_scale=64, block_reps=1, residual_blocks=False,
                          depth=3, min_level_capacity=128)
    variables = enc.init(jax.random.PRNGKey(0), batch.coords, batch.feats,
                         batch.valid, istrain=False, train=False)
    out = enc.apply(variables, batch.coords, batch.feats, batch.valid,
                    istrain=False, train=False)
    assert out.shape == (1024, 4 + 8 + 12)  # sum of planes
    assert bool(jnp.isfinite(out).all())
    # invalid rows read zeros
    assert float(jnp.abs(out[-50:]).max()) == 0.0

    pooled = enc.apply(variables, batch.coords, batch.feats, batch.valid,
                       istrain=True, train=False, num_scenes=2)
    assert pooled.shape == (2, 24)


@pytest.mark.parametrize("model_name,encoder", [
    ("MultiLabel", "SparseConvFCNet"),
    ("FullySupervised", "SparseConvFCNet"),
])
def test_meta_arch_contract(rng, model_name, encoder):
    cfg = Config(
        model_name=model_name,
        pointcloud_model=PointcloudModelConfig(
            name=encoder, m=4, full_scale=64, block_reps=1,
            residual_blocks=True, depth=3,
        ),
        engine=EngineConfig(min_level_capacity=128),
    )
    batch = _batch(rng, n=1024)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, istrain=True)
    (scene_logits, meta), mutated = model.apply(
        variables, batch, istrain=True, mutable=["batch_stats"]
    )
    assert scene_logits.shape == (2, NUM_CLASSES)
    assert "batch_stats" in mutated
    if model_name == "FullySupervised":
        assert meta.shape == (1024, NUM_CLASSES)  # per-point logits

    point_logits = model.apply(variables, batch, istrain=False, train=False)
    assert point_logits.shape == (1024, NUM_CLASSES)


@pytest.mark.slow
def test_multilabel_contrastive_with_text(rng):
    cfg = Config(
        model_name="MultiLabelContrastive",
        has_text=True,
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=4, full_scale=64, block_reps=1,
        ),
        text_model=TextModelConfig(
            name="TextTransformer", context_length=16, width=64, layers=2,
            vocab_size=1000,
        ),
        engine=EngineConfig(min_level_capacity=64),
    )
    batch = _batch(rng, n=512, with_text=True, length=16)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, istrain=True)
    (scene_logits, (gfeats, tfeats, has_text)), _ = model.apply(
        variables, batch, istrain=True, mutable=["batch_stats"]
    )
    assert scene_logits.shape == (2, NUM_CLASSES)
    assert gfeats.shape == (2, 4)       # embed = m for UNet
    assert tfeats.shape == (2, 2, 4)    # projected to embed width
    assert bool(jnp.isfinite(tfeats).all())


def test_registry_names_match_reference():
    for name in [
        "SparseConvUNet", "SparseConvFCNet", "SparseConvFCNetNarrow",
        "SparseConvFCNetDirectUpPool", "SparseConvFCNetDirectUpPoolLight",
        "TextTransformer", "CLIPTransformer",
        "MultiLabelContrastive", "MultiLabel", "FullySupervised",
    ]:
        assert name in MODEL_REGISTRY, name


def test_misc_result_and_pos_interp():
    import jax.numpy as jnp

    from tdwss.models.misc import Result, interpolate_pos_encoding

    r = Result(as_dict=True)
    r.append(1, name="a")
    r.update(b=2)
    assert r.as_return() == {"a": 1, "b": 2}
    r2 = Result()
    r2.append("x")
    assert r2.as_return() == "x"

    pe = jnp.ones((1, 8, 4))  # 2x2x2 grid
    same = interpolate_pos_encoding(pe, 2, 2, 2)
    assert same.shape == (1, 8, 4)
    up = interpolate_pos_encoding(pe, 3, 3, 3)
    assert up.shape == (1, 27, 4)


def test_clip_import_matches_torch():
    """Converted CLIP text-tower weights reproduce torch's attention math."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from tdwss.models.clip_import import convert_text_tower
    from tdwss.models.transformer import CLIPTransformer

    torch.manual_seed(0)
    width, heads, layers, ctx, vocab = 128, 2, 2, 8, 64

    # Build a minimal CLIP-text-tower state dict + its torch forward.
    state = {
        "token_embedding.weight": torch.randn(vocab, width) * 0.02,
        "positional_embedding": torch.randn(ctx, width) * 0.01,
        "ln_final.weight": torch.rand(width) + 0.5,
        "ln_final.bias": torch.randn(width) * 0.1,
    }
    mhas, mlps, lns = [], [], []
    for n in range(layers):
        p = f"transformer.resblocks.{n}"
        mha = torch.nn.MultiheadAttention(width, heads, batch_first=True)
        fc = torch.nn.Linear(width, 4 * width)
        proj = torch.nn.Linear(4 * width, width)
        ln1 = torch.nn.LayerNorm(width)
        ln2 = torch.nn.LayerNorm(width)
        state[f"{p}.attn.in_proj_weight"] = mha.in_proj_weight.detach()
        state[f"{p}.attn.in_proj_bias"] = mha.in_proj_bias.detach()
        state[f"{p}.attn.out_proj.weight"] = mha.out_proj.weight.detach()
        state[f"{p}.attn.out_proj.bias"] = mha.out_proj.bias.detach()
        state[f"{p}.mlp.c_fc.weight"] = fc.weight.detach()
        state[f"{p}.mlp.c_fc.bias"] = fc.bias.detach()
        state[f"{p}.mlp.c_proj.weight"] = proj.weight.detach()
        state[f"{p}.mlp.c_proj.bias"] = proj.bias.detach()
        state[f"{p}.ln_1.weight"] = ln1.weight.detach()
        state[f"{p}.ln_1.bias"] = ln1.bias.detach()
        state[f"{p}.ln_2.weight"] = ln2.weight.detach()
        state[f"{p}.ln_2.bias"] = ln2.bias.detach()
        mhas.append(mha); mlps.append((fc, proj)); lns.append((ln1, ln2))

    tokens = torch.randint(1, vocab - 1, (3, ctx))
    tokens[:, -1] = vocab - 1  # EOT = max id -> argmax pooling position

    with torch.no_grad():
        x = state["token_embedding.weight"][tokens] + state["positional_embedding"]
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        for n in range(layers):
            ln1, ln2 = lns[n]
            h = ln1(x)
            a, _ = mhas[n](h, h, h, attn_mask=mask, need_weights=False)
            x = x + a
            h = ln2(x)
            fc, proj = mlps[n]
            x = x + proj(fc(h) * torch.sigmoid(1.702 * fc(h)))
        lf = torch.nn.LayerNorm(width)
        lf.weight.data = state["ln_final.weight"]
        lf.bias.data = state["ln_final.bias"]
        x = lf(x)
        ref = x[torch.arange(3), tokens.argmax(dim=-1)].numpy()

    flat = convert_text_tower({k: v.numpy() for k, v in state.items()}, heads)
    # materialize via the loader round trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "clip.npz")
        np.savez(path, **flat)
        params = CLIPTransformer.load_pretrained_params(path)

    model = CLIPTransformer(context_length=ctx, width=width, layers=layers,
                            vocab_size=vocab)
    out = model.apply({"params": params}, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
