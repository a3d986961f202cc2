"""Golden numerical-parity tests against torch (reference formula oracles).

The reference computes its losses with torch.nn.functional
(reference utils/loss.py:5-33) and normalizes with BatchNorm
(models/SparseConvNet.py usage).  torch-cpu ships in the image, so these
tests assert the jnp implementations match torch bit-for-bit (f32
tolerance) on random inputs, including the static-shape masking the TPU
pipeline adds on top.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tdwss.utils.losses import (  # noqa: E402
    TextContrastive,
    masked_cross_entropy,
    multilabel_soft_margin,
)


def test_multilabel_soft_margin_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 20)).astype(np.float32)
    labels = (rng.random((6, 20)) < 0.3).astype(np.float32)
    want = F.multilabel_soft_margin_loss(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(multilabel_soft_margin(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-6)


def test_multilabel_soft_margin_masked_matches_dynamic_torch():
    """Padded scenes must not contribute — equals torch on the real rows."""
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((8, 20)).astype(np.float32)
    labels = (rng.random((8, 20)) < 0.3).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
    want = F.multilabel_soft_margin_loss(
        torch.from_numpy(logits[mask]), torch.from_numpy(labels[mask])).item()
    got = float(multilabel_soft_margin(jnp.asarray(logits),
                                       jnp.asarray(labels),
                                       scene_mask=jnp.asarray(mask)))
    assert got == pytest.approx(want, rel=1e-6)


def test_masked_cross_entropy_matches_torch_ignore_index():
    rng = np.random.default_rng(2)
    n, c = 500, 20
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, (n,)).astype(np.int64)
    labels[rng.random(n) < 0.25] = -100
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels),
                           ignore_index=-100).item()
    got = float(masked_cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_cross_entropy_valid_mask_matches_row_drop():
    rng = np.random.default_rng(3)
    n, c = 200, 10
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, (n,)).astype(np.int64)
    valid = rng.random(n) < 0.7
    want = F.cross_entropy(torch.from_numpy(logits[valid]),
                           torch.from_numpy(labels[valid])).item()
    got = float(masked_cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(labels.astype(np.int32)),
                                     valid=jnp.asarray(valid)))
    assert got == pytest.approx(want, rel=1e-5)


def _torch_text_contrastive(pc, text, has_text):
    """Reference utils/loss.py:6-18 formula, dynamic shapes."""
    similarity = torch.from_numpy(text) @ torch.from_numpy(pc).T
    num_text = similarity.size(1)
    labels = torch.tile(torch.from_numpy(has_text)[:, None], (1, num_text))
    return F.cross_entropy(similarity.transpose(1, 2), labels.long()).item()


def test_text_contrastive_matches_torch():
    rng = np.random.default_rng(4)
    b, bt, t, m = 5, 3, 4, 16
    pc = rng.standard_normal((b, m)).astype(np.float32)
    text = rng.standard_normal((bt, t, m)).astype(np.float32)
    has_text = np.array([0, 2, 4], np.int32)
    want = _torch_text_contrastive(pc, text, has_text)
    got = float(TextContrastive(jnp.asarray(pc), jnp.asarray(text),
                                jnp.asarray(has_text)))
    assert got == pytest.approx(want, rel=1e-5)


def test_text_contrastive_padded_batch_matches_dynamic_torch():
    """Static-shape padded batch == torch on the real scenes/slots only.

    Regression for the padded-column softmax leak: the softmax column axis
    must exclude padded scenes (whose pooled feature is 0 => logit 0).
    """
    rng = np.random.default_rng(5)
    b_real, b_pad, bt_real, bt_pad, t, m = 3, 6, 2, 4, 4, 16
    pc = np.zeros((b_pad, m), np.float32)
    pc[:b_real] = rng.standard_normal((b_real, m))
    text = np.zeros((bt_pad, t, m), np.float32)
    text[:bt_real] = rng.standard_normal((bt_real, t, m))
    has_text = np.full((bt_pad,), 0, np.int32)
    has_text[:bt_real] = [0, 2]

    want = _torch_text_contrastive(pc[:b_real], text[:bt_real],
                                   has_text[:bt_real])

    scene_mask = np.arange(b_pad) < b_real
    text_mask = np.arange(bt_pad) < bt_real
    got = float(TextContrastive(jnp.asarray(pc), jnp.asarray(text),
                                jnp.asarray(has_text),
                                text_mask=jnp.asarray(text_mask),
                                scene_mask=jnp.asarray(scene_mask)))
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_batch_norm_matches_torch_batchnorm1d():
    """MaskedBatchNorm == torch.nn.BatchNorm1d on the valid rows: output,
    running mean (biased batch mean), running var (UNBIASED batch var)."""
    from tdwss.models.layers import MaskedBatchNorm

    rng = np.random.default_rng(6)
    n_real, n_pad, c = 300, 384, 24
    x = np.zeros((n_pad, c), np.float32)
    x[:n_real] = rng.standard_normal((n_real, c)) * 2.0 + 0.5
    valid = np.arange(n_pad) < n_real

    tbn = torch.nn.BatchNorm1d(c, eps=1e-4, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        tbn.weight.copy_(torch.linspace(0.5, 1.5, c))
        tbn.bias.copy_(torch.linspace(-0.2, 0.2, c))
    t_out = tbn(torch.from_numpy(x[:n_real])).detach().numpy()

    mod = MaskedBatchNorm(momentum=0.9, eps=1e-4)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(valid), use_running_average=False)
    variables = {
        "params": {
            "scale": jnp.asarray(np.linspace(0.5, 1.5, c, dtype=np.float32)),
            "bias": jnp.asarray(np.linspace(-0.2, 0.2, c, dtype=np.float32)),
        },
        "batch_stats": variables["batch_stats"],
    }
    out, mutated = mod.apply(variables, jnp.asarray(x), jnp.asarray(valid),
                             use_running_average=False,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out)[:n_real], t_out,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[n_real:], 0.0)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_conv_block_matches_torch_composition():
    """Residual ConvBlock == the reference block composed from torch ops.

    Reference (models/SparseConvNet.py:34-55 block(), sparseconvnet
    semantics): shortcut = NiN(x) [channel change]; branch = BNReLU ->
    SubmConv -> BNReLU -> SubmConv; out = shortcut + branch.  The torch
    twin evaluates the same rulebook gather-matmul-sum with
    torch.nn.BatchNorm1d / relu / matmul on the valid rows, weights copied
    from the flax init.
    """
    from tdwss.models.sparse_encoders import ConvBlock
    from tdwss.ops.host_plan import build_subm_rulebook_np, voxelize_np

    rng = np.random.default_rng(11)
    n, cap = 600, 640
    coords = np.concatenate(
        [rng.integers(0, 24, (n, 3)), rng.integers(0, 2, (n, 1))],
        axis=1).astype(np.int32)
    feats = rng.standard_normal((n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    coords = np.pad(coords, ((0, cap - n), (0, 0)))
    feats = np.pad(feats, ((0, cap - n), (0, 0)))
    valid = np.pad(valid, (0, cap - n))
    grid, vfeats, _ = voxelize_np(coords, feats, valid, cap)
    rb = build_subm_rulebook_np(grid, 3)
    v = rb.shape[0]
    cin, cout = 3, 8
    gvalid = np.asarray(grid.valid)

    block = ConvBlock(cout, residual=True)
    variables = block.init(jax.random.PRNGKey(3), jnp.asarray(vfeats),
                           jnp.asarray(rb), jnp.asarray(gvalid), True, None)
    out, _ = block.apply(variables, jnp.asarray(vfeats), jnp.asarray(rb),
                         jnp.asarray(gvalid), True, None,
                         mutable=["batch_stats"])
    out = np.asarray(out)

    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    x = torch.from_numpy(np.asarray(vfeats))
    vmask = torch.from_numpy(gvalid)

    def t_bn_relu(h, scale, bias):
        bn = torch.nn.BatchNorm1d(h.shape[1], eps=1e-4, momentum=0.1)
        bn.train()
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(scale))
            bn.bias.copy_(torch.from_numpy(bias))
        full = torch.zeros_like(h)
        full[vmask] = bn(h[vmask])
        return torch.relu(full)

    def t_subm(h, w):
        # rulebook gather-matmul-sum, -1 rows contribute zero
        k = w.shape[0]
        acc = torch.zeros((v, w.shape[2]))
        trb = torch.from_numpy(rb.astype(np.int64))
        for kk in range(k):
            idx = trb[:, kk]
            live = idx >= 0
            g = torch.zeros((v, h.shape[1]))
            g[live] = h[idx[live]]
            acc += g @ torch.from_numpy(w[kk])
        return acc

    with torch.no_grad():
        shortcut = x @ torch.from_numpy(p["nin"]["kernel"])
        h = t_bn_relu(x, p["bnrelu1"]["bn"]["scale"], p["bnrelu1"]["bn"]["bias"])
        h = t_subm(h, p["conv1"]["kernel"])
        h = t_bn_relu(h, p["bnrelu2"]["bn"]["scale"], p["bnrelu2"]["bn"]["bias"])
        h = t_subm(h, p["conv2"]["kernel"])
        t_out = (shortcut + h).numpy()

    nv = int(gvalid.sum())
    np.testing.assert_allclose(out[:nv], t_out[:nv], rtol=2e-4, atol=2e-5)
