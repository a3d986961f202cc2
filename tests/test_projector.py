"""Projector tests (reference models/projector parity, SURVEY §2.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdwss.models.projector import Projector, crop_box, voxelize_views


def _identity_transform(b):
    return (
        np.tile(np.eye(4)[None], (b, 1, 1)),
        np.zeros((b, 3)),
        np.tile(np.eye(3)[None], (b, 1, 1)),
        np.zeros((b, 3)),
    )


def test_crop_box_selects_inside_points(rng):
    n = 200
    coords = np.concatenate(
        [rng.uniform(0, 10, (n, 3)), np.zeros((n, 1))], 1
    ).astype(np.float32)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    boxes = np.asarray([[2.5, 2.5, 2.5, 5, 5, 5, 0]], np.float32)  # [0,5]^3
    out_c, out_f = crop_box(coords, feats, boxes, _identity_transform(1))
    inside = np.all(coords[:, :3] <= 5, 1) & np.all(coords[:, :3] >= 0, 1)
    assert out_c.shape[0] == inside.sum()
    assert out_c[:, :3].min() >= 0 and out_c[:, :3].max() <= 1
    np.testing.assert_array_equal(out_c[:, 3], 0)


def test_crop_box_undoes_augmentation(rng):
    # world points in [0,1]^3, augmented by rot+offset; crop with box [0,1]^3
    n = 100
    world = rng.uniform(0, 1, (n, 3))
    theta = 0.7
    rot = np.array([
        [np.cos(theta), np.sin(theta), 0],
        [-np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ]) * 3.0
    offset = np.array([5.0, 6.0, 7.0])
    aug = world @ rot + offset
    coords = np.concatenate([aug, np.zeros((n, 1))], 1).astype(np.float32)
    feats = np.arange(n, dtype=np.float32)[:, None]
    transform = (
        np.eye(4)[None],
        np.zeros((1, 3)),
        np.linalg.inv(rot)[None],
        offset[None],
    )
    boxes = np.asarray([[0.5, 0.5, 0.5, 1.001, 1.001, 1.001, 0]], np.float32)
    out_c, out_f = crop_box(coords, feats, boxes, transform)
    assert out_c.shape[0] == n  # every point is inside after undoing aug
    np.testing.assert_array_equal(np.sort(out_f[:, 0]), np.arange(n))


def test_voxelize_views_projection(rng):
    # one point at a known cell: its Z-view pixel must carry the feature
    coords = np.asarray([[0.5, 0.25, 0.75, 0.0]], np.float32)
    feats = np.asarray([[3.0, -1.0]], np.float32)
    res = 8
    out = np.asarray(
        voxelize_views(jnp.asarray(coords), jnp.asarray(feats),
                       jnp.ones(1, bool), res, 1, "Z")
    )
    assert out.shape == (1, 2, res, res)
    x, y = int(0.5 * res), int(0.25 * res)
    np.testing.assert_allclose(out[0, 0, x, y], 3.0)
    assert out[0, 0].sum() == 3.0  # all other pixels empty -> 0


def test_projector_end_to_end(rng):
    n = 300
    coords = np.concatenate(
        [rng.uniform(0, 1, (n, 3)), rng.integers(0, 2, (n, 1))], 1
    ).astype(np.float32)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    model = Projector(out_channels=2, resolution=16, view="HWZ")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(coords),
                           jnp.asarray(feats), jnp.ones(n, bool), 2)
    masks = model.apply(variables, jnp.asarray(coords), jnp.asarray(feats),
                        jnp.ones(n, bool), 2)
    assert masks.shape == (3 * 2, 2, 16, 16)
    # gradient flows through matting
    def loss(v):
        return jnp.sum(
            model.apply(v, jnp.asarray(coords), jnp.asarray(feats),
                        jnp.ones(n, bool), 2) ** 2
        )
    g = jax.grad(loss)(variables)
    assert bool((np.asarray(
        g["params"]["matting"]["model"]["kernel"]) != 0).any())
