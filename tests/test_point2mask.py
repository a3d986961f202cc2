"""point2mask op tests (reference ops/point2mask parity, SURVEY §2.4).

Mirrors the reference's own __main__ smoke checks
(point2mask_modules.py:417-456): seeded forward + gradient-nonzero on random
clouds, and the Pixel2Mask round trip on a synthetic square image.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tdwss.ops.point2mask import (
    Box2Mask,
    Pixel2Mask,
    Point2Mask,
    ball_query_2d,
    point2mask_module,
    projection,
)


def test_projection_geometry():
    # theta=0, phi=0: view dir +x; U = (0,1,0), V = (0,0,1)
    pc = jnp.asarray([[[1.0, 2.0, 3.0], [0.0, -1.0, 0.5]]])
    out = np.asarray(projection(pc, jnp.zeros(1), jnp.zeros(1)))
    np.testing.assert_allclose(out[0, 0], [[2.0, 3.0], [-1.0, 0.5]], atol=1e-6)


def test_ball_query_2d_first_k_in_order(rng):
    supports = jnp.asarray(
        np.stack([np.linspace(0, 1, 10), np.zeros(10)], -1), jnp.float32
    )
    queries = jnp.zeros((1, 2), jnp.float32)
    idx = np.asarray(ball_query_2d(queries, supports, radius=0.5, nsample=3,
                                   points_num=10))
    # first three supports in index order within radius 0.5
    np.testing.assert_array_equal(idx[0], [0, 1, 2])
    # points_num limits the scan
    idx2 = np.asarray(ball_query_2d(queries, supports, 0.5, 3, points_num=2))
    np.testing.assert_array_equal(idx2[0], [0, 1, -1])
    # nothing in radius -> all -1
    far = jnp.asarray([[100.0, 100.0]], jnp.float32)
    idx3 = np.asarray(ball_query_2d(far, supports, 0.5, 3, 10))
    np.testing.assert_array_equal(idx3[0], [-1, -1, -1])


def test_point2mask_module_shapes_and_background(rng):
    b, n, c = 2, 50, 5
    coords = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    pn = jnp.asarray([n, n], jnp.int32)
    mask = np.asarray(point2mask_module(coords, feats, (16, 16), pn,
                                        radius=2.0, nsample=3))
    assert mask.shape == (b, 16, 16, 2)
    np.testing.assert_allclose(mask.sum(-1), 1.0, atol=1e-5)  # softmax or [1,0]
    # corners (outside the centred 80% box) should be background [1, 0]
    np.testing.assert_allclose(mask[:, 0, 0], [[1, 0]] * b, atol=1e-6)


def test_point2mask_gradients_flow(rng):
    b, n, c = 1, 40, 4
    coords = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    pn = jnp.asarray([n], jnp.int32)

    def f(fe):
        m = point2mask_module(coords, fe, (8, 8), pn, radius=3.0, nsample=4)
        return jnp.sum(m[..., 1])

    g = jax.grad(f)(feats)
    assert bool((np.asarray(g) != 0).any())


def test_point2mask_end_to_end(rng):
    xyz = rng.normal(size=(1, 200, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 200, 6)).astype(np.float32)
    labels = rng.integers(0, 3, (1, 200))
    module = Point2Mask(radius=4, nsample=3)
    masks = np.asarray(
        module(xyz, feats, labels, 16, np.zeros(2, np.float32),
               np.zeros(2, np.float32))
    )
    # 3 instances x 2 views
    assert masks.shape == (6, 3, 16, 16)
    assert np.isfinite(masks).all()


def test_box2mask_filters(rng):
    xyz = rng.uniform(0, 1, (1, 300, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 300, 4)).astype(np.float32)
    boxes = np.asarray([[[0, 0, 0, 1, 1, 1], [5, 5, 5, 6, 6, 6]]], np.float32)
    module = Box2Mask(radius=4, nsample=3)
    masks = np.asarray(
        module(xyz, feats, boxes, 8, np.zeros(1, np.float32),
               np.zeros(1, np.float32), box_filter_bar={})
    )
    assert masks.shape == (1, 3, 8, 8)  # empty box dropped


def test_pixel2mask_square(rng):
    img = np.zeros((1, 32, 32, 3), np.int32)
    img[:, 8:-8, 8:-8] = 255
    module = Pixel2Mask(radius=4, nsample=3)
    mask = np.asarray(module(img, 32))
    assert mask.shape == (1, 32, 32, 3)
    # interior of the square is strongly foreground vs the exact corner
    # (radius-4 blur reaches within ~3px of the rescaled square's edge)
    assert mask[0, 16, 16, 0] > mask[0, 0, 0, 0]
    assert mask[0, 16, 16, 0] > 200
