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


def test_collate_carries_boxes_and_transform(rng):
    """with_boxes: BoxBatch rides the train batch; crop_box round-trips."""
    import dataclasses

    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.synthetic import make_dataset

    cfg = Config(
        training_name="box_test",
        model_name="MultiLabel",
        label="scene_level",
        pointcloud_data=PointcloudDataConfig(
            scale=10, batch_size=2, with_boxes=True, max_boxes=4),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvFCNet", m=4, full_scale=256, block_reps=1,
            residual_blocks=False, depth=3),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=4096, min_level_capacity=256),
    )
    scenes = make_dataset(2, num_points=1500, seed=11, with_text=False)
    # attach synthetic world-space proposals around each scene's extent
    scenes = [
        dataclasses.replace(
            s, boxes=np.stack([
                np.concatenate([(s.points.max(0) + s.points.min(0)) / 2,
                                (s.points.max(0) - s.points.min(0)) * 1.2]),
                np.concatenate([s.points.mean(0) + 0.5,
                                np.full(3, 1.0)]),
            ]).astype(np.float32))
        for s in scenes
    ]
    np_rng = np.random.default_rng(0)
    batch = train_collate(scenes, cfg, np_rng)
    assert batch.box is not None
    assert batch.box.boxes.shape == (2, 4, 6)
    assert batch.box.valid.sum() == 4          # 2 real boxes per scene
    flat = batch.box.concat_boxes()
    assert flat.shape == (4, 7)
    np.testing.assert_array_equal(flat[:, 6], [0, 0, 1, 1])

    # the whole-extent box must recover ~all of its scene's points after
    # undoing the augmentation carried in the transform quartet
    keep = np.asarray(batch.valid)
    coords = np.asarray(batch.coords)[keep]
    feats = np.asarray(batch.feats)[keep]
    scene0 = flat[0:1]
    out_c, _ = crop_box(coords, feats, scene0, batch.box.transform_tuple())
    n_scene0 = int((coords[:, 3] == 0).sum())
    assert out_c.shape[0] >= 0.95 * n_scene0


def test_projector_from_batch_forward(rng):
    """Optional projector head renders views straight from the batch."""
    import dataclasses

    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.synthetic import make_dataset
    from tdwss.models.projector import project_from_batch

    cfg = Config(
        training_name="box_proj",
        model_name="MultiLabel",
        label="scene_level",
        pointcloud_data=PointcloudDataConfig(
            scale=10, batch_size=2, with_boxes=True, max_boxes=2),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvFCNet", m=4, full_scale=256, block_reps=1,
            residual_blocks=False, depth=3),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=4096, min_level_capacity=256),
    )
    scenes = make_dataset(2, num_points=1200, seed=13, with_text=False)
    scenes = [
        dataclasses.replace(
            s, boxes=np.concatenate(
                [s.points.mean(0),
                 (s.points.max(0) - s.points.min(0))])[None].astype(np.float32))
        for s in scenes
    ]
    batch = train_collate(scenes, cfg, np.random.default_rng(1))
    feats = np.asarray(batch.feats)

    proj = Projector(out_channels=2, resolution=32, view="HWZ")
    variables = proj.init(jax.random.PRNGKey(0), jnp.zeros((8, 4)),
                          jnp.zeros((8, 3)), jnp.ones((8,), bool), 1)
    imgs = project_from_batch(batch, feats, variables, proj)
    m = batch.box.concat_boxes().shape[0]
    assert imgs.shape == (3 * m, 2, 32, 32)
    assert np.isfinite(np.asarray(imgs)).all()
    assert np.abs(np.asarray(imgs)).sum() > 0
