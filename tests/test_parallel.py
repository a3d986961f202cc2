"""Data-parallel training over the 8-device virtual CPU mesh (SURVEY §4f).

Checks that the shard_map DP step runs, that gradients are synchronized
(replicated outputs), and that a DP step on N identical per-device batches
matches the single-device step numerically (pmean of identical grads).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdwss.config import Config, EngineConfig, LossConfig, PointcloudDataConfig, PointcloudModelConfig
from tdwss.data.collate import train_collate
from tdwss.data.synthetic import make_dataset
from tdwss.engine.steps import init_state, make_optimizer, make_train_step
from tdwss.models import build_model
from tdwss.parallel.dp import make_dp_train_step, make_mesh, shard_batch, stack_batches


def _cfg():
    return Config(
        model_name="MultiLabel",
        pointcloud_data=PointcloudDataConfig(scale=10, batch_size=2),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvFCNet", m=4, full_scale=64, block_reps=1, depth=2,
        ),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=1024, min_level_capacity=256),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    rng = np.random.default_rng(0)
    scenes = make_dataset(2, num_points=600, seed=5, with_text=False)
    batch = jax.tree_util.tree_map(
        jnp.asarray, train_collate(scenes, cfg, rng)
    )
    state = init_state(cfg, model, tx, batch)
    return cfg, model, tx, batch, state


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(setup):
    cfg, model, tx, batch, state = setup
    n = 8
    mesh = make_mesh(n)
    host_batch = jax.tree_util.tree_map(np.asarray, batch)
    stacked = shard_batch(stack_batches([host_batch] * n), mesh)

    dp_step = make_dp_train_step(cfg, model, tx, mesh)
    dp_state, dp_aux = dp_step(state, stacked)

    single_step = jax.jit(make_train_step(cfg, model, tx))
    s_state, s_aux = single_step(state, batch)

    np.testing.assert_allclose(
        float(dp_aux["loss"]), float(s_aux["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state.params),
        jax.tree_util.tree_leaves(s_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_step_different_batches_runs(setup):
    cfg, model, tx, _, state = setup
    n = 4
    mesh = make_mesh(n)
    rng = np.random.default_rng(1)
    batches = []
    for i in range(n):
        scenes = make_dataset(2, num_points=600, seed=50 + i, with_text=False)
        batches.append(train_collate(scenes, cfg, rng))
    stacked = shard_batch(stack_batches(batches), mesh)
    dp_step = make_dp_train_step(cfg, model, tx, mesh)
    new_state, aux = dp_step(state, stacked)
    assert np.isfinite(float(aux["loss"]))
    # params advanced
    a0 = jax.tree_util.tree_leaves(state.params)[0]
    a1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))


def test_dp_step_with_host_plans(scenes_factory=None):
    """DP stacking + shard_map step with windowed host plans attached."""
    import jax
    import numpy as np

    from tdwss.config import (Config, EngineConfig, LossConfig,
                              PointcloudDataConfig, PointcloudModelConfig)
    from tdwss.data.collate import train_collate
    from tdwss.data.plans import attach_host_plans
    from tdwss.data.synthetic import make_dataset
    from tdwss.engine.steps import init_state, make_optimizer
    from tdwss.models import build_model
    from tdwss.parallel.dp import (make_dp_train_step, make_mesh,
                                   shard_batch, stack_batches)

    cfg = Config(
        training_name="dp_hostplans", model_name="MultiLabel",
        label="scene_level", has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=20, batch_size=2),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=4, full_scale=256, block_reps=1,
            residual_blocks=False, depth=2),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=4096, min_level_capacity=2048),
    )
    rng = np.random.default_rng(0)
    n_dev = min(4, len(jax.devices()))
    batches = []
    for d in range(n_dev):
        scenes = make_dataset(2, num_points=1200, seed=10 + d,
                              with_text=False)
        batches.append(attach_host_plans(
            train_collate(scenes, cfg, rng), cfg))
    stacked = stack_batches(batches)
    mesh = make_mesh(n_dev)
    dev_batch = shard_batch(stacked, mesh)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = init_state(cfg, model, tx, batches[0])
    step = make_dp_train_step(cfg, model, tx, mesh)
    state, aux = step(state, dev_batch)
    assert np.isfinite(float(aux["loss"]))
