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


@pytest.mark.slow
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


def _reconstruct_abs(win):
    """Absolute (V, K) rulebook from windowed metadata (any form)."""
    from tdwss.ops.plan import WindowedGather

    rb = np.asarray(win.rb_local)
    starts = np.asarray(win.starts)
    v, k = rb.shape
    tiles = starts.shape[0]
    t = v // tiles
    nwin = starts.shape[1] if starts.ndim > 1 else 1
    gmap = np.arange(k, dtype=np.int32) % nwin
    base = np.repeat(starts.reshape(tiles, nwin), t, axis=0)[:, gmap]
    sentinel = win.window
    if getattr(win, "sub", 0):
        base = base + np.repeat(
            np.asarray(win.sub_off), win.sub, axis=0)[:, gmap]
        sentinel = win.subwin
    out = np.where(rb == sentinel, -1, rb + base)
    # overlay the spill list (exact corrections)
    v_src = win.v_src if isinstance(win, WindowedGather) else v
    ovf = np.asarray(win.res_ovf)
    real = (ovf[:, 0] < v) & (ovf[:, 2] < v_src)
    out[ovf[real, 0], ovf[real, 1]] = ovf[real, 2]
    return out


@pytest.mark.slow
def test_dp_harmonization_exact_at_production_shape():
    """Harmonized per-device metadata (window expansion, sub flattening,
    cap padding) must still encode the EXACT original rulebooks at
    >=100k-voxel capacities with genuinely heterogeneous device plans."""
    from tdwss.data.plans import attach_host_plans
    from tdwss.ops.host_plan import reset_sticky_plans
    from tdwss.ops.plan import Windowed27, WindowedGather
    from tdwss.parallel.dp import _harmonize_residual_caps

    cfg = Config(
        training_name="dp_prod", model_name="MultiLabel",
        label="scene_level", has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=33, batch_size=1),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=4, full_scale=2048, block_reps=1,
            residual_blocks=False, depth=3),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=131072, min_level_capacity=4096,
                            level_capacity_schedule=[2, 3],
                            compute_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    batches = []
    for d in range(8):
        reset_sticky_plans()   # devices must NOT share sticky state here
        scenes = make_dataset(1, num_points=40_000 + 9_000 * d,
                              seed=50 + d, with_text=False)
        batches.append(attach_host_plans(
            train_collate(scenes, cfg, rng), cfg))
    reset_sticky_plans()

    is_win = lambda x: isinstance(x, (Windowed27, WindowedGather))  # noqa

    def wins(b):
        return [x for x in jax.tree_util.tree_flatten(
            b, is_leaf=is_win)[0] if is_win(x)]

    assert batches[0].plans.levels[0].grid.capacity >= 100_000
    shapes = {tuple((w.window, w.res_ovf.shape[0], w.sub)
                    for w in wins(b)) for b in batches}
    assert len(shapes) > 1, "expected heterogeneous per-device metadata"

    before = [[_reconstruct_abs(w) for w in wins(b)] for b in batches]
    harmonized = _harmonize_residual_caps(batches)

    hshapes = {tuple((w.window, w.res_ovf.shape[0], w.sub)
                     for w in wins(b)) for b in harmonized}
    assert len(hshapes) == 1, "harmonization must unify every leaf shape"
    for b_pre, b_post in zip(before, harmonized):
        for rb_pre, w_post in zip(b_pre, wins(b_post)):
            np.testing.assert_array_equal(rb_pre, _reconstruct_abs(w_post))


@pytest.mark.slow
def test_dp_step_heterogeneous_plans_replicated():
    """8-device DP step with heterogeneous (harmonized) plans executes and
    keeps params replicated (moderate shapes — CPU mesh execution)."""
    from tdwss.data.plans import attach_host_plans
    from tdwss.ops.host_plan import reset_sticky_plans

    cfg = Config(
        training_name="dp_het", model_name="MultiLabel",
        label="scene_level", has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=20, batch_size=1),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=4, full_scale=512, block_reps=1,
            residual_blocks=False, depth=3),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=8192, min_level_capacity=1024,
                            compute_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    n_dev = 8
    batches = []
    for d in range(n_dev):
        reset_sticky_plans()
        scenes = make_dataset(1, num_points=2000 + 700 * d, seed=80 + d,
                              with_text=False)
        batches.append(attach_host_plans(
            train_collate(scenes, cfg, rng), cfg))
    reset_sticky_plans()
    stacked = stack_batches(batches)
    mesh = make_mesh(n_dev)
    dev_batch = shard_batch(stacked, mesh)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = init_state(cfg, model, tx, batches[0])
    step = make_dp_train_step(cfg, model, tx, mesh)
    state, aux = step(state, dev_batch)
    assert np.isfinite(float(aux["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow
def test_dp_trainer_end_to_end(tmp_path, monkeypatch):
    """The Trainer consumes cfg.mesh.data: a shrunk 4chip config trains
    2 epochs data-parallel on a 4-device virtual mesh with decreasing
    loss, replicated state, working validation, and checkpoint resume
    (the reference's `options: [distributed]` stub, realized)."""
    import os

    import tdwss
    from tdwss.config import load_config
    from tdwss.engine.train import Trainer
    from tdwss.ops.host_plan import reset_sticky_plans

    cfg_path = os.path.join(os.path.dirname(tdwss.__file__), "..",
                            "configs",
                            "3DUNetWithText_scannet_subcloud_uppool_4chip.yaml")
    cfg = load_config(
        cfg_path,
        label="scene_level",           # synthetic scenes, no subcloud prep
        epochs=2,
        pointcloud_data={"scale": 10, "val_reps": 1, "batch_size": 8},
        pointcloud_model={"name": "SparseConvFCNetDirectUpPool", "m": 4,
                          "full_scale": 64, "block_reps": 1,
                          "residual_blocks": False},
        engine={"max_points": 4096, "min_level_capacity": 256},
    )
    assert cfg.mesh.data == 4          # from the yaml
    reset_sticky_plans()
    train = make_dataset(32, num_points=600, seed=21, with_text=False)
    val = make_dataset(2, num_points=600, seed=121, with_text=False)
    monkeypatch.chdir(tmp_path)

    trainer = Trainer(cfg, train, val, use_checkpoints=True, verbose=False)
    assert trainer.mesh is not None and len(trainer.mesh.devices) == 4
    history = trainer.fit(epochs=2)
    assert len(history) == 2 and np.isfinite(history).all()
    assert history[-1] < history[0], history

    # state stays replicated across the mesh after real (different-batch)
    # DP steps
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 4
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    trainer.ckpt.close()

    # checkpoint resume restores the replicated state
    t2 = Trainer(cfg, train, val, use_checkpoints=True, verbose=False)
    assert t2.start_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.ckpt.close()
    reset_sticky_plans()
