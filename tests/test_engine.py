"""End-to-end engine tests on synthetic scenes (SURVEY.md §4e).

One-scene-family overfit check, multi-view voting validation, checkpoint
resume, and the full weak-supervision loop (sweep -> generate -> retrain
FullySupervised on pseudo labels).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdwss.config import (
    Config,
    EngineConfig,
    LossConfig,
    PointcloudDataConfig,
    PointcloudModelConfig,
)
from tdwss.data.synthetic import make_dataset
from tdwss.engine.pseudo import generate_pseudo_labels, threshold_sweep
from tdwss.engine.train import Trainer, is_power2


def _cfg(tmp_path=None, label="scene_level", model="MultiLabel"):
    return Config(
        training_name="test_run",
        model_name=model,
        label=label,
        pointcloud_data=PointcloudDataConfig(scale=10, val_reps=2, batch_size=2),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvFCNet", m=4, full_scale=64, block_reps=1,
            residual_blocks=False, depth=3,
        ),
        loss=LossConfig(Classification=True, TextContrastive=False),
        engine=EngineConfig(max_points=4096, min_level_capacity=256),
        epochs=4,
        path=str(tmp_path) if tmp_path else "pseudo_out",
    )


@pytest.fixture(scope="module")
def scenes():
    train = make_dataset(4, num_points=1500, seed=3, with_text=False)
    val = make_dataset(2, num_points=1500, seed=103, with_text=False)
    return train, val


def test_is_power2_schedule():
    assert [e for e in range(1, 40) if is_power2(e) or e % 32 == 0] == [
        1, 2, 4, 8, 16, 32,
    ]


@pytest.mark.slow
def test_overfit_loss_decreases(scenes):
    train, val = scenes
    cfg = _cfg()
    trainer = Trainer(cfg, train, val, use_checkpoints=False, verbose=False)
    history = trainer.fit(epochs=4)
    assert len(history) == 4
    assert np.isfinite(history).all()
    assert history[-1] < history[0], history


@pytest.mark.slow
def test_overfit_train_miou_floor(scenes):
    """Accuracy gate (VERDICT r02 #6): the model must LEARN, not just move.

    Overfit FullySupervised on the 4 synthetic train scenes with full point
    labels, then validate on those same scenes — train-set mIoU must clear
    a fixed floor.  This is the regression tripwire for perf surgery on the
    conv engine: a silently-corrupted kernel still shows decreasing loss
    but cannot reach the floor.  (Reference behavior: periodic mIoU during
    training, /root/reference/train.py:94-116.)
    """
    import dataclasses as dc

    train, _ = scenes
    # pseudo_labels := ground truth == the fully-supervised upper bound of
    # the pseudo-retrain round (the only point-CE path, steps.py:63-66)
    train = [dc.replace(s, pseudo_labels=s.labels) for s in train]
    cfg = _cfg(model="FullySupervised", label="pseudo")
    cfg = dc.replace(
        cfg, lr=0.01,
        pointcloud_model=dc.replace(cfg.pointcloud_model, m=8))
    trainer = Trainer(cfg, train, train, use_checkpoints=False, verbose=False)
    trainer.fit(epochs=25)

    # vote like validate() does, but gate on BOTH overall point accuracy
    # (robust to the synthetic set's 41-point tail classes) and mIoU
    from tdwss.data.dataset import val_offsets
    from tdwss.data.loader import val_batches
    from tdwss.engine.steps import accumulate_votes, make_eval_step
    from tdwss.utils import iou as iou_mod

    offsets, labels = val_offsets(train)
    store = jnp.zeros((int(offsets[-1]), 20), jnp.float32)
    eval_step = jax.jit(make_eval_step(trainer.model))
    for batch in val_batches(train, cfg, offsets, rep=1, prefetch=False):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        logits = eval_step(trainer.state.params, trainer.state.batch_stats,
                           batch)
        store = accumulate_votes(store, logits, batch.point_ids, batch.valid)
    preds = np.asarray(jnp.argmax(store, axis=1))
    mask = labels >= 0
    acc = float((preds[mask] == labels[mask]).mean())
    miou = iou_mod.evaluate(preds, labels, verbose=False)
    # calibration (CPU, seed 3, the 25 epochs this test trains): the run
    # clears the floors with margin (30-epoch reference point: acc 0.77 /
    # mIoU 0.107); a corrupted conv engine sits at acc ~0.3 (majority
    # class) / mIoU ~0.03
    assert acc >= 0.60, f"train-set point accuracy {acc:.3f} below floor"
    assert miou >= 0.07, f"train-set mIoU {miou:.3f} below floor"


def test_validate_runs_and_votes(scenes):
    train, val = scenes
    cfg = _cfg()
    trainer = Trainer(cfg, train, val, use_checkpoints=False, verbose=False)
    from tdwss.engine.evaluate import validate

    ious = validate(cfg, trainer.model, trainer.state.params,
                    trainer.state.batch_stats, val, reps=2, verbose=False)
    assert len(ious) == 2
    assert all(0.0 <= x <= 1.0 for x in ious)


@pytest.mark.slow
def test_checkpoint_resume(tmp_path, scenes, monkeypatch):
    train, val = scenes
    monkeypatch.chdir(tmp_path)
    cfg = _cfg()
    t1 = Trainer(cfg, train, val, use_checkpoints=True, verbose=False)
    t1.fit(epochs=2)
    t1.ckpt.close()

    t2 = Trainer(cfg, train, val, use_checkpoints=True, verbose=False)
    assert t2.start_epoch == 3
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.ckpt.close()


@pytest.mark.slow
def test_pseudo_label_loop(tmp_path, scenes):
    train, val = scenes
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, train, val, use_checkpoints=False, verbose=False)
    trainer.fit(epochs=2)

    sweep = threshold_sweep(
        cfg, trainer.model, trainer.state.params, trainer.state.batch_stats,
        train, thresholds=np.linspace(0.6, 0.8, 3),
        plot_path=os.path.join(tmp_path, "Statistics.jpg"), verbose=False,
    )
    assert sweep["labelnum_prop"].shape == (3,)
    # higher threshold -> fewer labels
    assert sweep["labelnum_prop"][0] >= sweep["labelnum_prop"][-1]

    # reference-parity mode: sweep over the train-augmented loader
    # (/root/reference/statistics.py:41-56)
    sweep_aug = threshold_sweep(
        cfg, trainer.model, trainer.state.params, trainer.state.batch_stats,
        train, thresholds=np.linspace(0.6, 0.8, 3),
        plot_path=os.path.join(tmp_path, "Statistics_aug.jpg"), verbose=False,
        train_augmented=True,
    )
    assert sweep_aug["labelnum_prop"].shape == (3,)
    assert sweep_aug["labelnum_prop"][0] >= sweep_aug["labelnum_prop"][-1]

    generated, correct, total = generate_pseudo_labels(
        cfg, trainer.model, trainer.state.params, trainer.state.batch_stats,
        train, threshold=0.6, verbose=False,
    )
    assert 0 < generated <= total
    # pseudo-label precision tripwire (VERDICT r02 #6): after 2 weak
    # epochs measured precision is ~0.22; random-within-scene-tags is
    # ~0.17, so 0.15 catches scatter/label corruption without flaking
    # (test_overfit_train_miou_floor is the strong accuracy gate)
    assert correct / generated >= 0.15, (correct, generated)

    # reload with pseudo labels and retrain FullySupervised
    saving_path = os.path.join(str(tmp_path), "test_run_thresh0.6")
    files = os.listdir(saving_path)
    assert len(files) == len(train)
    for scene in train:
        scene.pseudo_labels = np.load(
            os.path.join(saving_path, scene.name + cfg.suffix)
        )
        assert scene.pseudo_labels.shape == scene.labels.shape

    cfg2 = _cfg(tmp_path, label="pseudo", model="FullySupervised")
    t2 = Trainer(cfg2, train, val, use_checkpoints=False, verbose=False)
    history = t2.fit(epochs=2)
    assert np.isfinite(history).all()


def test_profiling_helpers(tmp_path):
    from tdwss.utils import profiling

    t = profiling.StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.mean >= 0
    with profiling.trace(str(tmp_path / "prof")):
        import jax.numpy as jnp

        jnp.ones((8, 8)).sum().block_until_ready()
    import os
    assert os.path.isdir(tmp_path / "prof")


@pytest.mark.slow
def test_pretrain_seeds_fresh_run(tmp_path, scenes, monkeypatch):
    """--pretrain loads params/batch_stats but NOT the optimizer/epoch."""
    import dataclasses

    train, val = scenes
    monkeypatch.chdir(tmp_path)
    cfg = _cfg()
    t1 = Trainer(cfg, train, val, use_checkpoints=True, verbose=False)
    t1.fit(epochs=2)
    t1.ckpt.close()
    src_dir = os.path.join("exp", cfg.training_name, "checkpoints")

    cfg2 = dataclasses.replace(cfg, training_name="finetune_run",
                               pretrain=src_dir)
    t2 = Trainer(cfg2, train, val, use_checkpoints=True, verbose=False)
    assert t2.start_epoch == 1          # fresh run, seeded weights
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(t2.state.step) == 0      # optimizer state stays fresh
    t2.ckpt.close()
