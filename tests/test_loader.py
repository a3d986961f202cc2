"""Host batch-pipeline tests: ordering, determinism, error propagation.

The loader feeds both real training and bench.py's end-to-end mode
(reference analogue: the torch DataLoader wiring, dataset/data.py:239-247);
its contracts — in-order delivery under thread workers, per-epoch
determinism, exceptions surfacing instead of truncating an epoch — are
what make the e2e throughput number trustworthy.
"""

import numpy as np
import pytest

from tdwss.config import (Config, EngineConfig, LossConfig,
                          PointcloudDataConfig, PointcloudModelConfig)
from tdwss.data.loader import (_parallel_map_ordered, _prefetch,
                               train_batches, warm_plan_shapes)
from tdwss.data.synthetic import make_dataset


def _cfg(n_scenes=6, bs=2, host_plans=True):
    return Config(
        training_name="loader_t", model_name="MultiLabel",
        label="scene_level", has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=20, batch_size=bs),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvUNet", m=4, full_scale=512, block_reps=1,
            residual_blocks=False, depth=3),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=8192, min_level_capacity=1024,
                            host_plans=host_plans,
                            compute_dtype="float32"),
    )


def test_parallel_map_ordered_preserves_order(monkeypatch):
    import os as _os
    monkeypatch.setattr(_os, "cpu_count", lambda: 4)
    import random
    import time

    def slow_square(x):
        time.sleep(random.random() * 0.01)
        return x * x

    out = list(_parallel_map_ordered(slow_square, list(range(40)),
                                     num_workers=4))
    assert out == [x * x for x in range(40)]


def test_parallel_map_ordered_propagates_exception(monkeypatch):
    import os as _os
    monkeypatch.setattr(_os, "cpu_count", lambda: 4)

    def boom(x):
        if x == 5:
            raise ValueError("bad item")
        return x

    with pytest.raises(ValueError, match="bad item"):
        list(_parallel_map_ordered(boom, list(range(10)), num_workers=3))


def test_prefetch_preserves_order_and_raises():
    assert list(_prefetch(iter(range(20)))) == list(range(20))

    def gen():
        yield 1
        raise RuntimeError("collate failed")

    it = _prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="collate failed"):
        list(it)


def test_train_batches_deterministic_per_epoch_and_covers_scenes():
    cfg = _cfg(host_plans=False)
    scenes = make_dataset(6, num_points=1500, seed=3, with_text=False)

    def labels_of(epoch):
        return [np.asarray(b.scene_label).sum() for b in
                train_batches(scenes, cfg, epoch=epoch, prefetch=False)]

    e1a, e1b, e2 = labels_of(1), labels_of(1), labels_of(2)
    assert len(e1a) == len(scenes) // cfg.pointcloud_data.batch_size
    assert e1a == e1b                       # same epoch -> same batches
    assert e1a != e2                        # different epoch -> reshuffled


def test_train_batches_with_host_plans_and_prefetch():
    cfg = _cfg()
    scenes = make_dataset(4, num_points=1500, seed=5, with_text=False)
    seen = 0
    for b in train_batches(scenes, cfg, epoch=1, prefetch=True):
        assert b.plans is not None
        assert b.vox_feats is not None
        seen += 1
    assert seen == 2


def test_warm_plan_shapes_freezes_sticky_registry():
    from tdwss.ops import host_plan as hp

    cfg = _cfg()
    scenes = make_dataset(6, num_points=1500, seed=9, with_text=False)
    hp.reset_sticky_plans()
    warm_plan_shapes(scenes, cfg, epochs=(1, 2))
    snap = dict(hp._ECAP_REGISTRY)
    # a post-warm epoch over the same compositions must not ratchet any
    # shape-bearing entry (window rungs / caps) — that is the whole point
    # of prewarming before the first jit
    for _ in train_batches(scenes, cfg, epoch=1, prefetch=False):
        pass
    for k, v in snap.items():
        assert hp._ECAP_REGISTRY.get(k) == v, k
    hp.reset_sticky_plans()


def test_train_batches_slims_dead_point_leaves():
    from tdwss.data import loader as ld
    from tdwss.ops import host_plan as hp

    cfg = _cfg()
    scenes = make_dataset(2, num_points=1500, seed=11, with_text=False)
    b = next(iter(train_batches(scenes, cfg, epoch=1, prefetch=False)))
    assert b.plans is not None
    assert b.coords.shape[0] == 0 and b.feats.shape[0] == 0
    assert b.point_ids.shape[0] == 0
    # scene-level training never reads the point domain: dropped too
    assert b.point_label.shape[0] == 0
    assert b.valid.shape[0] == 0
    assert b.point2voxel.shape[0] == 0 and b.point_perm.shape[0] == 0
    # the pseudo round's point CE DOES read them: kept
    hp.reset_sticky_plans()
    if ld._PLAN_CACHE is not None:
        ld._PLAN_CACHE.clear()
    cfg_p = _cfg()
    cfg_p.label = "pseudo"
    for s in scenes:
        s.pseudo_labels = s.labels.copy()
    bp = next(iter(train_batches(scenes, cfg_p, epoch=1, prefetch=False)))
    assert bp.point_label.shape[0] == cfg.engine.max_points
    assert bp.valid.shape[0] == cfg.engine.max_points
    assert bp.point2voxel is not None and bp.point2voxel.shape[0] > 0
    hp.reset_sticky_plans()


def test_plan_cache_hit_equals_fresh_build():
    """Cached batches (warm pass -> training loop replay) must be
    byte-identical to a fresh collate+plan build, and stats must replay."""
    import jax

    from tdwss.data import loader as ld
    from tdwss.data.collate import CollateStats
    from tdwss.ops import host_plan as hp

    cfg = _cfg()
    assert cfg.engine.plan_cache_batches > 0   # default-on
    scenes = make_dataset(4, num_points=1500, seed=21, with_text=False)
    hp.reset_sticky_plans()
    # converge the sticky registry first: shapes ratchet during a cold
    # pass, so fresh-vs-off comparability needs a fixed fingerprint
    warm_plan_shapes(scenes, cfg, epochs=(1,))
    if ld._PLAN_CACHE is not None:
        ld._PLAN_CACHE.clear()

    s_fresh = CollateStats()
    fresh = list(train_batches(scenes, cfg, epoch=1, prefetch=False,
                               stats=s_fresh))
    s_hit = CollateStats()
    hit = list(train_batches(scenes, cfg, epoch=1, prefetch=False,
                             stats=s_hit))
    assert s_hit.total_points == s_fresh.total_points
    assert s_hit.dropped_points == s_fresh.dropped_points
    assert len(hit) == len(fresh)
    for bf, bh in zip(fresh, hit):
        for lf, lh in zip(jax.tree_util.tree_leaves(bf),
                          jax.tree_util.tree_leaves(bh)):
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(lh))

    # cache OFF produces the same batches (the memo is transparent)
    cfg_off = _cfg()
    cfg_off.engine.plan_cache_batches = 0
    off = list(train_batches(scenes, cfg_off, epoch=1, prefetch=False))
    for bf, bo in zip(fresh, off):
        for lf, lo in zip(jax.tree_util.tree_leaves(bf),
                          jax.tree_util.tree_leaves(bo)):
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(lo))
    hp.reset_sticky_plans()
    ld._PLAN_CACHE.clear()


def test_plan_cache_invalidated_by_shape_ratchet(monkeypatch):
    """A sticky-registry change must MISS the cache (stale paddings would
    silently retrace the compiled step) — and an unchanged registry must
    HIT.  Observed via a build counter on attach_host_plans."""
    from tdwss.data import loader as ld
    from tdwss.ops import host_plan as hp

    cfg = _cfg()
    scenes = make_dataset(2, num_points=1500, seed=23, with_text=False)
    hp.reset_sticky_plans()
    if ld._PLAN_CACHE is not None:
        ld._PLAN_CACHE.clear()
    builds = []
    real = ld.attach_host_plans
    monkeypatch.setattr(ld, "attach_host_plans",
                        lambda *a, **k: builds.append(1) or real(*a, **k))
    list(train_batches(scenes, cfg, epoch=1, prefetch=False))
    n_cold = len(builds)
    assert n_cold >= 1
    list(train_batches(scenes, cfg, epoch=1, prefetch=False))
    assert len(builds) == n_cold, "expected pure cache hits"
    hp.reset_sticky_plans()   # fingerprint changes -> keys must miss
    list(train_batches(scenes, cfg, epoch=1, prefetch=False))
    assert len(builds) > n_cold, "expected rebuilds after registry reset"
    hp.reset_sticky_plans()
    ld._PLAN_CACHE.clear()
