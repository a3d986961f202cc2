"""Host batch iterators with background prefetch.

Replaces the reference's torch DataLoaders (dataset/data.py:239-247,
312-319): shuffled train batches with drop_last, val batches carrying global
point ids.  Augmentation + collation run on host threads so the accelerator
step overlaps with preparation of the next batch (SURVEY.md §2.5 host data
parallelism).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from tdwss.config import Config
from tdwss.data.batch import PointBatch
from tdwss.data.collate import CollateStats, train_collate, val_collate
from tdwss.data.plans import attach_host_plans
from tdwss.data.synthetic import Scene


def _prefetch(gen, depth: int = 2, to_device: bool = False):
    """Background-thread iterator; ``to_device`` additionally issues the
    (asynchronous) host->device transfer from the worker thread so the
    ~100+ MB/batch of rulebooks upload while the previous step computes,
    instead of serializing with it in the training loop."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    failure: list = []

    def worker():
        try:
            for item in gen:
                if to_device:
                    import jax

                    item = jax.device_put(item)
                q.put(item)
        except BaseException as e:  # re-raised in the consumer below
            failure.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if failure:
                # surface collate/plan/transfer errors instead of silently
                # truncating the epoch
                raise failure[0]
            return
        yield item


def _parallel_map_ordered(fn, items, num_workers: int, depth: int = 4):
    """Run ``fn`` over ``items`` on a thread pool, yielding results in order.

    Collate + host plan building are numpy/native-heavy (GIL released), so
    threads give true parallelism — the reference's num_workers=4 torch
    DataLoader equivalent (dataset/data.py:243) without process overhead.
    Workers are capped at the machine's core count: extra threads on a
    small host delay the FIRST batch (every in-flight batch shares the
    cores) without finishing the epoch any sooner.
    """
    import os

    num_workers = min(num_workers, os.cpu_count() or num_workers)
    if num_workers <= 1:
        for it in items:
            yield fn(it)
        return
    from concurrent.futures import ThreadPoolExecutor

    items = list(items)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = []
        it = iter(items)
        for x in it:
            pending.append(pool.submit(fn, x))
            if len(pending) >= num_workers + depth:
                break
        i = 0
        while i < len(pending):
            yield pending[i].result()
            i += 1
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(fn, nxt))


class _PlanCache:
    """LRU memo of fully-built train batches (collate + host plans).

    Every batch is a DETERMINISTIC function of (cfg.seed, epoch, start,
    the selected scene names) — the augmentation RNG derives from exactly
    that key (train_batches.make) — plus the sticky plan-shape registry
    state (a ratchet changes array paddings).  So batches built by the
    prewarm pass (:func:`warm_plan_shapes`) can be replayed verbatim by
    the training loop: on a few-core host this removes the per-batch plan
    cost from the steady-state loop, which is what a many-core host's
    plan/step overlap achieves (reference analogue: torch DataLoader
    workers, dataset/data.py:239-247).
    """

    def __init__(self, max_batches: int):
        import collections
        import threading

        self.max = max_batches
        self._d: "collections.OrderedDict" = collections.OrderedDict()
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            hit = self._d.get(key)
            if hit is not None:
                self._d.move_to_end(key)
            return hit

    def put(self, key, value) -> None:
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.max:
                self._d.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()


_PLAN_CACHE: Optional[_PlanCache] = None


def _plan_cache(cfg: Config) -> Optional[_PlanCache]:
    global _PLAN_CACHE
    n = getattr(cfg.engine, "plan_cache_batches", 0)
    if not n or not cfg.engine.host_plans:
        return None
    if _PLAN_CACHE is None or _PLAN_CACHE.max != n:
        _PLAN_CACHE = _PlanCache(n)
    return _PLAN_CACHE


def _shape_fingerprint():
    """Sticky plan-shape registry state: a ratchet invalidates the cache
    (stale paddings would retrace the compiled step)."""
    from tdwss.ops.host_plan import _ECAP_REGISTRY

    # keys are heterogeneous tuples (str/int mixes) — sort by repr
    return tuple(sorted(_ECAP_REGISTRY.items(), key=repr))


_SCENE_TOKENS = iter(range(1 << 62))


def _scene_token(s) -> int:
    """Stable per-Scene-object identity for cache keys.  Names alone can
    collide across datasets (synthetic seeds reuse 'scene_i'); object ids
    can be recycled by the allocator.  A lazily-assigned monotonic token
    is collision-free for the process lifetime; a rebuilt dataset simply
    misses (safe, just unmemoized)."""
    tok = getattr(s, "_tdwss_cache_token", None)
    if tok is None:
        tok = next(_SCENE_TOKENS)
        try:
            s._tdwss_cache_token = tok
        except Exception:   # frozen/slots dataclass: fall back to id()
            return id(s)
    return tok


def train_batches(scenes: Sequence[Scene], cfg: Config, epoch: int,
                  stats: Optional[CollateStats] = None,
                  prefetch: bool = True,
                  to_device: bool = False) -> Iterator[PointBatch]:
    """Shuffled, drop_last batches of ``cfg.pointcloud_data.batch_size``."""
    rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, epoch]))
    order = rng.permutation(len(scenes))
    bs = cfg.pointcloud_data.batch_size
    starts = list(range(0, len(order) - bs + 1, bs))
    cache = _plan_cache(cfg)

    def make(start):
        sel = [scenes[i] for i in order[start: start + bs]]
        key = None
        if cache is not None:
            key = (cfg.seed, epoch, start,
                   tuple(_scene_token(s) for s in sel),
                   _shape_fingerprint())
            hit = cache.get(key)
            if hit is not None:
                batch, d_stats = hit
                if stats is not None:
                    stats.total_points += d_stats[0]
                    stats.dropped_points += d_stats[1]
                return batch
        # per-batch child rng: collates may run on concurrent workers
        brng = np.random.default_rng(
            np.random.SeedSequence([cfg.seed, epoch, start]))
        before = ((stats.total_points, stats.dropped_points)
                  if stats is not None else (0, 0))
        bstats = stats if stats is not None else CollateStats()
        batch = train_collate(sel, cfg, brng, bstats)
        if cfg.engine.host_plans:
            batch = attach_host_plans(batch, cfg)
            if cfg.engine.slim_train_batch:
                from tdwss.data.plans import slim_batch_for_train

                batch = slim_batch_for_train(batch, cfg)
        if cache is not None:
            if stats is not None:
                delta = (stats.total_points - before[0],
                         stats.dropped_points - before[1])
            else:
                delta = (bstats.total_points, bstats.dropped_points)
            # re-key: building this batch may itself have ratcheted the
            # registry — store under the POST-build fingerprint
            key = (cfg.seed, epoch, start,
                   tuple(_scene_token(s) for s in sel),
                   _shape_fingerprint())
            cache.put(key, (batch, delta))
        return batch

    gen = _parallel_map_ordered(make, starts, cfg.engine.collate_workers)
    return _prefetch(gen, to_device=to_device) if prefetch else gen


def warm_plan_shapes(scenes: Sequence[Scene], cfg: Config,
                     epochs=(1,)) -> None:
    """Converge the sticky plan-shape registry BEFORE the first jit.

    Auto-sized windows and residual capacities ratchet monotonically
    across batches (tdwss.ops.host_plan registry); every ratchet after
    the first compile re-specializes the whole training step — tens of
    seconds locally, ~15 min through a remote-compile relay.  One dry
    pass over an epoch's batch compositions (collate + host plans,
    results discarded) pushes every per-level shape to its ceiling rung
    so the subsequent training epochs compile exactly once.  Costs one
    epoch of host plan building; a no-op when host plans are disabled.
    """
    if not cfg.engine.host_plans:
        return
    from tdwss.ops.host_plan import _ECAP_REGISTRY

    fp_start = _shape_fingerprint()
    for e in epochs:
        for _ in train_batches(scenes, cfg, epoch=e, prefetch=False):
            pass
    # Keep warming past the requested epochs until the sticky registry
    # reaches a fixed point: a mid-training ratchet re-specializes the
    # whole step (minutes via a remote-compile relay), so converging here
    # is strictly cheaper.  Bounded to 8 extra epochs — rung quantization
    # (_window_rung) makes the registry converge in 1-2 in practice.
    last = max(epochs, default=0)
    for e in range(last + 1, last + 9):
        before = dict(_ECAP_REGISTRY)
        for _ in train_batches(scenes, cfg, epoch=e, prefetch=False):
            pass
        if _ECAP_REGISTRY == before:
            break
    # With the plan cache on, batches built BEFORE the registry's last
    # ratchet are keyed under a stale shape fingerprint and would miss in
    # the training loop.  One more pass over the requested epochs re-caches
    # them under the converged fingerprint (pure hits when nothing
    # ratcheted anywhere in the warm passes).
    if _plan_cache(cfg) is not None and _shape_fingerprint() != fp_start:
        for e in epochs:
            for _ in train_batches(scenes, cfg, epoch=e, prefetch=False):
                pass


def val_batches(scenes: Sequence[Scene], cfg: Config,
                scene_offsets: np.ndarray, rep: int,
                stats: Optional[CollateStats] = None,
                prefetch: bool = True) -> Iterator[PointBatch]:
    """Sequential val batches (one random view per rep), with point_ids."""
    bs = cfg.pointcloud_data.batch_size
    starts = list(range(0, len(scenes), bs))

    def make(start):
        brng = np.random.default_rng(
            np.random.SeedSequence([cfg.seed, 7777, rep, start]))
        idx = list(range(start, min(start + bs, len(scenes))))
        sel = [scenes[i] for i in idx]
        batch = val_collate(sel, cfg, brng, scene_offsets, idx, stats,
                            num_scenes=bs)
        if cfg.engine.host_plans:
            batch = attach_host_plans(batch, cfg)
        return batch

    gen = _parallel_map_ordered(make, starts, cfg.engine.collate_workers)
    return _prefetch(gen) if prefetch else gen


def steps_per_epoch(num_scenes: int, batch_size: int) -> int:
    return num_scenes // batch_size
