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


def train_batches(scenes: Sequence[Scene], cfg: Config, epoch: int,
                  stats: Optional[CollateStats] = None,
                  prefetch: bool = True,
                  to_device: bool = False) -> Iterator[PointBatch]:
    """Shuffled, drop_last batches of ``cfg.pointcloud_data.batch_size``."""
    rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, epoch]))
    order = rng.permutation(len(scenes))
    bs = cfg.pointcloud_data.batch_size
    starts = list(range(0, len(order) - bs + 1, bs))

    def make(start):
        # per-batch child rng: collates may run on concurrent workers
        brng = np.random.default_rng(
            np.random.SeedSequence([cfg.seed, epoch, start]))
        sel = [scenes[i] for i in order[start: start + bs]]
        batch = train_collate(sel, cfg, brng, stats)
        if cfg.engine.host_plans:
            batch = attach_host_plans(batch, cfg)
            if cfg.engine.slim_train_batch:
                from tdwss.data.plans import slim_batch_for_train

                batch = slim_batch_for_train(batch, cfg)
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
