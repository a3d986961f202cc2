"""Multi-view voting validation (reference validation.py / train.py:94-116).

For each of ``val_reps`` repetitions the val loader produces one random view
per scene; per-point logits are scatter-added into a global vote store on
device (the reference round-tripped every batch through host,
train.py:107); argmax over accumulated votes -> mIoU after each rep.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdwss.config import Config
from tdwss.data.dataset import val_offsets
from tdwss.data.loader import val_batches
from tdwss.engine.steps import accumulate_votes, make_eval_step
from tdwss.utils import iou


def validate(cfg: Config, model, params, batch_stats, val_scenes,
             reps: Optional[int] = None, verbose: bool = True) -> List[float]:
    """Returns the mIoU after each voting repetition."""
    reps = reps or cfg.pointcloud_data.val_reps
    offsets, labels = val_offsets(val_scenes)
    store = jnp.zeros((int(offsets[-1]), 20), jnp.float32)

    eval_step = jax.jit(make_eval_step(model))
    vote = jax.jit(accumulate_votes)

    ious = []
    for rep in range(1, reps + 1):
        for batch in val_batches(val_scenes, cfg, offsets, rep):
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            logits = eval_step(params, batch_stats, batch)
            store = vote(store, logits, batch.point_ids, batch.valid)
        preds = np.asarray(jnp.argmax(store, axis=1))
        mean_iou = iou.evaluate(preds, labels, verbose=verbose)
        ious.append(mean_iou)
    return ious
