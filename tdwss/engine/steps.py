"""Compiled train / eval steps.

The reference training iteration (train.py:55-81): zero_grad ->
``model((x, text), istrain=True)`` -> Classification loss (+ point-level CE
in the pseudo round) -> TextContrastive -> Adam step.  Here the whole
iteration is one jitted function: loss, grads, optax update, and the BN
running-stat update, all on device.  The eval step returns per-point logits
for vote accumulation.

Data parallelism hooks: `make_train_step(..., pmean_axis="data")` inserts
gradient/batch-stat `pmean`s so the same step body runs under `shard_map`
over an ICI mesh (SURVEY.md §2.5 TPU-native plan).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tdwss.config import Config
from tdwss.data.batch import PointBatch
from tdwss.utils.losses import Classification, TextContrastive


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # () int32


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """Adam(1e-3) + StepLR(step_size=100 epochs, gamma=0.1) parity."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * (cfg.lr_decay_gamma ** (epoch // cfg.lr_decay_epochs))

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(cfg, steps_per_epoch))


def compute_loss(cfg: Config, model, params, batch_stats, batch: PointBatch):
    """Returns (loss, (new_batch_stats, aux_scalars))."""
    variables = {"params": params, "batch_stats": batch_stats}
    (out, meta), mutated = model.apply(
        variables, batch, istrain=True, mutable=["batch_stats"]
    )
    loss = jnp.asarray(0.0, jnp.float32)
    aux = {}
    if cfg.loss.Classification:
        cls_loss = Classification(out, batch.scene_label, mask=batch.scene_mask)
        loss = loss + cls_loss
        aux["cls_loss"] = cls_loss
        if cfg.label == "pseudo":
            point_loss = Classification(meta, batch.point_label, mask=batch.valid)
            loss = loss + point_loss
            aux["point_loss"] = point_loss
    if cfg.has_text and cfg.loss.TextContrastive:
        gfeats, tfeats, has_text = meta
        if tfeats is not None:
            text_mask = None
            if batch.text is not None:
                # mask padded scenes AND padded description slots
                slot_used = jnp.any(batch.text.tokens != 0, axis=-1)
                text_mask = jnp.logical_and(batch.text.valid[:, None], slot_used)
            text_loss = TextContrastive(
                gfeats, tfeats, has_text, text_mask=text_mask,
                scene_mask=batch.scene_mask,
            )
            loss = loss + text_loss
            aux["text_loss"] = text_loss
    aux["loss"] = loss
    return loss, (mutated["batch_stats"], aux)


def make_train_step(cfg: Config, model, tx: optax.GradientTransformation,
                    pmean_axis: Optional[str] = None):
    """One fused optimization step: grads + update + BN stats."""

    def train_step(state: TrainState, batch: PointBatch):
        grad_fn = jax.value_and_grad(
            lambda p: compute_loss(cfg, model, p, state.batch_stats, batch),
            has_aux=True,
        )
        (loss, (new_stats, aux)), grads = grad_fn(state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            new_stats = jax.lax.pmean(new_stats, pmean_axis)
            aux = jax.lax.pmean(aux, pmean_axis)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, aux

    return train_step


def make_eval_step(model):
    """Per-point logits in eval mode (running BN stats)."""

    def eval_step(params, batch_stats, batch: PointBatch):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, batch, istrain=False, train=False)

    return eval_step


def init_state(cfg: Config, model, tx, example_batch: PointBatch,
               seed: int = 0) -> TrainState:
    from tdwss.ops.sparse_conv import force_einsum

    # One jitted program instead of eager per-op dispatch: unjitted,
    # model.init issues hundreds of tiny executions (~0.4-2 s each through
    # the axon compile relay — measured ~5-10 min of the round-3 bench's
    # 28-min cold start).  The init forward's VALUES are throwaway (param
    # shapes are V-independent; BN stats init to zeros/ones), so the trace
    # also forces the einsum conv path — no Mosaic kernel compiles for a
    # program that runs exactly once.  force_einsum is trace-local
    # (contextvar): concurrent traces in loader threads keep the kernels.
    with force_einsum():
        variables = jax.jit(
            lambda rng, b: model.init(rng, b, istrain=True)
        )(jax.random.PRNGKey(seed), example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def accumulate_votes(store: jnp.ndarray, logits: jnp.ndarray,
                     point_ids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Multi-view vote accumulation on device (train.py:107 parity).

    Invalid ids are redirected out of range and dropped (NB: negative ids
    must not reach the scatter — JAX does not wrap them like numpy).
    """
    n = store.shape[0]
    ids = jnp.where(jnp.logical_and(valid, point_ids >= 0), point_ids, n)
    return store.at[ids].add(logits.astype(store.dtype), mode="drop")
