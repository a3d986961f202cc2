"""Meta-architectures (reference ``models/MultiLabelContrastive.py`` parity).

- ``MultiLabelContrastive`` (ref :7-47): point-cloud encoder + text encoder +
  ``text_linear(width -> embed)`` + ``linear(embed -> 20)``.  Train: pooled
  per-scene features -> scene logits, returns
  ``(scene_logits, (global_feats, text_feats, has_text))``; eval: per-point
  logits (CAM-style).
- ``MultiLabel`` (ref :50-70): no-text variant; pooling delegated to the
  encoder via ``istrain``.
- ``FullySupervised`` (ref :72-101): pseudo-label round; per-point logits +
  per-scene mean of logits, returns ``(scene_logits, point_logits)``.

Construction is config-driven through ``MODEL_REGISTRY`` with the
``embed_length`` metadata hook, exactly like the reference.
The per-scene mean pooling that the reference computes with a python loop
over ``batch_offsets`` (ref :36-39, :90-94) is a masked ``segment_mean`` here.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from tdwss import NUM_CLASSES
from tdwss.config import PointcloudModelConfig, TextModelConfig
from tdwss.data.batch import PointBatch
from tdwss.ops.segment import segment_mean_by_batch
from tdwss.registry import MODEL_REGISTRY


def _build_encoder(pc_config: PointcloudModelConfig, engine: Optional[Any] = None):
    cls, meta = MODEL_REGISTRY.get(pc_config.name)
    embed = meta.get("embed_length", lambda m: m)(pc_config.m)
    kwargs = dict(
        m=pc_config.m,
        dimension=pc_config.dimension,
        full_scale=pc_config.full_scale,
        block_reps=pc_config.block_reps,
        residual_blocks=pc_config.residual_blocks,
        depth=pc_config.depth,
        downsample=tuple(pc_config.downsample),
    )
    if pc_config.n_planes is not None:
        kwargs["n_planes"] = tuple(pc_config.n_planes)
    if engine is not None:
        kwargs.update(
            max_voxels=engine.max_voxels,
            level_capacity_shrink=engine.level_capacity_shrink,
            level_capacity_schedule=(
                tuple(engine.level_capacity_schedule)
                if engine.level_capacity_schedule else None),
            min_level_capacity=engine.min_level_capacity,
            compute_dtype=engine.compute_dtype,
            remat=engine.remat,
        )
    return cls(name="pc_encoder", **kwargs), embed


def _build_text_encoder(text_config: TextModelConfig):
    cls, _ = MODEL_REGISTRY.get(text_config.name)
    if text_config.name == "CLIPTransformer":
        return cls(
            clip_weights_path=text_config.clip_weights_path, name="text_encoder"
        )
    return cls(
        context_length=text_config.context_length,
        width=text_config.width,
        layers=text_config.layers,
        vocab_size=text_config.vocab_size,
        name="text_encoder",
    )


@MODEL_REGISTRY.register()
class MultiLabelContrastive(nn.Module):
    """Scene-tag classification + text-scene contrastive alignment."""

    pc_config: PointcloudModelConfig
    text_config: TextModelConfig
    engine: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: PointBatch, istrain: bool = False,
                 train: Optional[bool] = None):
        train = istrain if train is None else train
        encoder, embed = _build_encoder(self.pc_config, self.engine)
        if istrain:
            text = batch.text
            if text is not None and text.tokens.shape[0] > 0:
                bt, nt, length = text.tokens.shape
                text_encoder = _build_text_encoder(self.text_config)
                tfeats = text_encoder(text.tokens.reshape(-1, length))
                tfeats = tfeats.reshape(bt, nt, -1)
                tfeats = nn.Dense(embed, name="text_linear")(tfeats)
            else:
                tfeats = None
            global_feats = encoder(
                batch.coords, batch.feats, batch.valid,
                istrain=True, train=train, num_scenes=batch.num_scenes,
                plans=batch.plans, vox_feats=batch.vox_feats,
                point2voxel=batch.point2voxel, point_perm=batch.point_perm,
            )
            global_logits = nn.Dense(NUM_CLASSES, name="linear")(global_feats)
            return global_logits, (global_feats, tfeats,
                                   text.has_text if text is not None else None)
        out_feats = encoder(batch.coords, batch.feats, batch.valid,
                            istrain=False, train=train,
                            plans=batch.plans, vox_feats=batch.vox_feats,
                            point2voxel=batch.point2voxel,
                            point_perm=batch.point_perm)
        return nn.Dense(NUM_CLASSES, name="linear")(out_feats)


@MODEL_REGISTRY.register()
class MultiLabel(nn.Module):
    """No-text scene-tag classifier (reference :50-70)."""

    pc_config: PointcloudModelConfig
    engine: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: PointBatch, istrain: bool = False,
                 train: Optional[bool] = None):
        train = istrain if train is None else train
        encoder, _ = _build_encoder(self.pc_config, self.engine)
        out_feats = encoder(
            batch.coords, batch.feats, batch.valid,
            istrain=istrain, train=train, num_scenes=batch.num_scenes,
            plans=batch.plans, vox_feats=batch.vox_feats,
            point2voxel=batch.point2voxel, point_perm=batch.point_perm,
        )
        global_logits = nn.Dense(NUM_CLASSES, name="linear")(out_feats)
        if istrain:
            return global_logits, None
        return global_logits


@MODEL_REGISTRY.register(reads_point_coords=True)
class FullySupervised(nn.Module):
    """Pseudo-label retraining round (reference :72-101).

    Train returns (scene_logits = per-scene mean of point logits,
    point_logits) so both the multilabel loss and the point CE apply.
    """

    pc_config: PointcloudModelConfig
    engine: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: PointBatch, istrain: bool = False,
                 train: Optional[bool] = None):
        train = istrain if train is None else train
        encoder, _ = _build_encoder(self.pc_config, self.engine)
        out_feats = encoder(batch.coords, batch.feats, batch.valid,
                            istrain=False, train=train,
                            plans=batch.plans, vox_feats=batch.vox_feats,
                            point2voxel=batch.point2voxel,
                            point_perm=batch.point_perm)
        logits = nn.Dense(NUM_CLASSES, name="linear")(out_feats)
        if istrain:
            global_logits = segment_mean_by_batch(
                logits, batch.batch_idx, batch.num_scenes, batch.valid
            )
            return global_logits, logits
        return logits


def build_model(cfg) -> nn.Module:
    """Instantiate the configured meta-architecture (train.py:31-32 parity)."""
    cls, _ = MODEL_REGISTRY.get(cfg.model_name)
    if cfg.has_text and cfg.text_model.name == "CLIPTransformer" \
            and not cfg.text_data.bpe_vocab_path:
        # The frozen CLIP tower's embedding was trained on clip.tokenize
        # ids (reference dataset/data.py:13,195); feeding it the local
        # ScanNet-BPE/hash ids silently destroys the text signal.
        raise ValueError(
            "text_model.name=CLIPTransformer requires text_data."
            "bpe_vocab_path to point at the real CLIP "
            "bpe_simple_vocab_16e6.txt.gz (zero-egress images cannot "
            "vendor it); the fallback tokenizers emit ids the frozen "
            "embedding was never trained on.")
    if cfg.has_text and cls is MultiLabelContrastive:
        return cls(pc_config=cfg.pointcloud_model, text_config=cfg.text_model,
                   engine=cfg.engine)
    if cls in (MultiLabel, FullySupervised):
        return cls(pc_config=cfg.pointcloud_model, engine=cfg.engine)
    if cls is MultiLabelContrastive:
        return cls(pc_config=cfg.pointcloud_model, text_config=cfg.text_model,
                   engine=cfg.engine)
    raise KeyError(f"unknown meta-architecture {cfg.model_name}")
