"""Typed experiment configuration.

Replaces the reference's import-time global EasyDict config
(``utils/config.py:12-33``, which flattens a two-level YAML into a module
singleton) with explicit dataclasses constructed where needed.  The YAML
schema is compatible: ``load_config`` accepts the reference's two-level
layout (GENERAL / DATA / STRUCTURE / Training sections flattened one level),
so the reference's 22 ``config/*.yaml`` experiment files map 1:1 onto ours
under ``configs/``.

TPU-specific additions (absent in the reference because SparseConvNet's CUDA
engine runs with dynamic shapes): static capacity knobs — ``max_points``,
``max_voxels``, ``level_capacity_shrink`` — that fix array sizes under jit,
plus ``compute_dtype`` and the device-mesh shape for data parallelism.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class PointcloudDataConfig:
    scale: int = 20                  # voxel size = 1/scale metres
    val_reps: int = 1                # multi-view voting repetitions
    batch_size: int = 16
    elastic_deformation: bool = False
    # GSS proposal boxes in the train batch (reference dataset/data.py:55,
    # 199,223-238 always carries them; here gated — the wired-in reference
    # models never consume them, SURVEY §3.5).  Boxes are padded to
    # ``max_boxes`` per scene with a validity mask.
    with_boxes: bool = False
    max_boxes: int = 64


@dataclass
class TextDataConfig:
    max_seq_len: int = 120
    cropped_texts: int = 10
    # CLIP-format BPE merges file ("" = the shipped ScanNet-trained asset,
    # falling back to HashTokenizer if that is missing)
    bpe_vocab_path: str = ""


@dataclass
class PointcloudModelConfig:
    name: str = "SparseConvUNet"
    m: int = 16
    dimension: int = 3
    full_scale: int = 4096           # input field size (grid extent per axis)
    block_reps: int = 1
    residual_blocks: bool = False
    # FCN-family extras (reference models/SparseConvNet.py:75,92,145,198)
    depth: int = 7
    n_planes: Optional[List[int]] = None
    downsample: List[int] = field(default_factory=lambda: [2, 2])


@dataclass
class TextModelConfig:
    name: str = "TextTransformer"
    context_length: int = 120
    width: int = 256
    layers: int = 12
    vocab_size: int = 49408
    # CLIPTransformer variant: local path to pretrained weights (no egress).
    clip_weights_path: Optional[str] = None


@dataclass
class LossConfig:
    Classification: bool = True
    TextContrastive: bool = False


@dataclass
class MeshConfig:
    """Device mesh for data parallelism over ICI (SURVEY.md §2.5)."""

    data: int = 1                    # number of chips on the 'data' axis


@dataclass
class EngineConfig:
    """TPU execution knobs (no analogue in the reference)."""

    max_points: int = 262144         # static per-device point budget
    max_voxels: int = 0              # 0 => same as max_points
    level_capacity_shrink: int = 2   # per-level voxel capacity divisor (1 = no shrink)
    # Optional per-transition divisor schedule (overrides the scalar): real
    # scenes lose ~3.5x voxels per level below 1cm-2cm scales, so a schedule
    # like [2, 3, 4, 4, 4, 4] cuts padded compute ~30% (capacities must
    # still cover the data — overflow drops voxels).
    level_capacity_schedule: Optional[List[int]] = None
    min_level_capacity: int = 2048
    compute_dtype: str = "float32"   # bfloat16 for perf configs
    donate_state: bool = True
    remat: bool = False              # jax.checkpoint over encoder levels
    host_plans: bool = True          # build voxelization/rulebooks on host
                                     # (removes all sorts from the TPU step)
    collate_workers: int = 4         # host collate/plan threads (reference
                                     # DataLoader num_workers=4, data.py:243)
    prewarm_shapes: bool = True      # dry plan-build pass over epoch 1 so
                                     # sticky window/cap shapes converge
                                     # before the first jit (see
                                     # tdwss.data.loader.warm_plan_shapes)
    prewarm_epochs: List[int] = field(default_factory=lambda: [1, 2])
                                     # epochs whose batch compositions the
                                     # prewarm pass replays: one epoch can
                                     # miss a window/cap rung that a later
                                     # epoch's shuffle hits, re-specializing
                                     # the step mid-training
    slim_train_batch: bool = True    # drop train-dead point leaves
                                     # (coords/feats/point_ids) from the
                                     # device payload when host plans attach
    slim_device_plans: bool = True   # strip device-dead plan leaves (global
                                     # rulebooks, coarse grids) + int16
                                     # rb_local before host->device transfer
                                     # (tdwss.data.plans.slim_plans_for_device)
    plan_cache_batches: int = 64     # LRU memo of fully-built train batches
                                     # keyed by (seed, epoch, start, scene
                                     # names, sticky-shape fingerprint):
                                     # augmentation RNG is deterministic per
                                     # key, so batches built by the prewarm
                                     # pass (warm_plan_shapes) are reused
                                     # verbatim by the training loop instead
                                     # of re-planning — the few-core-host
                                     # analogue of plan/step overlap.  ~139
                                     # MB per cached batch at bench scale
                                     # (measured; <=64 -> ~9 GB worst case);
                                     # 0 disables.


@dataclass
class Config:
    # GENERAL
    training_name: str = "default"
    model_name: str = "MultiLabelContrastive"
    # DATA
    pointcloud_data: PointcloudDataConfig = field(default_factory=PointcloudDataConfig)
    label: str = "scene_level"       # scene_level | subcloud | pseudo
    has_text: bool = False
    text_data: TextDataConfig = field(default_factory=TextDataConfig)
    in_radius: float = 2.0           # subcloud sampling radius (metres)
    pseudo_label_path: str = ""
    pseudo_label_suffix: str = "_pseudo_label.npy"
    data_root: str = "dataset/ScanNet"
    # GSS proposal directory holding <scene>_prop.npy files (reference
    # dataset/data.py:45 hardcodes an absolute fv path).
    box_path: str = ""
    # STRUCTURE
    pointcloud_model: PointcloudModelConfig = field(default_factory=PointcloudModelConfig)
    text_model: TextModelConfig = field(default_factory=TextModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    # Training
    # --pretrain CLI flag (reference utils/config.py:17 — declared there
    # but never consumed; here it actually loads): path to a checkpoint
    # directory whose params/batch_stats seed a fresh run.
    pretrain: str = ""
    epochs: int = 512
    lr: float = 1e-3
    lr_decay_epochs: int = 100       # StepLR(step_size=100, gamma=0.1) parity
    lr_decay_gamma: float = 0.1
    seed: int = 0
    # Pseudo-label generation (statistics.py / pseudoLabelGeneration.py)
    threshold: float = 0.71
    path: str = "dataset/ScanNet/pseudo_label"
    suffix: str = "_pseudo_label.npy"
    # TPU engine
    engine: EngineConfig = field(default_factory=EngineConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @property
    def exp_path(self) -> str:
        return os.path.join("exp", self.training_name, self.training_name)


def _build(dc_type, raw: Dict[str, Any]):
    """Construct dataclass ``dc_type`` from a dict, recursing into fields."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    alias = {"nPlanes": "n_planes"}
    for key, value in raw.items():
        key = alias.get(key, key)
        if key not in fields:
            continue  # tolerate unknown/reference-only keys
        ftype = fields[key].type
        target = _DATACLASS_FIELDS.get((dc_type, key))
        if target is not None and isinstance(value, dict):
            kwargs[key] = _build(target, value)
        else:
            kwargs[key] = value
    return dc_type(**kwargs)


_DATACLASS_FIELDS = {
    (Config, "pointcloud_data"): PointcloudDataConfig,
    (Config, "text_data"): TextDataConfig,
    (Config, "pointcloud_model"): PointcloudModelConfig,
    (Config, "text_model"): TextModelConfig,
    (Config, "loss"): LossConfig,
    (Config, "engine"): EngineConfig,
    (Config, "mesh"): MeshConfig,
}


def load_config(path: str, **overrides: Any) -> Config:
    """Load a YAML config.

    Accepts both flat dicts and the reference's two-level sectioned layout
    (top-level sections GENERAL/DATA/STRUCTURE/Training whose children are
    flattened, reference utils/config.py:23-27).
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    flat: Dict[str, Any] = {}
    for key, value in raw.items():
        if isinstance(value, dict) and key.upper() in (
                "GENERAL", "DATA", "STRUCTURE", "TRAINING", "ENGINE",
                "PSEUDO_LABEL"):
            flat.update(value)
        else:
            flat[key] = value
    flat.update(overrides)
    return _build(Config, flat)


def config_from_dict(raw: Dict[str, Any]) -> Config:
    return _build(Config, raw)
