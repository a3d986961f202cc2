"""Fixed-shape batch assembly (trainMerge / valMerge parity).

The reference collate fns (dataset/data.py:135-238, 256-319) emit ragged
tensors + python ``batch_offsets``.  Here every batch is padded to the
static ``max_points`` capacity and carries masks (see
:mod:`tdwss.data.batch`), so one compiled program serves every step.

Overflow policy: if the concatenated scenes exceed capacity, a uniform
random subset is kept (and the event is visible via ``CollateStats``); the
reference could not overflow because SCN ran dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from tdwss import NUM_CLASSES
from tdwss.config import Config
from tdwss.data.augment import (
    color_jitter,
    scene_label_from_points,
    train_transform,
    val_transform,
)
from tdwss.data.batch import BoxBatch, PointBatch, TextBatch
from tdwss.data.synthetic import Scene
from tdwss.data.tokenizer import tokenize


@dataclass
class CollateStats:
    """Point accounting across a loader epoch.

    Collates run on concurrent worker threads (tdwss.data.loader), and
    bench.py derives its e2e throughput numerator from these counters, so
    the increments must be atomic — a bare ``+=`` is a read-modify-write
    that can lose a whole batch's count under interleaving.
    """

    total_points: int = 0
    dropped_points: int = 0

    def __post_init__(self):
        import threading

        self._lock = threading.Lock()

    def add(self, total: int, dropped: int = 0) -> None:
        with self._lock:
            self.total_points += total
            self.dropped_points += dropped


def _pad_points(arrays: dict, n_actual: int, capacity: int,
                rng: np.random.Generator, stats: Optional[CollateStats]):
    """Pad (or uniformly subsample) the concatenated point arrays."""
    dropped = 0
    if n_actual > capacity:
        keep = rng.permutation(n_actual)[:capacity]
        keep.sort()
        arrays = {k: v[keep] for k, v in arrays.items()}
        dropped = n_actual - capacity
    if stats is not None:
        stats.add(n_actual, dropped)
    if n_actual > capacity:
        n_actual = capacity
    out = {}
    for key, value in arrays.items():
        pad_value = -100 if key == "point_label" else 0
        full = np.full((capacity,) + value.shape[1:], pad_value, value.dtype)
        full[:n_actual] = value
        out[key] = full
    valid = np.zeros(capacity, bool)
    valid[:n_actual] = True
    return out, valid


def train_collate(scenes: Sequence[Scene], cfg: Config,
                  rng: np.random.Generator,
                  stats: Optional[CollateStats] = None) -> PointBatch:
    """trainMerge parity over a list of scenes (+pseudo/text modes)."""
    pcd = cfg.pointcloud_data
    full_scale = cfg.pointcloud_model.full_scale
    use_pseudo = cfg.label == "pseudo"

    coords_l, feats_l, label_l, batch_l = [], [], [], []
    scene_labels = []
    token_rows = []
    text_valid = []
    transforms = []
    for idx, scene in enumerate(scenes):
        a, keep, transform = train_transform(
            scene.points, pcd.scale, full_scale, rng,
            elastic_deformation=pcd.elastic_deformation,
        )
        transforms.append(transform)
        a = a[keep]
        b = scene.colors[keep]
        labels = scene.labels[keep]
        if use_pseudo:
            if scene.pseudo_labels is None:
                raise ValueError(f"scene {scene.name} lacks pseudo labels")
            labels = scene.pseudo_labels[keep]
        # a >= 0 after the crop, so floor == truncation: astype avoids a
        # second full-size float temporary
        coords_l.append(a.astype(np.int32))
        feats_l.append(color_jitter(b, rng))
        label_l.append(labels.astype(np.int32))
        batch_l.append(np.full(a.shape[0], idx, np.int32))
        scene_labels.append(scene_label_from_points(scene.labels[keep], NUM_CLASSES))

        if cfg.has_text:
            texts = scene.texts[: cfg.text_data.cropped_texts]
            row = np.zeros((cfg.text_data.cropped_texts, cfg.text_data.max_seq_len), np.int32)
            if texts:
                from tdwss.data.tokenizer import get_tokenizer

                toks = tokenize(texts, cfg.text_data.max_seq_len,
                                tokenizer=get_tokenizer(
                                    cfg.text_data.bpe_vocab_path or None),
                                vocab_size=cfg.text_model.vocab_size)
                row[: toks.shape[0]] = toks
            token_rows.append(row)
            text_valid.append(bool(texts))

    coords3 = np.concatenate(coords_l)
    arrays = {
        "coords": np.concatenate(
            [coords3, np.concatenate(batch_l)[:, None]], axis=1
        ),
        "feats": np.concatenate(feats_l).astype(np.float32),
        "point_label": np.concatenate(label_l),
    }
    arrays, valid = _pad_points(
        arrays, coords3.shape[0], cfg.engine.max_points, rng, stats
    )

    text = None
    if cfg.has_text:
        text = TextBatch(
            tokens=np.stack(token_rows),
            has_text=np.arange(len(scenes), dtype=np.int32),
            valid=np.asarray(text_valid, bool),
        )

    box = None
    if pcd.with_boxes:
        box = _collate_boxes(scenes, transforms, pcd.max_boxes)

    return PointBatch(
        coords=arrays["coords"],
        feats=arrays["feats"],
        valid=valid,
        scene_label=np.stack(scene_labels),
        scene_mask=np.ones(len(scenes), bool),
        point_label=arrays["point_label"],
        point_ids=np.full(cfg.engine.max_points, -1, np.int32),
        text=text,
        box=box,
    )


def _collate_boxes(scenes: Sequence[Scene], transforms: Sequence[dict],
                   max_boxes: int) -> BoxBatch:
    """Pad per-scene GSS proposals + inverse augmentation into a BoxBatch.

    Reference trainMerge concatenates ragged (K_i, 6)+idx boxes and stacks
    [align, center, rot_inv, offset] (dataset/data.py:199,223-238); the
    static-shape form pads boxes to ``max_boxes`` with a validity mask.
    """
    b = len(scenes)
    boxes = np.zeros((b, max_boxes, 6), np.float32)
    valid = np.zeros((b, max_boxes), bool)
    align = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    center = np.zeros((b, 3), np.float32)
    rot_inv = np.zeros((b, 3, 3), np.float32)
    offset = np.zeros((b, 3), np.float32)
    for i, (scene, tf) in enumerate(zip(scenes, transforms)):
        if scene.boxes is not None and scene.boxes.shape[0]:
            k = min(scene.boxes.shape[0], max_boxes)
            boxes[i, :k] = scene.boxes[:k, :6]
            valid[i, :k] = True
        if scene.align is not None:
            align[i] = scene.align
        if scene.center is not None:
            center[i] = scene.center
        rot_inv[i] = tf["rot_inv"]
        offset[i] = tf["offset"]
    return BoxBatch(boxes=boxes, valid=valid, align=align, center=center,
                    rot_inv=rot_inv, offset=offset)


def val_collate(scenes: Sequence[Scene], cfg: Config,
                rng: np.random.Generator,
                scene_offsets: Sequence[int],
                scene_indices: Sequence[int],
                stats: Optional[CollateStats] = None,
                num_scenes: Optional[int] = None) -> PointBatch:
    """valMerge parity: random view + global point_ids for vote accumulation.

    ``scene_offsets[i]`` is the global offset of dataset scene ``i``'s points
    (valOffsets parity, data.py:249-254); ``scene_indices`` are the dataset
    indices of ``scenes``.  ``num_scenes`` pads the scene axis to a static
    size so a final partial batch reuses the compiled program.
    """
    pcd = cfg.pointcloud_data
    full_scale = cfg.pointcloud_model.full_scale

    coords_l, feats_l, label_l, batch_l, pid_l = [], [], [], [], []
    scene_labels = []
    for idx, (scene, ds_idx) in enumerate(zip(scenes, scene_indices)):
        a, keep = val_transform(scene.points, pcd.scale, full_scale, rng)
        a = a[keep]
        # a >= 0 after the crop, so floor == truncation: astype avoids a
        # second full-size float temporary
        coords_l.append(a.astype(np.int32))
        feats_l.append(scene.colors[keep].astype(np.float32))
        label_l.append(scene.labels[keep].astype(np.int32))
        batch_l.append(np.full(a.shape[0], idx, np.int32))
        pid_l.append(np.nonzero(keep)[0].astype(np.int32) + scene_offsets[ds_idx])
        scene_labels.append(scene_label_from_points(scene.labels[keep], NUM_CLASSES))

    coords3 = np.concatenate(coords_l)
    arrays = {
        "coords": np.concatenate(
            [coords3, np.concatenate(batch_l)[:, None]], axis=1
        ),
        "feats": np.concatenate(feats_l),
        "point_label": np.concatenate(label_l),
        "point_ids": np.concatenate(pid_l),
    }
    arrays, valid = _pad_points(
        arrays, coords3.shape[0], cfg.engine.max_points, rng, stats
    )
    arrays["point_ids"] = np.where(valid, arrays["point_ids"], -1)

    b = num_scenes or len(scenes)
    scene_label = np.zeros((b, NUM_CLASSES), np.float32)
    scene_label[: len(scenes)] = np.stack(scene_labels)
    scene_mask = np.zeros(b, bool)
    scene_mask[: len(scenes)] = True

    return PointBatch(
        coords=arrays["coords"],
        feats=arrays["feats"],
        valid=valid,
        scene_label=scene_label,
        scene_mask=scene_mask,
        point_label=arrays["point_label"],
        point_ids=arrays["point_ids"],
        text=None,
    )
