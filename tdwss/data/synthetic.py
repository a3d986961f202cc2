"""Synthetic ScanNet-like scene generator.

No real ScanNet data ships in this image, so tests, the overfit harness and
the benchmark build surface-like point clouds that match the statistics the
sparse engine cares about: points concentrated on 2D surfaces (floors,
walls, furniture boxes), ~150k points / ~5x5x2.5 m per scene, 20-class
labels, RGB correlated with class, and label-derived text snippets standing
in for ScanRefer descriptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from tdwss.utils.iou import CLASS_LABELS


@dataclass
class Scene:
    """One scene in metre space (prepare_data.py artifact parity)."""

    points: np.ndarray                 # (N, 3) float32, mean-centred
    colors: np.ndarray                 # (N, 3) float32 in [-1, 1]
    labels: np.ndarray                 # (N,) int32 in {-100, 0..19}
    name: str
    texts: List[str] = field(default_factory=list)
    pseudo_labels: Optional[np.ndarray] = None
    # GSS proposal boxes [centre xyz, extent xyz] in axis-aligned world
    # space (reference <scene>_prop.npy first 6 columns, data.py:55,199)
    boxes: Optional[np.ndarray] = None          # (K, 6) float32
    center: Optional[np.ndarray] = None         # (3,) mean subtracted in prep
    align: Optional[np.ndarray] = None          # (4, 4) axis-align matrix


def _surface_points(rng, n, origin, extent, axis):
    """Uniform points on a thin axis-aligned slab."""
    p = origin + rng.random((n, 3)) * extent
    p[:, axis] = origin[axis] + rng.normal(scale=0.01, size=n)
    return p


def make_scene(seed: int, num_points: int = 40000, room: float = 5.0,
               num_objects: int = 8, with_text: bool = True) -> Scene:
    rng = np.random.default_rng(seed)
    chunks = []
    labels = []

    n_floor = num_points // 4
    chunks.append(_surface_points(rng, n_floor, np.zeros(3), np.array([room, room, 0]), 2))
    labels.append(np.full(n_floor, 1))  # floor

    n_wall = num_points // 8
    for axis, pos in [(0, 0.0), (0, room), (1, 0.0), (1, room)]:
        origin = np.zeros(3)
        origin[axis] = pos
        extent = np.array([room, room, 2.5])
        extent[axis] = 0
        chunks.append(_surface_points(rng, n_wall, origin, extent, axis))
        labels.append(np.full(n_wall, 0))  # wall

    remaining = num_points - sum(c.shape[0] for c in chunks)
    object_classes = rng.integers(2, 20, num_objects)
    per_obj = max(remaining // max(num_objects, 1), 1)
    for cls in object_classes:
        size = rng.uniform(0.3, 1.2, 3)
        origin = rng.uniform(0.2, room - 1.4, 3)
        origin[2] = 0
        # box: six faces
        n_face = max(per_obj // 6, 1)
        for axis in range(3):
            for side in (0.0, 1.0):
                o = origin + np.array([0.0, 0.0, 0.0])
                o[axis] += side * size[axis]
                extent = size.copy()
                extent[axis] = 0
                chunks.append(_surface_points(rng, n_face, o, extent, axis))
                labels.append(np.full(n_face, cls))

    points = np.concatenate(chunks).astype(np.float32)
    labels = np.concatenate(labels).astype(np.int32)
    # trim/pad to exactly num_points
    if points.shape[0] >= num_points:
        sel = rng.permutation(points.shape[0])[:num_points]
        points, labels = points[sel], labels[sel]

    # ~2% unlabeled points (ignore label), mirroring real ScanNet
    drop = rng.random(points.shape[0]) < 0.02
    labels = np.where(drop, -100, labels)

    # class-correlated colors + noise
    palette = np.linspace(-1, 1, 20)
    base = palette[np.clip(labels, 0, 19)]
    colors = np.stack(
        [base, np.roll(base, 1), -base], axis=1
    ).astype(np.float32) + rng.normal(scale=0.1, size=(points.shape[0], 3)).astype(np.float32)

    points = points - points.mean(0, keepdims=True)

    texts = []
    if with_text:
        present = np.unique(labels[labels >= 0])
        for cls in present[:6]:
            texts.append(f"there is a {CLASS_LABELS[int(cls)]} in the room")

    return Scene(
        points=points.astype(np.float32),
        colors=np.clip(colors, -1, 1),
        labels=labels,
        name=f"synthetic{seed:04d}_00",
        texts=texts,
    )


def make_dataset(num_scenes: int, num_points: int = 40000, seed: int = 0,
                 with_text: bool = True) -> List[Scene]:
    return [
        make_scene(seed * 1000 + i, num_points=num_points, with_text=with_text)
        for i in range(num_scenes)
    ]
