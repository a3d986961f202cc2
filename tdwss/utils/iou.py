"""ScanNet 20-class mean-IoU metric.

Capability parity with the reference's ``utils/iou.py:15-53``: a 20x20
confusion matrix accumulated as ``bincount(pred*20 + gt)`` over points with
``gt >= 0``, per-class IoU = TP/(TP+FP+FN), NaN for absent classes, and the
same printed table.  Both a numpy host path and a jit-able jnp path are
provided; the jnp path lets the multi-view voting loop keep the confusion
accumulation on device.
"""

from __future__ import annotations

import numpy as np

CLASS_LABELS = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]
UNKNOWN_ID = -100
N_CLASSES = len(CLASS_LABELS)


def confusion_matrix(pred_ids: np.ndarray, gt_ids: np.ndarray) -> np.ndarray:
    """(pred, gt) -> (20, 20) confusion counts over labelled points."""
    if pred_ids.shape != gt_ids.shape:
        raise ValueError(f"shape mismatch: {pred_ids.shape} vs {gt_ids.shape}")
    keep = gt_ids >= 0
    flat = pred_ids[keep].astype(np.int64) * N_CLASSES + gt_ids[keep].astype(np.int64)
    return np.bincount(flat, minlength=N_CLASSES * N_CLASSES).reshape(
        (N_CLASSES, N_CLASSES)
    ).astype(np.uint64)


def confusion_matrix_jnp(pred_ids, gt_ids):
    """Device-side confusion matrix (static shapes; ignored points masked)."""
    import jax.numpy as jnp

    keep = gt_ids >= 0
    gt = jnp.where(keep, gt_ids, 0)
    flat = pred_ids.astype(jnp.int32) * N_CLASSES + gt.astype(jnp.int32)
    counts = jnp.zeros((N_CLASSES * N_CLASSES,), jnp.int32).at[flat].add(
        keep.astype(jnp.int32), mode="drop"
    )
    return counts.reshape(N_CLASSES, N_CLASSES)


def get_iou(label_id: int, confusion: np.ndarray):
    tp = int(confusion[label_id, label_id])
    fp = int(confusion[label_id, :].sum()) - tp
    fn = int(confusion[:, label_id].sum()) - tp
    denom = tp + fp + fn
    if denom == 0:
        return float("nan"), tp, denom
    return float(tp) / denom, tp, denom


def evaluate(pred_ids: np.ndarray, gt_ids: np.ndarray, verbose: bool = True) -> float:
    """Mean IoU over the 20 classes; prints the reference-format table."""
    confusion = confusion_matrix(np.asarray(pred_ids), np.asarray(gt_ids))
    class_ious = {}
    mean_iou = 0.0
    for i, label_name in enumerate(CLASS_LABELS):
        class_ious[label_name] = get_iou(i, confusion)
        iou = class_ious[label_name][0]
        mean_iou += (0.0 if np.isnan(iou) else iou) / N_CLASSES
    if verbose:
        print("classes          IoU")
        print("----------------------------")
        for label_name in CLASS_LABELS:
            iou, tp, denom = class_ious[label_name]
            print(f"{label_name:<14s}: {iou:>5.3f}   ({tp:>6d}/{denom:<6d})")
        print("mean IOU", mean_iou)
    return mean_iou
