"""GSS proposal chain tests (reference ops/GeometricSelectiveSearch parity)."""

import numpy as np

from tdwss.gss import (
    SimilarityMask,
    generate_proposals,
    hierarchical_segmentation,
    nms_3d,
)
from tdwss.gss.search import _box_iou_3d, attach_unassigned, estimate_normals


def _two_plane_scene(rng, n=500):
    p1 = rng.uniform(0, 2, (n, 3)).astype(np.float32); p1[:, 2] = 0.0
    p2 = rng.uniform(0, 2, (n, 3)).astype(np.float32); p2[:, 2] = 1.0
    return np.concatenate([p1, p2])


def test_box_iou_identity():
    box = np.asarray([[0, 0, 0, 2, 2, 2, 1.0]], np.float32)
    np.testing.assert_allclose(_box_iou_3d(box, box)[0, 0], 1.0)
    other = np.asarray([[10, 0, 0, 2, 2, 2, 1.0]], np.float32)
    np.testing.assert_allclose(_box_iou_3d(box, other)[0, 0], 0.0)


def test_nms_suppresses_duplicates():
    boxes = np.asarray(
        [
            [0, 0, 0, 2, 2, 2, 0.9],
            [0.05, 0, 0, 2, 2, 2, 0.5],   # near-duplicate, lower score
            [10, 0, 0, 2, 2, 2, 0.8],
        ],
        np.float32,
    )
    keep = nms_3d(boxes, iou_threshold=0.5)
    assert set(keep.tolist()) == {0, 2}


def test_attach_unassigned(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    rid = np.zeros(50, np.int32)
    rid[25:] = 1
    rid[[0, 30]] = -1
    out = attach_unassigned(pts, rid)
    assert (out >= 0).all()


def test_hierarchical_merge_produces_supersets(rng):
    # two coplanar patches with touching bounding boxes -> adjacent
    p1 = rng.uniform(0, 2, (500, 3)).astype(np.float32); p1[:, 2] = 0.0
    p2 = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    p2[:, 0] += 1.95; p2[:, 2] = 0.0
    pts = np.concatenate([p1, p2])
    rid = np.concatenate([np.zeros(500, np.int32), np.ones(500, np.int32)])
    regions = hierarchical_segmentation(pts, rid)
    # 2 originals + 1 merged
    assert len(regions) == 3
    sizes = sorted(r.size for r in regions)
    assert sizes == [500, 500, 1000]


def test_hierarchical_merge_skips_non_adjacent(rng):
    pts = _two_plane_scene(rng)  # planes 1m apart in z -> bboxes disjoint
    rid = np.concatenate([np.zeros(500, np.int32), np.ones(500, np.int32)])
    regions = hierarchical_segmentation(pts, rid)
    assert len(regions) == 2


def test_generate_proposals_end_to_end(rng):
    pts = _two_plane_scene(rng)
    boxes = generate_proposals(pts, rng=rng)
    assert boxes.ndim == 2 and boxes.shape[1] == 7
    assert boxes.shape[0] >= 1
    assert (boxes[:, 3:6] >= 0).all()


def test_estimate_normals_planar(rng):
    pts = rng.uniform(0, 2, (400, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    normals = estimate_normals(pts)
    # planar cloud -> normals along +-z
    assert (np.abs(normals[:, 2]) > 0.95).mean() > 0.9
