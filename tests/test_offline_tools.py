"""Tests: pseudo-image pipeline, mesh utils, GSS eval/ensemble/colors."""

import numpy as np
import pytest

from tdwss.gss.eval import (
    ARCalculator,
    box_iou_3d_corners,
    center_extent_to_corners,
    convert_color,
    ensemble_proposals,
    evaluate_proposals,
)
from tdwss.ops.pseudo_images import (
    PseudoImageConfig,
    compose_text,
    create_cam2world_matrix,
    extract_mask,
    filter_images,
    is_white_background,
    run_mask_pipeline,
    sample_camera_pose,
    sample_camera_positions,
    shard_range,
)
from tdwss.utils.mesh import cylinder_mesh, rasterize_mesh


class TestCameraSampler:
    def test_positions_on_sphere(self, rng):
        for mode in ["uniform", "normal", "hybrid", "spherical_uniform", "mean"]:
            pts, phi, theta = sample_camera_positions(rng, 8, r=1.3, mode=mode)
            np.testing.assert_allclose(
                np.linalg.norm(pts, axis=1), 1.3, rtol=1e-6)
            assert phi.shape == theta.shape == (8, 1)

    def test_pose_shape_and_origin(self, rng):
        pose, _, _ = sample_camera_pose(rng, 4, radius=2.7)
        assert pose.shape == (4, 25)
        c2w = pose[0, :16].reshape(4, 4)
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 2.7, rtol=1e-5)
        # rotation block orthonormal
        r = c2w[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)

    def test_cam_looks_at_origin(self, rng):
        origins, _, _ = sample_camera_positions(rng, 3, r=2.0)
        c2w = create_cam2world_matrix(-origins / 2.0, origins)
        # camera -z axis (third column negated) points at the origin
        fwd = -c2w[:, :3, 2]
        np.testing.assert_allclose(
            fwd, -origins / np.linalg.norm(origins, axis=1, keepdims=True),
            atol=1e-6)


class TestTextCompose:
    def test_compose(self):
        ents = [{"name": "arm chair",
                 "attr": {"size": ["big"], "shape": ["round"],
                          "color": ["red"]}}]
        assert compose_text(ents) == ["a big round red arm chair"]


class TestMaskPipeline:
    def _white_bg_image(self, rng, white=True):
        img = np.full((64, 64, 3), 255 if white else 10, np.uint8)
        img[20:40, 20:40] = rng.integers(0, 200, (20, 20, 3))
        return img

    def test_background_filter(self, rng):
        good = self._white_bg_image(rng, True)
        bad = self._white_bg_image(rng, False)
        assert is_white_background(good) and not is_white_background(bad)
        keep = filter_images(np.stack([good, bad, good]))
        np.testing.assert_array_equal(keep, [0, 2])

    def test_extract_mask(self, rng):
        img = self._white_bg_image(rng)
        mask = extract_mask(img)
        assert (mask[:5] == 0).all()             # white border -> background
        assert (mask[20:40, 20:40] == 255).all()  # object -> foreground

    def test_run_mask_pipeline(self, rng):
        imgs = np.stack([self._white_bg_image(rng),
                         self._white_bg_image(rng, False)])
        cfg = PseudoImageConfig(resolution=32, blur_radius=1.5, blur_samples=8)
        keep, masks = run_mask_pipeline(imgs, cfg)
        assert list(keep) == [0]
        assert masks.shape == (1, 32, 32, 3)
        assert masks[0].max() > 0

    def test_shard_range(self):
        chunks = [list(shard_range(d, 3, 10)) for d in range(3)]
        assert sum(chunks, []) == list(range(10))


class TestMesh:
    def test_cylinder_rasterize(self):
        verts, faces = cylinder_mesh(np.array([0, 0, 0, 2.0, 0.5]))
        assert faces.max() < verts.shape[0]
        pts, vert_inds = rasterize_mesh(verts, faces, 0.1)
        assert pts.shape[0] > 500
        assert vert_inds.shape[0] == pts.shape[0]
        # all samples near the cylinder surface: radius <= 0.5 + eps, |z| <= 1
        r = np.linalg.norm(pts[:, :2], axis=1)
        assert (r <= 0.5 + 1e-4).all()
        assert (np.abs(pts[:, 2]) <= 1.0 + 1e-4).all()

    def test_degenerate_faces_dropped(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]], float)
        faces = np.array([[0, 1, 2], [0, 3, 0]])  # second is degenerate
        pts, _ = rasterize_mesh(verts, faces, 0.2)
        assert pts.shape[0] > 0


class TestGSSEval:
    def test_iou_identity(self):
        box = np.array([[0, 0, 0, 1, 1, 1.0]])
        assert box_iou_3d_corners(box, box)[0, 0] == pytest.approx(1.0)
        shifted = box + np.array([0.5, 0, 0, 0.5, 0, 0])
        assert box_iou_3d_corners(box, shifted)[0, 0] == pytest.approx(1 / 3)

    def test_ar_mabo(self):
        gt = np.array([[0.5, 0.5, 0.5, 1, 1, 1.0],
                       [5.0, 5.0, 5.0, 1, 1, 1.0]])   # center/extent
        props = np.array([[0.5, 0.5, 0.5, 1, 1, 1, 0.9],   # perfect match
                          [9.0, 9.0, 9.0, 1, 1, 1, 0.1]])  # miss
        res = evaluate_proposals([props], [gt])
        assert res["AR"] == pytest.approx(0.5)
        assert res["MABO"] == pytest.approx(0.5)
        assert res["avg_num_prop"] == 2

    def test_per_class_averaging(self):
        gt = np.array([[0.5, 0.5, 0.5, 1, 1, 1.0],
                       [5.0, 5.0, 5.0, 1, 1, 1.0]])
        props = np.array([[0.5, 0.5, 0.5, 1, 1, 1, 0.9]])
        calc = ARCalculator(0.25)
        calc.step(center_extent_to_corners(props),
                  center_extent_to_corners(gt), np.array([0, 1]))
        res = calc.compute()
        # class 0 fully recalled, class 1 missed -> AR .5
        assert res["AR"] == pytest.approx(0.5)

    def test_ensemble(self, rng):
        a = np.concatenate([rng.uniform(0, 10, (30, 6)),
                            rng.uniform(size=(30, 1))], axis=1)
        b = a.copy()  # duplicate policy -> NMS should dedupe heavily
        out = ensemble_proposals([a, b], iou_thresh=0.7, max_num_prop=25,
                                 rng=rng)
        assert out.shape[1] == 7
        assert out.shape[0] <= 25

    def test_color_spaces(self, rng):
        colors = rng.integers(0, 256, (50, 3)).astype(np.uint8)
        for name in ["rgb", "lab", "rgi", "hsv", "nrgb", "hue"]:
            out = convert_color(colors, name)
            assert out.shape == (50, 3)
        # pure red hue is 0; pure green hue ~ 1/3
        hsv = convert_color(np.array([[255, 0, 0], [0, 255, 0]], np.uint8),
                            "hsv")
        assert hsv[0, 0] == 0
        assert abs(int(hsv[1, 0]) - 85) <= 1
