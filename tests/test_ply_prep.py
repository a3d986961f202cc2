"""PLY I/O roundtrip + offline prep label remapping."""

import numpy as np

from tdwss.data.prep import NYU_CLASS_IDS, remap_labels
from tdwss.utils.ply import read_ply, write_ply


def test_ply_roundtrip(tmp_path, rng):
    n = 100
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    labels = rng.integers(0, 40, n).astype(np.int32)
    path = str(tmp_path / "scene.ply")
    write_ply(path, [pts, colors, labels],
              ["x", "y", "z", "red", "green", "blue", "label"])
    data = read_ply(path)
    np.testing.assert_allclose(
        np.stack([data["x"], data["y"], data["z"]], 1), pts, rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.stack([data["red"], data["green"], data["blue"]], 1), colors
    )
    np.testing.assert_array_equal(data["label"], labels)


def test_remap_labels():
    raw = np.array([0, 1, 2, 39, 40, 13, 14])
    out = remap_labels(raw)
    np.testing.assert_array_equal(out, [-100, 0, 1, 19, -100, -100, 12])
    # bijection over the 20 benchmark ids
    out2 = remap_labels(NYU_CLASS_IDS)
    np.testing.assert_array_equal(out2, np.arange(20))
