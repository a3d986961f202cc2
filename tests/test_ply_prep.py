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


def test_process_scene_real_world_quirks(tmp_path, rng):
    """prep survives real-ScanNet quirks (docs/REPRODUCE.md fixture):
    missing axisAlignment in the meta file, NYU ids outside the 20-class
    table (incl. ids >= 150, which index-crash the reference's
    remapper[labels] — prepare_data.py:12), uint8 colors, and a missing
    labels.ply (test split)."""
    from tdwss.data.prep import process_scene

    n = 64
    pts = rng.normal(size=(n, 3)).astype(np.float64) + 5.0
    colors = rng.integers(0, 255, (n, 3)).astype(np.uint8)   # non-float
    labels = np.full(n, 1163, np.int32)                      # unknown id
    labels[:10] = 4                                          # nyu 'bed'
    labels[10:20] = 0                                        # unannotated

    scene = tmp_path / "scene0000_00"
    scene.mkdir()
    write_ply(str(scene / "scene0000_00_vh_clean_2.ply"),
              [pts.astype(np.float32), colors],
              ["x", "y", "z", "red", "green", "blue"])
    write_ply(str(scene / "scene0000_00_vh_clean_2.labels.ply"),
              [pts.astype(np.float32), labels],
              ["x", "y", "z", "label"])
    # meta file present but WITHOUT an axisAlignment line
    (scene / "scene0000_00.txt").write_text("sceneType = Bedroom\n")

    out = tmp_path / "out"
    name = process_scene(str(scene), str(out))
    assert name == "scene0000_00"
    d = np.load(out / "scene0000_00.npz")
    assert d["points"].dtype == np.float32
    np.testing.assert_allclose(d["points"].mean(0), 0, atol=1e-3)  # centred
    np.testing.assert_array_equal(d["align"], np.eye(4))   # eye fallback
    assert d["colors"].dtype == np.float32
    assert d["colors"].min() >= -1.0 and d["colors"].max() <= 1.0
    lab = d["labels"]
    np.testing.assert_array_equal(lab[:10], 3)              # nyu 4 -> class 3
    np.testing.assert_array_equal(lab[10:], -100)           # 0 and 1163 ignored

    # test-split scene: no labels.ply at all
    scene2 = tmp_path / "scene0001_00"
    scene2.mkdir()
    write_ply(str(scene2 / "scene0001_00_vh_clean_2.ply"),
              [pts.astype(np.float32), colors],
              ["x", "y", "z", "red", "green", "blue"])
    assert process_scene(str(scene2), str(out)) == "scene0001_00"
    d2 = np.load(out / "scene0001_00.npz")
    np.testing.assert_array_equal(d2["labels"], -100)
