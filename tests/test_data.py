"""Data layer tests: augmentation bounds, scene labels, collation masks,
subclouds, tokenizer (SURVEY.md §4d)."""

import numpy as np
import pytest

from tdwss import NUM_CLASSES
from tdwss.config import Config, EngineConfig, PointcloudDataConfig, PointcloudModelConfig, TextDataConfig, TextModelConfig
from tdwss.data.augment import scene_label_from_points, train_transform, val_transform
from tdwss.data.collate import CollateStats, train_collate, val_collate
from tdwss.data.dataset import expand_subclouds, get_anchors, val_offsets
from tdwss.data.synthetic import make_dataset, make_scene
from tdwss.data.tokenizer import BpeTokenizer, HashTokenizer, tokenize


@pytest.fixture(scope="module")
def scenes():
    return make_dataset(3, num_points=2000, seed=11, with_text=True)


def _cfg(**kw):
    defaults = dict(
        pointcloud_data=PointcloudDataConfig(scale=10, batch_size=3),
        pointcloud_model=PointcloudModelConfig(full_scale=64),
        engine=EngineConfig(max_points=4096),
        has_text=False,
    )
    defaults.update(kw)
    return Config(**defaults)


def test_train_transform_bounds(rng, scenes):
    for scene in scenes:
        a, keep, tf = train_transform(scene.points, 10, 64, rng)
        kept = a[keep]
        assert kept.shape[0] > 0
        assert kept.min() >= 0 and kept.max() < 64
        # inverse transform recovers original points (up to fp error)
        rec = (kept - tf["offset"]) @ tf["rot_inv"]
        np.testing.assert_allclose(rec, scene.points[keep], atol=1e-6)


def test_val_transform_bounds(rng, scenes):
    a, keep = val_transform(scenes[0].points, 10, 64, rng)
    kept = a[keep]
    assert kept.min() >= 0 and kept.max() < 64


def test_scene_label_derivation():
    labels = np.array([-100, 0, 0, 5, 19, -100])
    tag = scene_label_from_points(labels)
    expect = np.zeros(NUM_CLASSES)
    expect[[0, 5, 19]] = 1
    np.testing.assert_array_equal(tag, expect)


def test_train_collate_masks(rng, scenes):
    cfg = _cfg(engine=EngineConfig(max_points=8192))
    stats = CollateStats()
    batch = train_collate(scenes, cfg, rng, stats)
    assert batch.coords.shape == (8192, 4)
    assert (~np.asarray(batch.valid)).any()  # there is padding
    valid = np.asarray(batch.valid)
    coords = np.asarray(batch.coords)
    assert coords[valid].min() >= 0
    assert coords[valid, :3].max() < 64
    assert set(np.unique(coords[valid, 3])) <= {0, 1, 2}
    assert np.asarray(batch.point_label)[~valid].min() == -100
    assert batch.scene_label.shape == (3, NUM_CLASSES)
    assert stats.total_points > 0


def test_train_collate_with_text(rng, scenes):
    cfg = _cfg(
        has_text=True,
        text_data=TextDataConfig(max_seq_len=12, cropped_texts=4),
        text_model=TextModelConfig(vocab_size=256),
    )
    batch = train_collate(scenes, cfg, rng)
    assert batch.text.tokens.shape == (3, 4, 12)
    assert batch.text.tokens.max() < 256
    np.testing.assert_array_equal(np.asarray(batch.text.has_text), [0, 1, 2])


def test_val_collate_point_ids(rng, scenes):
    cfg = _cfg()
    offsets, labels = val_offsets(scenes)
    batch = val_collate(scenes[:2], cfg, rng, offsets, [0, 1], num_scenes=3)
    valid = np.asarray(batch.valid)
    pids = np.asarray(batch.point_ids)
    assert pids[valid].min() >= 0
    assert pids[valid].max() < offsets[2]
    # point ids map back to the right scene's label
    gt = labels[pids[valid]]
    assert gt.shape[0] == valid.sum()
    assert np.asarray(batch.scene_mask).tolist() == [True, True, False]


def test_collate_overflow_subsamples(rng, scenes):
    cfg = _cfg(engine=EngineConfig(max_points=512))
    stats = CollateStats()
    batch = train_collate(scenes, cfg, rng, stats)
    assert np.asarray(batch.valid).sum() == 512
    assert stats.dropped_points > 0


def test_subcloud_expansion():
    scene = make_scene(5, num_points=4000)
    subs = expand_subclouds([scene], in_radius=2.0, min_points=200)
    assert len(subs) > 1
    for sub in subs:
        assert sub.points.shape[0] >= 200
        assert sub.points.shape[0] == sub.labels.shape[0]


def test_anchor_grid_covers_cloud():
    pts = np.random.default_rng(0).uniform(-3, 3, (500, 3))
    anchors = get_anchors(pts, 2.0)
    assert anchors.min() >= pts.min() - 1e-6
    assert anchors.max() <= pts.max() + 1e-6


def test_hash_tokenizer_deterministic():
    from tdwss.data.tokenizer import HashTokenizer

    ht = HashTokenizer()
    toks1 = tokenize(["a chair in the room"], 16, tokenizer=ht)
    toks2 = tokenize(["a chair in the room"], 16, tokenizer=ht)
    np.testing.assert_array_equal(toks1, toks2)
    assert toks1[0, 0] == 49406  # SOT
    assert 49407 in toks1[0]     # EOT
    assert toks1.shape == (1, 16)


def test_default_tokenizer_is_shipped_bpe():
    from tdwss.data.tokenizer import BpeTokenizer, get_tokenizer

    tok = get_tokenizer()
    assert isinstance(tok, BpeTokenizer)   # asset ships; no hash fallback
    toks = tokenize(["a chair in the room"], 16, vocab_size=49408)
    assert toks[0, 0] == tok.sot_id
    assert tok.eot_id in toks[0]


def test_tokenize_small_vocab():
    toks = tokenize(["hello world"], 8, vocab_size=64)
    assert toks.max() == 63       # EOT = vocab-1 (largest, for argmax pooling)
    assert toks[0, 0] == 62       # SOT = vocab-2
    words = toks[0][(toks[0] > 0) & (toks[0] < 62)]
    assert words.size > 0 and words.max() <= 61


def test_bpe_tokenizer_roundtrip(tmp_path):
    # minimal merges file in CLIP format
    merges = "#version\nh e\nhe l\nhel l\nhell o</w>\n"
    path = tmp_path / "merges.txt"
    path.write_text(merges)
    bpe = BpeTokenizer(str(path))
    ids = bpe.encode("hello hello")
    assert len(ids) == 2 and ids[0] == ids[1]
    ids2 = bpe.encode("help")
    assert len(ids2) >= 2  # partial merges + byte fallbacks
