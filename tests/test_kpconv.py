"""KPConv backbone tests: ops vs numpy oracles, pyramid, KPFCNN end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdwss.models.kpconv import (
    KPBatch,
    KPConvConfig,
    KPFCNN,
    kpfcnn_loss,
    load_kernels,
    segmentation_inputs,
)
from tdwss.models.kpconv.ops import (
    closest_pool,
    global_average,
    kpconv_apply,
    max_pool,
)


def _tiny_cfg(**kw):
    defaults = dict(
        architecture=(
            "simple", "resnetb", "resnetb_strided", "resnetb",
            "nearest_upsample", "unary",
        ),
        num_classes=5,
        in_features_dim=4,
        first_features_dim=16,
        num_kernel_points=7,
        first_subsampling_dl=0.1,
        default_neighbor_limit=12,
    )
    defaults.update(kw)
    return KPConvConfig(**defaults)


class TestKernelPoints:
    def test_disposition(self):
        kp = load_kernels(1.0, 15, dimension=3, fixed="center")
        assert kp.shape == (15, 3)
        assert np.allclose(kp[0], 0.0)                 # fixed center
        radii = np.linalg.norm(kp[1:], axis=1)
        assert abs(radii.mean() - 0.66) < 1e-3          # ratio rescale
        d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
        d += np.eye(15) * 10
        assert d.min() > 0.15                           # points spread out

    def test_radius_scaling(self):
        a = load_kernels(1.0, 7)
        b = load_kernels(2.5, 7)
        assert np.allclose(b, 2.5 * a, atol=1e-6)


class TestKPConvOp:
    def _oracle(self, q, s, inds, x, kp, w, extent):
        """Brute-force numpy KPConv (linear influence, sum aggregation)."""
        n_out = np.zeros((q.shape[0], w.shape[2]), np.float32)
        for v in range(q.shape[0]):
            for j in inds[v]:
                if j >= s.shape[0]:
                    continue
                rel = s[j] - q[v]
                for k in range(kp.shape[0]):
                    dist = np.linalg.norm(rel - kp[k])
                    infl = max(0.0, 1.0 - dist / extent)
                    n_out[v] += infl * x[j] @ w[k]
        return n_out

    def test_matches_oracle(self, rng):
        ns, nq, nn, cin, cout, k = 40, 10, 8, 6, 5, 7
        s = rng.normal(size=(ns, 3)).astype(np.float32)
        q = s[:nq]
        inds = rng.integers(0, ns, size=(nq, nn)).astype(np.int32)
        inds[0, -3:] = ns                               # shadow neighbors
        x = rng.normal(size=(ns, cin)).astype(np.float32)
        kp = load_kernels(0.5, k)
        w = rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1
        out, aux = kpconv_apply(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(inds), jnp.asarray(x),
            jnp.asarray(kp), jnp.asarray(w), kp_extent=0.6)
        expect = self._oracle(q, s, inds, x, kp, w, 0.6)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4,
                                   atol=2e-4)
        assert aux.min_d2 is None

    def test_deformable_aux(self, rng):
        ns, nn, k = 20, 6, 5
        s = rng.normal(size=(ns, 3)).astype(np.float32)
        inds = rng.integers(0, ns, size=(ns, nn)).astype(np.int32)
        x = rng.normal(size=(ns, 4)).astype(np.float32)
        kp = load_kernels(0.5, k)
        w = rng.normal(size=(k, 4, 3)).astype(np.float32)
        offsets = rng.normal(size=(ns, k, 3)).astype(np.float32) * 0.01
        out, aux = kpconv_apply(
            jnp.asarray(s), jnp.asarray(s), jnp.asarray(inds), jnp.asarray(x),
            jnp.asarray(kp), jnp.asarray(w), kp_extent=0.6,
            offsets=jnp.asarray(offsets))
        assert aux.min_d2.shape == (ns, k)
        assert aux.deformed_kp.shape == (ns, k, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestPools:
    def test_max_and_closest_pool(self, rng):
        x = rng.normal(size=(10, 4)).astype(np.float32)
        inds = np.array([[0, 1, 10], [2, 10, 10]], np.int32)
        mx = np.asarray(max_pool(jnp.asarray(x), jnp.asarray(inds)))
        np.testing.assert_allclose(
            mx[0], np.maximum(np.maximum(x[0], x[1]), 0), rtol=1e-6)
        cp = np.asarray(closest_pool(jnp.asarray(x), jnp.asarray(inds)))
        np.testing.assert_allclose(cp[1], x[2], rtol=1e-6)

    def test_global_average(self, rng):
        x = rng.normal(size=(6, 3)).astype(np.float32)
        bid = np.array([0, 0, 1, 1, 1, 0], np.int32)
        valid = np.array([1, 1, 1, 1, 1, 0], bool)
        out = np.asarray(global_average(
            jnp.asarray(x), jnp.asarray(bid), jnp.asarray(valid), 2))
        np.testing.assert_allclose(out[0], x[:2].mean(0), rtol=1e-5)
        np.testing.assert_allclose(out[1], x[2:5].mean(0), rtol=1e-5)


def _make_clouds(rng, n_clouds=2, n_pts=300):
    clouds = []
    for _ in range(n_clouds):
        pts = rng.uniform(0, 1.2, size=(n_pts, 3)).astype(np.float32)
        feats = np.concatenate(
            [np.ones((n_pts, 1), np.float32),
             rng.uniform(size=(n_pts, 3)).astype(np.float32)], axis=1)
        labels = rng.integers(0, 5, size=(n_pts,)).astype(np.int32)
        labels[:5] = -100
        clouds.append({"points": pts, "features": feats, "labels": labels})
    return clouds


class TestPyramid:
    def test_shapes_and_validity(self, rng):
        cfg = _tiny_cfg()
        batch = segmentation_inputs(_make_clouds(rng), cfg)
        assert len(batch.points) == cfg.num_layers == 2
        for li in range(2):
            cap = batch.points[li].shape[0]
            assert batch.valids[li].shape == (cap,)
            assert batch.neighbors[li].shape[0] == cap
            # indices in range or == capacity (shadow)
            assert batch.neighbors[li].max() <= cap
        # neighbor geometry: valid neighbors are within the conv radius
        pts0 = batch.points[0]
        r0 = cfg.first_subsampling_dl * cfg.conv_radius
        n0 = batch.neighbors[0]
        v = np.where(batch.valids[0])[0][:50]
        for i in v:
            real = n0[i][n0[i] < pts0.shape[0]]
            if real.size:
                d = np.linalg.norm(pts0[real] - pts0[i], axis=1)
                assert (d <= r0 + 1e-5).all()

    def test_pool_layer_smaller(self, rng):
        cfg = _tiny_cfg()
        batch = segmentation_inputs(_make_clouds(rng), cfg)
        assert batch.valids[1].sum() < batch.valids[0].sum()


class TestKPFCNN:
    @pytest.mark.slow
    def test_forward_and_loss_step(self, rng):
        cfg = _tiny_cfg()
        batch = segmentation_inputs(_make_clouds(rng, n_pts=200), cfg)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)._replace(
            num_scenes=2)
        model = KPFCNN(config=cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits, auxes = model.apply(variables, batch, train=False)
        assert logits.shape == (batch.features.shape[0], cfg.num_classes)
        loss = kpfcnn_loss(logits, batch.labels, auxes, cfg)
        assert np.isfinite(float(loss))

        def loss_fn(params):
            out, aux = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])[0]
            return kpfcnn_loss(out, batch.labels, aux, cfg)

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
        assert np.isfinite(gnorm) and gnorm > 0

    def test_deformable_arch(self, rng):
        cfg = _tiny_cfg(architecture=(
            "simple", "resnetb_deformable", "resnetb_strided",
            "resnetb_deformable", "nearest_upsample", "unary"))
        batch = segmentation_inputs(_make_clouds(rng, n_pts=150), cfg)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)._replace(
            num_scenes=2)
        model = KPFCNN(config=cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits, auxes = model.apply(variables, batch, train=False)
        assert len(auxes) == 2                          # two deformable convs
        loss = kpfcnn_loss(logits, batch.labels, auxes, cfg)
        assert np.isfinite(float(loss))


class TestPotentialSampler:
    def test_spheres_spread(self, rng):
        from tdwss.models.kpconv.sampler import PotentialSampler

        clouds = _make_clouds(rng, n_clouds=3, n_pts=400)
        sampler = PotentialSampler(clouds, in_radius=0.4, potential_dl=0.1,
                                   seed=0)
        draws = sampler.sample_batch(12, min_points=5)
        assert len(draws) == 12
        # potentials force coverage of every cloud
        assert {ci for ci, _, _ in draws} == {0, 1, 2}
        for ci, center, idx in draws:
            pts = clouds[ci]["points"][idx]
            d = np.linalg.norm(pts - center, axis=1)
            assert (d <= 0.4 + 1e-5).all()


def test_config_save_load_roundtrip(tmp_path):
    from tdwss.models.kpconv.config import (KPConvConfig, load_config,
                                            save_config)

    cfg = KPConvConfig(num_classes=13, KP_extent=1.2,
                       class_w=(1.0, 2.0), neighborhood_limits=(20, 30))
    p = str(tmp_path / "parameters.txt")
    save_config(cfg, p)
    assert load_config(p) == cfg


def test_kpfcnn_overfit_decreases_loss(rng):
    """Second backbone trains end-to-end: loss drops on a fixed batch."""
    import jax
    import optax

    from tdwss.models.kpconv import KPFCNN, kpfcnn_loss

    cfg = _tiny_cfg(num_classes=3)
    clouds = _make_clouds(rng, n_clouds=2, n_pts=150)
    for c in clouds:
        c["labels"] = (c["points"][:, 2] > 0.6).astype(np.int32) * 2
    batch = segmentation_inputs(clouds, cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)._replace(num_scenes=2)

    model = KPFCNN(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            (logits, aux), new_stats = model.apply(
                {"params": p, "batch_stats": stats}, batch, train=True,
                mutable=["batch_stats"])
            return kpfcnn_loss(logits, batch.labels, aux, cfg), new_stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), \
            new_stats["batch_stats"], opt_state, loss

    losses = []
    for _ in range(12):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_spherical_lloyd_disposition():
    """Lloyd variant: deterministic, inside the unit ball, well-spread,
    honors the 'center'/'verticals' pinning (reference
    kernel_points.py:78-257)."""
    from tdwss.models.kpconv.kernel_points import load_kernels, spherical_lloyd

    kp1 = spherical_lloyd(15, max_iter=60, approx_n=2000)
    kp2 = spherical_lloyd(15, max_iter=60, approx_n=2000)
    np.testing.assert_array_equal(kp1, kp2)            # deterministic
    assert kp1.shape == (15, 3)
    np.testing.assert_array_equal(kp1[0], 0)           # fixed center
    r = np.linalg.norm(kp1, axis=1)
    assert r.max() <= 1.0 + 1e-5
    # pairwise spread: no two cells collapse
    d = np.linalg.norm(kp1[:, None] - kp1[None, :], axis=-1)
    d[np.arange(15), np.arange(15)] = 1e9
    assert d.min() > 0.25

    kv = spherical_lloyd(15, fixed="verticals", max_iter=40, approx_n=2000)
    np.testing.assert_array_equal(kv[:3, :2], 0)       # on the z axis

    scaled = load_kernels(2.5, 15, lloyd=True)
    assert np.linalg.norm(scaled, axis=1).max() <= 2.5 + 1e-4
