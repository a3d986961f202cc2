"""Packed-row kernel layout == unpacked kernels, bit-exact (interpret).

The packed layout (tdwss.ops.pallas_subm._pack_p: (V, C<=64) sources
viewed as (V/p, 128) rows) reorders DMA/MXU work but must compute the
same decomposition; these tests flip the module gate and compare against
the unpacked kernels on host-built plans (32-aligned window starts,
host_plan.WIN_ALIGN).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tdwss.ops import host_plan as hp
from tdwss.ops import pallas_subm as ps


@pytest.fixture(scope="module")
def win_plan():
    rng = np.random.default_rng(0)
    v = 4096
    pts = rng.integers(0, 40, size=(v + 2048, 4)).astype(np.int32)
    pts[:, 3] = 0
    grid = hp.voxelize_np(pts, None, np.ones(pts.shape[0], bool), v)[0]
    rb = hp.build_subm_rulebook_np(grid, 3)
    win = hp.build_windowed_subm27(np.asarray(rb), grid, tile=512,
                                   window=640, nwin=9, sub=128, subwin=256)
    assert win is not None
    starts = jnp.asarray(np.asarray(win.starts).reshape(-1))
    soff = jnp.asarray(np.asarray(win.sub_off).reshape(-1))
    rbl = jnp.asarray(np.asarray(win.rb_local).astype(np.int32).T)
    assert (np.asarray(win.starts) % hp.WIN_ALIGN == 0).all()
    assert (np.asarray(win.sub_off) % hp.WIN_ALIGN == 0).all()
    return v, starts, soff, rbl


def _assert_close(ref, got, tag=""):
    """Scale-aware closeness: the packed kernels accumulate the same f32
    terms in a different order (sbuf scatter order vs per-block), so dW
    is equal to summation-order noise, not bit-identical (measured
    max-abs 3e-5 at scale ~194 == 1.6e-7 relative)."""
    ref = np.asarray(ref)
    got = np.asarray(got)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * scale,
                               err_msg=tag)


def _toggle(monkeypatch, on):
    monkeypatch.setattr(ps, "_PACK", on)
    # The kernels are @jax.jit-wrapped and module globals are NOT part of
    # the jit cache key: without clearing, the post-toggle call silently
    # reuses the pre-toggle executable and the whole comparison is
    # vacuous (caught in round 4 — a NameError in the packed fused
    # branch sailed through this suite and only surfaced on hardware).
    import jax

    jax.clear_caches()


@pytest.mark.parametrize("c", [32, 64])
def test_packed_fwd_matches_unpacked(win_plan, monkeypatch, c):
    v, starts, soff, rbl = win_plan
    rng = np.random.default_rng(c)
    feats = rng.standard_normal((v, c)).astype(np.float32)
    w9 = np.zeros((27, ps._lane_pad(c), c), np.float32)
    w9[:, :c, :] = rng.standard_normal((27, c, c)) * 0.1
    kw = dict(window=640, tile=512, sub=128, subwin=256, interpret=True)
    args = (jnp.asarray(feats), starts, soff, rbl, jnp.asarray(w9))
    _toggle(monkeypatch, False)
    ref = np.asarray(ps.windowed_matmul_sub(*args, **kw))
    _toggle(monkeypatch, True)
    assert ps._pack_p(c, c, v, 640, 256) == 128 // c
    got = np.asarray(ps.windowed_matmul_sub(*args, **kw))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow
def test_packed_dw_and_fused_bwd_match_unpacked(win_plan, monkeypatch):
    v, starts, soff, rbl = win_plan
    c = cout = 32
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((v, c)).astype(np.float32)
    dout = rng.standard_normal((v, cout)).astype(np.float32)
    kw = dict(window=640, tile=512, sub=128, subwin=256, interpret=True)

    dargs = (jnp.asarray(feats), starts, soff, rbl, jnp.asarray(dout))
    _toggle(monkeypatch, False)
    ref = np.asarray(ps.windowed_dw_sub(*dargs, **kw))[:, :c, :]
    _toggle(monkeypatch, True)
    got = np.asarray(ps.windowed_dw_sub(*dargs, **kw))[:, :c, :]
    _assert_close(ref, got, "packed dW")

    w = rng.standard_normal((27, c, cout)).astype(np.float32) * 0.1
    ccat = c + cout
    lpad = ps._lane_pad(ccat)
    wt_full = np.zeros((27, lpad, c), np.float32)
    wt_full[:, c:ccat, :] = w[::-1].transpose(0, 2, 1)
    src_cat = np.concatenate([feats, dout], axis=1)
    bargs = (jnp.asarray(src_cat), starts, soff, rbl, jnp.asarray(wt_full),
             jnp.asarray(dout))
    bkw = dict(cin=c, **kw)
    _toggle(monkeypatch, False)
    dx0, dw0 = ps.windowed_bwd_sub(*bargs, **bkw)
    _toggle(monkeypatch, True)
    dx1, dw1 = ps.windowed_bwd_sub(*bargs, **bkw)
    _assert_close(dx0, dx1, "fused dx")
    _assert_close(np.asarray(dw0)[:, :c, :], np.asarray(dw1)[:, :c, :],
                  "fused dW")
