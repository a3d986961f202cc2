"""Differentiable point-cloud -> 2D-mask rendering (point2mask parity).

TPU-native rebuild of the reference's CUDA extension + modules
(ops/point2mask/point2mask_modules.py, _ext_src/src/ball_query*.cu,
group_points*.cu — SURVEY.md §2.2/§2.4):

- :func:`projection` (ref point2mask_modules.py:24-46): project points onto
  the plane spanned by the (theta, phi) view direction.
- :func:`ball_query_2d` (ref ball_query_gpu.cu:9-55): for each query pixel,
  the first ``nsample`` support points (in index order, among the first
  ``points_num``) within ``radius``; -1 padding.  The CUDA scan-order
  semantics are reproduced exactly with a cumulative-count mask — no
  sorting, no dynamic shapes.
- :func:`point2mask_module` (ref :52-121): normalize projected coords into
  the centred 80% of an (H, W) canvas, average the top-2 class scores over
  each pixel's neighbors, softmax to a 2-channel mask; pixels with no
  neighbors (or tied channels) become background [1, 0].
- :class:`Point2Mask` / :class:`Box2Mask` / :class:`Pixel2Mask`
  (ref :145-385): instance-label / GSS-box / image-alpha front ends.  The
  per-instance cropping+padding loops are host-side (offline tooling); the
  rendering core is jitted per padded shape.

Gradients flow through features into the mask exactly as in the CUDA
group_points backward (scatter-add).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def projection(pc: jnp.ndarray, theta: jnp.ndarray, phi: jnp.ndarray,
               r: float = 1.0) -> jnp.ndarray:
    """Project (B, N, 3) points onto M view planes -> (B, M, N, 2)."""
    sint, cost = jnp.sin(theta), jnp.cos(theta)
    sinp, cosp = jnp.sin(phi), jnp.cos(phi)
    u = jnp.stack([-sint, cost, jnp.zeros_like(theta)], axis=-1)      # (M, 3)
    v = jnp.stack([cost * sinp, sint * sinp, cosp], axis=-1)          # (M, 3)
    basis = jnp.stack([u, v], axis=-1)                                # (M, 3, 2)
    center = jnp.stack([cost * cosp, sint * cosp, sinp], axis=-1) * r  # (M, 3)
    rel = pc[:, None, :, :] - center[None, :, None, :]                # (B, M, N, 3)
    return jnp.einsum("bmnc,mct->bmnt", rel, basis)


def ball_query_2d(queries: jnp.ndarray, supports: jnp.ndarray,
                  radius: float, nsample: int,
                  points_num: Union[int, jnp.ndarray]) -> jnp.ndarray:
    """(P, 2) queries x (N, 2) supports -> (P, nsample) idx, -1 empty.

    Keeps the FIRST nsample in-index-order hits among supports[:points_num],
    matching the reference CUDA kernel's scan semantics.
    """
    n = supports.shape[0]
    d2 = jnp.sum(
        (queries[:, None, :] - supports[None, :, :]) ** 2, axis=-1
    )  # (P, N)
    in_range = jnp.arange(n)[None, :] < points_num
    hit = jnp.logical_and(d2 <= radius * radius, in_range)
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)  # 1-based among hits
    keep = jnp.logical_and(hit, rank <= nsample)
    slot = jnp.where(keep, rank - 1, nsample)  # out-of-range -> dropped
    out = jnp.full((queries.shape[0], nsample + 1), -1, jnp.int32)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], hit.shape)
    out = out.at[jnp.arange(queries.shape[0])[:, None], slot].set(
        src, mode="drop"
    )
    return out[:, :nsample]


@partial(jax.jit, static_argnums=(2,), static_argnames=("radius", "nsample"))
def point2mask_module(coords: jnp.ndarray, features: jnp.ndarray,
                      res: Tuple[int, int],
                      points_num: jnp.ndarray,
                      radius: float = 4.0, nsample: int = 3) -> jnp.ndarray:
    """(B, N, 2) coords + (B, N, C) scores -> (B, H, W, 2) soft masks."""
    h, w = res
    # scale into the centred 80% of the canvas (ref :90-93)
    cmax = jnp.max(coords, axis=-2, keepdims=True)
    cmin = jnp.min(coords, axis=-2, keepdims=True)
    center = jax.lax.stop_gradient((cmax + cmin) / 2)
    scale = jax.lax.stop_gradient(jnp.clip(cmax - cmin, min=1e-5) / 2)
    p = jnp.asarray([[h, w]], jnp.float32)
    coords = ((coords - center) / scale + 1) * 0.8 * p / 2 + 0.1 * p

    xg, yg = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    samples = jnp.stack([xg, yg], axis=-1).reshape(-1, 2).astype(jnp.float32)

    # top-2 class scores per point (ref :105)
    pts_feats = jnp.sort(features, axis=-1)[..., -2:]  # (B, N, 2)

    def per_instance(args):
        c, f, pn = args
        idx = ball_query_2d(samples, c, radius, nsample, pn)   # (HW, S)
        ids = jnp.where(idx >= 0, idx, c.shape[0])
        g = jnp.take(f, ids, axis=0, mode="fill", fill_value=0)  # (HW, S, 2)
        # occupation counts nonzero gathered entries per channel (ref :111-115)
        occ = jnp.sum((g != 0).astype(jnp.float32), axis=1)      # (HW, 2)
        summed = jnp.sum(g, axis=1)
        avg = summed / jnp.where(occ == 0, 1.0, occ)
        m = jax.nn.softmax(avg, axis=-1)
        empty = (m[..., 0] == m[..., 1])[..., None]
        background = jnp.stack(
            [jnp.ones(m.shape[0]), jnp.zeros(m.shape[0])], axis=-1
        )
        return jnp.where(empty, background, m)

    masks = jax.lax.map(per_instance, (coords, pts_feats, points_num))
    return masks.reshape(coords.shape[0], h, w, 2)


def _pad_instances(coord_list, feat_list, counts, num_views):
    """Mean-pad ragged per-instance crops to a common size (ref :216-227)."""
    max_pt = max(int(c) for c in counts)
    coords_out, feats_out = [], []
    for crds, fts, cnt in zip(coord_list, feat_list, counts):
        cnt = int(cnt)
        if cnt < max_pt:
            pad_c = np.broadcast_to(
                crds.mean(axis=1, keepdims=True), (num_views, max_pt - cnt, 2)
            )
            pad_f = np.broadcast_to(
                fts.mean(axis=0, keepdims=True), (max_pt - cnt, fts.shape[1])
            )
            crds = np.concatenate([crds, pad_c], axis=1)
            fts = np.concatenate([fts, pad_f], axis=0)
        coords_out.append(crds)
        feats_out.append(fts)
    return np.stack(coords_out), np.stack(feats_out), max_pt


def _render(coords, feats, counts, num_views, res, radius, nsample):
    crds, fts, _ = _pad_instances(coords, feats, counts, num_views)
    num_inst = crds.shape[0]
    crds = crds.reshape(num_inst * num_views, -1, 2)
    fts = np.repeat(fts, num_views, axis=0)
    pn = np.repeat(np.asarray(counts, np.int32), num_views)
    mask = point2mask_module(
        jnp.asarray(crds), jnp.asarray(fts), res, jnp.asarray(pn),
        radius=radius, nsample=nsample,
    )
    return jnp.repeat(mask[..., 1:], 3, axis=-1) * 255


class Point2Mask:
    """Instance-label front end (ref :145-239): one mask per (instance, view)."""

    def __init__(self, *, radius: float, nsample: int):
        self.radius = radius
        self.nsample = nsample

    def __call__(self, xyz, features, proposals, res, theta, phi, r=1.0):
        if isinstance(res, int):
            res = (res, res)
        pc_coords = np.asarray(projection(jnp.asarray(xyz), jnp.asarray(theta),
                                          jnp.asarray(phi), r))
        proposals = np.asarray(proposals)
        features = np.asarray(features)
        m = np.asarray(theta).shape[0]
        masks = []
        for coords, label, feats in zip(pc_coords, proposals, features):
            coord_list, feat_list, counts = [], [], []
            for lab in np.unique(label):
                sel = label == lab
                coord_list.append(coords[:, sel])
                feat_list.append(feats[sel])
                counts.append(int(sel.sum()))
            masks.append(_render(coord_list, feat_list, counts, m, res,
                                 self.radius, self.nsample))
        return jnp.transpose(jnp.concatenate(masks), (0, 3, 1, 2))


class Box2Mask:
    """GSS-box front end with purity/density filters (ref :305-385)."""

    def __init__(self, *, radius: float, nsample: int):
        self.radius = radius
        self.nsample = nsample

    def __call__(self, xyz, features, boxes, res, theta, phi, r=1.0,
                 box_filter_bar: Optional[Dict[str, float]] = None):
        if isinstance(res, int):
            res = (res, res)
        box_filter_bar = box_filter_bar or {}
        purity_lwbnd = box_filter_bar.get("purity_lwbnd", 0.0)
        density_lwbnd = box_filter_bar.get("density_lwbnd", 0.0)
        pc_coords = np.asarray(projection(jnp.asarray(xyz), jnp.asarray(theta),
                                          jnp.asarray(phi), r))
        xyz = np.asarray(xyz)
        features = np.asarray(features)
        label = features.argmax(-1)
        m = np.asarray(theta).shape[0]
        masks = []
        for coords, boxpool, feats, pc, lab in zip(
            pc_coords, np.asarray(boxes), features, xyz, label
        ):
            coord_list, feat_list, counts = [], [], []
            for box in boxpool:
                sel = np.all(pc <= box[3:6], -1) & np.all(pc >= box[:3], -1)
                num_pts = int(sel.sum())
                if num_pts == 0:
                    continue
                clab = lab[sel]
                vals, cnts = np.unique(clab, return_counts=True)
                box_label = vals[np.argmax(cnts)]
                volume = float(np.prod(box[3:6] - box[:3]))
                sel_pts = int((clab == box_label).sum())
                purity = sel_pts / num_pts
                density = num_pts / max(volume, 1e-9)
                if purity >= purity_lwbnd and density >= density_lwbnd:
                    coord_list.append(coords[:, sel])
                    feat_list.append(feats[sel])
                    counts.append(num_pts)
            if not coord_list:
                continue
            masks.append(_render(coord_list, feat_list, counts, m, res,
                                 self.radius, self.nsample))
        if not masks:
            return jnp.zeros((0, 3) + tuple(res), jnp.float32)
        return jnp.transpose(jnp.concatenate(masks), (0, 3, 1, 2))


class Pixel2Mask:
    """Image-alpha front end (ref :241-303): blur a binary mask."""

    def __init__(self, *, radius: float, nsample: int):
        self.radius = radius
        self.nsample = nsample

    def __call__(self, image, res):
        if isinstance(res, int):
            res = (res, res)
        image = np.asarray(image)
        coord_list, counts = [], []
        for img in image:
            fg = np.argwhere(img[..., 0] == 255).astype(np.float32) + 0.5
            coord_list.append(fg[None, :, :])  # one 'view'
            counts.append(fg.shape[0])
        feat_list = [
            np.stack([np.zeros(c), np.ones(c)], axis=-1).astype(np.float32)
            for c in counts
        ]
        crds, fts, _ = _pad_instances(coord_list, feat_list, counts, 1)
        mask = point2mask_module(
            jnp.asarray(crds[:, 0]), jnp.asarray(fts), res,
            jnp.asarray(np.asarray(counts, np.int32)),
            radius=self.radius, nsample=self.nsample,
        )
        mask = mask + mask / np.e
        return jnp.repeat(mask[..., 1:], 3, axis=-1) * 255
