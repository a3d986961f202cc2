"""Pure-jax kernel-point convolution ops.

TPU-native rewrite of the reference KPConv math
(models/KPConv/blocks.py:143-378).  Everything is static-shape: neighbor
matrices are padded (N, nmax) int32 with the *shadow index == number of
support rows* (out of bounds), which ``jnp.take(mode='fill')`` turns into
zero features / far-away (1e6) coordinates — the same trick the reference
implements by concatenating a shadow row (blocks.py:276-281).

MXU mapping:
- squared point-to-kernel distances via the |a-b|^2 = |a|^2+|b|^2-2ab
  expansion so the cross term is one (N*nmax, 3) x (3, K) matmul instead of
  a materialized (N, nmax, K, 3) difference tensor;
- influence-weighted aggregation is a batched (K, nmax) x (nmax, Cin)
  matmul per point; the kernel-weight application one (N, K*Cin) x
  (K*Cin, Cout) matmul.

The deformable path skips the reference's dynamic ``new_max_neighb`` top-k
repacking (blocks.py:300-324) — that is a CUDA memory optimization with
data-dependent shapes; on TPU the masked full-width compute is both simpler
and faster.  Out-of-range neighbors contribute zero weight already (linear
influence clamps at KP_extent).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

SHADOW_COORD = 1e6


class KPConvAux(NamedTuple):
    """Side outputs needed by the deformable regularizer (ref blocks.py:298)."""

    min_d2: Optional[jnp.ndarray] = None        # (N, K) min sq dist to inputs
    deformed_kp: Optional[jnp.ndarray] = None   # (N, K, 3)


def gather_coords(s_pts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(Ns,3),(N,n) -> (N,n,3); shadow rows land at SHADOW_COORD."""
    return jnp.take(s_pts, idx, axis=0, mode="fill", fill_value=SHADOW_COORD)


def gather_feats(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(Ns,C),(N,n) -> (N,n,C); shadow rows read zeros."""
    return jnp.take(x, idx, axis=0, mode="fill", fill_value=0)


def _sq_distances(rel: jnp.ndarray, kp: jnp.ndarray) -> jnp.ndarray:
    """|rel - kp|^2 -> (N, n, K).

    rel: (N, n, 3) centered neighbors; kp: (K, 3) or (N, K, 3).
    """
    rel32 = rel.astype(jnp.float32)
    kp32 = kp.astype(jnp.float32)
    r2 = jnp.sum(rel32 * rel32, axis=-1)                      # (N, n)
    k2 = jnp.sum(kp32 * kp32, axis=-1)                        # (K,) or (N, K)
    if kp.ndim == 2:
        cross = jnp.einsum("vnd,kd->vnk", rel32, kp32)
        k2 = k2[None, None, :]
    else:
        cross = jnp.einsum("vnd,vkd->vnk", rel32, kp32)
        k2 = k2[:, None, :]
    return r2[:, :, None] + k2 - 2.0 * cross


def kp_influences(sq_distances: jnp.ndarray, kp_extent: float,
                  influence: str, aggregation: str) -> jnp.ndarray:
    """(N, n, K) sq distances -> (N, K, n) influence weights (ref :325-350)."""
    if influence == "constant":
        w = jnp.ones_like(sq_distances)
    elif influence == "linear":
        w = jnp.clip(1.0 - jnp.sqrt(sq_distances) / kp_extent, 0.0, None)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        w = jnp.exp(-sq_distances / (2.0 * sigma**2 + 1e-9))
    else:
        raise ValueError(f"unknown KP influence {influence!r}")
    if aggregation == "closest":
        nearest = jnp.argmin(sq_distances, axis=-1)           # (N, n)
        w = w * jax.nn.one_hot(nearest, sq_distances.shape[-1],
                               dtype=w.dtype)
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation mode {aggregation!r}")
    return jnp.transpose(w, (0, 2, 1))                        # (N, K, n)


def kpconv_apply(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    x: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    offsets: Optional[jnp.ndarray] = None,
    modulations: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KPConvAux]:
    """Kernel-point convolution (reference blocks.py:238-378).

    q_pts (N,3) query points; s_pts (Ns,3) supports; neighb_inds (N,n)
    int32 with shadow == Ns; x (Ns,Cin); kernel_points (K,3);
    weights (K,Cin,Cout).  Returns ((N,Cout), aux).
    """
    neighbors = gather_coords(s_pts, neighb_inds)             # (N, n, 3)
    rel = neighbors - q_pts[:, None, :]                       # centered

    if offsets is not None:
        deformed = kernel_points[None, :, :] + offsets        # (N, K, 3)
        sq = _sq_distances(rel, deformed)
        aux = KPConvAux(min_d2=jnp.min(sq, axis=1), deformed_kp=deformed)
    else:
        sq = _sq_distances(rel, kernel_points)
        aux = KPConvAux()

    all_weights = kp_influences(sq, kp_extent, influence, aggregation)
    neighb_x = gather_feats(x, neighb_inds)                   # (N, n, Cin)

    compute_dtype = x.dtype
    weighted = jnp.einsum(
        "vkn,vnc->vkc",
        all_weights.astype(compute_dtype),
        neighb_x,
        preferred_element_type=jnp.float32,
    )                                                         # (N, K, Cin)
    if modulations is not None:
        weighted = weighted * modulations[:, :, None]

    k, cin, cout = weights.shape
    out = jnp.dot(
        weighted.reshape(-1, k * cin).astype(compute_dtype),
        weights.reshape(k * cin, cout).astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(compute_dtype), aux


def max_pool(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Max over padded neighborhoods; shadows read 0 (ref blocks.py:95-110)."""
    return jnp.max(gather_feats(x, inds), axis=1)


def closest_pool(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Pool from the first (closest) neighbor (ref blocks.py:81-92)."""
    return jnp.take(x, inds[:, 0], axis=0, mode="fill", fill_value=0)


def global_average(x: jnp.ndarray, batch_ids: jnp.ndarray,
                   valid: jnp.ndarray, num_scenes: int) -> jnp.ndarray:
    """Per-cloud mean (ref blocks.py:113-132), segment-sum based."""
    ids = jnp.where(valid, batch_ids, num_scenes)
    summed = jnp.zeros((num_scenes, x.shape[-1]), jnp.float32).at[ids].add(
        x.astype(jnp.float32), mode="drop")
    counts = jnp.zeros((num_scenes,), jnp.int32).at[ids].add(1, mode="drop")
    return (summed / jnp.maximum(counts, 1)[:, None]).astype(x.dtype)


def p2p_fitting_regularizer(
    min_d2s, deformed_kps, kp_extents, *,
    repulse_extent: float, deform_fitting_power: float,
) -> jnp.ndarray:
    """Deformable-offset regularizer (reference architectures.py:26-58).

    min_d2s: list of (N, K); deformed_kps: list of (N, K, 3);
    kp_extents: matching per-conv KP extents.
    """
    fitting = 0.0
    repulsive = 0.0
    for min_d2, dkp, ext in zip(min_d2s, deformed_kps, kp_extents):
        # L1 of normalized squared distance to the closest input point.
        fitting = fitting + jnp.mean(jnp.abs(min_d2 / (ext**2)))
        locs = dkp / ext                                      # (N, K, 3)
        k = locs.shape[1]
        d = jnp.sqrt(jnp.maximum(
            jnp.sum((locs[:, :, None, :]
                     - jax.lax.stop_gradient(locs[:, None, :, :]))**2,
                    axis=-1), 1e-12))                         # (N, K, K)
        mask = 1.0 - jnp.eye(k, dtype=d.dtype)[None]
        rep = jnp.minimum(d - repulse_extent, 0.0)**2 * mask
        repulsive = repulsive + jnp.mean(jnp.sum(rep, axis=2)) / k
    total = 2.0 * fitting + repulsive
    return deform_fitting_power * total
