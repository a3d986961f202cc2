"""Data parallelism over an ICI device mesh (pjit / shard_map).

The reference has no working distributed mode — one config stub
(`subcloud_uppool_4gpu.yaml`: ``options: [distributed]``, batch 30, lr 4e-3)
with no DDP code behind it (SURVEY.md §2.5).  Here DP is first-class and
TPU-native:

- a 1-D ``Mesh`` over the 'data' axis (chips within a slice, ICI-connected);
- each device holds an independent fixed-capacity :class:`PointBatch`
  (leading device axis, sharded with ``P('data')``) — sharding the *point*
  axis instead would split scenes across chips and break rulebook locality;
- the single-chip train step body runs under ``shard_map`` with
  ``lax.pmean`` on gradients and BN batch statistics (sync-BN), so XLA emits
  ICI all-reduces; optimizer state and params stay replicated.

The `subcloud_uppool_4gpu` experiment becomes a 4-chip mesh run of the same
program.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
try:
    from jax import shard_map  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdwss.config import Config
from tdwss.data.batch import PointBatch
from tdwss.engine.steps import TrainState, make_train_step


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def _expand_window(win, new_w: int):
    """Re-express windowed metadata with a LARGER window, exactly.

    Coverage is preserved: a start may only move DOWN (the v_src - W clip
    tightens), by at most new_w - old_w, so every previously-covered
    local index stays inside the bigger window after shifting.  Sentinels
    (== old window) remap to the new window.
    """
    from tdwss.ops.plan import Windowed27, WindowedGather

    old_w = win.window
    if new_w == old_w:
        return win
    rb = np.asarray(win.rb_local)
    starts = np.asarray(win.starts)
    v_src = win.v_src if isinstance(win, WindowedGather) else rb.shape[0]
    new_starts = np.minimum(starts, max(v_src - new_w, 0)).astype(np.int32)
    delta = (starts - new_starts).astype(np.int32)      # >= 0
    tiles = starts.shape[0]
    t = rb.shape[0] // tiles
    if getattr(win, "sub", 0):
        # two-level forms (Windowed27 / WindowedGather): sub-relative
        # locals are unchanged — shift the sub offsets so
        # (start + sub_off) keeps its absolute position (the clamp bound
        # only grows with the window).
        spt = t // win.sub
        soff = np.asarray(win.sub_off) + np.repeat(delta, spt, axis=0)
        return win.replace(starts=new_starts,
                           sub_off=soff.astype(np.int32),
                           window=new_w)
    if isinstance(win, WindowedGather):
        k = rb.shape[1]
        if starts.ndim == 1:
            drows = np.repeat(delta, t)[:, None]
        else:
            gmap = np.arange(k, dtype=np.int32) % starts.shape[1]
            drows = np.repeat(delta[:, gmap], t, axis=0)
    else:                                               # Windowed27
        gmap = np.arange(27, dtype=np.int32) % 9
        if starts.shape[1] == 3:
            gmap = gmap % 3
        drows = np.repeat(delta[:, gmap], t, axis=0)
    rb_new = np.where(rb == old_w, new_w, rb + drows).astype(np.int32)
    return win.replace(starts=new_starts, rb_local=rb_new, window=new_w)


def _flatten_sub(win):
    """Convert a two-level (sub-window) form back to the flat form, exactly.

    rb entries relative to (start + sub_off) with sentinel == subwin become
    entries relative to start with sentinel == window.  Needed when devices
    disagree on sub-enablement (auto window sizes straddle the subwin
    threshold) — stacking requires one treedef.
    """
    if not getattr(win, "sub", 0):
        return win
    rb = np.asarray(win.rb_local)
    soff = np.asarray(win.sub_off)
    v, k = rb.shape
    nwin = soff.shape[1]
    gmap = np.arange(k, dtype=np.int32) % nwin
    big = np.repeat(soff, win.sub, axis=0)[:, gmap]
    rb_big = np.where(rb == win.subwin, win.window, rb + big).astype(np.int32)
    return win.replace(rb_local=rb_big, sub_off=None, sub=0, subwin=0)


def _harmonize_residual_caps(batches: Sequence[PointBatch]) -> List[PointBatch]:
    """Unify windowed-conv metadata shapes for cross-device stacking.

    The host plan builder buckets overflow capacities and auto-window
    sizes per batch (sticky, monotone); stacking across devices requires
    identical shapes AND identical static windows, so every windowed
    leaf expands to the stack-wide max window (exact, see
    :func:`_expand_window`) and pads its residual lists to the max caps
    (pad rows carry src == V -> inert, counts 0).
    """
    from tdwss.ops.plan import Windowed27, WindowedGather

    is_win = lambda x: isinstance(  # noqa: E731
        x, (Windowed27, WindowedGather))
    flat0, _ = jax.tree_util.tree_flatten(batches[0], is_leaf=is_win)
    caps = {}
    flatten_sub = set()
    for i, leaf in enumerate(flat0):
        if is_win(leaf):
            wins = [jax.tree_util.tree_flatten(b, is_leaf=is_win)[0][i]
                    for b in batches]
            vas = [getattr(w, "v_active", 0) for w in wins]
            caps[i] = (max(w.res_ovf.shape[0] for w in wins),
                       max(w.ovf_v.shape[0] for w in wins),
                       max(w.window for w in wins),
                       max((w.res_tile.shape[1]
                            for w in wins if w.res_tile is not None),
                           default=0),
                       max((w.res_hent.shape[0]
                            for w in wins if w.res_hent is not None),
                           default=0),
                       max((w.res_htile.shape[0]
                            for w in wins if w.res_htile is not None),
                           default=0),
                       max((w.res_ttap.shape[0]
                            for w in wins
                            if getattr(w, "res_ttap", None) is not None),
                           default=0),
                       0 if 0 in vas else max(vas))
            if len({(getattr(w, "sub", 0), getattr(w, "subwin", 0))
                    for w in wins}) > 1:
                flatten_sub.add(i)
    if not caps:
        return list(batches)

    out = []
    for b in batches:
        flat, treedef = jax.tree_util.tree_flatten(b, is_leaf=is_win)
        for i, (e_cap, h_cap, w_max, r_max, he_max, ht_max, tc_max,
                va) in caps.items():
            win = flat[i]
            if getattr(win, "v_active", 0) != va and hasattr(win,
                                                             "v_active"):
                # static field must agree across the stacked devices; the
                # harmonized prefix covers every device's active rows
                win = win.replace(v_active=va)
            if i in flatten_sub:
                win = _flatten_sub(win)
            win = _expand_window(win, w_max)
            v = win.rb_local.shape[0]
            src_pad = win.v_src if isinstance(win, WindowedGather) else v
            if win.res_tile is not None and win.res_tile.shape[1] < r_max:
                t2, r, _ = win.res_tile.shape
                pad = np.full((t2, r_max - r, 3), src_pad, np.int32)
                pad[..., 0] = v // t2      # local sentinel == t_res
                pad[..., 1] = 0
                win = win.replace(res_tile=np.concatenate(
                    [np.asarray(win.res_tile), pad], axis=1))
            if win.res_hent is not None and win.res_hent.shape[0] < he_max:
                pad = np.full((he_max - win.res_hent.shape[0], 3), src_pad,
                              np.int32)
                pad[:, 0] = v              # owner sentinel == v_out
                win = win.replace(res_hent=np.concatenate(
                    [np.asarray(win.res_hent), pad]))
                if getattr(win, "res_tperm", None) is not None:
                    # c2 rows == hent rows: pad the tap permutation with
                    # out-of-bounds slots (zero-fill contributions)
                    grow = he_max - win.res_tperm.shape[0]
                    if grow > 0:
                        oob = win.res_tent.shape[0]
                        win = win.replace(res_tperm=np.concatenate(
                            [np.asarray(win.res_tperm),
                             np.full((grow,), oob, np.int32)]))
            if win.res_htile is not None and win.res_htile.shape[0] < ht_max:
                from tdwss.ops.host_plan import _RES_TILE

                pad = np.zeros((ht_max - win.res_htile.shape[0], 2),
                               np.int32)
                pad[:, 0] = v // _RES_TILE  # tile sentinel == T2
                win = win.replace(res_htile=np.concatenate(
                    [np.asarray(win.res_htile), pad]))
            if (getattr(win, "res_ttap", None) is not None
                    and win.res_ttap.shape[0] < tc_max):
                from tdwss.ops.host_plan import _RES_HCHUNK

                grow = tc_max - win.res_ttap.shape[0]
                ent_pad = np.full((grow * _RES_HCHUNK, 2), src_pad,
                                  np.int32)
                ent_pad[:, 1] = v          # owner sentinel == v_out
                # perm values stay valid: existing slots keep their
                # positions and hent pad rows (added above) must point
                # out of bounds of the GROWN tap array
                new_len = tc_max * _RES_HCHUNK
                perm = np.asarray(win.res_tperm)
                old_oob = perm >= win.res_tent.shape[0]
                perm = np.where(old_oob, new_len, perm).astype(np.int32)
                if win.res_hent is not None:
                    eh = win.res_hent.shape[0]
                    if perm.shape[0] < eh:
                        perm = np.concatenate(
                            [perm, np.full((eh - perm.shape[0],), new_len,
                                           np.int32)])
                win = win.replace(
                    res_tent=np.concatenate(
                        [np.asarray(win.res_tent), ent_pad]),
                    res_ttap=np.concatenate(
                        [np.asarray(win.res_ttap),
                         np.zeros((grow,), np.int32)]),
                    res_tperm=perm)
            e, h = win.res_ovf.shape[0], win.ovf_v.shape[0]
            if e < e_cap:
                pad = np.full((e_cap - e, 3), v, np.int32)
                pad[:, 2] = src_pad
                win = win.replace(
                    res_ovf=np.concatenate([np.asarray(win.res_ovf), pad]))
            if h < h_cap:
                win = win.replace(
                    ovf_v=np.concatenate(
                        [np.asarray(win.ovf_v),
                         np.full((h_cap - h,), v, np.int32)]),
                    ovf_count=np.concatenate(
                        [np.asarray(win.ovf_count),
                         np.zeros((h_cap - h,), np.int32)]),
                )
            flat[i] = win
        out.append(jax.tree_util.tree_unflatten(treedef, flat))
    return out


def stack_batches(batches: Sequence[PointBatch]) -> PointBatch:
    """Stack per-device batches along a new leading device axis."""
    batches = _harmonize_residual_caps(batches)
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def shard_batch(stacked: PointBatch, mesh: Mesh, axis: str = "data") -> PointBatch:
    """Place a device-stacked batch so axis 0 shards across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked
    )


def make_dp_train_step(cfg: Config, model, tx, mesh: Mesh, axis: str = "data"):
    """shard_map'd train step: per-device batch, pmean'd grads/stats.

    Input state is replicated (P()), batch leading axis sharded (P(axis));
    outputs are replicated again because pmean synchronizes every
    device-varying quantity before the optimizer update.
    """
    step = make_train_step(cfg, model, tx, pmean_axis=axis)

    def per_device(state: TrainState, dev_batch: PointBatch):
        # strip the leading device axis of size 1 within each shard
        local = jax.tree_util.tree_map(lambda x: x[0], dev_batch)
        return step(state, local)

    import inspect

    kwargs = {}
    if "check_vma" in inspect.signature(shard_map).parameters:
        kwargs["check_vma"] = False       # jax >= 0.7 name
    else:  # pragma: no cover
        kwargs["check_rep"] = False
    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        **kwargs,
    )
    return jax.jit(sharded)


def dp_train_batches(scenes, cfg: Config, epoch: int, num_devices: int,
                     stats=None):
    """Group the host loader's batches into device-stacked super-batches."""
    from tdwss.data.loader import train_batches

    group: List[PointBatch] = []
    for batch in train_batches(scenes, cfg, epoch, stats):
        group.append(batch)
        if len(group) == num_devices:
            yield stack_batches(group)
            group = []
