"""Halo exchange of boundary patches for distributed expansion.

The reference's expansion walks ONE global cell grid per camera
(TMVS/mvs/mvs.cpp:529-601). To scale a wavefront round across a TPU slice,
each device owns a contiguous x-slab of every camera's cell grid (patches
belong to the shard owning their reference-camera cell column). A parent on
a slab boundary spawns candidates in 4-neighbour cells (mvs.cpp:536-549),
one of which can fall into the adjacent shard's slab — those candidates are
the halo, exchanged with the two ring neighbours via ``ppermute`` (ICI
neighbour traffic only, never a global collective):

    shard k:  [generate] -> keep own | send left | send right
              -> ppermute(+1), ppermute(-1) -> merge -> dedupe/cap -> refine

Because the candidate step is one cell, the halo depth is exactly 1 — a
candidate's owner is at most one slab away whenever slabs are >= 2 cells
wide (asserted).

All shapes are static: each shard emits up to ``cap`` candidates per
direction, masked. Overflow drops the lowest-priority candidates, which is
the distributed analog of the reference's density cap (maxCellPatchNum,
mvs.cpp:795) applied early.

NOTE: the production distributed-expansion step lives in
``parallel/expansion.py`` — multi-view candidates can land arbitrarily far
across the grid, which the +-1 ring cannot carry, so it routes via
all_gather. The ring primitives here remain the right tool for
single-view, locality-bounded exchanges (and are exercised by
tests/test_halo.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pais_mvs_tpu.parallel.mesh import PATCH_AXIS


class RoutedCandidates(NamedTuple):
    payload: jnp.ndarray   # [cap3, D] merged (own + from-left + from-right)
    col: jnp.ndarray       # [cap3] global cell column of each candidate
    valid: jnp.ndarray     # [cap3] bool


def _pack_direction(payload, col, valid, want, cap, order):
    """Compact the rows with ``want`` into a fixed [cap, ...] buffer,
    keeping the lowest-``order`` rows when more than cap qualify."""
    want_v = want & valid
    key = jnp.where(want_v, order, jnp.inf)
    sel = jnp.argsort(key, stable=True)
    take = sel[:cap]
    ok = want_v[take]
    return payload[take], col[take], ok


def halo_route(payload, col, valid, slab_cols: int, axis: str = PATCH_AXIS,
               cap: int | None = None, order=None):
    """Route candidates to their owner shards (must run inside shard_map).

    payload: [N, D] per-shard candidate payloads; col: [N] global cell
    column; valid: [N]; order: [N] f32 rank (lower = more important) used
    when a direction overflows ``cap`` — the highest-order rows are dropped
    (None = positional). A candidate belongs to shard ``col // slab_cols``.
    Only +-1 ring traffic is supported, so slabs must be >= 2 cells wide
    (checked statically). Returns RoutedCandidates with 3N (or 3*cap) rows.
    """
    assert slab_cols >= 2, \
        f"slab_cols={slab_cols}: single-cell slabs can route further than " \
        f"the +-1 ring neighbours"
    N = payload.shape[0]
    if cap is None:
        cap = N
    if order is None:
        order = jnp.arange(N, dtype=jnp.float32)
    k = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    owner = jnp.clip(col // slab_cols, 0, n_shards - 1)

    own_p, own_c, own_v = _pack_direction(payload, col, valid,
                                          owner == k, cap, order)
    left_p, left_c, left_v = _pack_direction(payload, col, valid,
                                             owner == k - 1, cap, order)
    right_p, right_c, right_v = _pack_direction(payload, col, valid,
                                                owner == k + 1, cap, order)

    # ring permutes: "send right" = shard k -> k+1, so what we RECEIVE from
    # the left neighbour is its right-bound buffer
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    recv_from_left = jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis, fwd), (right_p, right_c, right_v))
    recv_from_right = jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis, bwd), (left_p, left_c, left_v))

    # wrap-around guard: shard 0 must ignore ring traffic from the last
    # shard and vice versa (the grid is not cyclic)
    rl_v = recv_from_left[2] & (k > 0)
    rr_v = recv_from_right[2] & (k < n_shards - 1)

    merged_p = jnp.concatenate([own_p, recv_from_left[0], recv_from_right[0]])
    merged_c = jnp.concatenate([own_c, recv_from_left[1], recv_from_right[1]])
    merged_v = jnp.concatenate([own_v, rl_v, rr_v])
    return RoutedCandidates(merged_p, merged_c, merged_v)


@functools.partial(jax.jit, static_argnames=("slab_cols", "mesh", "cap"))
def route_candidates(payload, col, valid, slab_cols: int, mesh: Mesh,
                     cap: int | None = None):
    """shard_map wrapper over ``halo_route`` for [S*N, ...] global arrays
    sharded over the patch axis. Returns global [S*3N(or 3cap), ...]."""
    def body(p, c, v):
        return halo_route(p, c, v, slab_cols, PATCH_AXIS, cap)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS)),
        out_specs=RoutedCandidates(P(PATCH_AXIS), P(PATCH_AXIS),
                                   P(PATCH_AXIS)),
        check_vma=False)
    return f(payload, col, valid)


def expansion_candidates_local(img_x, img_y, priority, valid,
                               grid_w: int, cell_size: int):
    """4-neighbour candidate cells of each parent (pure array op).

    img_x/img_y: [N] parent reference-view pixel coords; returns per-parent
    4 candidates' (cell col, cell row, parent idx) as flat [4N] arrays.
    Ref: MVS::expandNeighborCell (mvs.cpp:529-564) — the same four offsets.
    """
    cx = (img_x / cell_size).astype(jnp.int32)
    cy = (img_y / cell_size).astype(jnp.int32)
    offs = jnp.asarray([[-1, 0], [0, -1], [1, 0], [0, 1]], jnp.int32)
    ncx = cx[:, None] + offs[None, :, 0]                    # [N, 4]
    ncy = cy[:, None] + offs[None, :, 1]
    parent = jnp.broadcast_to(jnp.arange(cx.shape[0])[:, None], ncx.shape)
    ok = valid[:, None] & (ncx >= 0) & (ncx < grid_w) & (ncy >= 0)
    return (ncx.reshape(-1), ncy.reshape(-1), parent.reshape(-1),
            ok.reshape(-1))


def _dedupe_against_occupancy(routed: RoutedCandidates, occ, k,
                              slab_cols: int, grid_h: int, cap_per: int,
                              pri_col: int, row_col: int):
    """Per-cell priority-ordered acceptance against the local occupancy:
    sort candidates by (cell, priority), accept the first
    (cap_per - occupancy[cell]) of each run — the distributed counterpart
    of skipNeighborCell's density clause (mvs.cpp:795).

    Returns (accept [R] bool, row [R] int32)."""
    lcol = routed.col - k * slab_cols
    row = routed.payload[:, row_col].astype(jnp.int32)
    cell_id = jnp.where(routed.valid, lcol * grid_h + row, 2**30)
    pri = routed.payload[:, pri_col]
    order = jnp.lexsort((pri, cell_id))
    cid_s = cell_id[order]
    same = jnp.concatenate([jnp.zeros(1, bool), cid_s[1:] == cid_s[:-1]])
    idx = jnp.arange(cid_s.shape[0])
    start = jnp.where(~same, idx, 0)
    start = jax.lax.associative_scan(jnp.maximum, start)
    rank = idx - start
    occ_flat = occ.reshape(-1)
    cell_occ = occ_flat[jnp.clip(cid_s, 0, occ_flat.shape[0] - 1)]
    accept_s = routed.valid[order] & (rank + cell_occ < cap_per)
    accept = jnp.zeros_like(accept_s).at[order].set(accept_s)
    return accept & routed.valid, row


@functools.partial(jax.jit, static_argnames=("slab_cols", "grid_w", "grid_h",
                                             "cell_size", "mesh", "cap_per"))
def sharded_expansion_round(centers, normals, img_xy, priority, valid,
                            occupancy, mesh: Mesh, slab_cols: int,
                            grid_w: int, grid_h: int, cell_size: int,
                            cap_per: int = 2):
    """One SPMD wavefront candidate round over a cell-slab-sharded frontier.

    Per shard: generate 4-neighbour candidates from the local parents,
    halo-route them to the owning shards, then dedupe per target cell
    against the (sharded) occupancy grid with the ``cap_per`` density cap —
    the distributed counterpart of skipNeighborCell's count clause
    (mvs.cpp:795) + expandCell target selection.

    Args (global shapes, sharded over the patch axis):
      centers [N,3], normals [N,3], img_xy [N,2] (reference-view pixels),
      priority [N], valid [N]; occupancy [S*slab_cols, grid_h] int32 counts
      (sharded over its first axis).

    Returns (cand_cell_xy [N4,2] int32, cand_parent_center [N4,3],
    cand_parent_normal [N4,3], accept [N4]) — all patch-axis sharded, ready
    to feed the candidate-center intersection + batched refine.
    """
    def body(centers, normals, img_xy, priority, valid, occ):
        k = jax.lax.axis_index(PATCH_AXIS)
        ncx, ncy, parent, ok = expansion_candidates_local(
            img_xy[:, 0], img_xy[:, 1], priority, valid, grid_w, cell_size)
        ok &= ncy < grid_h
        payload = jnp.concatenate([
            centers[parent], normals[parent],
            priority[parent][:, None],
            ncy[:, None].astype(centers.dtype)], axis=-1)     # [4N, 8]
        routed = halo_route(payload, ncx, ok, slab_cols,
                            order=priority[parent])
        accept, row = _dedupe_against_occupancy(
            routed, occ, k, slab_cols, grid_h, cap_per,
            pri_col=6, row_col=7)
        cell_xy = jnp.stack([routed.col, row], axis=-1)
        return (cell_xy, routed.payload[:, :3], routed.payload[:, 3:6],
                accept)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                  P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS)),
        out_specs=(P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                   P(PATCH_AXIS)),
        check_vma=False)
    return f(centers, normals, img_xy, priority, valid, occupancy)
