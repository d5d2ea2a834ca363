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


def sharded_expand_step(scene, cfg, centers, normals, img_xy, priority,
                        valid, ref_cam, parent_cam_mask, occupancy,
                        neighbor_radius, key, mesh: Mesh, slab_cols: int,
                        grid_h: int, cap_per: int = 2):
    """One COMPLETE distributed expansion step inside a single shard_map:
    4-neighbour candidate generation -> ppermute halo routing -> per-cell
    density dedupe -> ray/plane candidate centers (mvs.cpp:809-836) ->
    viewing-cone camera sets (patch.cpp:723-761) -> full batched refine
    (PSO + NCC pruning + runtime filter) -> occupancy scatter of the
    accepted patches.

    Simplification vs the host engine (documented): each patch expands over
    its REFERENCE view's cell grid only (the host path walks every visible
    view's grid); ownership is by reference-view cell column.

    Global shapes (patch-axis sharded unless noted): centers/normals [N,3],
    img_xy [N,2] (reference-view pixels), priority/valid/ref_cam [N],
    parent_cam_mask [N,C], occupancy [S*slab_cols, C*grid_h] int32 (sharded
    on axis 0; rows are PER-CAMERA, cam*grid_h + cell_row — one CellMap per
    camera like the reference, mvs.cpp:74-87); neighbor_radius f32 scalar
    and key replicated.

    Returns (refined PatchBatch [12N rows, sharded], accepted [12N],
    new_occupancy, spilled [1] int) — accepted rows are refined patches
    that passed both the density dedupe and runtime filtering; ``spilled``
    counts accepted patches whose refined cell lies beyond the +-1 ring
    (their occupancy increments are dropped; ADVICE r1).
    """
    from pais_mvs_tpu.models import patch as patch_mod

    C = scene.rig.num_cameras
    fn = _expand_step_fn(cfg, mesh, slab_cols, occupancy.shape[0], grid_h,
                         cap_per, cfg.cell_size, C)
    return fn(scene, centers, normals, img_xy, priority, valid, ref_cam,
              parent_cam_mask, occupancy,
              jnp.float32(neighbor_radius), key)


@functools.lru_cache(maxsize=32)
def _expand_step_fn(cfg, mesh, slab_cols, grid_w, grid_h, cap_per,
                    cell_size, C):
    """Build + cache the jitted shard_map for sharded_expand_step (a fresh
    closure per call would recompile every time)."""
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import Scene
    from pais_mvs_tpu.ops import geometry as geom
    from pais_mvs_tpu.ops import lifecycle as lc

    def body(scene, centers, normals, img_xy, priority, valid, ref_cam,
             parent_cam_mask, occ, neighbor_radius, key):
        rig = scene.rig
        k = jax.lax.axis_index(PATCH_AXIS)
        ncx, ncy, parent, ok = expansion_candidates_local(
            img_xy[:, 0], img_xy[:, 1], priority, valid, grid_w, cell_size)
        ok &= ncy < grid_h
        # occupancy is PER CAMERA ([slab_cols, C*grid_h] per shard): the
        # combined row index cam*grid_h + row keeps two patches whose
        # DIFFERENT reference cameras share a (cx, cy) from colliding in
        # one density counter (the reference keeps one CellMap per camera,
        # mvs.cpp:74-87)
        comb = ref_cam[parent] * grid_h + ncy
        payload = jnp.concatenate([
            centers[parent], normals[parent], priority[parent][:, None],
            comb[:, None].astype(centers.dtype),
            ref_cam[parent][:, None].astype(centers.dtype),
            parent_cam_mask[parent].astype(centers.dtype)], axis=-1)
        routed = halo_route(payload, ncx, ok, slab_cols,
                            order=priority[parent])
        accept, comb_row = _dedupe_against_occupancy(
            routed, occ, k, slab_cols, C * grid_h, cap_per,
            pri_col=6, row_col=7)
        row = comb_row % grid_h

        # candidate center: reference-view cell-center pixel ray meeting
        # the parent plane (MVS::getExpansionPatchCenter, mvs.cpp:809-836)
        p_center = routed.payload[:, 0:3]
        p_normal = routed.payload[:, 3:6]
        rcam = routed.payload[:, 8].astype(jnp.int32)
        p_mask = routed.payload[:, 9:9 + C] > 0.5
        px = (routed.col.astype(jnp.float32) + 0.5) * cell_size
        py = (row.astype(jnp.float32) + 0.5) * cell_size
        pix = jnp.stack([px, py], -1)
        d = jax.vmap(lambda xy, c: geom.pixel_to_world_dir(
            xy, rig.R[c], rig.center[c], rig.focal[c], rig.principal[c]))(
            pix, rcam)
        new_center = geom.ray_plane_intersect(
            rig.center[rcam], d, p_center, p_normal)

        # viewing-cone camera set with the parent-fallback clause
        facing = -p_normal @ rig.optical.T                     # [R, C]
        mask = facing >= cfg.visible_correlation
        lacking = jnp.sum(mask, -1) < cfg.min_cam_num
        fallback = p_mask & (facing >= cfg.visible_correlation / 2.0)
        mask = jnp.where(lacking[:, None], mask | fallback, mask)

        R_rows = new_center.shape[0]
        pb = patch_mod.empty_batch(R_rows, C)
        pb = jax.tree.map(jnp.asarray, pb)
        pb = pb.replace(
            center=new_center.astype(jnp.float32),
            normal_sph=geom.normal_to_spherical(p_normal).astype(
                jnp.float32),
            cam_mask=mask,
            valid=accept & jnp.all(jnp.isfinite(new_center), -1)
                  & (jnp.sum(mask, -1) >= cfg.min_cam_num))
        kk = jax.random.fold_in(key, k)
        res = lc.refine_batch(scene, cfg, pb, kk, neighbor_radius,
                              False, 1)
        accepted = res.batch.valid

        # occupancy scatter of the survivors at their REFINED cell (refine
        # recomputes ref_cam/img_point and the patch can shift a cell):
        # increments halo-route to the owning shard like the candidates
        # did. Cells more than one slab away (a ref-camera switch across
        # the grid — rare) are dropped by the ring exchange; the psum'd
        # ``spilled`` count makes that drop observable instead of silent
        # (the bounded undercount only makes the density cap slightly
        # more permissive).
        rb = res.batch
        ref_ip = jnp.take_along_axis(
            rb.img_point, rb.ref_cam[:, None, None].repeat(2, -1),
            axis=1)[:, 0]
        fcol = jnp.clip((ref_ip[:, 0] / cell_size).astype(jnp.int32),
                        0, grid_w - 1)
        fcomb = jnp.clip(rb.ref_cam * grid_h
                         + (ref_ip[:, 1] / cell_size).astype(jnp.int32),
                         0, C * grid_h - 1)
        n_shards = jax.lax.axis_size(PATCH_AXIS)
        owner = jnp.clip(fcol // slab_cols, 0, n_shards - 1)
        spilled = jax.lax.psum(
            jnp.sum((jnp.abs(owner - k) > 1) & accepted), PATCH_AXIS)
        inc = halo_route(fcomb[:, None].astype(jnp.float32),
                         fcol, accepted, slab_cols)
        ilcol = jnp.clip(inc.col - k * slab_cols, 0, slab_cols - 1)
        irow = jnp.clip(inc.payload[:, 0].astype(jnp.int32),
                        0, C * grid_h - 1)
        occ2 = occ.at[ilcol, irow].add(inc.valid.astype(occ.dtype))
        return res.batch, accepted, occ2, spilled[None]

    spec_pb = jax.tree.map(lambda _: P(PATCH_AXIS),
                           patch_mod.empty_batch(1, C))

    def wrapper(scene, *args):
        scene_spec = jax.tree.map(lambda _: P(), scene)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(scene_spec, P(PATCH_AXIS), P(PATCH_AXIS),
                      P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                      P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                      P(), P()),
            out_specs=(spec_pb, P(PATCH_AXIS), P(PATCH_AXIS), P()),
            check_vma=False)
        return f(scene, *args)

    return jax.jit(wrapper)
