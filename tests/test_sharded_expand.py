"""Integrated SPMD expansion step (parallel/expansion.py): all-view
candidate generation -> all_gather routing -> three-clause skipNeighborCell
against exchanged cellmate state -> plane intersection -> per-shard refine
-> insert-time re-check -> occupancy update, all in one shard_map."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models import patch as patch_mod
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops import lifecycle as lc
from pais_mvs_tpu.parallel.mesh import make_mesh
from pais_mvs_tpu.parallel.expansion import expand_step, OCC_STATE_F

S = 8
CFG = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                max_iteration=6, dist_weighting=4 / 3.0,
                cell_size=10, visible_correlation=0.7, min_cam_num=3)


def _refined_frontier(cfg, sc, scene, B=64):
    pb = patch_mod.from_seeds(sc.seed_centers[:B], sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    res = lc.refine_batch(scene, cfg, jax.tree.map(jnp.asarray, pb),
                          jax.random.PRNGKey(0), jnp.float32(0.01), True, 1)
    return jax.device_get(res.batch)


def _pack(rb, cfg, slab, per=16, C=4):
    """Shard-pack valid refined patches by ref-view cell column."""
    valid = np.asarray(rb.valid)
    ref_px = np.take_along_axis(np.asarray(rb.img_point),
                                np.asarray(rb.ref_cam)[:, None, None]
                                .repeat(2, -1), 1)[:, 0]
    cols = (ref_px[:, 0] / cfg.cell_size).astype(int)
    owner = np.clip(cols // slab, 0, S - 1)
    nrm = np.asarray(geom.spherical_to_normal(jnp.asarray(rb.normal_sph)))
    N = S * per
    centers = np.zeros((N, 3), np.float32)
    normals = np.zeros((N, 3), np.float32)
    orank = np.full(N, 1e30, np.float32)
    val = np.zeros(N, bool)
    pmask = np.zeros((N, C), bool)
    pri_order = np.argsort(np.asarray(rb.priority), kind="stable")
    for rank_i, i in enumerate(pri_order):
        if not valid[i]:
            continue
        k = owner[i]
        j = val[k * per:(k + 1) * per].sum()
        if j >= per:
            continue
        t = k * per + j
        centers[t] = rb.center[i]
        normals[t] = nrm[i]
        orank[t] = float(rank_i)
        val[t] = True
        pmask[t] = rb.cam_mask[i]
    return centers, normals, orank, val, pmask


def _grids(cfg, widths, heights, C):
    cam_cells = np.stack(
        [np.asarray([-(-w // cfg.cell_size) for w in widths], np.int32),
         np.asarray([-(-h // cfg.cell_size) for h in heights], np.int32)],
        -1)
    gw = int(cam_cells[:, 0].max())
    gh = int(cam_cells[:, 1].max())
    slab = max(1, -(-gw // S))
    return cam_cells, slab, gh


def test_expand_step_produces_surface_patches():
    cfg = CFG
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    cam_cells, slab, gh = _grids(cfg, [160] * C, [120] * C, C)
    rb = _refined_frontier(cfg, sc, scene)
    assert np.asarray(rb.valid).sum() > 30
    centers, normals, orank, val, pmask = _pack(rb, cfg, slab, C=C)
    assert val.sum() > 30

    mesh = make_mesh((S, 1))
    R = 64
    occ = np.zeros((S * slab, C * gh), np.int32)
    ost = np.zeros((S * slab, C * gh, 2, OCC_STATE_F), np.float32)
    out_pb, accepted, occ2, ost2, spilled, _sp_par, _rc = expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
        jnp.asarray(occ), jnp.asarray(ost), jnp.asarray(cam_cells),
        0.01, jax.random.PRNGKey(1), mesh, slab, gh, cap_per=2,
        refine_budget=R)

    acc = np.asarray(accepted)
    assert acc.sum() > 20, f"only {acc.sum()} accepted"
    new_pts = np.asarray(out_pb.center)[acc]
    d = sc.surface_distance(new_pts)
    assert np.median(d) < 0.01, np.median(d)
    # occupancy bookkeeping: every accepted patch registers in EVERY
    # visible in-map view's cell (reference CellMap::insert semantics)
    cm = np.asarray(out_pb.cam_mask)[acc]
    added = int(np.asarray(occ2).sum()) - int(occ.sum())
    assert added >= acc.sum()                    # >= one cell per patch
    assert added <= cm.sum()                     # <= one per visible view
    # cellmate state rows materialize alongside the counts
    st = np.asarray(ost2)
    assert (np.abs(st[..., :3]).sum(-1) > 0).sum() > acc.sum() / 2


def test_occupancy_is_per_camera():
    """Two parents with DIFFERENT reference cameras projecting to the
    SAME (cx, cy) must not contend for one density counter (reference
    keeps one CellMap per camera, mvs.cpp:74-87). With the full-parity
    all-view candidates, a parent blocked in cam 0's saturated grid must
    still expand through the other cameras' grids."""
    cfg = CFG
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    cam_cells, slab, gh = _grids(cfg, [160] * C, [120] * C, C)
    rb = _refined_frontier(cfg, sc, scene)
    centers, normals, orank, val, pmask = _pack(rb, cfg, slab, C=C)

    # cam 0's cells ALL at the cap (counts only — no cellmate state, so
    # only the density clause fires), other cameras empty
    occ = np.zeros((S * slab, C * gh), np.int32)
    occ[:, :gh] = 2
    ost = np.zeros((S * slab, C * gh, 2, OCC_STATE_F), np.float32)

    mesh = make_mesh((S, 1))
    out_pb, accepted, occ2, ost2, spilled, _sp_par, _rc = expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
        jnp.asarray(occ), jnp.asarray(ost), jnp.asarray(cam_cells),
        0.01, jax.random.PRNGKey(1), mesh, slab, gh, cap_per=2,
        refine_budget=64)
    acc = np.asarray(accepted)
    assert acc.sum() > 5, int(acc.sum())
    # no accepted candidate cell may sit in cam 0's saturated grid: all
    # accepted patches were seeded from other cameras' cells. (Their
    # REFINED ref cam can still be 0 — the block is on candidate cells.)
    # Verify via occupancy: cam 0 rows only grew through multi-view
    # REGISTRATION of accepted patches, never past the insert-time gate's
    # accounting; other cams' grids must have grown.
    grown_other = (np.asarray(occ2)[:, gh:].sum() - occ[:, gh:].sum())
    assert grown_other > 0


def test_skip_clauses_block_occupied_neighborhood():
    """Clause b (cellmate correlation > minCorrelation) and clause c
    (geometric isNeighbor) of skipNeighborCell must suppress candidates:
    pre-seeding the occupancy state with confident on-surface cellmates in
    EVERY camera's grid must collapse the accept count vs an empty grid
    (mvs.cpp:792-807)."""
    cfg = CFG
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    cam_cells, slab, gh = _grids(cfg, [160] * C, [120] * C, C)
    rb = _refined_frontier(cfg, sc, scene)
    centers, normals, orank, val, pmask = _pack(rb, cfg, slab, C=C)
    mesh = make_mesh((S, 1))

    occ0 = np.zeros((S * slab, C * gh), np.int32)
    ost0 = np.zeros((S * slab, C * gh, 3, OCC_STATE_F), np.float32)
    _, acc_empty, _, _, _, _, _ = expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
        jnp.asarray(occ0), jnp.asarray(ost0), jnp.asarray(cam_cells),
        0.01, jax.random.PRNGKey(1), mesh, slab, gh, cap_per=3,
        refine_budget=64)
    n_empty = int(np.asarray(acc_empty).sum())
    assert n_empty > 10

    # one HIGH-CORRELATION cellmate in every cell of every camera: count 1
    # (below cap_per=3, so the density clause alone cannot block), but
    # clause b must skip every candidate cell
    occ1 = np.ones((S * slab, C * gh), np.int32)
    ost1 = np.zeros((S * slab, C * gh, 3, OCC_STATE_F), np.float32)
    ost1[..., 0, 6] = 0.99          # correlation > minCorrelation (0.7)
    ost1[..., 0, 0:3] = 1e6         # far away: isNeighbor never fires
    _, acc_b, _, _, _, _, _ = expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
        jnp.asarray(occ1), jnp.asarray(ost1), jnp.asarray(cam_cells),
        0.01, jax.random.PRNGKey(1), mesh, slab, gh, cap_per=3,
        refine_budget=64)
    assert int(np.asarray(acc_b).sum()) == 0

    # clause c: low-correlation cellmates ON the parents' planes (use the
    # parents' own centers/normals smeared into every cell) with a large
    # neighbor radius -> the geometric test must block everything
    ost2 = np.zeros((S * slab, C * gh, 3, OCC_STATE_F), np.float32)
    ost2[..., 0, 0:3] = centers[val].mean(0)
    ost2[..., 0, 3:6] = np.array([0, 0, 1.0])
    ost2[..., 0, 6] = 0.1
    _, acc_c, _, _, _, _, _ = expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
        jnp.asarray(occ1), jnp.asarray(ost2), jnp.asarray(cam_cells),
        1e9,                          # neighbor radius covers everything
        jax.random.PRNGKey(1), mesh, slab, gh, cap_per=3,
        refine_budget=64)
    assert int(np.asarray(acc_c).sum()) == 0


def test_refine_exactly_once_across_requeues():
    """Budget-spilled parents are re-queued, but a candidate that already
    consumed its refine must never refine again (the reference pops each
    queued candidate exactly once, mvs.cpp:632-788): feeding the returned
    ``refined_cands`` back as ``cand_done`` must make the re-run's refined
    set DISJOINT from the first round's."""
    cfg = CFG
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    cam_cells, slab, gh = _grids(cfg, [160] * C, [120] * C, C)
    rb = _refined_frontier(cfg, sc, scene)
    centers, normals, orank, val, pmask = _pack(rb, cfg, slab, C=C)
    mesh = make_mesh((S, 1))
    occ = np.zeros((S * slab, C * gh), np.int32)
    ost = np.zeros((S * slab, C * gh, 2, OCC_STATE_F), np.float32)

    # a 4-per-shard budget against ~16 candidates/parent forces spills
    args = (scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
            jnp.asarray(orank), jnp.asarray(val), jnp.asarray(pmask),
            jnp.asarray(occ), jnp.asarray(ost), jnp.asarray(cam_cells),
            0.01, jax.random.PRNGKey(1), mesh, slab, gh)
    _, _, _, _, spilled, sp_par, rc1 = expand_step(
        *args, cap_per=2, refine_budget=4)
    rc1 = np.asarray(rc1)
    assert int(np.asarray(spilled)[0]) > 0, "scenario must spill"
    assert np.asarray(sp_par).any()
    assert rc1.any()

    # identical round with the consumed candidates masked: nothing may
    # refine twice, and the freed budget goes to previously-spilled ones
    _, _, _, _, _, _, rc2 = expand_step(
        *args, cap_per=2, refine_budget=4, cand_done=jnp.asarray(rc1))
    rc2 = np.asarray(rc2)
    assert not (rc1 & rc2).any(), "a candidate refined twice"
    assert rc2.any(), "deferred candidates must get the freed budget"
