"""Integrated SPMD expansion step: candidates -> halo routing -> plane
intersection -> per-shard refine -> occupancy update, all in one shard_map
(BASELINE config 5's view/cell-partitioned multi-host expansion path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models import patch as patch_mod
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import lifecycle as lc
from pais_mvs_tpu.parallel.mesh import make_mesh, PATCH_AXIS
from pais_mvs_tpu.parallel.halo import sharded_expand_step


def test_sharded_expand_step_produces_surface_patches():
    S = 8
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    cell_size=10, visible_correlation=0.7, min_cam_num=3)
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    grid_h = (120 + cfg.cell_size - 1) // cfg.cell_size
    slab_cols = 2
    grid_w = S * slab_cols   # 16 columns x 10px = covers the 160px width

    # refined seeds as the frontier
    B = 64
    pb = patch_mod.from_seeds(sc.seed_centers[:B], sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    res = lc.refine_batch(scene, cfg, jax.tree.map(jnp.asarray, pb),
                          jax.random.PRNGKey(0), jnp.float32(0.01), True, 1)
    rb = jax.device_get(res.batch)
    valid = np.asarray(rb.valid)
    assert valid.sum() > 30

    # bin parents by reference-view cell column -> shard ownership;
    # pad each shard to the same count
    ref_px = np.take_along_axis(np.asarray(rb.img_point),
                                np.asarray(rb.ref_cam)[:, None, None]
                                .repeat(2, -1), 1)[:, 0]
    cols = (ref_px[:, 0] / cfg.cell_size).astype(int)
    owner = np.clip(cols // slab_cols, 0, S - 1)
    per = 16
    N = S * per
    centers = np.zeros((N, 3), np.float32)
    normals = np.zeros((N, 3), np.float32)
    img_xy = np.zeros((N, 2), np.float32)
    priority = np.full(N, 1e9, np.float32)
    val = np.zeros(N, bool)
    refc = np.zeros(N, np.int32)
    pmask = np.zeros((N, C), bool)
    from pais_mvs_tpu.ops import geometry as geom
    nrm = np.asarray(geom.spherical_to_normal(jnp.asarray(rb.normal_sph)))
    for k in range(S):
        ids = np.nonzero(valid & (owner == k))[0][:per]
        for j, i in enumerate(ids):
            t = k * per + j
            centers[t] = rb.center[i]
            normals[t] = nrm[i]
            img_xy[t] = ref_px[i]
            priority[t] = rb.priority[i]
            val[t] = True
            refc[t] = rb.ref_cam[i]
            pmask[t] = rb.cam_mask[i]
    assert val.sum() > 30

    mesh = make_mesh((S, 1))
    occupancy = np.zeros((grid_w, C * grid_h), np.int32)   # per-camera rows
    out_pb, accepted, occ2, spilled = sharded_expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(img_xy), jnp.asarray(priority), jnp.asarray(val),
        jnp.asarray(refc), jnp.asarray(pmask), jnp.asarray(occupancy),
        0.01, jax.random.PRNGKey(1), mesh, slab_cols, grid_h, cap_per=2)

    acc = np.asarray(accepted)
    assert acc.sum() > 20, f"only {acc.sum()} accepted"
    new_pts = np.asarray(out_pb.center)[acc]
    d = sc.surface_distance(new_pts)
    assert np.median(d) < 0.01, np.median(d)
    # occupancy bookkeeping: every accepted patch increments exactly one
    # cell (its refined location, halo-routed to the owner shard); cells
    # can exceed the cap post-refine when two candidates drift into the
    # same cell — the cap gates CANDIDATE cells, like the host engine's
    # insert-time filter
    assert int(np.asarray(occ2).sum()) - int(occupancy.sum()) \
        == acc.sum() - int(np.asarray(spilled)[0])


def test_occupancy_is_per_camera():
    """Two parents with DIFFERENT reference cameras projecting to the
    SAME (cx, cy) must not contend for one density counter (VERDICT r1
    missing #4; reference keeps one CellMap per camera, mvs.cpp:74-87)."""
    S = 8
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    cell_size=10, visible_correlation=0.7, min_cam_num=3)
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=64, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = 4
    grid_h = (120 + cfg.cell_size - 1) // cfg.cell_size
    slab_cols = 2
    grid_w = S * slab_cols
    mesh = make_mesh((S, 1))

    # a pre-filled occupancy: cam 0's cells are ALL at the cap, every
    # other camera's grid is empty
    occupancy = np.zeros((grid_w, C * grid_h), np.int32)
    occupancy[:, :grid_h] = 2

    B = 64
    pb = patch_mod.from_seeds(sc.seed_centers[:B], sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    res = lc.refine_batch(scene, cfg, jax.tree.map(jnp.asarray, pb),
                          jax.random.PRNGKey(0), jnp.float32(0.01), True, 1)
    rb = jax.device_get(res.batch)
    valid = np.asarray(rb.valid)
    ref_px = np.take_along_axis(np.asarray(rb.img_point),
                                np.asarray(rb.ref_cam)[:, None, None]
                                .repeat(2, -1), 1)[:, 0]
    cols = (ref_px[:, 0] / cfg.cell_size).astype(int)
    owner = np.clip(cols // slab_cols, 0, S - 1)
    from pais_mvs_tpu.ops import geometry as geom
    nrm = np.asarray(geom.spherical_to_normal(jnp.asarray(rb.normal_sph)))
    per = 16
    N = S * per
    centers = np.zeros((N, 3), np.float32)
    normals = np.zeros((N, 3), np.float32)
    img_xy = np.zeros((N, 2), np.float32)
    priority = np.full(N, 1e9, np.float32)
    val = np.zeros(N, bool)
    refc = np.zeros(N, np.int32)
    pmask = np.zeros((N, C), bool)
    n_noncam0 = 0
    for k in range(S):
        ids = np.nonzero(valid & (owner == k))[0][:per]
        for j, i in enumerate(ids):
            t = k * per + j
            centers[t] = rb.center[i]
            normals[t] = nrm[i]
            img_xy[t] = ref_px[i]
            priority[t] = rb.priority[i]
            val[t] = True
            refc[t] = rb.ref_cam[i]
            pmask[t] = rb.cam_mask[i]
            if rb.ref_cam[i] != 0:
                n_noncam0 += 1
    assert n_noncam0 > 10, "test scene degenerate: all parents ref cam 0"

    out_pb, accepted, occ2, spilled = sharded_expand_step(
        scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
        jnp.asarray(img_xy), jnp.asarray(priority), jnp.asarray(val),
        jnp.asarray(refc), jnp.asarray(pmask), jnp.asarray(occupancy),
        0.01, jax.random.PRNGKey(1), mesh, slab_cols, grid_h, cap_per=2)
    acc = np.asarray(accepted)
    rc_out = np.asarray(out_pb.ref_cam)[acc]
    # cam-0-referenced candidates were capped out; other cameras' grids
    # must still accept (a shared grid would block them all)
    assert acc.sum() > 5, int(acc.sum())
    assert (rc_out != 0).all(), np.bincount(rc_out)
