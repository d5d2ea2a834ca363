"""Post-filter efficacy: inject synthetic outliers into a clean
reconstruction and verify the -f pipeline removes them while keeping the
surface (the PMVS/PCMVS rules, mvs.cpp:279-525)."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor


def test_filters_remove_injected_outliers():
    # neighbor_radius_scalar raised from the pawn default: these synthetic
    # scenes are near-planar, so the volume^(1/3)-based radius degenerates
    # below the patch spacing and the PCMVS density rule would kill every
    # isolated-but-good patch once ANY near-twin pair exists (avg > 0).
    # 0.08 puts the radius just above the measured patch spacing.
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    seed_refine_rounds=1, cell_size=4,
                    batch_size=64, wavefront_size=64,
                    min_correlation=0.7, neighbor_radius_scalar=0.08)
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=30, seed=8)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    rec.refine_seeds()
    rec.expand(max_rounds=4)
    n_good = len(rec.arena.live_ids())
    assert n_good > 200

    # inject floating outliers: off-surface points with weak correlation,
    # projected into the cameras so they land in real cells
    rng = np.random.default_rng(0)
    n_bad = 40
    base = sc.seed_centers[rng.integers(0, len(sc.seed_centers), n_bad)]
    bad_centers = base + np.stack(
        [rng.uniform(-0.05, 0.05, n_bad), rng.uniform(-0.05, 0.05, n_bad),
         rng.uniform(0.08, 0.3, n_bad)], -1)      # pushed off the surface
    C = 4
    ipts = np.zeros((n_bad, C, 2))
    masks = np.zeros((n_bad, C), dtype=bool)
    for c in range(C):
        xy = np.zeros((n_bad, 2))
        Rc = rec.np_R[c]; cc = rec.np_center[c]
        f = rec.np_focal[c]; pp = rec.np_principal[c]
        xc = (bad_centers - cc) @ Rc.T
        xy[:, 0] = f[0] * xc[:, 0] / xc[:, 2] + pp[0]
        xy[:, 1] = f[1] * xc[:, 1] / xc[:, 2] + pp[1]
        ok = (xy[:, 0] >= 0) & (xy[:, 0] < 160) & \
             (xy[:, 1] >= 0) & (xy[:, 1] < 120) & (xc[:, 2] > 0)
        masks[:, c] = ok
        ipts[:, c] = xy
    keep = masks.sum(1) >= 3
    bad_centers, masks, ipts = bad_centers[keep], masks[keep], ipts[keep]
    n_bad = len(bad_centers)
    assert n_bad >= 20

    sph = np.tile([np.pi, 0.0], (n_bad, 1))      # normal = -z (toward cams)
    bad_ids = rec.arena.append(
        center=bad_centers, normal_sph=sph, cam_mask=masks,
        ref_cam=np.zeros(n_bad, dtype=np.int32),
        depth=np.linalg.norm(bad_centers - rec.np_center[0], axis=1),
        lod=np.zeros(n_bad, dtype=np.int32),
        fitness=np.full(n_bad, 5.0),              # poor photoconsistency
        correlation=np.full(n_bad, 0.2),          # weak NCC
        priority=np.full(n_bad, 100.0),
        color=np.full((n_bad, 3), 255.0),
        img_point=ipts, is_seed=np.zeros(n_bad, dtype=bool))
    rec.grids = None                              # force grid rebuild

    rec.run_filters(0.25)
    alive = rec.arena.alive
    removed_bad = int((~alive[bad_ids]).sum())
    # the weak-correlation floaters must be overwhelmingly removed...
    assert removed_bad >= 0.8 * n_bad, f"{removed_bad}/{n_bad} removed"
    # ...while the surface stays covered. The density rules legitimately
    # thin crowded cells (these mini scenes run far denser per cell than
    # the pawn default), so assert coverage + quality, not a retention %.
    good_alive = len(rec.arena.live_ids())
    assert good_alive >= 100, good_alive
    pts = rec.live_centers()
    d = sc.surface_distance(pts)
    assert np.median(d) < 0.01
    assert np.max(d) < 0.05, "a surviving outlier escaped the filters"
    # surface extent preserved (filters didn't collapse to one region)
    assert pts[:, 0].max() - pts[:, 0].min() > 1.0
