"""Degenerate-input robustness: the engine must degrade gracefully (the
reference's failure mode is printf + drop the patch, never a crash)."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor


def _cfg(**kw):
    base = dict(patch_radius=4, max_lod=3, particle_num=6, max_iteration=6,
                dist_weighting=4 / 3.0, seed_refine_rounds=1, cell_size=12,
                batch_size=32, wavefront_size=32)
    base.update(kw)
    return MvsConfig(**base)


def test_no_seeds_survive_min_cam_gate():
    """Every seed below minCamNum: refine accepts nothing, expansion is a
    no-op, writers still work."""
    cfg = _cfg(min_cam_num=5)          # scene has 4 cameras -> impossible
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=10, seed=3)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n = rec.refine_seeds()
    assert n == 0
    assert rec.expand(max_rounds=3) == 0
    assert rec.live_centers().shape == (0, 3)
    assert rec.patch_data().centers.shape == (0, 3)


def test_filters_on_empty_arena():
    cfg = _cfg()
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=5, seed=3)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    assert rec.cell_filtering() == 0
    assert rec.visibility_filtering() == 0
    assert rec.neighbor_cell_filtering(0.25) == 0
    assert rec.neighbor_patch_filtering(0.25) == 0


def test_garbage_seed_centers_dropped_not_fatal():
    """NaN / far-away seed centers must be filtered, not crash the batch."""
    cfg = _cfg()
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=12, seed=3)
    centers = sc.seed_centers.copy()
    centers[0] = np.nan
    centers[1] = 1e6                      # far outside every frustum
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(centers), 3), 128.0))
    n = rec.refine_seeds()
    assert 0 < n <= len(centers)
    pts = rec.live_centers()
    assert np.all(np.isfinite(pts))
    d = sc.surface_distance(pts)
    assert np.median(d) < 0.01
