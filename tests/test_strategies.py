"""Expansion queue strategies (MVS::getPatchIdFromQueue, mvs.cpp:632-788)."""

import numpy as np
import pytest

from pais_mvs_tpu import config as cfg_mod
from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor


@pytest.mark.parametrize("strategy", [
    cfg_mod.EXPANSION_BEST_FIRST, cfg_mod.EXPANSION_WORST_FIRST,
    cfg_mod.EXPANSION_BREADTH_FIRST, cfg_mod.EXPANSION_DEPTH_FIRST])
def test_expansion_strategies_complete(strategy):
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    seed_refine_rounds=1, cell_size=12,
                    batch_size=64, wavefront_size=8,
                    expansion_strategy=strategy)
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=20, seed=2)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n_seeds = rec.refine_seeds()
    assert n_seeds > 5
    total = rec.expand(max_rounds=6)
    assert total >= n_seeds
    d = sc.surface_distance(rec.live_centers())
    assert np.median(d) < 0.01
