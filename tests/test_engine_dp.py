"""Data-parallel engine refine (patch-axis shard_map over local devices)
must reproduce the single-device pipeline's quality."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor


def test_dp_refine_matches_quality():
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    seed_refine_rounds=1, cell_size=12,
                    batch_size=64, wavefront_size=64,
                    data_parallel="on")
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=24, seed=4)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    assert rec._dp_mesh is not None, "8-device CPU mesh should enable DP"
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n = rec.refine_seeds()
    assert n > 10
    rec.expand(max_rounds=3)
    d = sc.surface_distance(rec.live_centers())
    assert np.median(d) < 0.01
    assert len(rec.arena.live_ids()) > n
