"""Engine-level distributed expansion (expand_distributed): the SPMD
cell-slab path must grow the cloud on the ground-truth surface."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor
from pais_mvs_tpu.parallel.mesh import make_mesh


def test_expand_distributed_grows_surface():
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=6, dist_weighting=4 / 3.0,
                    seed_refine_rounds=1, cell_size=10,
                    batch_size=64, visible_correlation=0.7)
    sc = make_scene(num_cams=4, width=160, height=120, num_seeds=30, seed=5)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n_seeds = rec.refine_seeds()
    assert n_seeds > 15

    mesh = make_mesh((8, 1))
    total = rec.expand_distributed(mesh=mesh, max_rounds=4, per_shard=32)
    assert total > n_seeds + 50, f"only grew to {total}"
    pts = rec.live_centers()
    d = sc.surface_distance(pts)
    assert np.median(d) < 0.01, np.median(d)
    # the new patches carry full derived state for the filters/writers
    assert rec.cell_filtering() >= 0
    rec.write_ply("/dev/null")
