"""Non-planar reconstruction: the engine must recover a curved height
field, not just the plane every other test uses (patch normals vary across
the surface; LOD/visibility machinery sees realistic variation)."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene, _bumps
from pais_mvs_tpu.engine.reconstructor import Reconstructor


def test_bumpy_surface_reconstruction():
    cfg = MvsConfig(patch_radius=5, max_lod=3, particle_num=8,
                    max_iteration=10, dist_weighting=5 / 3.0,
                    seed_refine_rounds=1, cell_size=12,
                    batch_size=128, wavefront_size=256)
    sc = make_scene(num_cams=5, width=240, height=180, num_seeds=40,
                    seed=13, amplitude=0.05)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n = rec.refine_seeds()
    assert n > 15, f"only {n} seeds accepted"
    rec.expand(max_rounds=4)
    pts = rec.live_centers()
    assert len(pts) > 300
    d = sc.surface_distance(pts)
    # scene scale ~2, bump amplitude 0.05: recovered cloud must hug the
    # curved surface, far below the amplitude itself
    assert np.median(d) < 0.01, np.median(d)
    # sanity: the cloud actually follows the bumps (z varies with x, y as
    # the height field does, not a plane fit)
    z_pred = 0.05 * _bumps(pts[:, 0], pts[:, 1])
    corr = np.corrcoef(pts[:, 2], z_pred)[0, 1]
    assert corr > 0.9, corr
