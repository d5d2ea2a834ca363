"""Kill-set parity of the engine's four post-filters vs the serial
reference-semantics oracle (mvs.cpp:279-525 re-read into
OraclePipeline.{cell,visibility,neighbor_cell,neighbor_patch}_filtering).

Round 2 verified the filters native-vs-Python (both builder code sharing
one design) plus efficacy; this closes the remaining gap with an
independent serial NumPy implementation run on the SAME cloud, comparing
which patches each pass kills."""

import numpy as np
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.engine.reconstructor import Reconstructor
from pais_mvs_tpu.oracle import OraclePipeline


def _overlap(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a), len(b))


def test_filter_kill_sets_match_oracle():
    cfg = MvsConfig(patch_radius=4, max_lod=3, particle_num=6,
                    max_iteration=8, dist_weighting=4 / 3.0, cell_size=10,
                    min_cam_num=3, max_cell_patch_num=2,
                    neighbor_radius_scalar=0.08, batch_size=64,
                    wavefront_size=64, seed_refine_rounds=1)
    sc = make_scene(num_cams=4, width=200, height=150, num_seeds=25, seed=3)
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    rec.refine_seeds()
    rec.expand()
    a = rec.arena
    live = a.live_ids()
    assert len(live) > 150

    # hand the oracle the exact same cloud + neighborRadius
    rec._ensure_grids()
    orc = OraclePipeline(sc.params, sc.images, cfg, seed=0)
    orc.adopt_cloud(a.data["center"][live], a.data["normal_sph"][live],
                    a.data["cam_mask"][live], a.data["correlation"][live],
                    a.data["img_point"][live],
                    neighbor_radius=rec.neighbor_radius)
    ogrids = orc._filter_grids()
    pos_of = {int(pid): i for i, pid in enumerate(live)}

    def engine_kills(fn):
        alive0 = a.alive.copy()
        fn()
        return {pos_of[int(p)] for p in live if alive0[p] and not a.alive[p]}

    def oracle_kills(fn):
        drop0 = [p.drop for p in orc.patches]
        fn()
        return {i for i, p in enumerate(orc.patches)
                if not drop0[i] and p.drop}

    passes = [
        ("cell", lambda: rec.cell_filtering(),
         lambda: orc.cell_filtering(ogrids)),
        ("visibility", lambda: rec.visibility_filtering(),
         lambda: orc.visibility_filtering(ogrids)),
        ("neighbor_cell", lambda: rec.neighbor_cell_filtering(0.25),
         lambda: orc.neighbor_cell_filtering(0.25, ogrids)),
        ("neighbor_patch", lambda: rec.neighbor_patch_filtering(0.25),
         lambda: orc.neighbor_patch_filtering(0.25, ogrids)),
    ]
    total_e = 0
    for name, efn, ofn in passes:
        ke = engine_kills(efn)
        ko = oracle_kills(ofn)
        ov = _overlap(ke, ko)
        assert ov >= 0.95, (name, len(ke), len(ko), ov,
                            sorted(ke ^ ko)[:10])
        total_e += len(ke)
    # the run must actually exercise the filters (something was killed)
    assert total_e > 0
