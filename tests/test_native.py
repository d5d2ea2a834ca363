"""Native C++ host runtime vs the pure-Python reference paths."""

import numpy as np
import pytest

from pais_mvs_tpu import native as native_rt
from pais_mvs_tpu.engine.arena import PatchArena
from pais_mvs_tpu.engine.cellgrid import CellGrids

pytestmark = pytest.mark.skipif(not native_rt.available(),
                                reason="native runtime not built")


def _fake_arena(n=200, C=4, seed=0):
    rng = np.random.default_rng(seed)
    a = PatchArena(C)
    a.append(
        center=rng.normal(size=(n, 3)),
        normal_sph=np.stack([rng.uniform(0, np.pi, n),
                             rng.uniform(-np.pi, np.pi, n)], -1),
        cam_mask=rng.uniform(size=(n, C)) < 0.7,
        ref_cam=rng.integers(0, C, n).astype(np.int32),
        depth=rng.uniform(1, 3, n),
        lod=np.zeros(n, dtype=np.int32),
        fitness=rng.uniform(0, 2, n),
        correlation=rng.uniform(0.3, 1.0, n),
        priority=rng.permutation(n).astype(np.float64),
        color=rng.uniform(0, 255, (n, 3)),
        img_point=rng.uniform(0, 200, (n, C, 2)),
        is_seed=np.zeros(n, dtype=bool),
    )
    # kill a few
    a.delete(np.arange(0, n, 17))
    return a


def test_grid_parity():
    a = _fake_arena()
    widths = [200, 180, 220, 200]
    heights = [150, 160, 140, 150]
    py = CellGrids.build(a, widths, heights, 10)
    nat = native_rt.NativeCellGrids.build(a, widths, heights, 10)
    assert py.width == list(nat.width) and py.height == list(nat.height)
    for (cam, cx, cy), ids in py.cells.items():
        assert nat.cell(cam, cx, cy) == ids
    # removal parity
    pid = int(a.live_ids()[5])
    cm = a.data["cam_mask"][pid]
    ip = a.data["img_point"][pid]
    py.remove_patch(pid, cm, ip)
    nat.remove_patch(pid, cm, ip)
    for (cam, cx, cy), ids in py.cells.items():
        assert nat.cell(cam, cx, cy) == ids


def test_candidate_generation_parity():
    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.engine.reconstructor import Reconstructor
    a = _fake_arena(n=150)
    widths = [200, 180, 220, 200]
    heights = [150, 160, 140, 150]
    cfg = MvsConfig(cell_size=10, max_cell_patch_num=3, min_correlation=0.8)
    parents = a.live_ids()[:40]

    # drive both paths through the SAME bookkeeping logic via a stub
    class Stub:
        pass
    stub = Stub()
    stub.cfg = cfg
    stub.arena = a
    stub.neighbor_radius = 0.15
    stub.use_native = False
    stub.grids = CellGrids.build(a, widths, heights, cfg.cell_size)
    stub._is_neighbor = lambda *args: Reconstructor._is_neighbor(stub, *args)
    stub._skip_neighbor_cell = \
        lambda *args: Reconstructor._skip_neighbor_cell(stub, *args)
    py = Reconstructor._generate_candidates(stub, parents)

    stub2 = Stub()
    stub2.cfg = cfg
    stub2.arena = a
    stub2.neighbor_radius = 0.15
    stub2.use_native = True
    stub2.grids = native_rt.NativeCellGrids.build(a, widths, heights,
                                                  cfg.cell_size)
    nat = Reconstructor._generate_candidates(stub2, parents)

    assert len(py[0]) > 0
    for x, y in zip(py, nat):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_insert_time_filter_parity():
    a = _fake_arena(n=120)
    widths = [200, 180, 220, 200]
    heights = [150, 160, 140, 150]
    nat = native_rt.NativeCellGrids.build(a, widths, heights, 10)
    py = CellGrids.build(a, widths, heights, 10)
    cap = 2
    for pid in a.live_ids()[:30]:
        cm = a.data["cam_mask"][pid]
        ip = a.data["img_point"][pid]
        cams = np.nonzero(cm)[0]
        full = sum(1 for c in cams
                   if len(py.cell(int(c), *py.cell_of(ip[c]))) >= cap)
        expected = full < len(cams)
        assert nat.insert_time_filter(cm, ip, cap) == expected


def test_neighbor_counts_vs_bruteforce():
    rng = np.random.default_rng(7)
    n = 500
    centers = rng.normal(size=(n, 3))
    ids = np.arange(n, dtype=np.int64)
    radius = 0.4
    got = native_rt.neighbor_counts(centers, ids, radius)
    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    want = (d <= radius).sum(axis=1) - 1
    np.testing.assert_array_equal(got, want)
