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


def _filter_stub(a, use_native, widths, heights, cfg):
    from pais_mvs_tpu.engine.reconstructor import Reconstructor

    class Stub:
        pass
    s = Stub()
    s.cfg = cfg
    s.arena = a
    s.neighbor_radius = 0.15
    s.use_native = use_native and native_rt.available()
    cls = native_rt.NativeCellGrids if s.use_native else CellGrids
    s.grids = cls.build(a, widths, heights, cfg.cell_size)
    s.np_center = np.linspace(-1, 1, a.num_cams * 3).reshape(-1, 3)
    s._log = lambda *args, **kw: None
    for m in ("_ensure_grids", "_delete", "_is_neighbor", "_native_kill",
              "cell_filtering", "visibility_filtering",
              "neighbor_cell_filtering"):
        setattr(s, m, getattr(Reconstructor, m).__get__(s))
    return s


def test_post_filter_parity():
    """The C++ filter passes must match the Python loops kill-for-kill
    (same cells order, deletions effective immediately)."""
    from pais_mvs_tpu.config import MvsConfig
    widths = [200, 180, 220, 200]
    heights = [150, 160, 140, 150]
    cfg = MvsConfig(cell_size=10, max_cell_patch_num=3, min_cam_num=2)
    for fname, args in (("cell_filtering", ()),
                        ("visibility_filtering", ()),
                        ("neighbor_cell_filtering", (0.25,))):
        a_py = _fake_arena(n=300, seed=3)
        a_nat = _fake_arena(n=300, seed=3)
        s_py = _filter_stub(a_py, False, widths, heights, cfg)
        s_nat = _filter_stub(a_nat, True, widths, heights, cfg)
        r_py = getattr(s_py, fname)(*args)
        r_nat = getattr(s_nat, fname)(*args)
        assert r_py == r_nat, fname
        assert r_py > 0, f"{fname}: degenerate test (nothing removed)"
        np.testing.assert_array_equal(a_py.alive, a_nat.alive)
        assert a_py.deleted_ids == a_nat.deleted_ids
        # grid state must match after the deletions
        for key in s_py.grids.all_keys():
            assert list(s_py.grids.cell(*key)) == list(s_nat.grids.cell(*key))


def test_batch_insert_parity():
    """tg_batch_insert must accept exactly the candidates the sequential
    Python insert-time loop (density clause + skipNeighborCell re-check)
    accepts, in the same order."""
    from pais_mvs_tpu.config import MvsConfig
    rng = np.random.default_rng(11)
    widths = [200, 180, 220, 200]
    heights = [150, 160, 140, 150]
    C = 4
    cfg = MvsConfig(cell_size=10, max_cell_patch_num=2, min_correlation=0.8)
    nr = 0.3
    a = _fake_arena(n=80, seed=5)
    nat = native_rt.NativeCellGrids.build(a, widths, heights, cfg.cell_size)
    py = CellGrids.build(a, widths, heights, cfg.cell_size)

    N = 120
    n_arena = a.count
    keep = rng.uniform(size=N) < 0.8
    cam_masks = rng.uniform(size=(N, C)) < 0.7
    img_pts = rng.uniform(0, 150, (N, C, 2))
    order = rng.permutation(N).astype(np.int64)
    parents = rng.choice(a.live_ids(), N).astype(np.int64)
    cand_cam = rng.integers(0, C, N).astype(np.int32)
    cand_cx = rng.integers(0, 14, N).astype(np.int32)
    cand_cy = rng.integers(0, 13, N).astype(np.int32)
    cand_center = rng.normal(size=(N, 3))
    cand_sph = np.stack([rng.uniform(0, np.pi, N),
                         rng.uniform(-np.pi, np.pi, N)], -1)
    cand_corr = rng.uniform(0.3, 1.0, N)
    first_id = n_arena

    accept = nat.batch_insert(
        order, keep, cam_masks, img_pts, parents, cand_cam, cand_cx,
        cand_cy, a.data["center"][:n_arena], a.data["normal_sph"][:n_arena],
        a.data["correlation"][:n_arena], a.alive[:n_arena].astype(np.uint8),
        cand_center, cand_sph, cand_corr, cfg.min_correlation, nr,
        cfg.max_cell_patch_num, first_id)

    # python mirror
    def normal_of(sph):
        st = np.sin(sph[0])
        return np.array([st * np.cos(sph[1]), st * np.sin(sph[1]),
                         np.cos(sph[0])])

    def geom_of(q):
        if q >= first_id:
            row = new_rows[q - first_id]
            return cand_center[row], normal_of(cand_sph[row]), cand_corr[row]
        return (a.data["center"][q], normal_of(a.data["normal_sph"][q]),
                a.data["correlation"][q])

    accept_py = np.zeros(N, dtype=bool)
    new_rows = []
    nid = first_id
    for i in order:
        if not keep[i]:
            continue
        cams = np.nonzero(cam_masks[i])[0]
        full = sum(1 for c in cams
                   if len(py.cell(int(c), *py.cell_of(img_pts[i, c])))
                   >= cfg.max_cell_patch_num)
        if not (full < len(cams)):
            continue
        c1 = a.data["center"][parents[i]]
        n1 = normal_of(a.data["normal_sph"][parents[i]])
        occ = py.cell(int(cand_cam[i]), int(cand_cx[i]), int(cand_cy[i]))
        skip = len(occ) >= cfg.max_cell_patch_num
        for q in occ:
            if skip:
                break
            if q < first_id and not a.alive[q]:
                continue
            c2, n2, corrq = geom_of(q)
            if corrq > cfg.min_correlation:
                skip = True
                break
            d = c2 - c1
            if abs(d @ n1) + abs(d @ n2) <= nr:
                skip = True
                break
        if skip:
            continue
        py.insert_patch(nid, cam_masks[i], img_pts[i])
        new_rows.append(int(i))
        accept_py[i] = True
        nid += 1
    np.testing.assert_array_equal(accept, accept_py)
    assert accept.sum() > 0 and accept.sum() < keep.sum()
    for key in py.cells.keys():
        assert list(py.cell(*key)) == list(nat.cell(*key))


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
