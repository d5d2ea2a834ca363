"""insert_fixpoint vs a literal serial simulation of the host insert loop.

The distributed expansion path replays the host engine's sequential
insert re-check (reconstructor.py:557-574 — per-candidate live-grid
``_insert_time_cell_filter`` + ``_skip_neighbor_cell``, in strategy
order, cells filling as earlier candidates insert) as a replicated
Jacobi fixpoint (parallel/expansion.py::insert_fixpoint). This test
pins the mirror BIT-EXACTLY: randomized candidate scenarios with heavy
cell collisions, blocking chains (an early reject un-blocking a later
candidate), live density pressure from both pre-round occupants and
within-round inserts, and out-of-frame visible cams (which the host
counts in the density denominator but can never see as full).

Reference semantics being simulated: mvs.cpp:877-895 (density clause)
and mvs.cpp:792-807 (skipNeighborCell) applied at insert time against
the live grid.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.parallel.expansion import insert_fixpoint


def serial_insert_sim(a_acc, a_vis, a_cm, a_ord, a_st, a_ocell, a_cnt0,
                      a_pc, a_pn, vis_cell, cnt_vis, cap, min_corr, nr):
    """Literal transcription of the host's per-candidate insert loop."""
    SR, C = a_vis.shape
    ins_by_cell = {}                     # cell -> list of st rows (accepted)
    acc = np.zeros(SR, bool)
    for i in np.argsort(a_ord, kind="stable"):
        if not a_acc[i]:
            continue
        # _insert_time_cell_filter: every visible cam counts; only
        # in-frame cells can be full (live counts)
        nvis = int(a_cm[i].sum())
        full = 0
        for c in range(C):
            if not a_vis[i, c]:
                continue
            live = cnt_vis[i, c] + len(ins_by_cell.get(vis_cell[i, c], []))
            if live >= cap:
                full += 1
        if nvis > 0 and full >= nvis:
            continue
        # _skip_neighbor_cell on the ORIGINAL candidate cell vs the live
        # within-round inserts (pre-round occupants were cleared at
        # candidate-generation time and cannot change mid-round)
        mates = ins_by_cell.get(a_ocell[i], [])
        if a_cnt0[i] + len(mates) >= cap:
            continue
        blocked = False
        for st in mates:
            if st[6] > min_corr:
                blocked = True
                break
            d = st[0:3] - a_pc[i]
            if (abs(np.dot(d, a_pn[i])) + abs(np.dot(d, st[3:6]))) <= nr:
                blocked = True
                break
        if blocked:
            continue
        acc[i] = True
        for c in range(C):
            if a_vis[i, c]:
                ins_by_cell.setdefault(vis_cell[i, c], []).append(a_st[i])
    return acc


def _random_scenario(rng, SR, C, grid_w, grid_h, cap):
    """Collision-heavy candidate table. Correlations straddle min_corr
    and geometry straddles nr so all three clauses fire."""
    min_corr = 0.7
    nr = 0.1
    a_cm = rng.random((SR, C)) < 0.8
    a_cm[a_cm.sum(1) == 0, 0] = True
    # ~15% of visible cams are out-of-frame (host: in denominator,
    # never full)
    a_vis = a_cm & (rng.random((SR, C)) < 0.85)
    a_cx = rng.integers(0, grid_w, (SR, C)).astype(np.int32)
    a_cy = rng.integers(0, grid_h, (SR, C)).astype(np.int32)
    vis_cell = np.where(a_vis,
                        (a_cx * C + np.arange(C)[None, :]) * grid_h + a_cy,
                        2 ** 30)
    a_ocell = ((rng.integers(0, grid_w, SR) * C + rng.integers(0, C, SR))
               * grid_h + rng.integers(0, grid_h, SR)).astype(np.int32)
    # force collisions: half the rows share original cells with others,
    # and original cells often appear as refined cells too
    half = SR // 2
    a_ocell[half:] = a_ocell[rng.integers(0, half, SR - half)]
    swap = (rng.random(SR) < 0.5) & a_vis[:, 0]   # only real cells —
    # the sentinel key only ever marks masked INSERT entries in prod
    a_ocell[swap] = vis_cell[swap, 0].astype(np.int32)
    a_acc = rng.random(SR) < 0.85
    a_ord = rng.permutation(SR).astype(np.float32)
    ctr = rng.normal(size=(SR, 3)).astype(np.float32) * 0.15
    nrm = rng.normal(size=(SR, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    corr = rng.uniform(min_corr - 0.2, min_corr + 0.2, SR).astype(
        np.float32)
    a_st = np.concatenate([ctr, nrm, corr[:, None]], -1)
    a_pc = rng.normal(size=(SR, 3)).astype(np.float32) * 0.15
    a_pn = rng.normal(size=(SR, 3)).astype(np.float32)
    a_pn /= np.linalg.norm(a_pn, axis=1, keepdims=True)
    a_cnt0 = rng.integers(0, cap + 1, SR).astype(np.int32)
    cnt_vis = rng.integers(0, cap + 1, (SR, C)).astype(np.int32)
    return dict(a_acc=a_acc, a_vis=a_vis, a_cm=a_cm, a_ord=a_ord,
                a_st=a_st, a_ocell=a_ocell, a_cnt0=a_cnt0, a_pc=a_pc,
                a_pn=a_pn, a_cx=a_cx, a_cy=a_cy, vis_cell=vis_cell,
                cnt_vis=cnt_vis, cap=cap, min_corr=min_corr, nr=nr)


@pytest.mark.parametrize("seed", range(12))
def test_fixpoint_matches_serial(seed):
    rng = np.random.default_rng(seed)
    # small grid => heavy collisions; cap varies to exercise both the
    # density clauses and deep blocking chains
    sc = _random_scenario(rng, SR=96, C=3, grid_w=5,
                          grid_h=4, cap=int(rng.integers(1, 5)))
    want = serial_insert_sim(
        sc["a_acc"], sc["a_vis"], sc["a_cm"], sc["a_ord"], sc["a_st"],
        sc["a_ocell"], sc["a_cnt0"], sc["a_pc"], sc["a_pn"],
        sc["vis_cell"], sc["cnt_vis"], sc["cap"], sc["min_corr"],
        sc["nr"])
    got = np.asarray(insert_fixpoint(
        jnp.asarray(sc["a_acc"]), jnp.asarray(sc["a_vis"]),
        jnp.asarray(sc["a_cm"]), jnp.asarray(sc["a_ord"]),
        jnp.asarray(sc["a_st"]), jnp.asarray(sc["a_ocell"]),
        jnp.asarray(sc["a_cnt0"]), jnp.asarray(sc["a_pc"]),
        jnp.asarray(sc["a_pn"]), jnp.asarray(sc["a_cx"]),
        jnp.asarray(sc["a_cy"]), jnp.asarray(sc["cnt_vis"]),
        3, 4, sc["cap"], sc["min_corr"], jnp.float32(sc["nr"])))
    assert (got == want).all(), \
        f"fixpoint diverges from serial at rows {np.nonzero(got != want)}"


def test_fixpoint_unblocks_chain():
    """A rejected earlier insert must NOT block a later candidate: c0 is
    rejected by its own full original cell, so its would-be confident
    insert into cell B never lands — the serial loop (and the fixpoint)
    accepts c1 probing B; a single optimistic join pass would not."""
    C, grid_h, cap = 1, 4, 2
    a_acc = np.array([True, True])
    a_vis = np.ones((2, 1), bool)
    a_cm = np.ones((2, 1), bool)
    a_ord = np.array([0.0, 1.0], np.float32)
    nrm = np.array([0.0, 0.0, 1.0], np.float32)
    a_st = np.stack([np.r_[0, 0, 0, nrm, 0.99].astype(np.float32),
                     np.r_[5, 5, 5, nrm, 0.0].astype(np.float32)])
    # refined insert targets: c0 -> cell B (cx=0, cy=0, key 0),
    # c1 -> cell (cx=1, cy=0, key 4)
    a_cx = np.array([[0], [1]], np.int32)
    a_cy = np.zeros((2, 1), np.int32)
    # original cells: c0 probes cell A (key 1, FULL pre-round),
    # c1 probes cell B (key 0, empty)
    a_ocell = np.array([1, 0], np.int32)
    a_cnt0 = np.array([cap, 0], np.int32)
    cnt_vis = np.zeros((2, 1), np.int32)
    a_pc = np.zeros((2, 3), np.float32)
    a_pn = np.tile(nrm, (2, 1))
    got = np.asarray(insert_fixpoint(
        jnp.asarray(a_acc), jnp.asarray(a_vis), jnp.asarray(a_cm),
        jnp.asarray(a_ord), jnp.asarray(a_st), jnp.asarray(a_ocell),
        jnp.asarray(a_cnt0), jnp.asarray(a_pc), jnp.asarray(a_pn),
        jnp.asarray(a_cx), jnp.asarray(a_cy), jnp.asarray(cnt_vis),
        C, grid_h, cap, 0.7, jnp.float32(0.1)))
    assert not got[0] and got[1]
