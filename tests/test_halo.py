"""Halo exchange + sharded expansion round vs a single-process oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.parallel.mesh import make_mesh, PATCH_AXIS
from pais_mvs_tpu.parallel.halo import route_candidates, \
    sharded_expansion_round

S = 8            # shards
SLAB = 4         # cell columns per shard
GRID_W = S * SLAB
GRID_H = 6
CELL = 10


def test_route_candidates_delivers_to_owner():
    rng = np.random.default_rng(0)
    N = 16                                  # per shard
    payload = rng.normal(size=(S * N, 3)).astype(np.float32)
    valid = rng.uniform(size=S * N) < 0.8
    # columns: mostly own slab, some +-1 neighbour (halo), never further
    col = np.zeros(S * N, dtype=np.int32)
    for k in range(S):
        base = k * SLAB
        local = rng.integers(0, SLAB, N)
        drift = rng.choice([-1, 0, 0, 0, 1], N)
        col[k * N:(k + 1) * N] = np.clip(base + local + drift * SLAB,
                                         0, GRID_W - 1)
    mesh = make_mesh((S, 1))
    out = route_candidates(jnp.asarray(payload), jnp.asarray(col),
                           jnp.asarray(valid), SLAB, mesh)
    got_p = np.asarray(out.payload)
    got_c = np.asarray(out.col)
    got_v = np.asarray(out.valid)

    # every valid candidate must appear exactly once, on its owner shard
    rows_per_shard = got_p.shape[0] // S
    expected = sorted(map(tuple, np.concatenate(
        [payload[valid], col[valid, None]], axis=1).tolist()))
    received = []
    owner_ok = True
    for k in range(S):
        sl = slice(k * rows_per_shard, (k + 1) * rows_per_shard)
        pv, cv, vv = got_p[sl], got_c[sl], got_v[sl]
        for p, c in zip(pv[vv], cv[vv]):
            received.append(tuple(list(p) + [c]))
            owner_ok &= (c // SLAB == k)
    assert owner_ok
    assert sorted(received) == expected


def test_sharded_expansion_round_matches_oracle():
    rng = np.random.default_rng(3)
    N = 8                                   # parents per shard
    M = S * N
    centers = rng.normal(size=(M, 3)).astype(np.float32)
    normals = rng.normal(size=(M, 3)).astype(np.float32)
    priority = rng.permutation(M).astype(np.float32)  # distinct ranks
    valid = rng.uniform(size=M) < 0.9
    # parent pixels binned so shard k's parents live in its slab
    img_xy = np.zeros((M, 2), dtype=np.float32)
    for k in range(S):
        img_xy[k * N:(k + 1) * N, 0] = \
            (k * SLAB + rng.uniform(0, SLAB, N)) * CELL
        img_xy[k * N:(k + 1) * N, 1] = rng.uniform(0, GRID_H, N) * CELL
    occupancy = rng.integers(0, 2, size=(GRID_W, GRID_H)).astype(np.int32)
    CAP = 2

    mesh = make_mesh((S, 1))
    cell_xy, pc, pn, accept = sharded_expansion_round(
        jnp.asarray(centers), jnp.asarray(normals), jnp.asarray(img_xy),
        jnp.asarray(priority), jnp.asarray(valid), jnp.asarray(occupancy),
        mesh, SLAB, GRID_W, GRID_H, CELL, cap_per=CAP)
    cell_xy, pc, accept = (np.asarray(cell_xy), np.asarray(pc),
                           np.asarray(accept))

    # oracle: global 4-neighbour candidates, per-cell priority order,
    # cap_per - occupancy acceptances
    cands = []   # (cellx, celly, priority, parent)
    for i in range(M):
        if not valid[i]:
            continue
        cx = int(img_xy[i, 0] / CELL)
        cy = int(img_xy[i, 1] / CELL)
        for dx, dy in ((-1, 0), (0, -1), (1, 0), (0, 1)):
            nx, ny = cx + dx, cy + dy
            if 0 <= nx < GRID_W and 0 <= ny < GRID_H:
                cands.append((nx, ny, priority[i], i))
    per_cell = {}
    accepted_oracle = set()
    for nx, ny, pri, i in sorted(cands, key=lambda t: (t[0], t[1], t[2])):
        cnt = per_cell.get((nx, ny), int(occupancy[nx, ny]))
        if cnt < CAP:
            per_cell[(nx, ny)] = cnt + 1
            accepted_oracle.add((nx, ny, round(float(pri), 3)))

    got = set()
    pri_of = {tuple(np.round(centers[i], 4)): priority[i] for i in range(M)}
    for j in range(len(accept)):
        if accept[j]:
            key = tuple(np.round(pc[j], 4))
            got.add((int(cell_xy[j, 0]), int(cell_xy[j, 1]),
                     round(float(pri_of[key]), 3)))
    assert got == accepted_oracle
