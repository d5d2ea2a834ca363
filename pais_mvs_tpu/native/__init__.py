"""ctypes binding for the native host runtime (native/runtime.cpp).

The shared library is built lazily with g++ on first import (cached next
to the source); if the toolchain or build is unavailable, ``LIB`` is None
and callers fall back to the pure-Python paths — the native runtime is a
host-side accelerator, never a correctness requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

from pais_mvs_tpu.engine.cellgrid import GridCoordsMixin

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cpp")
_SO = os.path.join(_DIR, "libtmvs_runtime.so")

LIB = None


def _build() -> bool:
    # build into a per-pid temp file and rename atomically: concurrent
    # processes (pytest -n, multi-process launches) must never dlopen a
    # half-written .so
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            sys.stderr.write(f"[native] build failed:\n{r.stderr}\n")
            return False
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        sys.stderr.write(f"[native] build unavailable: {e}\n")
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global LIB
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        sys.stderr.write(f"[native] load failed: {e}\n")
        return

    c = ctypes
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.tg_create.restype = c.c_void_p
    lib.tg_create.argtypes = [c.c_int, i32p, i32p, c.c_int]
    lib.tg_destroy.argtypes = [c.c_void_p]
    lib.tg_grid_dims.restype = c.c_int
    lib.tg_grid_dims.argtypes = [c.c_void_p, c.c_int,
                                 c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.tg_insert_patch.argtypes = [c.c_void_p, c.c_int, u8p, dp]
    lib.tg_remove_patch.argtypes = [c.c_void_p, c.c_int, u8p, dp]
    lib.tg_cell_count.restype = c.c_int
    lib.tg_cell_count.argtypes = [c.c_void_p, c.c_int, c.c_int, c.c_int]
    lib.tg_all_cells.restype = c.c_int
    lib.tg_all_cells.argtypes = [c.c_void_p, i32p, i32p, i32p, c.c_int]
    lib.tg_cell_ids.restype = c.c_int
    lib.tg_cell_ids.argtypes = [c.c_void_p, c.c_int, c.c_int, c.c_int,
                                i32p, c.c_int]
    lib.tg_insert_time_filter.restype = c.c_int
    lib.tg_insert_time_filter.argtypes = [c.c_void_p, u8p, dp, c.c_int]
    lib.tg_candidates.restype = c.c_int
    lib.tg_candidates.argtypes = [
        c.c_void_p, i64p, c.c_int, dp, dp, dp, u8p, u8p, dp,
        c.c_double, c.c_double, c.c_int, i64p, i32p, i32p, i32p, c.c_int]
    lib.tg_neighbor_counts.argtypes = [dp, i64p, c.c_int, c.c_double, i64p]
    lib.tg_cell_filter.restype = c.c_int
    lib.tg_cell_filter.argtypes = [c.c_void_p, i32p, i32p, i32p, c.c_int,
                                   dp, u8p, dp, u8p, i64p, c.c_int]
    lib.tg_visibility_filter.restype = c.c_int
    lib.tg_visibility_filter.argtypes = [c.c_void_p, i64p, c.c_int, dp, dp,
                                         u8p, dp, u8p, c.c_int, i64p, c.c_int]
    lib.tg_neighbor_cell_filter.restype = c.c_int
    lib.tg_neighbor_cell_filter.argtypes = [
        c.c_void_p, i32p, i32p, i32p, c.c_int, dp, dp, u8p, dp, u8p,
        c.c_double, c.c_double, i64p, c.c_int]
    lib.tg_batch_insert.restype = c.c_int
    lib.tg_batch_insert.argtypes = [c.c_void_p, i64p, c.c_int, u8p, u8p, dp,
                                    i64p, i32p, i32p, i32p, dp, dp, dp, u8p,
                                    dp, dp, dp, c.c_double, c.c_double,
                                    c.c_int, c.c_int64, u8p]

    LIB = lib


_load()


def available() -> bool:
    return LIB is not None


class NativeCellGrids(GridCoordsMixin):
    """Drop-in counterpart of engine.cellgrid.CellGrids backed by C++.
    Coordinate math (cell_of / in_map / grid dims) is SHARED with the
    Python grid via GridCoordsMixin — the bit-parity contract."""

    def __init__(self, widths, heights, cell_size: int):
        assert LIB is not None
        self.cell_size = cell_size
        self._w = np.asarray(widths, dtype=np.int32)
        self._h = np.asarray(heights, dtype=np.int32)
        self._g = LIB.tg_create(len(self._w), self._w, self._h, cell_size)
        self.width = self.grid_dims([int(w) for w in self._w], cell_size)
        self.height = self.grid_dims([int(h) for h in self._h], cell_size)

    def __del__(self):
        if LIB is not None and getattr(self, "_g", None):
            LIB.tg_destroy(self._g)
            self._g = None

    def cell(self, cam: int, cx: int, cy: int):
        n = LIB.tg_cell_count(self._g, cam, cx, cy)
        if n == 0:
            return []
        out = np.empty(n, dtype=np.int32)
        n = LIB.tg_cell_ids(self._g, cam, cx, cy, out, n)
        return out[:n].tolist()

    def cell_count(self, cam: int, cx: int, cy: int) -> int:
        return LIB.tg_cell_count(self._g, cam, cx, cy)

    def all_keys(self):
        """Sorted (cam, cx, cy) keys of every non-empty cell."""
        n = LIB.tg_all_cells(self._g, np.empty(0, np.int32),
                             np.empty(0, np.int32), np.empty(0, np.int32), 0)
        if n == 0:
            return []
        oc = np.empty(n, np.int32)
        ox = np.empty(n, np.int32)
        oy = np.empty(n, np.int32)
        n = LIB.tg_all_cells(self._g, oc, ox, oy, n)
        keys = sorted(zip(oc.tolist(), ox.tolist(), oy.tolist()))
        return keys

    def insert_patch(self, pid: int, cam_mask, img_points) -> None:
        LIB.tg_insert_patch(
            self._g, int(pid),
            np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_points, dtype=np.float64))

    def remove_patch(self, pid: int, cam_mask, img_points) -> None:
        LIB.tg_remove_patch(
            self._g, int(pid),
            np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_points, dtype=np.float64))

    def insert_time_filter(self, cam_mask, img_points,
                           max_cell_patch_num: int) -> bool:
        return bool(LIB.tg_insert_time_filter(
            self._g, np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_points, dtype=np.float64),
            max_cell_patch_num))

    def candidates(self, parents, centers, normal_sph, correlation, alive,
                   cam_mask, img_pts, min_correlation: float,
                   neighbor_radius: float, max_cell_patch_num: int):
        """Whole-wavefront candidate generation (see tg_candidates)."""
        parents = np.ascontiguousarray(parents, dtype=np.int64)
        cap = max(len(parents) * cam_mask.shape[1] * 4, 64)
        while True:
            op = np.empty(cap, dtype=np.int64)
            oc = np.empty(cap, dtype=np.int32)
            ox = np.empty(cap, dtype=np.int32)
            oy = np.empty(cap, dtype=np.int32)
            n = LIB.tg_candidates(
                self._g, parents, len(parents),
                np.ascontiguousarray(centers, dtype=np.float64),
                np.ascontiguousarray(normal_sph, dtype=np.float64),
                np.ascontiguousarray(correlation, dtype=np.float64),
                np.ascontiguousarray(alive, dtype=np.uint8),
                np.ascontiguousarray(cam_mask, dtype=np.uint8),
                np.ascontiguousarray(img_pts, dtype=np.float64),
                float(min_correlation), float(neighbor_radius),
                int(max_cell_patch_num), op, oc, ox, oy, cap)
            if n >= 0:
                return op[:n], oc[:n], ox[:n], oy[:n]
            cap *= 2

    @staticmethod
    def _keys_arrays(keys):
        k = np.asarray(keys, dtype=np.int32).reshape(-1, 3)
        return (np.ascontiguousarray(k[:, 0]), np.ascontiguousarray(k[:, 1]),
                np.ascontiguousarray(k[:, 2]))

    def cell_filter(self, keys, correlation, cam_mask, img_pts, alive):
        """Whole cellFiltering pass (tg_cell_filter). Mutates ``alive`` and
        the grid; returns the killed ids."""
        oc, ox, oy = self._keys_arrays(keys)
        out = np.empty(max(len(alive), 1), dtype=np.int64)
        n = LIB.tg_cell_filter(
            self._g, oc, ox, oy, len(oc),
            np.ascontiguousarray(correlation, dtype=np.float64),
            np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_pts, dtype=np.float64),
            alive, out, len(out))
        return out[:n]

    def visibility_filter(self, ids, centers, cam_centers, cam_mask,
                          img_pts, alive, min_cam_num: int):
        """Whole visibilityFiltering pass (tg_visibility_filter)."""
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        out = np.empty(max(len(ids), 1), dtype=np.int64)
        n = LIB.tg_visibility_filter(
            self._g, ids, len(ids),
            np.ascontiguousarray(centers, dtype=np.float64),
            np.ascontiguousarray(cam_centers, dtype=np.float64),
            np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_pts, dtype=np.float64),
            alive, int(min_cam_num), out, len(out))
        return out[:n]

    def neighbor_cell_filter(self, keys, centers, normal_sph, cam_mask,
                             img_pts, alive, neighbor_radius: float,
                             ratio: float):
        """Whole neighborCellFiltering pass (tg_neighbor_cell_filter)."""
        oc, ox, oy = self._keys_arrays(keys)
        out = np.empty(max(len(alive), 1), dtype=np.int64)
        n = LIB.tg_neighbor_cell_filter(
            self._g, oc, ox, oy, len(oc),
            np.ascontiguousarray(centers, dtype=np.float64),
            np.ascontiguousarray(normal_sph, dtype=np.float64),
            np.ascontiguousarray(cam_mask, dtype=np.uint8),
            np.ascontiguousarray(img_pts, dtype=np.float64),
            alive, float(neighbor_radius), float(ratio), out, len(out))
        return out[:n]

    def batch_insert(self, order, keep, cam_masks, img_pts,
                     parents, cand_cam, cand_cx, cand_cy,
                     centers, normal_sph, correlation, alive,
                     cand_center, cand_sph, cand_corr,
                     min_correlation: float, neighbor_radius: float,
                     max_cell_patch_num: int, first_id: int):
        """Sequential insert-time density + skipNeighborCell re-check +
        grid registration for one expansion round (tg_batch_insert).
        Returns the acceptance mask in candidate order; accepted rows got
        ids first_id..first_id+n-1 in ``order`` sequence."""
        order = np.ascontiguousarray(order, dtype=np.int64)
        accept = np.zeros(len(keep), dtype=np.uint8)
        LIB.tg_batch_insert(
            self._g, order, len(order),
            np.ascontiguousarray(keep, dtype=np.uint8),
            np.ascontiguousarray(cam_masks, dtype=np.uint8),
            np.ascontiguousarray(img_pts, dtype=np.float64),
            np.ascontiguousarray(parents, dtype=np.int64),
            np.ascontiguousarray(cand_cam, dtype=np.int32),
            np.ascontiguousarray(cand_cx, dtype=np.int32),
            np.ascontiguousarray(cand_cy, dtype=np.int32),
            np.ascontiguousarray(centers, dtype=np.float64),
            np.ascontiguousarray(normal_sph, dtype=np.float64),
            np.ascontiguousarray(correlation, dtype=np.float64),
            np.ascontiguousarray(alive, dtype=np.uint8),
            np.ascontiguousarray(cand_center, dtype=np.float64),
            np.ascontiguousarray(cand_sph, dtype=np.float64),
            np.ascontiguousarray(cand_corr, dtype=np.float64),
            float(min_correlation), float(neighbor_radius),
            int(max_cell_patch_num), int(first_id), accept)
        return accept.astype(bool)

    @staticmethod
    def build(arena, widths, heights, cell_size: int) -> "NativeCellGrids":
        g = NativeCellGrids(widths, heights, cell_size)
        for pid in arena.live_ids():
            g.insert_patch(int(pid), arena.data["cam_mask"][pid],
                           arena.data["img_point"][pid])
        return g


def neighbor_counts(centers: np.ndarray, ids: np.ndarray,
                    radius: float) -> np.ndarray:
    """Euclidean neighbour counts within radius, grid-hashed (C++)."""
    assert LIB is not None
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    out = np.zeros(len(ids), dtype=np.int64)
    LIB.tg_neighbor_counts(
        np.ascontiguousarray(centers, dtype=np.float64), ids, len(ids),
        float(radius), out)
    return out
