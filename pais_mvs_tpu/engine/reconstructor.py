"""The reconstruction engine: batched seed refinement, wavefront expansion
over the cell grids, and post-filtering.

Inversion of the reference's control flow (SURVEY.md §7): instead of a
serial priority queue popping ONE patch and running ONE swarm
(MVS::expansionPatches, TMVS/mvs/mvs.cpp:233-275), each round takes the
best-priority frontier slice, generates ALL its cell-expansion candidates,
and refines them in one batched device program. Ordering-sensitive cell
capacity semantics are enforced host-side in parent-priority order, so
``wavefront_size=1`` degenerates to the reference's best-first behaviour.

Division of labour: the device owns all pixel math (PSO/fitness/NCC/LOD);
the host owns the ragged bookkeeping (arena, cell buckets, frontier).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.engine.arena import PatchArena
from pais_mvs_tpu.engine.cellgrid import CellGrids
from pais_mvs_tpu import native as native_rt
from pais_mvs_tpu.models import patch as patch_mod
from pais_mvs_tpu.models.camera import CameraParams, Scene, build_scene
from pais_mvs_tpu.models.patch import PatchBatch
from pais_mvs_tpu.ops import lifecycle as lc
from pais_mvs_tpu.io.mvsbin import MvsPatchData, write_mvs
from pais_mvs_tpu.io.pointcloud import write_ply, write_psr


class Reconstructor:
    def __init__(self, params: Sequence[CameraParams],
                 images: Sequence[np.ndarray], cfg: MvsConfig,
                 verbose: bool = True, use_native: Optional[bool] = None,
                 logger=None):
        self.cfg = cfg
        self.params = list(params)
        self.verbose = verbose
        self.logger = logger
        # native C++ host runtime (cell grids + candidate generation +
        # neighbour counting); falls back to pure Python when the shared
        # library is unavailable
        self.use_native = (native_rt.available() if use_native is None
                           else (use_native and native_rt.available()))
        _t0 = time.time()
        self.scene: Scene = build_scene(params, images, cfg)
        _scene_s = time.time() - _t0
        self.widths = [img.shape[1] for img in images]
        self.heights = [img.shape[0] for img in images]
        C = self.scene.num_cameras
        self.arena = PatchArena(C)
        self.grids: Optional[CellGrids] = None
        self.neighbor_radius = cfg.neighbor_radius
        self.key = jax.random.PRNGKey(cfg.rng_seed)
        # autosave cadence in new patches (mvs.cpp:265-268 uses 500); the
        # live-snapshot hook (addPatchView analog) fires at the same points
        self.autosave_interval = 500
        self.live_snapshot_dir: Optional[str] = None
        # host copies of rig data for cheap bookkeeping math
        rig = self.scene.rig
        self.np_center = np.asarray(rig.center, dtype=np.float64)
        self.np_optical = np.asarray(rig.optical, dtype=np.float64)
        self.np_R = np.asarray(rig.R, dtype=np.float64)
        self.np_focal = np.asarray(rig.focal, dtype=np.float64)
        self.np_principal = np.asarray(rig.principal, dtype=np.float64)
        self.stats: Dict[str, float] = {"scene_build_s": round(_scene_s, 2)}
        # data-parallel refine over all local devices: pure patch-axis
        # sharding under shard_map (the reference has nothing comparable —
        # its outer loop is strictly sequential, SURVEY §2 C11)
        self._dp_mesh = None
        n_dev = jax.local_device_count()
        dp = cfg.data_parallel
        want_dp = dp == "on" or (dp == "auto"
                                 and jax.default_backend() != "cpu")
        if want_dp and n_dev > 1 and cfg.batch_size % n_dev == 0:
            from jax.sharding import Mesh
            # local_devices, NOT devices[:n]: on multi-host runs the global
            # list leads with process 0's devices, which other processes
            # cannot address
            self._dp_mesh = Mesh(np.array(jax.local_devices()), ("dp",))
            self._log(f"data-parallel refine over {n_dev} devices")

    # ------------------------------------------------------------------
    # logging
    # ------------------------------------------------------------------
    def _log(self, msg: str):
        if self.logger is not None:
            self.logger.log(msg)
        elif self.verbose:
            print(msg, flush=True)

    # ------------------------------------------------------------------
    # seeds
    # ------------------------------------------------------------------
    def load_seeds(self, centers: np.ndarray, cam_masks: np.ndarray,
                   img_points: np.ndarray, colors: np.ndarray | None = None,
                   retriangulate: bool = True) -> None:
        """Ingest sparse points (pixel-coordinate measurements) and
        re-triangulate them (MVS::reCentering, mvs.cpp:135-145)."""
        B = len(centers)
        C = self.scene.num_cameras
        pb = patch_mod.from_seeds(centers, cam_masks, img_points, colors)
        if retriangulate:
            pb = lc.prepare_seeds(self.scene, self.cfg, pb)
        else:
            import pais_mvs_tpu.ops.geometry as geom
            normal = geom.estimated_normal(
                pb.center, self.scene.rig.center[None].repeat(B, 0),
                pb.cam_mask)
            pb = pb.replace(normal_sph=geom.normal_to_spherical(normal))
        self._seed_pb = jax.device_get(pb)
        self._seed_colors = colors

    def _rehydrate(self, patches) -> PatchBatch:
        """Rebuild derived patch state from an .mvs checkpoint's
        (center, normal, cams, fitness, correlation) tuples."""
        B = len(patches.centers)
        C = self.scene.num_cameras
        pb = patch_mod.empty_batch(B, C)
        pb = pb.replace(
            center=jnp.asarray(patches.centers, dtype=jnp.float32),
            normal_sph=jnp.asarray(patches.normal_sph, dtype=jnp.float32),
            cam_mask=jnp.asarray(patches.cam_masks),
            fitness=jnp.asarray(patches.fitness, dtype=jnp.float32),
            correlation=jnp.asarray(patches.correlation, dtype=jnp.float32),
            valid=jnp.ones(B, dtype=bool),
            is_seed=jnp.ones(B, dtype=bool))
        return jax.device_get(lc.rehydrate_batch(
            self.scene, self.cfg, pb, jnp.float32(self.neighbor_radius)))

    def load_seeds_from_mvs(self, patches) -> None:
        """Resume reconstruction from an .mvs checkpoint (the reference's
        -r path for .mvs inputs, TMVS.cpp:87-88)."""
        self._seed_pb = self._rehydrate(patches)

    def adopt_loaded_patches(self) -> None:
        """Adopt checkpoint patches as the final set (the -f path,
        TMVS.cpp:131-136)."""
        out = self._seed_pb
        keep = np.asarray(out.valid)
        self._append_to_arena(out, keep, is_seed=True)
        self._update_neighbor_radius()

    def refine_seeds(self) -> int:
        """Batched MVS::refineSeedPatches (mvs.cpp:196-231). Returns the
        number of accepted seed patches."""
        pb = self._seed_pb
        B = pb.center.shape[0]
        # neighborRadius from the raw seed cloud (reference computes it
        # before refining, mvs.cpp:202)
        ext = pb.center.max(0) - pb.center.min(0)
        vol = float(abs(ext[0] * ext[1] * ext[2]))
        if vol > 0:
            self.neighbor_radius = (vol ** (1. / 3.)
                                    * self.cfg.neighbor_radius_scalar)
        t0 = time.time()
        # re-optimization rounds with early stop: the reference loops each
        # patch until its refCam + camera set stabilize (<= camNum times,
        # patch.cpp:140-172); here a whole-batch round is skipped once
        # essentially every surviving patch has stabilized
        out = pb
        prev_ref = None
        prev_mask = None
        rounds_run = 0
        for rnd in range(self.cfg.seed_refine_rounds):
            # the runtime filter applies ONCE after the whole loop
            # (mvs.cpp:217); intermediate rounds must not kill seeds that
            # can still recover (e.g. minCorrelation mid-loop)
            out, iters = self._refine_all(out, is_seed=True, rounds=1,
                                          final_filter=False)
            rounds_run += 1
            ref = np.asarray(out.ref_cam)
            mask = np.asarray(out.cam_mask)
            alive = np.asarray(out.valid)
            if prev_ref is not None and alive.any():
                changed = ((ref != prev_ref)
                           | (mask != prev_mask).any(axis=1)) & alive
                if changed.sum() <= max(1, int(0.01 * alive.sum())):
                    break
            prev_ref, prev_mask = ref, mask
        out = jax.device_get(lc.apply_runtime_filter(
            self.scene, self.cfg, jax.tree.map(jnp.asarray, out)))
        keep = np.asarray(out.valid)
        n = int(keep.sum())
        self._append_to_arena(out, keep, is_seed=True)
        self._update_neighbor_radius()
        self.stats["seed_refine_s"] = time.time() - t0
        self.stats["seed_rounds"] = rounds_run
        self.stats["seed_accepted"] = n
        self.stats["seed_pps"] = round(n / max(time.time() - t0, 1e-9), 2)
        self._log(f"seeds: {n}/{B} accepted in {time.time()-t0:.2f}s "
                  f"({rounds_run} rounds, neighborRadius "
                  f"{self.neighbor_radius:.5f})")
        return n

    # ------------------------------------------------------------------
    # device batching
    # ------------------------------------------------------------------
    def _chunk_sizes(self, B: int):
        """Fixed-shape chunk plan: full batches plus a LADDER of smaller
        tail sizes (bs/2, bs/4) so a 400-seed load doesn't pad to 1024 —
        each size is one extra cached compile, and the padding waste on
        partial batches drops ~4x."""
        bs = self.cfg.batch_size
        n_dev = 1 if self._dp_mesh is None else self._dp_mesh.size
        # every ladder entry must divide evenly over the dp mesh (a 6- or
        # 12-device mesh does not divide 64) — round the floor UP to a
        # device-count multiple
        floor = -(-64 // n_dev) * n_dev
        ladder = sorted({bs, max(bs // 2 // n_dev * n_dev, floor),
                         max(bs // 4 // n_dev * n_dev, floor)})
        sizes = []
        rem = B
        while rem > 0:
            size = next((s for s in ladder if s >= rem), bs)
            sizes.append(size)
            rem -= size
        return sizes

    def _refine_all_async(self, pb: PatchBatch, is_seed: bool, rounds: int,
                          final_filter: bool = True):
        """Dispatch an arbitrary-size batch in fixed-shape chunks WITHOUT
        fetching: returns an opaque handle for ``_refine_fetch``. The
        device works asynchronously from dispatch, so the caller can do
        host work (the pipelined expand's next-round candidate generation)
        before paying the fetch wait."""
        cfg = self.cfg
        B = pb.center.shape[0]
        sizes = self._chunk_sizes(B)
        total = sum(sizes)
        pad = total - B
        if pad:
            filler = patch_mod.take(pb, np.zeros(pad, dtype=np.int64))
            filler = filler.replace(valid=np.zeros(pad, dtype=bool))
            pb = patch_mod.concat(jax.device_get(pb), jax.device_get(filler))
        reslist = []
        s = 0
        for size in sizes:
            chunk = patch_mod.take(pb, np.arange(s, s + size))
            s += size
            chunk = jax.tree.map(jnp.asarray, chunk)
            self.key, sub = jax.random.split(self.key)
            if self._dp_mesh is not None:
                res = self._refine_dp(chunk, sub, is_seed, rounds,
                                      final_filter)
            else:
                res = lc.refine_batch(self.scene, cfg, chunk, sub,
                                      jnp.float32(self.neighbor_radius),
                                      is_seed, rounds, final_filter)
            reslist.append(res)
        return reslist, B

    def _refine_fetch(self, handle):
        """Fetch + host-merge the results of ``_refine_all_async``."""
        reslist, B = handle
        outs = [jax.device_get(r.batch) for r in reslist]
        its = [np.asarray(r.iterations) for r in reslist]
        merged = jax.tree.map(lambda *xs: np.concatenate(xs, 0)[:B], *outs)
        return merged, np.concatenate(its)[:B]

    def _refine_all(self, pb: PatchBatch, is_seed: bool, rounds: int,
                    final_filter: bool = True):
        """Refine an arbitrary-size batch in fixed-shape chunks."""
        return self._refine_fetch(
            self._refine_all_async(pb, is_seed, rounds, final_filter))

    def _refine_dp(self, chunk: PatchBatch, key, is_seed: bool, rounds: int,
                   final_filter: bool = True):
        """Patch-axis data-parallel refine_batch over the local-device mesh
        (each shard refines its slice independently; PRNG folds in the
        shard index so swarms stay decorrelated).

        The shard_map MUST be wrapped in jit and cached: called eagerly it
        dispatches the body op-by-op (catastrophic on a tunneled backend),
        and rebuilding the closure each call would defeat jit's cache.
        """
        from jax.sharding import PartitionSpec as P
        cache = getattr(self, "_dp_fns", None)
        if cache is None:
            cache = self._dp_fns = {}
        key_t = (is_seed, rounds, final_filter, chunk.center.shape[0])
        fn = cache.get(key_t)
        if fn is None:
            cfg = self.cfg
            scene = self.scene

            def body(pbs, key, nr):
                k = jax.random.fold_in(key, jax.lax.axis_index("dp"))
                return lc.refine_batch(scene, cfg, pbs, k, nr, is_seed,
                                       rounds, final_filter)

            spec = jax.tree.map(lambda _: P("dp"), chunk)
            fn = jax.jit(jax.shard_map(
                body, mesh=self._dp_mesh,
                in_specs=(spec, P(), P()),
                out_specs=lc.RefineResult(spec, P("dp")),
                check_vma=False))
            cache[key_t] = fn
        return fn(chunk, key, jnp.float32(self.neighbor_radius))

    def _append_to_arena(self, out: PatchBatch, keep: np.ndarray,
                         is_seed: bool) -> np.ndarray:
        return self._append_rows(out, np.nonzero(keep)[0], is_seed)

    def _append_rows(self, out: PatchBatch, idx: np.ndarray,
                     is_seed: bool) -> np.ndarray:
        """Append the given rows IN ORDER (ids are assigned sequentially,
        so callers that pre-registered grid ids must pass the same order)."""
        if len(idx) == 0:
            return np.zeros(0, dtype=np.int64)
        ids = self.arena.append(
            center=np.asarray(out.center)[idx],
            normal_sph=np.asarray(out.normal_sph)[idx],
            cam_mask=np.asarray(out.cam_mask)[idx],
            ref_cam=np.asarray(out.ref_cam)[idx],
            depth=np.asarray(out.depth)[idx],
            lod=np.asarray(out.lod)[idx],
            fitness=np.asarray(out.fitness)[idx],
            correlation=np.asarray(out.correlation)[idx],
            priority=np.asarray(out.priority)[idx],
            color=np.asarray(out.color)[idx],
            img_point=np.asarray(out.img_point)[idx],
            is_seed=np.full(len(idx), is_seed),
        )
        return ids

    def _update_neighbor_radius(self):
        nr = self.arena.neighbor_radius(self.cfg.neighbor_radius_scalar)
        if nr > 0:
            self.neighbor_radius = nr

    # ------------------------------------------------------------------
    # expansion
    # ------------------------------------------------------------------
    def _strategy_order(self, frontier: np.ndarray) -> np.ndarray:
        """Queue pop order over the frontier per the configured expansion
        strategy (MVS::getPatchIdFromQueue, mvs.cpp:632-788)."""
        cfg = self.cfg
        from pais_mvs_tpu import config as cfg_mod
        if cfg.expansion_strategy == cfg_mod.EXPANSION_WORST_FIRST:
            return np.argsort(-self.arena.data["priority"][frontier],
                              kind="stable")
        if cfg.expansion_strategy == cfg_mod.EXPANSION_BREADTH_FIRST:
            return np.arange(len(frontier))               # FIFO by id
        if cfg.expansion_strategy == cfg_mod.EXPANSION_DEPTH_FIRST:
            return np.arange(len(frontier))[::-1]         # LIFO by id
        # best-first: lowest priority first (mvs.cpp:656-693)
        return np.argsort(self.arena.data["priority"][frontier],
                          kind="stable")

    def _is_neighbor(self, c1, n1, c2, n2) -> np.ndarray:
        """Plane-to-plane distance test (Patch::isNeighbor, patch.cpp:6-23).
        Vectorized over leading dims of c2/n2."""
        d = c2 - c1
        dist = np.abs(d @ n1) + np.abs(np.sum(d * n2, axis=-1))
        return dist <= self.neighbor_radius

    def _skip_neighbor_cell(self, occupants: List[int], parent_id: int) -> bool:
        """MVS::skipNeighborCell (mvs.cpp:792-807)."""
        cfg = self.cfg
        a = self.arena
        if len(occupants) >= cfg.max_cell_patch_num:
            return True
        if not occupants:
            return False
        occ = np.asarray(occupants)
        occ = occ[a.alive[occ]]
        if len(occ) == 0:
            return False
        if np.any(a.data["correlation"][occ] > cfg.min_correlation):
            return True
        c1 = a.data["center"][parent_id]
        n1 = self.arena.normals([parent_id])[0]
        c2 = a.data["center"][occ]
        n2 = self.arena.normals(occ)
        return bool(np.any(self._is_neighbor(c1, n1, c2, n2)))

    def _expansion_centers(self, cams, cxs, cys, parent_ids) -> np.ndarray:
        """Ray through each cell center intersected with the parent plane
        (MVS::getExpansionPatchCenter, mvs.cpp:809-836). Vectorized."""
        cfg = self.cfg
        cams = np.asarray(cams)
        px = (np.asarray(cxs) + 0.5) * cfg.cell_size
        py = (np.asarray(cys) + 0.5) * cfg.cell_size
        f = self.np_focal[cams]
        pp = self.np_principal[cams]
        d_cam = np.stack([(px - pp[:, 0]) / f[:, 0],
                          (py - pp[:, 1]) / f[:, 1],
                          np.ones_like(px)], axis=-1)
        R = self.np_R[cams]
        v12 = np.einsum("nji,nj->ni", R, d_cam)       # R^T d (at depth 1)
        cc = self.np_center[cams]
        pc = self.arena.data["center"][parent_ids]
        pn = self.arena.normals(parent_ids)
        u = np.sum(pn * (pc - cc), axis=-1) / np.sum(pn * v12, axis=-1)
        return cc + u[:, None] * v12

    def _expand_visible_cameras(self, normals: np.ndarray,
                                parent_masks: np.ndarray) -> np.ndarray:
        """Patch::expandVisibleCamera (patch.cpp:723-761)."""
        cfg = self.cfg
        facing = -normals @ self.np_optical.T          # [N, C]
        mask = facing >= cfg.visible_correlation
        lacking = mask.sum(axis=1) < cfg.min_cam_num
        fallback = parent_masks & (facing >= cfg.visible_correlation / 2.0)
        mask[lacking] |= fallback[lacking]
        return mask

    def _grids_build(self):
        cls = (native_rt.NativeCellGrids if self.use_native else CellGrids)
        return cls.build(self.arena, self.widths, self.heights,
                         self.cfg.cell_size)

    def _insert_time_cell_filter(self, cam_mask, img_points) -> bool:
        """The cell-density clause of MVS::runtimeFiltering
        (mvs.cpp:877-895) applied at insertion time: reject when EVERY
        visible view's target cell is already full."""
        cfg = self.cfg
        if self.use_native:
            return self.grids.insert_time_filter(cam_mask, img_points,
                                                 cfg.max_cell_patch_num)
        full = 0
        cams = np.nonzero(cam_mask)[0]
        for cam in cams:
            cx, cy = self.grids.cell_of(img_points[cam])
            occ = self.grids.cell(int(cam), cx, cy)
            if len(occ) >= cfg.max_cell_patch_num:
                full += 1
        return full < len(cams)

    def _generate_candidates(self, parents):
        """Per-round candidate cells: (parent, cam, cx, cy) arrays after
        skipNeighborCell + the per-round cell budget (mvs.cpp:529-564,
        792-807). Native C++ fast path with a pure-Python mirror."""
        cfg = self.cfg
        a = self.arena
        if self.use_native:
            n = a.count
            return self.grids.candidates(
                parents, a.data["center"][:n], a.data["normal_sph"][:n],
                a.data["correlation"][:n], a.alive[:n],
                a.data["cam_mask"][:n], a.data["img_point"][:n],
                cfg.min_correlation, self.neighbor_radius,
                cfg.max_cell_patch_num)
        cand_parent, cand_cam, cand_cx, cand_cy = [], [], [], []
        seen_cells = {}
        for pid in parents:
            mask = a.data["cam_mask"][pid]
            ipts = a.data["img_point"][pid]
            for cam in np.nonzero(mask)[0]:
                cam = int(cam)
                cx, cy = self.grids.cell_of(ipts[cam])
                for nx, ny in ((cx - 1, cy), (cx, cy - 1),
                               (cx + 1, cy), (cx, cy + 1)):
                    if not self.grids.in_map(cam, nx, ny):
                        continue
                    occ = self.grids.cell(cam, nx, ny)
                    if self._skip_neighbor_cell(occ, int(pid)):
                        continue
                    key = (cam, nx, ny)
                    cnt = seen_cells.get(key, len(occ))
                    if cnt >= cfg.max_cell_patch_num:
                        continue
                    seen_cells[key] = cnt + 1
                    cand_parent.append(int(pid))
                    cand_cam.append(cam)
                    cand_cx.append(nx)
                    cand_cy.append(ny)
        return (np.asarray(cand_parent, dtype=np.int64),
                np.asarray(cand_cam, dtype=np.int32),
                np.asarray(cand_cx, dtype=np.int32),
                np.asarray(cand_cy, dtype=np.int32))

    def expand(self, max_rounds: int = 10_000,
               autosave_path: Optional[str] = None) -> int:
        """Wavefront expansion (MVS::expansionPatches, mvs.cpp:233-275).
        Returns total patch count.

        With ``cfg.pipeline_expansion`` the host candidate generation of
        round n+1 overlaps the device refine of round n: prepare(n+1) runs
        against the PRE-insert(n) grid while refine(n) is in flight, then
        insert(n) lands. Two bounded semantic shifts vs the serial loop
        (both of the same class as changing wavefront_size, which the
        reference treats as tunable): (a) patches inserted in round n join
        the frontier one round later; (b) candidates of round n+1 are
        generated against a grid missing round n's inserts — the
        insert-time live-grid re-check below restores the density/
        skipNeighborCell verdicts exactly, so only candidate *generation*
        sees stale counts (it may generate candidates a fresh insert would
        have suppressed; they die at insert time). Parity vs the
        non-pipelined path is CI-gated (tests/test_engine_e2e.py).
        """
        cfg = self.cfg
        a = self.arena
        self.grids = self._grids_build()
        self._update_neighbor_radius()
        t0 = time.time()
        total_refined = 0
        t_device = 0.0
        self._save_time = a.count // self.autosave_interval
        pipeline = cfg.pipeline_expansion

        def prepare():
            """Pop a wavefront and generate+prep its candidates. Returns
            None when the frontier is empty, "skip" for a consumed round
            with no refinable candidates, else the round dict."""
            frontier = a.live_ids()
            frontier = frontier[~a.expanded[frontier]]
            if len(frontier) == 0:
                return None
            order = self._strategy_order(frontier)
            parents = frontier[order][:cfg.wavefront_size]
            a.expanded[parents] = True

            # candidate generation over 4-neighbour cells of every view
            cand_parent, cand_cam, cand_cx, cand_cy = \
                self._generate_candidates(parents)
            if len(cand_parent) == 0:
                return "skip"

            centers = self._expansion_centers(cand_cam, cand_cx, cand_cy,
                                              cand_parent)
            normals = self.arena.normals(cand_parent)
            masks = self._expand_visible_cameras(
                normals, a.data["cam_mask"][cand_parent])
            ok = masks.sum(axis=1) >= cfg.min_cam_num
            ok &= np.all(np.isfinite(centers), axis=1)
            if not ok.any():
                return "skip"
            centers_k, normals_k, masks_k = centers[ok], normals[ok], \
                masks[ok]
            N = len(centers_k)
            C = self.scene.num_cameras
            pb = patch_mod.empty_batch(N, C)
            sph = np.stack([np.arccos(np.clip(normals_k[:, 2], -1, 1)),
                            np.arctan2(normals_k[:, 1], normals_k[:, 0])],
                           -1)
            pb = pb.replace(
                center=np.asarray(centers_k, dtype=np.float32),
                normal_sph=np.asarray(sph, dtype=np.float32),
                cam_mask=np.asarray(masks_k),
                valid=np.ones(N, dtype=bool))
            return dict(parents=parents, pb=jax.device_get(pb), N=N,
                        parents_kept=np.asarray(cand_parent)[ok],
                        cams_kept=np.asarray(cand_cam)[ok],
                        cx_kept=np.asarray(cand_cx)[ok],
                        cy_kept=np.asarray(cand_cy)[ok])

        def insert(prep, out, rnd, inflight_parents=None):
            """Sequential insert in STRATEGY-POP order: the cell-density
            clause AND the skipNeighborCell re-check both run against the
            live grid state (cells fill as we insert, exactly as in the
            reference's serial loop — without the re-check one wavefront
            round over-fills cells ~1.7x vs the serial oracle).
            Candidates already arrive grouped by parent in the strategy's
            pop order (cam-outer/offset-inner within a parent, matching
            mvs.cpp:535-549), so arrival order IS the serial order — a
            priority re-sort here would invert worst-first and scramble
            breadth/depth-first (for best-first the two coincide)."""
            keep = out.valid
            parents_kept = prep["parents_kept"]
            cams_kept = prep["cams_kept"]
            cx_kept = prep["cx_kept"]
            cy_kept = prep["cy_kept"]
            order = np.arange(len(parents_kept))
            if self.use_native:
                # one native pass decides + registers; rows then land in
                # the arena in the same order, so ids line up
                n_arena = a.count
                cm_all = np.ascontiguousarray(np.asarray(out.cam_mask))
                ip_all = np.ascontiguousarray(
                    np.asarray(out.img_point, dtype=np.float64))
                accept = self.grids.batch_insert(
                    order, keep, cm_all, ip_all,
                    parents_kept, cams_kept, cx_kept, cy_kept,
                    a.data["center"][:n_arena],
                    a.data["normal_sph"][:n_arena],
                    a.data["correlation"][:n_arena],
                    a.alive[:n_arena].astype(np.uint8),
                    np.asarray(out.center), np.asarray(out.normal_sph),
                    np.asarray(out.correlation),
                    cfg.min_correlation, self.neighbor_radius,
                    cfg.max_cell_patch_num, a.count)
                sel = order[accept[order]]
                self._append_rows(out, sel, is_seed=False)
                inserted = len(sel)
            else:
                inserted = 0
                for i in order:
                    if not keep[i]:
                        continue
                    cm = out.cam_mask[i]
                    ip = out.img_point[i]
                    if not self._insert_time_cell_filter(cm, ip):
                        continue
                    occ = [q for q in self.grids.cell(
                               int(cams_kept[i]), int(cx_kept[i]),
                               int(cy_kept[i])) if a.alive[q]]
                    if self._skip_neighbor_cell(occ, int(parents_kept[i])):
                        continue
                    ids = self._append_rows(out, np.asarray([i]),
                                            is_seed=False)
                    self.grids.insert_patch(int(ids[0]), cm, ip)
                    inserted += 1
            self._log(f"round {rnd}: {len(prep['parents'])} parents -> "
                      f"{prep['N']} candidates -> {inserted} inserted "
                      f"(total {len(a.live_ids())})")
            # autosave every 500 new patches (mvs.cpp:265-268), frontier
            # included via the sidecar. In pipelined mode the NEXT round's
            # parents are already popped (expanded=True) with their
            # children only in flight — checkpoint them UNEXPANDED so a
            # crash+resume re-pops them instead of silently losing their
            # subtrees ("this round never happened" is a consistent state;
            # the serial path can never write the inconsistent one).
            if autosave_path and \
                    a.count // self.autosave_interval > self._save_time:
                self._save_time = a.count // self.autosave_interval
                if inflight_parents is not None:
                    a.expanded[inflight_parents] = False
                self.save_checkpoint(autosave_path)
                if inflight_parents is not None:
                    a.expanded[inflight_parents] = True
                self._live_snapshot()

        pending = None              # (prep, handle, round#) awaiting insert
        rnd = 0
        while rnd < max_rounds:
            prep = prepare()
            if prep is None and pending is None:
                break
            handle = None
            t_disp = 0.0
            if isinstance(prep, dict):
                t_dev0 = time.time()
                handle = self._refine_all_async(prep["pb"], is_seed=False,
                                                rounds=1)
                t_disp = time.time() - t_dev0
                total_refined += prep["N"]
            if pending is not None:
                pprep, phandle, prnd = pending
                pending = None
                t_f0 = time.time()
                out, _ = self._refine_fetch(phandle)
                t_device += time.time() - t_f0
                insert(pprep, out, prnd,
                       inflight_parents=(prep["parents"]
                                         if isinstance(prep, dict)
                                         else None))
            if handle is not None:
                if pipeline:
                    pending = (prep, handle, rnd)
                else:
                    t_f0 = time.time()
                    out, _ = self._refine_fetch(handle)
                    t_device += time.time() - t_f0 + t_disp
                    insert(prep, out, rnd)
            rnd += 1
        if pending is not None:     # max_rounds hit with one in flight
            pprep, phandle, prnd = pending
            out, _ = self._refine_fetch(phandle)
            insert(pprep, out, prnd)
        self._update_neighbor_radius()
        wall = time.time() - t0
        self.stats["expansion_s"] = wall
        self.stats["expansion_device_s"] = round(t_device, 3)
        self.stats["expansion_host_s"] = round(wall - t_device, 3)
        self.stats["expansion_refined"] = total_refined
        self.stats["expansion_pps"] = round(
            total_refined / max(wall, 1e-9), 2)
        return len(a.live_ids())

    # ------------------------------------------------------------------
    # post filters (MVS::cellFiltering / visibilityFiltering /
    # neighborCellFiltering / neighborPatchFiltering, mvs.cpp:279-525)
    # ------------------------------------------------------------------
    def _ensure_grids(self):
        if self.grids is None:
            self._update_neighbor_radius()
            self.grids = self._grids_build()

    def _delete(self, pid: int):
        a = self.arena
        if self.grids is not None:
            self.grids.remove_patch(int(pid), a.data["cam_mask"][pid],
                                    a.data["img_point"][pid])
        a.delete(pid)

    def _native_kill(self, killed: np.ndarray) -> int:
        """Record natively-performed deletions (the C++ pass already
        removed them from the grid and flipped its alive copy)."""
        self.arena.delete(killed)
        return len(killed)

    def cell_filtering(self) -> int:
        """PMVS outlier rule: drop patch j in a cell when
        corr_j * camNum_j < sum of cellmates' correlations (mvs.cpp:279-325)."""
        self._ensure_grids()
        a = self.arena
        if self.use_native:
            n = a.count
            killed = self.grids.cell_filter(
                self.grids.all_keys(), a.data["correlation"][:n],
                a.data["cam_mask"][:n], a.data["img_point"][:n],
                a.alive[:n].astype(np.uint8))
            removed = self._native_kill(killed)
            self._log(f"cellFiltering removed {removed}")
            return removed
        removed = 0
        for key in self.grids.all_keys():
            occ = [p for p in self.grids.cell(*key) if a.alive[p]]
            if len(occ) < 2:
                continue
            corr = a.data["correlation"][occ]
            camn = a.data["cam_mask"][occ].sum(axis=1)
            tot = corr.sum()
            kill = [p for p, c, k in zip(occ, corr, camn)
                    if c * k < tot - c]
            for p in kill:
                self._delete(p)
                removed += 1
        self._log(f"cellFiltering removed {removed}")
        return removed

    def visibility_filtering(self) -> int:
        """Depth-ordering consistency per view (mvs.cpp:399-446)."""
        self._ensure_grids()
        a = self.arena
        cfg = self.cfg
        if self.use_native:
            n = a.count
            killed = self.grids.visibility_filter(
                a.live_ids(), a.data["center"][:n], self.np_center,
                a.data["cam_mask"][:n], a.data["img_point"][:n],
                a.alive[:n].astype(np.uint8), cfg.min_cam_num)
            removed = self._native_kill(killed)
            self._log(f"visibilityFiltering removed {removed}")
            return removed
        removed = 0
        for pid in a.live_ids():
            mask = a.data["cam_mask"][pid]
            ipts = a.data["img_point"][pid]
            center = a.data["center"][pid]
            cams = np.nonzero(mask)[0]
            visible = len(cams)
            for cam in cams:
                cam = int(cam)
                depth = np.linalg.norm(center - self.np_center[cam])
                cx, cy = self.grids.cell_of(ipts[cam])
                for q in self.grids.cell(cam, cx, cy):
                    if q == pid or not a.alive[q]:
                        continue
                    nd = np.linalg.norm(a.data["center"][q]
                                        - self.np_center[cam])
                    if depth > nd:
                        visible -= 1
                        break
            if visible < cfg.min_cam_num:
                self._delete(pid)
                removed += 1
        self._log(f"visibilityFiltering removed {removed}")
        return removed

    def neighbor_cell_filtering(self, neighbor_ratio: float) -> int:
        """3x3-cell neighbourhood support ratio (mvs.cpp:327-397)."""
        self._ensure_grids()
        a = self.arena
        if self.use_native:
            n = a.count
            killed = self.grids.neighbor_cell_filter(
                self.grids.all_keys(), a.data["center"][:n],
                a.data["normal_sph"][:n], a.data["cam_mask"][:n],
                a.data["img_point"][:n], a.alive[:n].astype(np.uint8),
                self.neighbor_radius, neighbor_ratio)
            removed = self._native_kill(killed)
            self._log(f"neighborCellFiltering removed {removed}")
            return removed
        removed = 0
        for key in self.grids.all_keys():
            cam, x, y = key
            occ = [p for p in self.grids.cell(*key) if a.alive[p]]
            kill = []
            for pid in occ:
                c1 = a.data["center"][pid]
                n1 = a.normals([pid])[0]
                nsum = 0
                nnum = 0
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        nx, ny = x + dx, y + dy
                        if not self.grids.in_map(cam, nx, ny):
                            continue
                        cell = [q for q in self.grids.cell(cam, nx, ny)
                                if a.alive[q]]
                        nsum += len(cell)
                        if cell:
                            c2 = a.data["center"][cell]
                            n2 = a.normals(cell)
                            nnum += int(self._is_neighbor(c1, n1, c2, n2)
                                        .sum())
                if nsum and nnum / nsum < neighbor_ratio:
                    kill.append(pid)
            for p in kill:
                self._delete(p)
                removed += 1
        self._log(f"neighborCellFiltering removed {removed}")
        return removed

    def neighbor_patch_filtering(self, neighbor_ratio: float) -> int:
        """PCMVS density rule: drop patches with fewer Euclidean neighbours
        (within neighborRadius) than avg * ratio (mvs.cpp:448-525).
        Implemented as chunked pairwise distances (the reference is an
        O(N^2) OMP loop)."""
        self._ensure_grids()
        a = self.arena
        ids = a.live_ids()
        if len(ids) == 0:
            return 0
        if self.use_native:
            counts = native_rt.neighbor_counts(a.data["center"], ids,
                                               self.neighbor_radius)
        else:
            centers = a.data["center"][ids]
            N = len(ids)
            counts = np.zeros(N, dtype=np.int64)
            chunk = max(1, int(2e7 / max(N, 1)))
            for s in range(0, N, chunk):
                d = np.linalg.norm(centers[s:s + chunk, None, :]
                                   - centers[None, :, :], axis=-1)
                counts[s:s + chunk] = \
                    (d <= self.neighbor_radius).sum(axis=1) - 1
        avg = counts.mean()
        kill = ids[counts < avg * neighbor_ratio]
        for p in kill:
            self._delete(p)
        self._log(f"neighborPatchFiltering removed {len(kill)} "
                  f"(avg neighbours {avg:.2f})")
        return len(kill)

    def run_filters(self, ratio: float = 0.25) -> None:
        """The reference ``-f`` pipeline (TMVS.cpp:124-172)."""
        self.cell_filtering()
        self.visibility_filtering()
        self.neighbor_cell_filtering(ratio)
        self.arena.deleted_ids.clear()
        self.neighbor_patch_filtering(ratio)

    # ------------------------------------------------------------------
    # export
    # ------------------------------------------------------------------
    def patch_data(self, deleted: bool = False) -> MvsPatchData:
        a = self.arena
        if deleted:
            ids = np.asarray(a.deleted_ids, dtype=np.int64)
        else:
            ids = a.live_ids()
        return MvsPatchData(
            centers=a.data["center"][ids],
            normal_sph=a.data["normal_sph"][ids],
            cam_masks=a.data["cam_mask"][ids],
            fitness=a.data["fitness"][ids],
            correlation=a.data["correlation"][ids])

    def live_centers(self) -> np.ndarray:
        return self.arena.data["center"][self.arena.live_ids()]

    def write_mvs(self, path: str, deleted: bool = False) -> None:
        write_mvs(path, self.cfg, self.params, self.patch_data(deleted))

    # ------------------------------------------------------------------
    # checkpoint / resume (SURVEY §5.4): the .mvs is the reference's
    # checkpoint but cannot carry the expansion frontier — the reference
    # restarts expansion ordering from scratch on resume. The sidecar
    # .state.npz captures the FULL arena (expanded flags, deleted archive,
    # neighborRadius), so resume continues exactly where the run stopped.
    # ------------------------------------------------------------------
    def save_checkpoint(self, mvs_path: str) -> None:
        import os
        self.write_mvs(mvs_path)
        a = self.arena
        n = a.count
        state = {f"d_{k}": v[:n] for k, v in a.data.items()}
        # distributed refine-exactly-once bookkeeping: re-queued parents'
        # consumed candidates must survive a mid-expansion resume, or a
        # resumed run re-refines them (the divergence cand_done closes)
        cd = getattr(self, "_dist_cand_done", None) or {}
        if cd:
            ids = sorted(cd.keys())
            state["cand_done_ids"] = np.asarray(ids, np.int64)
            state["cand_done_masks"] = np.stack([cd[i] for i in ids])
        # write-then-rename: a crash mid-save must never leave a truncated
        # sidecar that poisons the next resume
        tmp = mvs_path + f".state.npz.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            np.savez_compressed(
                fh, count=np.asarray(n), alive=a.alive[:n],
                expanded=a.expanded[:n],
                deleted_ids=np.asarray(a.deleted_ids, dtype=np.int64),
                neighbor_radius=np.asarray(self.neighbor_radius), **state)
        os.replace(tmp, mvs_path + ".state.npz")

    def load_checkpoint(self, mvs_path: str) -> bool:
        """Restore the arena from ``mvs_path + '.state.npz'`` if present and
        readable. Returns True when resumed (the .mvs itself is then
        redundant); a corrupt sidecar is reported and ignored so the caller
        falls back to the .mvs patches."""
        path = mvs_path + ".state.npz"
        import os
        import zipfile
        if not os.path.exists(path):
            return False
        a = self.arena
        # materialize EVERY array inside the try: a sidecar that opens but
        # has a truncated/corrupt member must not leave the arena
        # half-mutated (the fallback-to-.mvs contract)
        try:
            st = np.load(path)
            n = int(st["count"])
            fields = {k: np.asarray(st[f"d_{k}"]) for k in a.data}
            alive = np.asarray(st["alive"])
            expanded = np.asarray(st["expanded"])
            deleted_ids = [int(i) for i in st["deleted_ids"]]
            neighbor_radius = float(st["neighbor_radius"])
            if "cand_done_ids" in st.files:
                cand_done = {int(i): np.asarray(m) for i, m in
                             zip(st["cand_done_ids"],
                                 st["cand_done_masks"])}
            else:
                cand_done = {}
            for k, v in fields.items():
                if v.shape[0] != n:
                    raise ValueError(f"field {k} has {v.shape[0]} rows, "
                                     f"expected {n}")
            if alive.shape[0] != n or expanded.shape[0] != n:
                raise ValueError("alive/expanded length mismatch")
        except (OSError, ValueError, KeyError, zipfile.BadZipFile) as e:
            if self.logger is not None:
                self.logger.warning(f"ignoring corrupt checkpoint sidecar "
                                    f"{path}: {e}")
            return False
        a._grow(max(n, 1))
        a.count = n
        for k in a.data:
            a.data[k][:n] = fields[k]
        a.alive[:n] = alive
        a.expanded[:n] = expanded
        a.deleted_ids = deleted_ids
        self.neighbor_radius = neighbor_radius
        self._dist_cand_done = cand_done
        self.grids = None
        self._log(f"resumed checkpoint {path}: {n} patches "
                  f"({int(a.alive[:n].sum())} live, "
                  f"{int((~a.expanded[:n] & a.alive[:n]).sum())} frontier)")
        return True

    def _live_snapshot(self) -> None:
        """Offline-honest analog of the reference's live-viewer hook
        ``addPatchView`` (TMVS/mvs/mvs.h:12, TMVS.cpp:20-24, called on
        every accepted patch at mvs/mvs.cpp:223,600): when
        ``live_snapshot_dir`` is set (CLI ``--live-snapshots``), each
        autosave also refreshes ``live_snapshot.ply`` with the current
        cloud, so a long reconstruction can be watched mid-flight with
        any file-watching point-cloud viewer."""
        if not self.live_snapshot_dir:
            return
        import os
        tmp = os.path.join(self.live_snapshot_dir, ".live_snapshot.tmp")
        dst = os.path.join(self.live_snapshot_dir, "live_snapshot.ply")
        self.write_ply(tmp)
        os.replace(tmp, dst)       # atomic: a watcher never sees a torn file

    def write_ply(self, path: str, deleted: bool = False) -> None:
        a = self.arena
        ids = (np.asarray(a.deleted_ids, dtype=np.int64) if deleted
               else a.live_ids())
        write_ply(path, a.data["center"][ids], a.normals(ids),
                  a.data["color"][ids])

    def write_psr(self, path: str) -> None:
        ids = self.arena.live_ids()
        write_psr(path, self.arena.data["center"][ids],
                  self.arena.normals(ids))


def _expand_distributed(self, mesh=None, max_rounds: int = 10_000,
                        per_shard: int = 256, refine_budget=None,
                        autosave_path=None) -> int:
    """SPMD wavefront expansion over a cell-slab device mesh (the
    multi-device counterpart of ``expand``; BASELINE config 5).

    Each round orders the frontier by the configured expansion strategy,
    bins parents by reference-view cell column (shard ownership), and runs
    ``parallel.expansion.expand_step`` — all-view candidate generation,
    full three-clause skipNeighborCell against the exchanged cellmate
    state, plane intersection, batched refine, insert-time re-check and
    occupancy update all on-device — then merges the accepted patches back
    into the arena. Parents whose candidates were deferred by the refine
    budget are re-queued — EXCEPT when the stall guard fires (two
    consecutive spill rounds with zero inserts: the occupancy cannot have
    changed, so an identical frontier would re-spill to max_rounds), which
    drops that round's deferred candidates and logs it. That guard is the
    one bounded departure from the reference's never-drop queue.
    See parallel/expansion.py for the semantics map vs
    mvs.cpp:529-601/792-898; the insert-time re-check is an exact
    serial-loop mirror (insert_fixpoint, bit-parity-tested against a
    serial simulation in tests/test_insert_fixpoint.py).
    """
    import jax
    import math as _math
    from pais_mvs_tpu.parallel.expansion import build_occupancy, expand_step
    from pais_mvs_tpu.parallel.mesh import make_mesh

    cfg = self.cfg
    a = self.arena
    if mesh is None:
        n = max(jax.local_device_count(), 1)
        mesh = make_mesh((n, 1))
    S = mesh.shape["patch"]
    if refine_budget is None:
        refine_budget = 8 * per_shard

    cell = cfg.cell_size
    C_cams = a.num_cams
    cam_cells = np.stack(
        [np.asarray([_math.ceil(w / cell) for w in self.widths], np.int32),
         np.asarray([_math.ceil(h / cell) for h in self.heights], np.int32)],
        axis=-1)                                              # [C, 2]
    gw_cells = int(cam_cells[:, 0].max())
    gh_cells = int(cam_cells[:, 1].max())
    slab = max(1, _math.ceil(gw_cells / S))

    # per-camera occupancy: counts AND cellmate state (center/normal/
    # correlation) for the correlation + isNeighbor skip clauses
    self._update_neighbor_radius()
    occ_np, ost_np = build_occupancy(a, cell, cam_cells, slab, S, gh_cells,
                                     cfg.max_cell_patch_num)
    occ = jnp.asarray(occ_np)
    ost = jnp.asarray(ost_np)
    cam_cells_j = jnp.asarray(cam_cells)

    t0 = time.time()
    total_inserted = 0
    total_spilled = 0
    stall_rounds = 0
    # per-parent record of candidates that already SPENT their one refine
    # in a spilled round (reference pops refine each candidate exactly
    # once, mvs.cpp:632-788): fed back into expand_step as ``cand_done``
    # so a re-queued parent never re-refines them. Only spilled parents
    # ever hold an entry; cleared once the parent stays expanded. Kept on
    # self and checkpointed so a mid-expansion resume stays exact.
    cand_done = getattr(self, "_dist_cand_done", None)
    if cand_done is None:
        cand_done = {}
    self._dist_cand_done = cand_done
    self._dist_save_time = a.count // self.autosave_interval
    for rnd in range(max_rounds):
        frontier = a.live_ids()
        frontier = frontier[~a.expanded[frontier]]
        if len(frontier) == 0:
            break
        order = self._strategy_order(frontier)
        ordered = frontier[order]                             # strategy order
        refc = a.data["ref_cam"][ordered].astype(np.int32)
        ipts = a.data["img_point"][ordered, refc]             # [N, 2]
        owner = np.clip((ipts[:, 0] / cell).astype(int) // slab, 0, S - 1)

        # vectorized shard packing: rank of each parent within its shard
        # (strategy order preserved — ``ordered`` is already sorted, and
        # the stable owner sort keeps it within each shard's run)
        by_owner = np.argsort(owner, kind="stable")
        starts = np.searchsorted(owner[by_owner], np.arange(S))
        rank = np.arange(len(ordered)) - np.repeat(
            starts, np.diff(np.r_[starts, len(ordered)]))
        sel = by_owner[rank < per_shard]                      # kept rows
        slot = owner[sel] * per_shard + rank[rank < per_shard]

        N = S * per_shard
        centers = np.zeros((N, 3), np.float32)
        normals = np.zeros((N, 3), np.float32)
        orank = np.full(N, 1e30, np.float32)
        valid = np.zeros(N, bool)
        pmask = np.zeros((N, C_cams), bool)
        taken = ordered[sel]
        centers[slot] = a.data["center"][taken]
        normals[slot] = a.normals(taken)
        # the strategy-order position doubles as the device-side serial
        # rank for every cell-budget decision. Renumber to the rank WITHIN
        # the taken subset (same order, values < S*per_shard): the device
        # key cord = orank*(4C+1)+sub is float32, and full-frontier
        # positions would lose integer exactness past 2^24/(4C+1) parents
        rank_in_taken = np.empty(len(sel), np.float32)
        rank_in_taken[np.argsort(sel, kind="stable")] = \
            np.arange(len(sel), dtype=np.float32)
        orank[slot] = rank_in_taken
        valid[slot] = True
        pmask[slot] = a.data["cam_mask"][taken]
        if len(taken) == 0:
            break
        a.expanded[taken] = True
        pdone = np.zeros((N, 4 * C_cams), bool)
        if cand_done:
            for j, pid in enumerate(taken):
                dm = cand_done.get(int(pid))
                if dm is not None:
                    pdone[slot[j]] = dm

        # split (not fold_in) so a resumed/repeated expansion never
        # replays the same PSO stream (ADVICE r1)
        self.key, sub = jax.random.split(self.key)
        out_pb, accepted, occ, ost, spilled, sp_par, ref_cand = expand_step(
            self.scene, cfg, jnp.asarray(centers), jnp.asarray(normals),
            jnp.asarray(orank), jnp.asarray(valid), jnp.asarray(pmask),
            occ, ost, cam_cells_j, self.neighbor_radius, sub,
            mesh, slab, gh_cells, cap_per=cfg.max_cell_patch_num,
            refine_budget=refine_budget, cand_done=jnp.asarray(pdone))
        acc = np.asarray(accepted)
        if acc.any():
            outs = jax.device_get(out_pb)
            self._append_to_arena(outs, acc, is_seed=False)
            total_inserted += int(acc.sum())
        n_spill = int(np.asarray(spilled)[0])
        total_spilled += n_spill
        requeued = False
        requeue = np.empty(0, np.int64)
        if n_spill:
            # re-queue the parents of budget-deferred candidates so they
            # regenerate next round (the reference's queue never drops a
            # candidate, mvs.cpp:632-788). skipNeighborCell prunes the
            # regenerated ones whose cells filled meanwhile. Stop after 2
            # consecutive zero-insert rounds: an insertion-free round
            # leaves the occupancy unchanged, so an identically-spilling
            # frontier would loop to max_rounds without progress — the
            # stall guard then DROPS that round's deferred candidates
            # (the one bounded departure from the never-drop queue; it
            # is logged as 'dropped (stall guard)' when it fires).
            stall_rounds = stall_rounds + 1 if not acc.any() else 0
            if stall_rounds < 2:
                sp = np.asarray(sp_par)                       # [N] by slot
                requeue = taken[sp[slot]]
                a.expanded[requeue] = False
                requeued = True
        else:
            stall_rounds = 0
        # refine-exactly-once bookkeeping: re-queued parents accumulate
        # this round's consumed candidates; parents that stay expanded
        # release their record
        rc = np.asarray(ref_cand)                             # [N, 4C]
        requeue_set = set(int(p) for p in requeue)
        for j, pid in enumerate(taken):
            pid = int(pid)
            if pid in requeue_set:
                prev = cand_done.get(pid)
                cand_done[pid] = (rc[slot[j]] if prev is None
                                  else prev | rc[slot[j]])
            else:
                cand_done.pop(pid, None)
        self._log(f"dist round {rnd}: {len(taken)} parents"
                  f" -> {int(acc.sum())} inserted"
                  f" (total {len(a.live_ids())})"
                  + (f" [refine-budget spill {n_spill}, "
                     f"{'re-queued' if requeued else 'dropped (stall guard)'}]"
                     if n_spill else ""))
        # zero-accept rounds still make progress: the taken parents are
        # marked expanded, so the frontier drains and the top-of-loop
        # check terminates
        if autosave_path and \
                a.count // self.autosave_interval > self._dist_save_time:
            self._dist_save_time = a.count // self.autosave_interval
            self.save_checkpoint(autosave_path)
            self._live_snapshot()
    else:
        # range exhausted (not frontier-drained): a round cap that leaves
        # live unexpanded parents must be LOUD, or a truncated cloud looks
        # like a finished run
        left = a.live_ids()
        left = int((~a.expanded[left]).sum())
        if left:
            self._log(f"WARNING: expand_distributed stopped at the "
                      f"max_rounds={max_rounds} cap with {left} unexpanded "
                      f"frontier patches remaining — the cloud is truncated "
                      f"(raise max_rounds / per_shard to finish)")
    self.grids = None          # host grids rebuilt lazily for the filters
    self.stats["dist_expansion_s"] = time.time() - t0
    self.stats["dist_inserted"] = total_inserted
    self.stats["dist_spilled"] = total_spilled
    return len(a.live_ids())


Reconstructor.expand_distributed = _expand_distributed
