"""Sequential NumPy oracle of the reference pipeline's per-patch cost.

Two jobs:
  1. **Baseline measurement** — the reference publishes no numbers
     (BASELINE.md), so the CPU figure to beat is measured here: a faithful
     one-patch-at-a-time refine loop with TMVS semantics (one GLN-PSO swarm
     per patch, fitness vectorized over the particle set — the moral
     equivalent of the reference's OpenMP-over-particles C++,
     TMVS/pso/psosolver.cpp:113-122).
  2. **Semantic cross-check** — an independent implementation of the
     fitness kernel for parity tests against the JAX path.

Deliberately NumPy-only: no jax imports, runs anywhere.
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np

from pais_mvs_tpu.config import MvsConfig


class NpScene:
    """Minimal camera + pyramid container for the oracle."""

    def __init__(self, params, images, cfg: MvsConfig):
        from pais_mvs_tpu.ops import pyramid as pyr
        C = len(params)
        self.cfg = cfg
        self.R = np.zeros((C, 3, 3))
        self.T = np.zeros((C, 3))
        self.center = np.zeros((C, 3))
        self.focal = np.zeros((C, 2))
        self.principal = np.zeros((C, 2))
        self.optical = np.zeros((C, 3))
        self.levels = []
        self.edge_levels = []
        self.max_lod = np.zeros(C, dtype=int)
        for i, (p, img) in enumerate(zip(params, images)):
            h, w = img.shape[:2]
            from pais_mvs_tpu.models.camera import _np_quat_to_rotation
            R = _np_quat_to_rotation(np.asarray(p.quaternion, float))
            self.R[i] = R
            self.center[i] = p.center
            self.T[i] = -R @ np.asarray(p.center, float)
            self.focal[i] = p.focal
            pp = np.asarray(p.principal, float)
            if pp[0] < 0 and pp[1] < 0:
                pp = np.array([w >> 1, h >> 1], float)
            self.principal[i] = pp
            self.optical[i] = R.T @ np.array([0.0, 0.0, 1.0])
            gray = pyr.rgb_to_gray(img)
            ml = pyr.max_lod_for(w, h, cfg.lod_ratio, cfg.max_lod)
            self.max_lod[i] = ml
            lv, ed, _ = pyr.build_pyramid(gray, cfg.lod_ratio, ml)
            self.levels.append(lv)
            self.edge_levels.append(ed)

    def project(self, cam: int, X, lod_scale: float = 1.0):
        xc = X @ self.R[cam].T + self.T[cam]
        xy = (xc[..., :2] / xc[..., 2:3] * self.focal[cam]
              + self.principal[cam]) * lod_scale
        return xy, xc[..., 2]


def _dist_weight(cfg: MvsConfig) -> np.ndarray:
    r = cfg.patch_radius
    ax = np.arange(-r, r + 1, dtype=np.float64)
    dx, dy = np.meshgrid(ax, ax, indexing="ij")
    g = np.exp(-(dx ** 2 + dy ** 2) / (2 * cfg.dist_weighting ** 2))
    g /= (2 * np.pi * cfg.dist_weighting ** 2)
    return (g / g.sum()).ravel()


def fitness_np(scene: NpScene, cfg: MvsConfig, ref_cam: int, cam_idx,
               lod: int, ray, pos) -> np.ndarray:
    """Vectorized-over-particles TMVS fitness (patch.cpp:914-1047).

    pos: [P, 3] (theta, phi, depth). Returns [P]."""
    P = pos.shape[0]
    big = 1e30
    out = np.full(P, big)
    st = np.sin(pos[:, 0])
    normal = np.stack([st * np.cos(pos[:, 1]), st * np.sin(pos[:, 1]),
                       np.cos(pos[:, 0])], -1)                  # [P, 3]
    ok = normal @ scene.optical[ref_cam] <= 0
    center = ray[None] * pos[:, 2:3] + scene.center[ref_cam]   # [P, 3]
    s = cfg.lod_ratio ** lod
    r = cfg.patch_radius

    # homography via the reference-camera-frame parameterization
    Rr = scene.R[ref_cam]
    n_r = normal @ Rr.T
    X_r = center @ Rr.T + scene.T[ref_cam]
    d_r = np.sum(n_r * X_r, -1)
    ok &= np.abs(d_r) > 1e-12

    pt, z = scene.project(ref_cam, center, s)                  # [P, 2]
    img_ref = scene.levels[ref_cam][lod]
    hh, ww = img_ref.shape
    ok &= (pt[:, 0] - r >= 2) & (pt[:, 0] + r < ww - 3) & \
          (pt[:, 1] - r >= 2) & (pt[:, 1] + r < hh - 3) & (z > 0)

    ax = np.arange(-r, r + 1, dtype=np.float64)
    dxg, dyg = np.meshgrid(ax, ax, indexing="ij")
    offs = np.stack([dxg.ravel(), dyg.ravel()], -1)            # [W2, 2]
    W2 = offs.shape[0]
    dw = _dist_weight(cfg)

    cams = list(cam_idx)
    K = len(cams)
    for p in range(P):
        if not ok[p]:
            continue
        win = pt[p][None] + offs                               # [W2, 2]
        ref_i = img_ref[np.round(win[:, 1]).astype(int),
                        np.round(win[:, 0]).astype(int)]
        fgm = ref_i != 0
        vals = np.zeros((W2, K))
        bad = False
        for k, cam in enumerate(cams):
            if cam == ref_cam:
                H = np.eye(3)
            else:
                R_rel = scene.R[cam] @ Rr.T
                t_rel = scene.T[cam] - R_rel @ scene.T[ref_cam]
                M = R_rel + np.outer(t_rel, n_r[p]) / d_r[p]
                f_t, pp_t = scene.focal[cam], scene.principal[cam]
                LK_t = np.array([[s * f_t[0], 0, s * pp_t[0]],
                                 [0, s * f_t[1], s * pp_t[1]], [0, 0, 1.0]])
                f_r, pp_r = scene.focal[ref_cam], scene.principal[ref_cam]
                LK_r_inv = np.array([
                    [1 / (s * f_r[0]), 0, -pp_r[0] / f_r[0]],
                    [0, 1 / (s * f_r[1]), -pp_r[1] / f_r[1]], [0, 0, 1.0]])
                H = LK_t @ M @ LK_r_inv
            w = H[2, 0] * win[:, 0] + H[2, 1] * win[:, 1] + H[2, 2]
            u = (H[0, 0] * win[:, 0] + H[0, 1] * win[:, 1] + H[0, 2]) / w
            v = (H[1, 0] * win[:, 0] + H[1, 1] * win[:, 1] + H[1, 2]) / w
            img = scene.levels[cam][lod]
            ih, iw = img.shape
            inb = (u >= 2) & (u < iw - 3) & (v >= 2) & (v < ih - 3) & (w != 0)
            if not np.all(inb | ~fgm):
                bad = True
                break
            x0 = np.floor(u).astype(int)
            y0 = np.floor(v).astype(int)
            x0c = np.clip(x0, 0, iw - 2)
            y0c = np.clip(y0, 0, ih - 2)
            fx = u - x0
            fy = v - y0
            vals[:, k] = (img[y0c, x0c] * (1 - fx) * (1 - fy)
                          + img[y0c, x0c + 1] * fx * (1 - fy)
                          + img[y0c + 1, x0c] * (1 - fx) * fy
                          + img[y0c + 1, x0c + 1] * fx * fy)
        if bad:
            continue
        mean = vals.mean(axis=1)
        sad = np.abs(vals - mean[:, None]).mean(axis=1)
        weight = np.ones(W2)
        if cfg.adaptive_distance_enable:
            weight = weight * dw
        if cfg.adaptive_difference_enable:
            weight = weight * np.exp(-sad * sad / cfg.diff_weighting)
        if cfg.adaptive_gradient_enable:
            e = scene.edge_levels[ref_cam][lod][
                np.round(win[:, 1]).astype(int),
                np.round(win[:, 0]).astype(int)]
            weight = weight * np.exp(-1.0 / np.maximum(
                e * cfg.gradient_weighting, 1e-20))
        weight = weight * fgm
        sw = weight.sum()
        if sw > 0:
            out[p] = float((weight * sad).sum() / sw)
    return out


def pso_refine_one(scene: NpScene, cfg: MvsConfig, rng, ref_cam: int,
                   cam_idx, lod: int, ray, sph0, depth0, depth_range,
                   seed_patch: bool = True) -> Tuple[np.ndarray, float, int]:
    """One patch's GLN-PSO run with reference hyper-parameters
    (psosolver.cpp; patch.cpp:180-219). Returns (gbest, fitness, iters)."""
    P = cfg.particle_num * (2 if seed_patch else 1)
    iters = cfg.max_iteration * (2 if seed_patch else 1)
    lo = np.array([0.0, sph0[1] - np.pi / 2, depth_range[0]])
    hi = np.array([np.pi, sph0[1] + np.pi / 2, depth_range[1]])
    inter = hi - lo
    pos = lo + inter * rng.uniform(size=(P, 3))
    vel = inter * (2 * rng.uniform(size=(P, 3)) - 1)
    pos[0] = (sph0[0], sph0[1], depth0)
    fit = fitness_np(scene, cfg, ref_cam, cam_idx, lod, ray, pos)
    pbest = pos.copy()
    pfit = fit.copy()
    gi = int(np.argmin(pfit))
    gbest, gfit = pbest[gi].copy(), float(pfit[gi])
    iw = 0.8
    it = 0
    for it in range(iters):
        disp = np.mean(np.abs(pos - gbest))
        vidx = np.mean(np.abs(vel))
        if disp < 0.01 and vidx < 0.01:
            break
        # lBest / nBest (GLN)
        d2 = ((pbest[:, None, :] - pbest[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        lbest = np.zeros_like(pos)
        nbest = np.zeros_like(pos)
        for i in range(P):
            nn = np.argsort(d2[i])[:min(5, P)]
            lbest[i] = pbest[nn[np.argmin(pfit[nn])]]
            with np.errstate(divide="ignore", invalid="ignore"):
                fdr = (fit[i] - pfit[None, :]) / np.abs(
                    pos[i][:, None] - pbest.T)
            fdr[:, i] = -np.inf
            fdr = np.where(np.isnan(fdr), -np.inf, fdr)
            nbest[i] = pbest[np.argmax(fdr, axis=1), np.arange(3)]
        rp = 1.2 * rng.uniform(size=(P, 1))
        rg = 1.5 * rng.uniform(size=(P, 1))
        rl = 1.0 * rng.uniform(size=(P, 1))
        rn = 1.0 * rng.uniform(size=(P, 1))
        vel = iw * vel + rp * (pbest - pos) + rg * (gbest[None] - pos) \
            + rl * (lbest - pos) + rn * (nbest - pos)
        pos = np.clip(pos + vel, lo, hi)
        fit = fitness_np(scene, cfg, ref_cam, cam_idx, lod, ray, pos)
        upd = fit < pfit
        pbest[upd] = pos[upd]
        pfit[upd] = fit[upd]
        gi = int(np.argmin(pfit))
        if pfit[gi] < gfit:
            gbest, gfit = pbest[gi].copy(), float(pfit[gi])
        iw = max(iw - 1.0 / iters, 0.4)
    return gbest, gfit, it + 1


def measure_cpu_patches_per_sec(num_patches: int = 8, width: int = 640,
                                height: int = 480, seed: int = 0,
                                cfg: MvsConfig | None = None) -> dict:
    """Time the sequential per-patch refine on the pawn-shaped workload
    (README config.txt: radius 15, 15 particles, 30 iterations; seeds 2x)."""
    from pais_mvs_tpu.data.synthetic import make_scene
    cfg = cfg or MvsConfig(particle_num=15, max_iteration=30,
                           dist_weighting=5.0)
    sc = make_scene(num_cams=5, width=width, height=height,
                    num_seeds=num_patches + 8, seed=seed)
    scene = NpScene(sc.params, sc.images, cfg)
    rng = np.random.default_rng(seed)
    n_true = sc.plane_normal
    sph = np.array([np.arccos(n_true[2]), np.arctan2(n_true[1], n_true[0])])
    t0 = time.time()
    done = 0
    for m in range(num_patches):
        c = sc.seed_centers[m]
        ref = 2
        ray = c - scene.center[ref]
        depth = float(np.linalg.norm(ray))
        ray = ray / depth
        pso_refine_one(scene, cfg, rng, ref, list(range(5)), 0, ray,
                       sph + rng.normal(scale=0.2, size=2),
                       depth + rng.normal(scale=0.02),
                       (depth - 0.1, depth + 0.1), seed_patch=True)
        done += 1
    dt = time.time() - t0
    return {"patches": done, "seconds": dt, "patches_per_sec": done / dt}


if __name__ == "__main__":
    import json
    r = measure_cpu_patches_per_sec()
    print(json.dumps(r))
