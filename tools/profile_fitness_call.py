"""Decompose one patch_fitness_pallas call: prep pieces vs the kernel.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_fitness_call.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models import patch as patch_mod
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import lifecycle as lc
from pais_mvs_tpu.ops import fitness as F
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops import pallas_fitness as pf

B, P = 1024, 30


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return dt


def main():
    cfg = MvsConfig(particle_num=15, max_iteration=30, dist_weighting=5.0,
                    batch_size=B, max_lod=6)
    sc = make_scene(num_cams=5, width=640, height=480, num_seeds=B + 64,
                    seed=0)
    scene = build_scene(sc.params, sc.images, cfg)
    rig, pyrs = scene.rig, scene.pyramids
    C = rig.num_cameras
    r = cfg.patch_radius
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    centers = sc.seed_centers[:B] + rng.normal(scale=0.01, size=(B, 3))
    pb = patch_mod.from_seeds(centers, sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    normal0 = pf.geom.spherical_to_normal(pb.normal_sph)
    ref_cam = lc.set_reference_camera(scene, normal0, pb.cam_mask)
    depth, ray = lc.set_depth_and_ray(scene, pb.center, ref_cam)
    lod = lc.set_lod(scene, cfg, pb.center, ref_cam)
    sph = pb.normal_sph
    k = jax.random.PRNGKey(1)
    noise = jax.random.normal(k, (B, P, 3)) * jnp.array([0.1, 0.1, 0.0])
    pos = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)[:, None, :] + noise
    cam_mask = pb.cam_mask
    active = jnp.ones((B,), bool)

    # full call
    timeit("patch_fitness_pallas (full)", jax.jit(
        lambda pos: pf.patch_fitness_pallas(
            scene, cfg, ref_cam, cam_mask, lod, ray, pos, active=active)),
        pos)

    # sort only
    def f_sort(pos):
        order = jnp.argsort(pos[..., 2], axis=1)
        ps = jnp.take_along_axis(pos, order[..., None], axis=1)
        return ps[..., 0] + jnp.argsort(order, axis=1)
    timeit("argsort x2 + take", jax.jit(f_sort), pos)

    # homographies
    lod_scale = jnp.power(jnp.float32(cfg.lod_ratio), lod.astype(jnp.float32))
    ref_center = rig.center[ref_cam]

    def f_hom(pos):
        normal = geom.spherical_to_normal(pos[..., :2])
        center = ray[:, None, :] * pos[..., 2:3] + ref_center[:, None, :]
        ref_cam_bp = jnp.broadcast_to(ref_cam[:, None], (B, P))
        H, hok = F._per_camera_homographies(
            scene, center, normal, ref_cam_bp,
            jnp.broadcast_to(lod_scale[:, None], (B, P)))
        return jnp.sum(H, axis=(1, 2, 3, 4)) + hok.sum(axis=(1, 2))
    timeit("homographies [B,P,C]", jax.jit(f_hom), pos)

    # median box placement
    normal = geom.spherical_to_normal(pos[..., :2])
    center = ray[:, None, :] * pos[..., 2:3] + ref_center[:, None, :]
    ref_cam_bp = jnp.broadcast_to(ref_cam[:, None], (B, P))
    H, hok = F._per_camera_homographies(
        scene, center, normal, ref_cam_bp,
        jnp.broadcast_to(lod_scale[:, None], (B, P)))

    def _proj(Xb, c, s):
        return geom.project(Xb, rig.R[c], rig.T[c], rig.focal[c],
                            rig.principal[c], s)[0]
    pt = jax.vmap(_proj)(center[:, 0], ref_cam, lod_scale)

    def f_median(H):
        uvc, _ = geom.homography_apply(H, pt[:, None, None, :])
        uvc = jnp.where(jnp.isfinite(uvc), uvc, 0.0)
        return jnp.median(uvc, axis=1).sum(axis=(1, 2))
    timeit("box-placement median [B,P,C,2]", jax.jit(f_median), H)

    # weight gathers
    W2 = (2 * r + 1) ** 2

    def f_wfg(pt):
        win = pt[:, None, :] + jnp.asarray(F.window_offsets(r))[None]
        ref_cam_bw = jnp.broadcast_to(ref_cam[:, None], (B, W2))
        lod_bw = jnp.broadcast_to(lod[:, None], (B, W2))
        ref_int = F.nearest_gather(pyrs.images, pyrs.yoff, ref_cam_bw,
                                   lod_bw, win)
        edge = F.nearest_gather(pyrs.edges, pyrs.yoff, ref_cam_bw,
                                lod_bw, win)
        return ref_int.sum(-1) + edge.sum(-1)
    timeit("fg/edge nearest gathers [B,W2]x2", jax.jit(f_wfg), pt)


if __name__ == "__main__":
    main()
