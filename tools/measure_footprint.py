"""Measure warped-window footprint extents vs the Pallas box budget.

The fused fitness kernel DMA's a [KY, KX] box per (patch, camera) cell and
samples every particle's warped window from it (ops/pallas_fitness.py:
_run_sampler box placement). KY is sized by ``cover_y = 1.6*r + 10``
(pallas_fitness.py:936) and KY directly scales the MXU streaming dim, the
CwT hat build, and the VPU reduce — if real workloads never use the full
y budget, a tighter cover_y is a ~KY-proportional kernel saving.

This measures, on CPU, the ACTUAL per-(patch, camera) footprint half-
extents |v - cy| and |u - cx| (cy/cx = the box placement's median warped
center, the exact quantity _run_sampler aligns the box to) over:

  1. the bench selftest workload (pawn-shaped synthetic, r=15, swarm
     positions = incumbent + deliberately WIDE noise — wider than any
     PSO iterate, bench.py:135-137);
  2. positions drawn UNIFORMLY over the full PSO search bounds that
     lifecycle.refine_batch sets (PSO iterates are clamped to these
     bounds, ops/pso.py:182 — so this bounds every reachable position);
  3. the realistic pawn-rig photo scene (r=6), same two samplings.

Only pvalid particles (facing / in-ref-frame / homography-ok — the gates
patch_fitness_pallas applies before sampling) and in-image pixels count:
everything else is BIG-fated before or at sampling and needs no coverage.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/measure_footprint.py
"""

import sys

import numpy as np


def measure(scene, cfg, pb, pos, label):
    import jax
    import jax.numpy as jnp
    from pais_mvs_tpu.ops import fitness as F
    from pais_mvs_tpu.ops import geometry as geom
    from pais_mvs_tpu.ops import lifecycle as lc

    rig, pyrs = scene.rig, scene.pyramids
    B, P, _ = pos.shape
    C = rig.num_cameras
    r = cfg.patch_radius

    normal = geom.spherical_to_normal(jnp.asarray(pb.normal_sph))
    ref_cam = lc.set_reference_camera(scene, normal, pb.cam_mask)
    lod = lc.set_lod(scene, cfg, jnp.asarray(pb.center), ref_cam)
    _, ray = lc.set_depth_and_ray(scene, jnp.asarray(pb.center), ref_cam)
    cam_mask = jnp.asarray(pb.cam_mask)

    nrm = geom.spherical_to_normal(pos[..., :2])
    center = ray[:, None, :] * pos[..., 2:3] + rig.center[ref_cam][:, None]
    facing_bad = jnp.einsum("bpk,bk->bp", nrm, rig.optical[ref_cam]) > 0
    lod_scale = jnp.power(jnp.float32(cfg.lod_ratio), lod.astype(jnp.float32))
    ref_cam_bp = jnp.broadcast_to(ref_cam[:, None], (B, P))
    H, hok = F._per_camera_homographies(
        scene, center, nrm, ref_cam_bp,
        jnp.broadcast_to(lod_scale[:, None], (B, P)))          # [B,P,C,3,3]

    def _proj(Xb, c, s):
        return geom.project(Xb, rig.R[c], rig.T[c], rig.focal[c],
                            rig.principal[c], s)[0]
    pt = jax.vmap(_proj)(center[:, 0], ref_cam, lod_scale)     # [B, 2]
    ref_dims = pyrs.dims[ref_cam, lod].astype(jnp.float32)
    in_ref = ((pt[:, 0] - r >= 2) & (pt[:, 0] + r < ref_dims[:, 1] - 3) &
              (pt[:, 1] - r >= 2) & (pt[:, 1] + r < ref_dims[:, 0] - 3))
    pvalid = (~facing_bad) & in_ref[:, None] & \
        jnp.all(hok | ~cam_mask[:, None, :], axis=-1)          # [B, P]

    offs = jnp.asarray(F.window_offsets(r))                    # [W2, 2]
    xy = pt[:, None, :] + offs[None]                           # [B, W2, 2]
    xy1 = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
    w = jnp.einsum("bpcij,bwj->bpcwi", H, xy1)                 # [B,P,C,W2,3]
    uv = w[..., :2] / jnp.where(w[..., 2:3] == 0, 1.0, w[..., 2:3])

    # box anchor: the median over particles of the warped WINDOW CENTER
    # (exactly _run_sampler's ctr, pallas_fitness.py:442-448)
    ptc1 = jnp.concatenate([pt, jnp.ones_like(pt[..., :1])], -1)
    wc = jnp.einsum("bpcij,bj->bpci", H, ptc1)
    uvc = wc[..., :2] / jnp.where(wc[..., 2:3] == 0, 1.0, wc[..., 2:3])
    uvc = jnp.where(jnp.isfinite(uvc), uvc, 0.0)
    ctr = jnp.median(uvc, axis=1)                              # [B, C, 2]

    hw = pyrs.dims[jnp.arange(C)[None, :], lod[:, None]].astype(jnp.float32)
    inim = ((uv[..., 0] >= 2.0) & (uv[..., 0] < hw[:, None, :, None, 1] - 3)
            & (uv[..., 1] >= 2.0)
            & (uv[..., 1] < hw[:, None, :, None, 0] - 3))
    ok = (pvalid[:, :, None, None] & cam_mask[:, None, :, None] & inim
          & (w[..., 2] != 0) & jnp.isfinite(uv).all(-1))

    dy = jnp.where(ok, jnp.abs(uv[..., 1] - ctr[:, None, :, None, 1]), 0.0)
    dx = jnp.where(ok, jnp.abs(uv[..., 0] - ctr[:, None, :, None, 0]), 0.0)
    dyn, dxn = np.asarray(dy), np.asarray(dx)
    okn = np.asarray(ok)
    vals_y = dyn[okn]
    vals_x = dxn[okn]
    cy_bud = int(1.6 * r) + 10
    from pais_mvs_tpu.ops.pallas_fitness import STRETCH
    cx_bud = int((STRETCH + 0.4) * r) + 8
    q = lambda v, p: float(np.percentile(v, p)) if len(v) else float("nan")
    print(f"{label}: r={r} n_valid_px={len(vals_y)}")
    print(f"  |v-cy|: p99 {q(vals_y,99):6.2f}  p99.99 {q(vals_y,99.99):6.2f}"
          f"  p100 {float(vals_y.max()):6.2f}   budget cover_y={cy_bud}"
          f" (KY={((2*cy_bud+7+7)//8)*8})")
    print(f"  |u-cx|: p99 {q(vals_x,99):6.2f}  p99.99 {q(vals_x,99.99):6.2f}"
          f"  p100 {float(vals_x.max()):6.2f}   budget cover_x~{cx_bud}")
    return float(vals_y.max()), float(vals_x.max())


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.data.realistic import make_realistic_scene
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import build_scene
    from pais_mvs_tpu.ops import geometry as geom
    from pais_mvs_tpu.ops import lifecycle as lc

    rng = np.random.default_rng(0)

    def workloads(scene, cfg, pb, Bs, P, label):
        normal = geom.spherical_to_normal(jnp.asarray(pb.normal_sph))
        ref_cam = lc.set_reference_camera(scene, normal, pb.cam_mask)
        depth, ray = lc.set_depth_and_ray(scene, jnp.asarray(pb.center),
                                          ref_cam)
        sph = jnp.asarray(pb.normal_sph)
        incumbent = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)
        # 1) bench selftest noise (deliberately wide, bench.py:135-137)
        noise = jax.random.normal(jax.random.PRNGKey(7), (Bs, P, 3)) \
            * jnp.array([0.3, 0.3, 0.002])
        measure(scene, cfg, pb, incumbent[:, None, :] + noise,
                label + " selftest-noise")
        # 2) uniform over the FULL PSO bounds refine_batch sets for seeds
        #    (theta in [0,pi], phi +-pi/2, depth from set_depth_range's
        #    1-px-parallax window — lifecycle.py:356-362)
        center0 = jnp.asarray(pb.center)
        dr, _ = lc.set_depth_range(scene, cfg, center0, ray, depth,
                                   ref_cam, jnp.asarray(pb.cam_mask),
                                   jnp.float32(0.005))
        lo = jnp.stack([jnp.zeros_like(depth), sph[:, 1] - np.pi / 2,
                        dr[:, 0]], -1)
        hi = jnp.stack([jnp.full_like(depth, np.pi), sph[:, 1] + np.pi / 2,
                        dr[:, 1]], -1)
        u = jnp.asarray(rng.uniform(size=(Bs, P, 3)), jnp.float32)
        measure(scene, cfg, pb, lo[:, None] + (hi - lo)[:, None] * u,
                label + " pso-bounds-uniform")

    cfg = MvsConfig(particle_num=15, max_iteration=30, dist_weighting=5.0,
                    batch_size=256, max_lod=6)
    sc = make_scene(num_cams=5, width=640, height=480, num_seeds=320, seed=0)
    scene = build_scene(sc.params, sc.images, cfg)
    Bs, P = 256, 16
    pb = patch_mod.from_seeds(sc.seed_centers[:Bs], sc.seed_cam_masks[:Bs],
                              sc.seed_img_points[:Bs])
    pb = lc.prepare_seeds(scene, cfg, pb)
    pb = jax.tree.map(lambda x: x[:Bs], jax.device_get(pb))
    workloads(scene, cfg, pb, Bs, P, "bench(r=15)")

    rsc = make_realistic_scene(num_seeds=128, seed=0)
    rcfg = MvsConfig(patch_radius=6, max_lod=4, particle_num=8,
                     max_iteration=12, dist_weighting=2.0, cell_size=12,
                     min_cam_num=3, batch_size=128)
    rscene = build_scene(rsc.params, rsc.images, rcfg)
    Br = (len(rsc.seed_centers) // 8) * 8
    rpb = patch_mod.from_seeds(rsc.seed_centers[:Br],
                               rsc.seed_cam_masks[:Br],
                               rsc.seed_img_points[:Br])
    rpb = lc.prepare_seeds(rscene, rcfg, rpb)
    rpb = jax.tree.map(lambda x: x[:Br], jax.device_get(rpb))
    workloads(rscene, rcfg, rpb, Br, 16, "realistic(r=6)")


if __name__ == "__main__":
    main()
