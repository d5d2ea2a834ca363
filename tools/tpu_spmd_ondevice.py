"""Execute the SPMD paths ON the real TPU chip (VERDICT r3 missing #1).

Everything distributed (shard_map around the Pallas kernel, psum view
composition, parallel.expansion.expand_step) had only ever lowered on the
virtual CPU mesh — and round 3 proved CPU acceptance != Mosaic acceptance
(the bf16 matmul accumulator verified in interpret mode but was rejected
on-device, ops/pallas_fitness.py:295-302). This script runs, on a
1-device mesh over the attached chip:

  1. ``sharded_pso_refine`` — the patch-dp x view-sharded fitness step:
     on accelerators the per-shard sampling is the Pallas box-sampler
     kernel with the cross-camera reduction psum-composed over the view
     axis (ops/view_fitness.py::fitness_view_pallas, round 5);
  2. ``refine_batch`` on a mesh-sharded patch batch (this and step 3 run
     the fused Pallas fitness kernel under shard_map);
  3. multi-round ``expand_distributed`` — all_gather candidate routing,
     three-clause skipNeighborCell, occupancy scatter, spill re-queue —
     with a quality gate against the synthetic analytic surface.

A clean exit means zero Mosaic rejections anywhere in the SPMD program
set. Run: PYTHONPATH=/root/repo:/root/.axon_site python
tools/tpu_spmd_ondevice.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this script is meant for the "
              "attached TPU chip", file=sys.stderr)

    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.engine.reconstructor import Reconstructor
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import build_scene
    from pais_mvs_tpu.ops import geometry as geom
    from pais_mvs_tpu.ops import lifecycle as lc
    from pais_mvs_tpu.parallel import mesh as mesh_mod
    from pais_mvs_tpu.parallel.sharded import sharded_pso_refine

    n = jax.local_device_count()
    mesh = mesh_mod.make_mesh((n, 1), jax.devices()[:n])
    print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)

    cfg = MvsConfig(patch_radius=6, max_lod=3, particle_num=8,
                    max_iteration=8, dist_weighting=2.0,
                    seed_refine_rounds=1, cell_size=10, batch_size=64,
                    wavefront_size=64)
    sc = make_scene(num_cams=4, width=320, height=240, num_seeds=32, seed=5)
    scene = build_scene(sc.params, sc.images, cfg)
    C = scene.rig.num_cameras
    B = 32

    centers = sc.seed_centers[:B].astype(np.float32)
    ref = np.full(B, 1, dtype=np.int32)
    rays = centers - np.asarray(scene.rig.center)[ref]
    depths = np.linalg.norm(rays, axis=-1)
    rays = (rays / depths[:, None]).astype(np.float32)
    n0 = np.asarray(geom.estimated_normal(
        jnp.asarray(centers), scene.rig.center[None].repeat(B, 0),
        jnp.ones((B, C), bool)))
    sph = np.asarray(geom.normal_to_spherical(jnp.asarray(n0)))
    lo = np.stack([np.zeros(B), sph[:, 1] - np.pi / 2, depths - 0.05],
                  -1).astype(np.float32)
    hi = np.stack([np.full(B, np.pi), sph[:, 1] + np.pi / 2, depths + 0.05],
                  -1).astype(np.float32)
    init = np.stack([sph[:, 0], sph[:, 1], depths], -1).astype(np.float32)

    # 1) shard_map'd PSO refine (psum view composition) on the chip
    t0 = time.time()
    res = sharded_pso_refine(
        scene.rig, scene.pyramids.images, scene.pyramids.edges,
        scene.pyramids.dims, scene.pyramids.yoff, cfg,
        jnp.asarray(ref), jnp.ones((B, C), bool),
        jnp.zeros(B, dtype=jnp.int32), jnp.asarray(rays),
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(init),
        jax.random.PRNGKey(0), mesh, cfg.particle_num, cfg.max_iteration)
    fits = np.asarray(res.gbest_fit)        # scalar fetch = axon sync
    assert np.all(np.isfinite(fits)), fits
    print(f"1 sharded_pso_refine OK ({time.time() - t0:.1f}s incl compile, "
          f"median fit {np.median(fits):.4f})", file=sys.stderr)

    # 2) refine_batch on a mesh-sharded batch
    t0 = time.time()
    pb = patch_mod.from_seeds(centers, np.ones((B, C), bool),
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    pb = mesh_mod.shard_patch_batch(pb, mesh)
    scene_r = mesh_mod.replicate_scene(scene, mesh)
    out = lc.refine_batch(scene_r, cfg, pb, jax.random.PRNGKey(1),
                          jnp.float32(0.005), True, 1)
    kept = int(np.asarray(out.batch.valid).sum())
    print(f"2 sharded refine_batch OK ({time.time() - t0:.1f}s, "
          f"kept {kept}/{B})", file=sys.stderr)

    # 3) full distributed expansion rounds on the chip
    t0 = time.time()
    rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
    rec.load_seeds(sc.seed_centers, sc.seed_cam_masks, sc.seed_img_points,
                   np.full((len(sc.seed_centers), 3), 128.0))
    n_seeds = rec.refine_seeds()
    rec.expand_distributed(mesh=mesh, max_rounds=4, per_shard=64)
    pts = rec.live_centers()
    d = float(np.median(sc.surface_distance(pts)))
    n_exp = len(pts) - n_seeds
    assert n_exp > 0, "distributed expansion inserted nothing"
    assert d < 0.01, f"off-surface: {d}"
    print(f"3 expand_distributed OK ({time.time() - t0:.1f}s, "
          f"{n_seeds} seeds -> +{n_exp} patches, median dist {d:.5f}, "
          f"spilled {rec.stats.get('dist_spilled', 0)})", file=sys.stderr)
    print(f"SPMD-on-{dev.platform} OK: devices={n} inserted={n_exp} "
          f"median_dist={d:.5f}")


if __name__ == "__main__":
    main()
