"""TPU probe for the dual-width span bucketing: per-call timings at forced
narrow fractions + the in-situ narrow fraction across a real seed PSO.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bucket.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models import patch as patch_mod
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import lifecycle as lc, geometry as geom
from pais_mvs_tpu.ops.pallas_fitness import patch_fitness_pallas


def main():
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    B, P = 1024, 30
    cfg = MvsConfig(particle_num=15, max_iteration=30, max_lod=6)
    sc = make_scene(num_cams=5, width=640, height=480, num_seeds=B + 64,
                    seed=0)
    scene = build_scene(sc.params, sc.images, cfg)
    rng = np.random.default_rng(0)
    centers = sc.seed_centers[:B] + rng.normal(scale=0.01, size=(B, 3))
    pb = patch_mod.from_seeds(centers, sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    normal = geom.spherical_to_normal(jnp.asarray(pb.normal_sph))
    ref_cam = lc.set_reference_camera(scene, normal, pb.cam_mask)
    depth, ray = lc.set_depth_and_ray(scene, jnp.asarray(pb.center), ref_cam)
    lod = lc.set_lod(scene, cfg, jnp.asarray(pb.center), ref_cam)
    sph = jnp.asarray(pb.normal_sph)

    def timed(cfg_x, scale, label, reps=30):
        noise = jax.random.normal(jax.random.PRNGKey(7), (B, P, 3)) \
            * jnp.array(scale)
        pos = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)[:, None, :] + noise

        @jax.jit
        def many(pos):
            def body(c, i):
                f = patch_fitness_pallas(scene, cfg_x, ref_cam, pb.cam_mask,
                                         lod, ray, pos + 1e-6 * i)
                return c + jnp.sum(jnp.where(f < 1e19, f, 0.0)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return c

        float(many(pos))                      # compile+warm
        t0 = time.time()
        float(many(pos))
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:34s} {dt:7.2f} ms/call", flush=True)
        return dt

    cfg_off = cfg.replace(pallas_span_bucket=False)
    cfg_fast = cfg.replace(pallas_span_bucket=False, pallas_fast_slice=True)
    # all-narrow / all-wide forcing via noise scale
    timed(cfg_off, (0.02, 0.02, 0.0005), "wide-only kernel, tight noise")
    timed(cfg_fast, (0.02, 0.02, 0.0005), "64-only (fast_slice) kernel")
    timed(cfg, (0.02, 0.02, 0.0005), "dual,    tight noise (most narrow)")
    timed(cfg_off, (1.2, 1.2, 0.002), "wide-only kernel, huge noise")
    timed(cfg, (1.2, 1.2, 0.002), "dual,    huge noise (none narrow)")
    timed(cfg, (0.3, 0.3, 0.002), "dual,    mid noise")


if __name__ == "__main__":
    main()
