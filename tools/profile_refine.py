"""Phase breakdown of the bench refine workload on the real TPU.

Times in isolation: the Pallas fitness call (kernel + XLA epilogue), the
GLN-PSO update math with a trivial fitness, remove_invisible_cameras (NCC),
and the full refine_batch — so kernel work can be separated from epilogue,
PSO bookkeeping and visibility pruning.

Run: PYTHONPATH=/root/.axon_site python tools/profile_refine.py
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
from pais_mvs_tpu.ops import pallas_fitness as pf
from pais_mvs_tpu.ops import pso as pso_mod

B = 1024
P = 30          # seed particle count (15 * 2)
ITERS = 60      # seed iterations (30 * 2)


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeit(name, fn, *args, reps=3, scale=1.0):
    out = fn(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms  (x{scale:g} = {dt*scale:6.2f} s "
          f"of a {B}-patch refine)", file=sys.stderr)
    return dt


def main():
    # persistent compile cache: the isolated phase jits are large and the
    # axon remote-compile path is minutes when cold
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache()

    cfg = MvsConfig(particle_num=15, max_iteration=30, dist_weighting=5.0,
                    batch_size=B, max_lod=6)
    sc = make_scene(num_cams=5, width=640, height=480, num_seeds=B + 64,
                    seed=0)
    scene = build_scene(sc.params, sc.images, cfg)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    centers = sc.seed_centers[:B] + rng.normal(scale=0.01, size=(B, 3))
    pb = patch_mod.from_seeds(centers, sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    key = jax.random.PRNGKey(0)
    nr = jnp.float32(0.005)

    # --- state the fitness call needs ---
    normal = pf.geom.spherical_to_normal(pb.normal_sph)
    ref_cam = lc.set_reference_camera(scene, normal, pb.cam_mask)
    depth, ray = lc.set_depth_and_ray(scene, pb.center, ref_cam)
    depth_range, _ = lc.set_depth_range(scene, cfg, pb.center, ray, depth,
                                        ref_cam, pb.cam_mask, nr)
    lod = lc.set_lod(scene, cfg, pb.center, ref_cam)
    sph = pb.normal_sph
    k = jax.random.PRNGKey(1)
    noise = jax.random.normal(k, (B, P, 3)) * jnp.array([0.1, 0.1, 0.0])
    pos = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)[:, None, :] + noise
    active = jnp.ones((B,), bool)

    # 1. full fitness call (kernel + epilogue)
    fit_call = jax.jit(lambda pos: pf.patch_fitness_pallas(
        scene, cfg, ref_cam, pb.cam_mask, lod, ray, pos, active=active))
    timeit("patch_fitness_pallas [B,30] (per call)", fit_call, pos,
           scale=ITERS + 1)

    # 2. PSO machinery with trivial fitness
    lo = jnp.stack([jnp.zeros(B), sph[:, 1] - 1.5,
                    depth_range[:, 0]], -1).astype(jnp.float32)
    hi = jnp.stack([jnp.full(B, np.pi), sph[:, 1] + 1.5,
                    depth_range[:, 1]], -1).astype(jnp.float32)
    init = jnp.stack([sph[:, 0], sph[:, 1], depth], -1).astype(jnp.float32)

    def cheap_fit(pos, act):
        return jnp.sum(pos * pos, axis=-1)

    pso_call = jax.jit(lambda: pso_mod.gln_pso(
        cheap_fit, lo, hi, init, key, particle_num=P, max_iteration=ITERS,
        active0=active).gbest_fit)
    timeit("gln_pso 60 iters, trivial fitness (total)", pso_call, scale=1)

    # 3. NCC visibility pruning (once per refine round)
    inv_call = jax.jit(lambda: lc.remove_invisible_cameras(
        scene, cfg, pb.center, normal, ref_cam, pb.cam_mask, lod)[1])
    timeit("remove_invisible_cameras (per call)", inv_call, scale=1)

    # 4. LOD select
    lod_call = jax.jit(lambda: lc.set_lod(scene, cfg, pb.center, ref_cam))
    timeit("set_lod (per call)", lod_call, scale=1)

    # 5. full refine_batch reference point
    ref_call = jax.jit(lambda k: lc.refine_batch(
        scene, cfg, pb, k, nr, True, 1).batch.fitness)
    timeit("refine_batch total", ref_call, key, scale=1)

    # 6. PSO convergence distribution on the bench workload (VERDICT r4
    # weak #6): per-swarm iteration counts decide whether whole-batch
    # chunked early-exit (cfg.pso_exit_chunk) can save entire fitness
    # dispatches — the roofline bounds cost per CALL, not call COUNT.
    res = lc.refine_batch(scene, cfg, pb, key, nr, True, 1)
    it = np.asarray(res.iterations)
    qs = np.percentile(it, [10, 25, 50, 75, 90, 100])
    print(f"PSO iterations (last round, {ITERS} max): "
          f"p10/p25/p50/p75/p90/max = "
          + "/".join(f"{int(v)}" for v in qs), file=sys.stderr)
    for k in (10, 20, 30, 40, 50, ITERS - 1):
        print(f"  swarms frozen by iter {k:2d}: "
              f"{float((it <= k).mean()):.3f}", file=sys.stderr)
    # the exit fires only when the LAST swarm freezes — that is the number
    # that decides the lever
    print(f"  whole-batch exit would save "
          f"{ITERS - int(it.max())}/{ITERS} dispatches", file=sys.stderr)

    # 7. A/B: chunked early-exit vs fixed scan, end to end
    for chunk in (0, 6, 10):
        cfg_c = cfg.replace(pso_exit_chunk=chunk)
        call = jax.jit(lambda k, c=cfg_c: lc.refine_batch(
            scene, c, pb, k, nr, True, 1).batch.fitness)
        timeit(f"refine_batch pso_exit_chunk={chunk}", call, key, scale=1)


if __name__ == "__main__":
    main()
