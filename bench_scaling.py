"""Scaling measurement: refined patches/s at 1..N local devices.

BASELINE.json asks for patches/s measured at 1 chip / 1 host / N>=2 hosts
with >= 80% scaling efficiency. This harness measures every attached device
count by re-running the data-parallel refine over sub-meshes (this
container exposes ONE real TPU chip, so here it reports a single point;
on a pod host it prints the whole curve). Prints one JSON line per device
count.

Usage:  python bench_scaling.py            (real devices)
        JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python bench_scaling.py        (virtual-mesh smoke run; the
            numbers are NOT hardware scaling, just a correctness drive)
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import build_scene
    from pais_mvs_tpu.ops import lifecycle as lc

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    except Exception:
        pass

    def sync(x):
        return float(jnp.sum(x))

    devices = jax.devices()
    per_dev = int(os.environ.get("BENCH_PER_DEVICE", "512"))
    cfg0 = MvsConfig(particle_num=15, max_iteration=30, dist_weighting=5.0,
                     max_lod=6)
    sc = make_scene(num_cams=5, width=640, height=480,
                    num_seeds=per_dev * len(devices) + 64, seed=0)
    rng = np.random.default_rng(0)

    base_pps = None
    for n in range(1, len(devices) + 1):
        B = per_dev * n
        cfg = cfg0.replace(batch_size=B)
        scene = build_scene(sc.params, sc.images, cfg)
        centers = sc.seed_centers[:B] + rng.normal(scale=0.01, size=(B, 3))
        pb = patch_mod.from_seeds(centers, sc.seed_cam_masks[:B],
                                  sc.seed_img_points[:B])
        pb = lc.prepare_seeds(scene, cfg, pb)
        nr = jnp.float32(0.005)
        key = jax.random.PRNGKey(0)

        mesh = Mesh(np.array(devices[:n]), ("dp",))

        def body(pbs, k):
            kk = jax.random.fold_in(k, jax.lax.axis_index("dp"))
            return lc.refine_batch(scene, cfg, pbs, kk, nr, True, 1)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("dp"), pb), P()),
            out_specs=lc.RefineResult(
                jax.tree.map(lambda _: P("dp"), pb), P("dp")),
            check_vma=False))
        res = f(pb, key)
        sync(res.batch.fitness)
        t0 = time.time()
        reps = 2
        for i in range(reps):
            res = f(pb, jax.random.fold_in(key, i))
        sync(res.batch.fitness)
        dt = time.time() - t0
        pps = B * reps / dt
        if base_pps is None:
            base_pps = pps
        eff = pps / (base_pps * n)
        print(json.dumps({
            "metric": "dp-refine throughput",
            "devices": n, "value": round(pps, 2),
            "unit": "patches/s", "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
