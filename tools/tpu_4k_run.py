"""4K-scale validation run on the attached TPU chip (VERDICT r3 weak #7).

The HBM budget table (BASELINE.md round 2: 3.0 GiB of device image state
for a 4K x 3072, 8-camera rig) and the O(n) antiderivative resampler were
built FOR 4K, but the largest scene ever measured was 2048x1536 x 6 cams.
This runs the full CLI pipeline (NVM load -> seed refine -> wavefront
expansion -> writers) on an 8-camera 4096x3072 curved synthetic scene,
expansion round-capped to bound wall-clock, and reports wall, phase
split, sustained refines/s, peak device memory, and median surface
distance.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_4k_run.py
     [--rounds N] [--seeds N] [--out DIR]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=24,
                    help="expansion wavefront round cap (bounds wall-clock)")
    ap.add_argument("--seeds", type=int, default=400)
    ap.add_argument("--out", default="/tmp/tpu_4k")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="pipeline_expansion knob (A/B, round 5)")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    os.makedirs(args.out, exist_ok=True)
    os.chdir(args.out)

    import jax
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.io.nvm import save_nvm

    t0 = time.time()
    sc = make_scene(num_cams=8, width=4096, height=3072,
                    num_seeds=args.seeds, seed=7, amplitude=0.06)
    for p, img in zip(sc.params, sc.images):
        Image.fromarray(img).save(p.file_name)
    save_nvm("scene.nvm", sc.params, sc.seed_centers,
             np.full((len(sc.seed_centers), 3), 128.0),
             sc.seed_cam_masks, sc.seed_img_points
             - np.array([[[2048.0, 1536.0]]]))
    gen_s = time.time() - t0
    print(f"scene gen+write: {gen_s:.1f}s", file=sys.stderr)

    with open("config.txt", "w") as f:
        f.write("patchRadius 15\nmaxLOD 8\nparticleNum 15\n"
                "maxIteration 30\ndistWeighting 5.0\ncellSize 16\n"
                "minCamNum 3\nseedRefineRounds 2\nbatchSize 1024\n"
                "wavefrontSize 4096\n"
                f"pipelineExpansion {args.pipeline}\n")

    # round-cap the expansion through the real CLI path so the run is
    # bounded (same pattern as tests/test_realistic.py's CLI test)
    import pais_mvs_tpu.engine.reconstructor as recon_mod
    from pais_mvs_tpu import cli
    orig_expand = recon_mod.Reconstructor.expand
    rounds = args.rounds
    recon_mod.Reconstructor.expand = (
        lambda self, max_rounds=10_000, autosave_path=None:
            orig_expand(self, max_rounds=rounds,
                        autosave_path=autosave_path))
    t0 = time.time()
    rc = cli.main(["-r", "scene.nvm", "-o", args.out])
    wall = time.time() - t0
    recon_mod.Reconstructor.expand = orig_expand
    assert rc == 0

    from pais_mvs_tpu.io import mvsbin
    f = mvsbin.read_mvs("exp.mvs")
    pts = f.patches.centers
    d = sc.surface_distance(pts)
    stats = json.load(open("stats.json"))

    mem = {}
    try:
        ms = dev.memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in ms:
                mem[k + "_GiB"] = round(ms[k] / 2**30, 3)
    except Exception as e:
        mem = {"unavailable": str(e)}

    out = {
        "scene": "8-cam 4096x3072 curved, seeds %d" % args.seeds,
        "pipeline_expansion": bool(args.pipeline),
        "rounds_cap": rounds,
        "patches": int(len(pts)),
        "median_surface_dist": float(np.median(d)),
        "p95_surface_dist": float(np.quantile(d, 0.95)),
        "wall_s": round(wall, 1),
        "expansion_s": stats.get("expansion_s"),
        "expansion_device_s": stats.get("expansion_device_s"),
        "expansion_host_s": stats.get("expansion_host_s"),
        "expansion_refined": stats.get("expansion_refined"),
        "expansion_pps": stats.get("expansion_pps"),
        "memory": mem,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
