"""Benchmark: patch-refinement throughput on the pawn-shaped workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/s", "vs_baseline": N}

Workload = the reference's default pawn configuration (README config.txt /
TMVS/TMVS.cpp:49-50): 5 cameras at 640x480, patchRadius 15 (961-px windows),
15 particles x 30 iterations with seed patches using 2x both. The metric is
end-to-end refined patches per second per chip through refine_batch — PSO,
photoconsistency, NCC visibility pruning, LOD selection and runtime
filtering included (more work per patch than the CPU baseline measures, so
the comparison is conservative).

vs_baseline divides by the sequential CPU oracle's patches/s
(baseline_cpu.json; pais_mvs_tpu/oracle.py — the reference publishes no
numbers, SURVEY.md §6). Driver target: >= 50x (BASELINE.json).

SELF-CALIBRATION (round 4): the axon tunnel's day-to-day throughput drift
is ~±10% (BASELINE.md round 3) — larger than most kernel-level wins. The
bench therefore (a) times BENCH_BLOCKS >= 4 independent blocks and reports
the median + IQR, and (b) interleaves a pinned CONTROL arm — the
roll-hoisted kernel variant (pallas_roll_hoist=True, e2e neutral vs the
per-block default) — through the same blocks, emitting both numbers plus
their ratio. Cross-round comparisons should use
head_vs_control (tunnel-invariant) rather than raw patches/s. The
realistic-gate acceptance fraction is also emitted so margin drift is
visible across rounds (VERDICT r3 weak #5).
"""

import json
import os
import sys
import time

import numpy as np


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast (instead of hanging forever) when the axon TPU tunnel is
    down: backend init under the axon plugin retries silently with ~0 CPU
    when the tunnel is unreachable. Probe device discovery in a subprocess
    with a hard timeout so a dead tunnel yields a clear error, not a hang.
    Honors whatever JAX_PLATFORMS the caller set (a CPU-pinned run probes
    the CPU backend and passes immediately)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import pais_mvs_tpu, jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"bench: backend init did not answer within {timeout_s:.0f}s "
              "— TPU tunnel down? (JAX_PLATFORMS=cpu runs on CPU)",
              file=sys.stderr)
        sys.exit(2)
    if r.returncode != 0:
        print(f"bench: backend probe failed:\n{r.stderr[-800:]}",
              file=sys.stderr)
        sys.exit(2)


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import build_scene
    from pais_mvs_tpu.ops import lifecycle as lc

    # persistent compilation cache: the refine program is large and the
    # axon remote-compile path is slow/flaky on cold compiles
    # (machine-keyed: stale cross-host CPU AOT entries SIGILL, cache.py)
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(__file__),
                                         ".jax_cache"))

    B = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "4"))
    with_control = os.environ.get("BENCH_CONTROL", "1") != "0"

    # BENCH_BF16_VPU=0/1/2 A/Bs the bf16 VPU weight-build levels
    # (config.py pallas_bf16_vpu) on both the headline run and the
    # realistic-imagery gate below, so a speedup claim is quality-gated
    # in the same command.
    bf16_vpu = int(os.environ.get("BENCH_BF16_VPU", "-1"))

    # max_lod=6 keeps the pyramid stack + LOD-search unroll bounded (the
    # pawn workload's texture keeps patches at LOD 0-2 anyway)
    cfg = MvsConfig(particle_num=15, max_iteration=30, dist_weighting=5.0,
                    batch_size=B, max_lod=6)
    if bf16_vpu >= 0:
        cfg = cfg.replace(pallas_bf16_vpu=bf16_vpu)
    # BENCH_EXIT_CHUNK=N A/Bs the PSO chunked early-exit on the head arm
    # (the control arm keeps the fixed scan, so head_vs_control isolates it)
    exit_chunk = int(os.environ.get("BENCH_EXIT_CHUNK", "-1"))
    if exit_chunk >= 0:
        cfg = cfg.replace(pso_exit_chunk=exit_chunk)
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

    # NOTE: jax.block_until_ready does NOT reliably block on the tunneled
    # axon platform — fetch a scalar instead, which forces every queued
    # dispatch to complete before timing stops.
    def sync(x):
        return float(jnp.sum(x))

    # compile + warm up
    t0 = time.time()
    res = lc.refine_batch(scene, cfg, pb, key, nr, True, 1)
    sync(res.batch.fitness)
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # on-device Pallas-vs-jnp parity self-test (regenerates the PARITY.md
    # agreement figures every bench run so they cannot silently rot)
    selftest_ran = os.environ.get("BENCH_SELFTEST", "1") != "0"
    agree = 1.0
    if selftest_ran:
        from pais_mvs_tpu.ops import fitness as F
        from pais_mvs_tpu.ops import geometry as geom
        from pais_mvs_tpu.ops.pallas_fitness import patch_fitness_pallas
        Bs, P = 256, 16
        sub = jax.tree.map(lambda x: x[:Bs], jax.device_get(pb))
        normal = geom.spherical_to_normal(jnp.asarray(sub.normal_sph))
        ref_cam = lc.set_reference_camera(scene, normal, sub.cam_mask)
        depth, ray = lc.set_depth_and_ray(scene, jnp.asarray(sub.center),
                                          ref_cam)
        lod = lc.set_lod(scene, cfg, jnp.asarray(sub.center), ref_cam)
        sph = jnp.asarray(sub.normal_sph)
        noise = jax.random.normal(jax.random.PRNGKey(7), (Bs, P, 3)) \
            * jnp.array([0.3, 0.3, 0.002])        # deliberately wide
        pos = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)[:, None, :] + noise
        f_ref = np.asarray(F.patch_fitness(scene, cfg, ref_cam, sub.cam_mask,
                                           lod, ray, pos))
        f_pal = np.asarray(patch_fitness_pallas(scene, cfg, ref_cam,
                                                sub.cam_mask, lod, ray, pos))
        big = 1e19
        v_ref, v_pal = f_ref < big, f_pal < big
        agree = float((v_ref == v_pal).mean())
        both = v_ref & v_pal
        err = np.abs(f_ref[both] - f_pal[both]) if both.any() else np.zeros(1)
        print(f"selftest: validity agreement {agree:.3f} "
              f"(pallas-only-invalid {float((v_ref & ~v_pal).mean()):.3f}), "
              f"|fit err| p50 {np.percentile(err, 50):.2e} "
              f"p99 {np.percentile(err, 99):.2e}", file=sys.stderr)
        if agree < 0.95:
            print("selftest: AGREEMENT BELOW 0.95 — kernel parity regressed",
                  file=sys.stderr)

    # REAL-imagery quality gate ON DEVICE: the pawn-rig photo scene is the
    # one that caught both round-2 accuracy bugs (bf16 einsum downcast,
    # slice clipping) — classes the synthetic gate is blind to. Seed-refine
    # it on this backend and gate the median surface distance at ~3x the
    # healthy value (healthy ~8e-4; the r2 precision bug degraded this
    # ~5x, so a regression of that class fails here).
    realistic_ok = True
    if os.environ.get("BENCH_REALISTIC", "1") != "0":
        from pais_mvs_tpu.data.realistic import make_realistic_scene
        rsc = make_realistic_scene(num_seeds=128, seed=0)
        rcfg = MvsConfig(patch_radius=6, max_lod=4, particle_num=8,
                         max_iteration=12, dist_weighting=2.0, cell_size=12,
                         min_cam_num=3, batch_size=128)
        if bf16_vpu >= 0:
            rcfg = rcfg.replace(pallas_bf16_vpu=bf16_vpu)
        rscene = build_scene(rsc.params, rsc.images, rcfg)
        Br = (len(rsc.seed_centers) // 8) * 8
        rpb = patch_mod.from_seeds(rsc.seed_centers[:Br],
                                   rsc.seed_cam_masks[:Br],
                                   rsc.seed_img_points[:Br])
        rpb = lc.prepare_seeds(rscene, rcfg, rpb)
        rres = lc.refine_batch(rscene, rcfg, rpb, jax.random.PRNGKey(3),
                               jnp.float32(0.01), True, 2)
        rkeep = np.asarray(rres.batch.valid)
        rd = (rsc.surface_distance(np.asarray(rres.batch.center)[rkeep])
              if rkeep.any() else np.array([np.inf]))
        rmed = float(np.median(rd))
        racc = int(rkeep.sum())
        realistic_ok = racc > 0.4 * Br and rmed < 2.5e-3
        print(f"realistic gate: {racc}/{Br} seeds, median "
              f"surface dist {rmed:.5f} -> "
              f"{'ok' if realistic_ok else 'FAIL'}", file=sys.stderr)
    else:
        racc, Br, rmed = -1, -1, float("nan")

    # control arm: the pinned roll-HOISTED kernel variant (e2e neutral vs
    # the per-block default, BASELINE.md round 4 — a distinct but stable
    # second program, which is all the drift calibration needs). Same
    # workload, same jit machinery; compiled once here so its compile does
    # not land inside a timed block.
    cfg_ctrl = cfg.replace(pallas_roll_hoist=True, pso_exit_chunk=0)
    if with_control:
        res_c = lc.refine_batch(scene, cfg_ctrl, pb, key, nr, True, 1)
        sync(res_c.batch.fitness)

    # untimed re-warm BLOCK for the head arm: the first timed block after
    # the warmup/selftest/control phase consistently runs at ~0.4x the
    # steady rate REGARDLESS of batch size or arm (round 4: 174.9 vs 470
    # at B=1024, 203 vs 459 at B=256 — proportional, so not a fixed
    # reload cost; a single re-warm dispatch did not absorb it). Run one
    # full block's worth of untimed dispatches at the same cadence so the
    # timed blocks start from steady state.
    for i in range(reps):
        res_w = lc.refine_batch(scene, cfg, pb,
                                jax.random.fold_in(key, 10_000 + i),
                                nr, True, 1)
    sync(res_w.batch.fitness)

    # steady state: nblocks independent timed blocks per arm, interleaved
    # H C H C ... so tunnel drift within the run hits both arms equally
    def timed_block(c, i0):
        t0 = time.time()
        for i in range(reps):
            r = lc.refine_batch(scene, c, pb,
                                jax.random.fold_in(key, i0 + i), nr, True, 1)
        sync(r.batch.fitness)
        return B * reps / (time.time() - t0), r

    head_pps, ctrl_pps = [], []
    for k in range(nblocks):
        v, res = timed_block(cfg, k * reps)
        head_pps.append(v)
        if with_control:
            v, _ = timed_block(cfg_ctrl, k * reps)
            ctrl_pps.append(v)

    def med_iqr(xs):
        return (float(np.median(xs)),
                [float(np.percentile(xs, 25)), float(np.percentile(xs, 75))])

    pps, head_iqr = med_iqr(head_pps)
    print(f"head blocks: {[round(x, 1) for x in head_pps]}", file=sys.stderr)
    if with_control:
        cpps, ctrl_iqr = med_iqr(ctrl_pps)
        print(f"ctrl blocks: {[round(x, 1) for x in ctrl_pps]}",
              file=sys.stderr)

    # sanity: the result must actually be a reconstruction, not garbage
    keep = np.asarray(res.batch.valid)
    d = sc.surface_distance(np.asarray(res.batch.center)[keep]) if \
        keep.any() else np.array([np.inf])
    print(f"accepted {keep.sum()}/{B}, median surface dist "
          f"{np.median(d):.5f}", file=sys.stderr)
    # gate at ~10x the measured steady-state quality (2.6e-4), not the old
    # 100x-loose 0.02 — a real regression must fail the gate. The selftest
    # validity agreement gates too (VERDICT r4 weak #1): a kernel-parity
    # regression must mark the JSON, not just whisper on stderr.
    quality_ok = keep.sum() > B * 0.5 and np.median(d) < 0.003 \
        and realistic_ok and agree >= 0.95

    # no silent fallback (VERDICT r4 weak #2): a missing/corrupt baseline
    # file must fail loudly, not flatter vs_baseline with a stale constant
    with open(os.path.join(os.path.dirname(__file__),
                           "baseline_cpu.json")) as f:
        cpu_pps = json.load(f)["value"]

    out = {
        "metric": "pawn-shaped dense-recon patch refinement throughput"
                  + ("" if quality_ok else " [QUALITY CHECK FAILED]"),
        "value": round(pps, 2),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps / cpu_pps, 2),
        "iqr": [round(head_iqr[0], 2), round(head_iqr[1], 2)],
        "blocks": nblocks,
        "realistic_accept": None if racc < 0 else [racc, Br],
        "realistic_median_dist": None if racc < 0 else round(rmed, 6),
        # null = the parity self-test was SKIPPED (BENCH_SELFTEST=0), so
        # quality_ok's agree clause was vacuous — keeps the record honest
        "selftest_agreement": round(agree, 3) if selftest_ran else None,
    }
    if with_control:
        out["control_hoist_kernel"] = round(cpps, 2)
        out["control_iqr"] = [round(ctrl_iqr[0], 2), round(ctrl_iqr[1], 2)]
        out["head_vs_control"] = round(pps / cpps, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
