"""Roofline accounting for the fused fitness kernel (VERDICT r2 item 7).

Computes the ANALYTIC work counts of one `patch_fitness_pallas` call at the
headline bench shape directly from the kernel's shape algebra
(ops/pallas_fitness.py: _run_fused / _fused_body / _sample_block /
_bilinear_block), then measures the achieved per-call time on the real TPU
and prints achieved-vs-peak rates for the MXU and the VPU separately.

Terminology:
  useful MXU FLOPs  — 2*M*K*N of the dot_generals as written
  tile  MXU FLOPs   — the same dots with M,K padded to the 128x128 MXU
                      tile (what the systolic array actually schedules)
  VPU element-ops   — one arithmetic/compare/select lane-op on one f32
                      element (builds, reduces, coordinate math)

Peaks (TPU v5e, single chip): 197 TFLOP/s bf16 MXU; the VPU peak is taken
from the measured weight-build calibration (tools/microbench_kernel.py
variant V1) rather than a datasheet constant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""

import os
import sys
import time

import numpy as np


# ---------------------------------------------------------------------------
# analytic model (mirrors _run_fused's shape derivation)
# ---------------------------------------------------------------------------

def _round_up(n, m):
    return ((n + m - 1) // m) * m


def kernel_work(B=1024, C=5, P=30, r=15, ks_wide=128, ks_narrow=64,
                narrow_frac=0.0):
    """Work counts for ONE fused-kernel fitness call.

    narrow_frac: fraction of patches taking the KS=64 launch (span
    bucketing); 0.0 = always-wide production default.
    """
    cover = int((2.6 + 0.4) * r) + 8            # _run_fused cover default
    cover_y = int(1.6 * r) + 10
    KY = _round_up(2 * cover_y + 7, 8)           # 80 at r=15
    KX = _round_up(2 * cover + 127, 128)         # 256 at r=15
    W2 = (2 * r + 1) ** 2
    W2p = _round_up(W2, 128)                     # 1024 at r=15
    Pp = _round_up(P, 8)                         # particle padding
    PB, NB = 8, Pp // 8
    PT = PB * W2p                                # 8192

    def per_patch(KS):
        blocks = C * NB
        # --- MXU (pass A sampling): _bilinear_block, contract_x=KS>=KY ---
        if KS >= KY:
            mxu_useful = 2 * KY * KS * PT * blocks
        else:
            mxu_useful = 2 * KY * KS * PT * blocks   # same product, y-contract
        mxu_tile = 2 * _round_up(KY, 128) * _round_up(KS, 128) * PT * blocks
        # weight build _nn x2 (ref + edge), KS_SM=64, y-contract
        mxu_useful += 2 * (2 * KY * 64 * W2p)
        mxu_tile += 2 * (2 * 128 * 128 * W2p)

        # --- VPU element-ops ---
        vpu = 0
        # per-particle u/v/ok coordinate math: ~22 ops per window pixel
        vpu += blocks * PB * W2p * 22
        # CwT build [KY, PT]: sub+abs+max (+vb mask ~2)
        vpu += blocks * KY * PT * 5
        # RwT build [KS, PT]: sub+abs+max
        vpu += blocks * KS * PT * 3
        # post-matmul reduce (tmp*CwT + KY-row sum)  [contract_x branch]
        vpu += blocks * KY * PT * 2
        # pass B cross-camera SAD (per block): sums, mean, absdev, weights
        vpu += NB * PT * (C + 3 * C + 12)
        # per-patch weight build (ref+edge nearest pass + exp weights)
        vpu += 2 * (64 * W2p * 3 + KY * W2p * 5) + W2p * 12
        return mxu_useful, mxu_tile, vpu

    mu_w, mt_w, v_w = per_patch(ks_wide)
    mu_n, mt_n, v_n = per_patch(ks_narrow)
    f = narrow_frac
    return dict(
        KY=KY, KX=KX, W2p=W2p, P_padded=Pp, PT=PT, B=B, C=C,
        mxu_useful=B * ((1 - f) * mu_w + f * mu_n),
        mxu_tile=B * ((1 - f) * mt_w + f * mt_n),
        vpu_ops=B * ((1 - f) * v_w + f * v_n),
        # HBM traffic: per active cell one [KY, KX] bf16 box DMA + edge box
        hbm_bytes=B * (C + 1) * KY * KX * 2,
    )


def report(dt_call_s, w, label, vpu_peak_ops=None):
    mu, mt, vp = w["mxu_useful"], w["mxu_tile"], w["vpu_ops"]
    print(f"--- {label}: {dt_call_s*1e3:.2f} ms/call ---")
    print(f"MXU useful : {mu/1e9:7.2f} GFLOP  -> {mu/dt_call_s/1e12:6.1f} "
          f"TFLOP/s  ({mu/dt_call_s/197e12*100:5.1f}% of bf16 peak)")
    print(f"MXU tile   : {mt/1e9:7.2f} GFLOP  -> {mt/dt_call_s/1e12:6.1f} "
          f"TFLOP/s  ({mt/dt_call_s/197e12*100:5.1f}% of bf16 peak)")
    line = (f"VPU el-ops : {vp/1e9:7.2f} G      -> "
            f"{vp/dt_call_s/1e12:6.2f} Tops/s")
    if vpu_peak_ops:
        line += f"  ({vp/dt_call_s/vpu_peak_ops*100:5.1f}% of MEASURED peak)"
    print(line)
    print(f"HBM boxes  : {w['hbm_bytes']/1e9:7.2f} GB     -> "
          f"{w['hbm_bytes']/dt_call_s/1e9:6.1f} GB/s "
          f"({w['hbm_bytes']/dt_call_s/819e9*100:5.1f}% of 819 GB/s)")


def main():
    from pais_mvs_tpu.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from pais_mvs_tpu.config import MvsConfig
    from pais_mvs_tpu.data.synthetic import make_scene
    from pais_mvs_tpu.models import patch as patch_mod
    from pais_mvs_tpu.models.camera import build_scene
    from pais_mvs_tpu.ops import lifecycle as lc, geometry as geom
    from pais_mvs_tpu.ops.pallas_fitness import patch_fitness_pallas

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
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
    noise = jax.random.normal(jax.random.PRNGKey(7), (B, P, 3)) \
        * jnp.array((0.02, 0.02, 0.0005))
    pos = jnp.stack([sph[:, 0], sph[:, 1], depth], -1)[:, None, :] + noise

    def timed(cfg_x, reps=30):
        @jax.jit
        def many(pos):
            def body(c, i):
                f = patch_fitness_pallas(scene, cfg_x, ref_cam, pb.cam_mask,
                                         lod, ray, pos + 1e-6 * i)
                return c + jnp.sum(jnp.where(f < 1e19, f, 0.0)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return c
        float(many(pos))
        t0 = time.time()
        float(many(pos))
        return (time.time() - t0) / reps

    dt_wide = timed(cfg.replace(pallas_span_bucket=False))
    report(dt_wide, kernel_work(B=B, P=P), "always-wide KS=128 (production)")
    dt_fast = timed(cfg.replace(pallas_span_bucket=False,
                                pallas_fast_slice=True))
    report(dt_fast, kernel_work(B=B, P=P, ks_wide=64),
           "all-narrow KS=64 (fast_slice)")

    # residual-headroom summary
    w = kernel_work(B=B, P=P)
    wn = kernel_work(B=B, P=P, ks_wide=64)
    print("\nheadroom: VPU el-ops wide/narrow = "
          f"{w['vpu_ops']/1e9:.1f}G / {wn['vpu_ops']/1e9:.1f}G "
          f"({(1-wn['vpu_ops']/w['vpu_ops'])*100:.0f}% saved by KS=64); "
          "weight builds (RwT+CwT) are "
           f"{(w['B']*w['C']*(w['P_padded']//8)*(w['KY']*5+128*3)*w['PT']/w['vpu_ops'])*100:.0f}% "
           "of VPU work")


if __name__ == "__main__":
    main()
