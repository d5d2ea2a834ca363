"""Pallas TPU kernels for the photoconsistency hot loop.

Why the jnp path is slow on TPU: it samples every (patch, particle, pixel,
view) with element-granularity gathers, which the TPU executes serially.
These kernels restructure the work around the hardware:

  * Per (patch, view) a K x K pixel **box** around the warped window is
    DMA'd from the HBM pyramid into VMEM once; all P particles' windows
    sample from that box. The box position exploits two structural facts:
    the reference-window center is depth-invariant (the candidate center
    moves along the reference ray), and the depth search range is ~1 pixel
    of parallax by construction (TMVS/mvs/patch.cpp:463-509), so all
    particles' warped footprints cluster tightly.
  * Bilinear sampling becomes **matmuls on the MXU**: the bilinear weight
    matrices have entries relu(1 - |coord - index|) (built in-register
    from iota). Particles are processed in depth-sorted blocks of 8
    sharing one slice of the box, so one [KY, KS] x [KS, 8*W2] contraction
    serves a whole block (v2; see _cell_body / _block_body). No gathers
    anywhere.
  * The production fitness path (v3, `patch_fitness_pallas` ->
    `_fused_kernel`) keeps ALL of a patch's camera boxes VMEM-resident and
    fuses the cross-camera mean / SAD / adaptive weighting / validity
    reduction (patch.cpp:979-1046) into the same kernel, emitting [B, P]
    fitness directly — the [B, C, P, W2] sample tensor (0.6 GB/call at
    the bench shape) never touches HBM. Per-patch pixel weights
    (distance table x gradient x foreground) are also computed in-kernel
    from the ref camera's box + an edge-atlas box.
  * The NCC/correlation path (`warped_patch_vectors_pallas`) still uses
    the two-stage sampler (`_run_sampler`): it genuinely needs the warped
    vectors for the pairwise table. Staying two-stage is a measured
    choice, not an omission: at P=1 the intermediate [B, C, 1, W2p]
    tensor is ~20 MB (~50 us of HBM traffic against a multi-ms refine
    round) and the normalization/pairwise dots are MXU-friendly XLA —
    fusing them buys < 1% end-to-end.

Samples falling outside the box are flagged invalid; hypotheses needing
them score BIG — with the 128-wide block slice (STRETCH coverage) this
affects no hypothesis the jnp reference accepts in practice: on-device
validity agreement is 1.000 even under deliberately wide hypothesis
noise (re-measured by bench.py's self-test every run). ``cover`` trades
coverage for FLOPs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.models.camera import Scene
from pais_mvs_tpu.ops import fitness as F
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops.geometry import BIG

INVALID = -1e9  # python float: jnp constants cannot be captured by kernels


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sample_kernel(ints_ref, ints2_ref, flts_ref, pflags_ref, images_ref,
                   H_ref, offs_ref, out_ref, box0, box1, sem0, sem1, *,
                   precision, ks_lg):
    """Grid (B, C). Emits warped bilinear samples for one (patch, view).

    ints: [B, C, 4] int32 (bx, by_atlas, by_level, active) in SMEM; ints2 is the SAME
    array windowed at row b+1 (for the cross-row prefetch);
    flts: [B, C, 6] f32 (h, w, ptx, pty, margin_lo, margin_hi) in SMEM;
    pflags: [B, 1, P] int32 per-particle validity in SMEM (0 = the candidate
    is already BIG-fated — facing away / window out of the reference
    frame — so its sampling is skipped entirely);
    images: [C, Ha, Wa] f32 mip-atlas in ANY/HBM; H: [B, C, P, 9] f32 in SMEM;
    offs: [2, W2p] f32 in VMEM (transposed: dx row 0, dy row 1, so pixel
    coordinates are born on the lane axis). out: [B, C, P, W2p] f32.

    The box is DOUBLE-BUFFERED: each cell prefetches the NEXT cell's slab
    into the other buffer (parity = linear cell index % 2) so the HBM copy
    overlaps the current cell's particle loop. Cells whose swarm is
    inactive start no copy and wait on none — the parity schedule is
    data-independent, so producer/consumer stay matched.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    B = pl.num_programs(0)
    C = pl.num_programs(1)
    KY, KX = box0.shape
    P = out_ref.shape[2]
    W2p = out_ref.shape[3]

    act = ints_ref[0, c, 3]
    par = (b * C + c) % 2

    def _copy(bxv, byv, camv, buf, sem):
        # byv is in ATLAS rows (band offset already folded in host-side)
        return pltpu.make_async_copy(
            images_ref.at[camv, pl.ds(byv, KY), pl.ds(bxv, KX)],
            buf, sem)

    def _own_copy(buf, sem):
        return _copy(pl.multiple_of(ints_ref[0, c, 0], 128),
                     pl.multiple_of(ints_ref[0, c, 1], 8),
                     c, buf, sem)

    # the very first cell has no predecessor: issue its own copy
    @pl.when((b == 0) & (c == 0) & (act != 0))
    def _first():
        _own_copy(box0, sem0).start()

    # complete this cell's copy (issued by the predecessor, or just above)
    @pl.when((act != 0) & (par == 0))
    def _w0():
        _own_copy(box0, sem0).wait()

    @pl.when((act != 0) & (par == 1))
    def _w1():
        _own_copy(box1, sem1).wait()

    # prefetch the NEXT cell's slab into the other buffer
    is_last = (b == B - 1) & (c == C - 1)
    in_row = c < C - 1
    nc = jnp.where(in_row, c + 1, 0)
    n_bx = pl.multiple_of(
        jnp.where(in_row, ints_ref[0, nc, 0], ints2_ref[0, nc, 0]), 128)
    n_by = pl.multiple_of(
        jnp.where(in_row, ints_ref[0, nc, 1], ints2_ref[0, nc, 1]), 8)
    n_act = jnp.where(in_row, ints_ref[0, nc, 3], ints2_ref[0, nc, 3])
    do_pf = (~is_last) & (n_act != 0)

    @pl.when(do_pf & (par == 0))
    def _p0():
        _copy(n_bx, n_by, nc, box1, sem1).start()

    @pl.when(do_pf & (par == 1))
    def _p1():
        _copy(n_bx, n_by, nc, box0, sem0).start()

    @pl.when(act != 0)
    def _cell():
        # cast to f32 at the read: the atlas (and the DMA scratch) is
        # bf16, and pltpu.roll on bf16 crashes the compiler
        box_f = jax.lax.cond(par == 0, lambda: box0[:, :],
                             lambda: box1[:, :]).astype(jnp.float32)
        _cell_body(ints_ref, flts_ref, pflags_ref, H_ref,
                   offs_ref, out_ref, box_f, c, KY, KX, P, W2p, precision,
                   ks_lg)


# Warp-stretch the BOX (DMA extent) must survive. The region-ratio gate
# drops cameras whose window stretches beyond ~1/0.55 = 1.8x, but the gate
# runs AFTER each PSO (removeInvisibleCamera) — DURING the swarm the
# reference scores arbitrarily tilted hypotheses finitely, and the seed
# swarms sample the FULL theta range.
STRETCH = 2.6


def _slice_width(W2p: int, KX: int, ks: int) -> int:
    """Column width of the per-block box slice, clipped to the box.

    The production fitness path launches the kernel at TWO static widths
    per call (span bucketing, see ``_narrow_fit_mask``): 64 for patches
    whose every particle window provably fits the narrow slice, 128 for
    the rest. 128 covers the near-grazing normals whose warped u-span
    exceeds 64 (~7% of seed candidates on a wide-baseline rig; measured
    p90 span 111 px on the pawn cameras — falsely-BIG clipping that cost
    5x seed accuracy on real texture). The MXU contraction is flat in K up
    to 128; _bilinear_block puts the LARGER of (KS, KY) on the MXU so only
    the VPU weight build scales with the width (~25% of kernel time at
    128) — which is exactly what the narrow bucket saves.
    """
    return min(ks, KX)


def _hat_weights(coord, iota, bf16):
    """Bilinear hat weights max(1 - |coord - i|, 0) for every integer
    lane/sublane index i (``iota`` [K, 1]) against per-pixel coordinates
    ``coord`` [1, T] (the kernel's dominant VPU term; patch.cpp:1005-1017
    is the per-pixel bilinear this vectorizes).

    ``bf16=True`` builds at the VPU's bf16 element rate using the RESIDUAL
    formulation: round(coord) and the iota are exact in bf16 (integers
    <= 256 here), so only the fractional residual carries quantization and
    the built weight equals bf16(f32 weight) to 1 ulp. A raw coordinate
    cast would quantize coord itself (+-0.2 px at coord ~ 100) — the
    exact error class the realistic-imagery gate exists to catch
    (BASELINE.md round 2). Non-finite coords yield NaN weights here where
    f32 yields 0/NaN; both are dead lanes (the caller's ok mask fails the
    same bound compares) and are zeroed at the scratch write.
    """
    if not bf16:
        return jnp.maximum(1.0 - jnp.abs(coord - iota), 0.0)
    c0 = jnp.round(coord)
    frac = (coord - c0).astype(jnp.bfloat16)                  # |.| <= 0.5
    d = (c0.astype(jnp.bfloat16) - iota.astype(jnp.bfloat16)) + frac
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def _sample_block(hs, flags, box_f, x, y, px, py, bxf, byf,
                  h_img, w_img, mlo, mhi, iota_lg, iota_ys,
                  KX, KY, PB, precision, write, bf16_vpu=0, shared=None):
    """One particle block x one camera: bilinear-sample all PB particles'
    warped windows from the block's 128-wide box slice and call
    ``write(val [1, PB*T], ok [1, PB*T])``.

    hs: per-particle lists of 9 homography scalars; flags: per-particle
    validity scalars; box_f: [KY, KX] f32; x/y: [1, T] ref-window pixel
    coordinates; mlo/mhi: bounds margins.

    ``shared``: optional pre-rolled cell-level slice ``(box_p, xoff_f)``
    (the roll-hoist path, cfg.pallas_roll_hoist): the caller rolled the
    box ONCE per (patch, camera) cell on the whole-swarm mean center and
    all blocks sample from it — the per-block scalar centering pass and
    the per-block roll are skipped; ``box_f`` is unused then.
    """
    KS_LG = iota_lg.shape[0]
    # which hat matrix feeds the MXU vs the VPU reduce follows
    # _bilinear_block's contraction choice for this launch width
    contract_x = KS_LG >= KY
    mxu_bf16 = precision is None and bf16_vpu >= 1
    vpu_bf16 = precision is None and bf16_vpu >= 2
    rw_bf16 = mxu_bf16 if contract_x else vpu_bf16
    cw_bf16 = vpu_bf16 if contract_x else mxu_bf16

    # scalar pass: block slice centering = mean valid warped center
    # (skipped under the roll hoist — the cell-level center was computed
    # once over the whole swarm by the caller)
    if shared is None:
        ucs, n_ok = 0.0, 0
        for j in range(PB):
            h = hs[j]
            wc = h[6] * px + h[7] * py + h[8]
            uc = (h[0] * px + h[1] * py + h[2]) / jnp.where(wc == 0, 1.0, wc)
            fj = (flags[j] != 0) & (wc != 0)
            ucs = ucs + jnp.where(fj, uc, 0.0)
            n_ok = n_ok + fj.astype(jnp.int32)
        center_lg = ucs / jnp.maximum(n_ok, 1).astype(jnp.float32)
    else:
        center_lg = None

    # shared vector pass: per-particle u/v + margin validity
    us, vs, oks = [], [], []
    for j in range(PB):
        h = hs[j]
        wq = h[6] * x + h[7] * y + h[8]                       # [1, T]
        swq = jnp.where(wq == 0, 1.0, wq)
        u = (h[0] * x + h[1] * y + h[2]) / swq
        v = (h[3] * x + h[4] * y + h[5]) / swq
        ok = ((wq != 0) & (flags[j] != 0)
              & (u >= mlo) & (u < w_img - mhi)
              & (v >= mlo) & (v < h_img - mhi))
        us.append(u)
        vs.append(v)
        oks.append(ok)
    u_blk = jnp.concatenate(us, axis=1)                       # [1, PB*T]
    v_blk = jnp.concatenate(vs, axis=1)
    okm_blk = jnp.concatenate(oks, axis=1)
    vb = v_blk - byf
    okm_blk = okm_blk & (vb >= 0) & (vb <= KY - 2)
    CwT = _hat_weights(vb, iota_ys, cw_bf16)                  # [KY, PB*T]

    def emit(ks, iota_xs, center_u):
        if shared is not None:
            box_p, xoff_f = shared
        else:
            xoff = jnp.clip(center_u.astype(jnp.int32)
                            - bxf.astype(jnp.int32) - ks // 2, 0, KX - ks)
            # dynamic lane-roll + static slice (Mosaic has no dynamic lane
            # slicing); wrapped columns land beyond ub's [0, ks-2] validity
            # window, so they are never read as valid samples. Roll in f32
            # (bf16 roll crashes the compiler), cast after.
            box_p = pltpu.roll(box_f, -xoff, 1)[:, :ks]
            if precision is None:
                box_p = box_p.astype(jnp.bfloat16)
            xoff_f = xoff.astype(jnp.float32)
        ub = u_blk - bxf - xoff_f
        ok_blk = okm_blk & (ub >= 0) & (ub <= ks - 2)
        RwT = _hat_weights(ub, iota_xs, rw_bf16)              # [ks, PB*T]
        val = _bilinear_block(box_p, RwT, CwT, ks, KY, precision)
        write(val, ok_blk)

    # NOTE: a per-block narrow/wide dispatch (pl.when on the corner span)
    # was measured SLOWER than always-wide (310 vs 442 p/s at the bench):
    # the data-dependent branches defeat Mosaic's cross-block
    # MXU/VPU pipelining and double the compiled body. Always-wide costs
    # ~28% vs the old 64-slice but eliminates the falsely-BIG clipping of
    # near-grazing hypotheses entirely (validity agreement 1.000).
    emit(KS_LG, iota_lg, center_lg)


def _bilinear_block(box_p, RwT, CwT, KS, KY, precision, contract_x=None):
    """val[t] = sum_xy box[y, x] * Rw[x, t] * Cw[y, t] with one weight
    matrix contracted on the MXU (one K-tile up to 128 either way) and the
    row-weighted reduce over the other axis on the VPU.

    ``contract_x=None`` picks the branch with the smaller MXU output and
    VPU reduce: KS=64 < KY contracts y ([64, PT] out, 64-row reduce) —
    this is where the narrow launch's ~25% saving lives. The price is
    that narrow and wide launches quantize different weight matrices to
    bf16, so dual-width fitness agrees with always-wide only to bf16
    tolerance (the same bound as kernel-vs-jnp parity; pinning
    contract_x=True was measured to erase the entire narrow gain)."""
    if contract_x is None:
        contract_x = KS >= KY
    # pallas_bf16_vpu=2 marks the VPU-side hat matrix bf16 (built by
    # _hat_weights, residual formulation): cast the MXU result to bf16 and
    # run the row-weighted reduce at the VPU's bf16 element rate. Mosaic
    # REQUIRES a 32-bit matmul accumulator on real TPU (a bf16
    # preferred_element_type verifies on CPU interpret mode but fails
    # 'Expected matmul acc to be 32-bit' on-device), so the downcast
    # happens after the dot, not inside it. The hat has <= 2 nonzero rows
    # per column, so the bf16 reduce only ever adds exact zeros — it loses
    # no precision beyond the bf16 product rounding.
    vpu_bf16 = precision is None and \
        (CwT if contract_x else RwT).dtype == jnp.bfloat16
    if precision is None:
        cast = lambda m: m.astype(jnp.bfloat16)
        # pin DEFAULT explicitly: a global jax_default_matmul_precision
        # override must not reach the bf16 kernel dots (Mosaic rejects
        # 'highest' on bf16 operands)
        kw = dict(precision=jax.lax.Precision.DEFAULT,
                  preferred_element_type=jnp.float32)
    else:
        cast = lambda m: m
        kw = dict(precision=precision, preferred_element_type=jnp.float32)
    down = (lambda m: m.astype(jnp.bfloat16)) if vpu_bf16 else (lambda m: m)
    if contract_x:
        # contract x on the MXU: [KY, KS] x [KS, PT] -> [KY, PT]
        tmp = jax.lax.dot_general(box_p, cast(RwT),
                                  (((1,), (0,)), ((), ())), **kw)
        out = jnp.sum(down(tmp) * CwT, axis=0, keepdims=True)
    else:
        # contract y on the MXU: [KY, KS]^T-contract [KY, PT] -> [KS, PT]
        S = jax.lax.dot_general(box_p, cast(CwT),
                                (((0,), (0,)), ((), ())), **kw)
        out = jnp.sum(down(S) * RwT, axis=0, keepdims=True)
    return out.astype(jnp.float32) if vpu_bf16 else out


def _cell_body(ints_ref, flts_ref, pflags_ref, H_ref, offs_ref,
               out_ref, box_f, c, KY, KX, P, W2p, precision, ks_lg):
    """Particle-BLOCK batched sampling (kernel v2).

    Particles are processed in blocks of PB=8 sharing one KS-wide column
    slice of the box (centered on the block's mean warped center — valid
    because the warped window center is the projection of the 3D candidate
    center, which depends only on depth, and the host depth-sorts particles
    so block members cluster). Per block the bilinear interp is ONE MXU
    matmul contracting the box's y axis against the column weights for all
    PB*T pixels at once, then a VPU row-weighted reduce over KS rows — vs
    v1's per-particle [KY,64]x[64,T] matmuls the MXU N axis is 8x fuller
    and the rolls drop from P to NB per cell. The static Python block loop
    (not fori_loop) lets Mosaic software-pipeline MXU and VPU across
    blocks; measured 2.1x vs v1 (tools/microbench_kernel.py: A=11.1 vs
    L=5.3 us/cell).
    """
    bx = pl.multiple_of(ints_ref[0, c, 0], 128)
    by = pl.multiple_of(ints_ref[0, c, 2], 8)   # LEVEL-coords box origin
    h_img = flts_ref[0, c, 0]
    w_img = flts_ref[0, c, 1]

    # window pixel coordinates in the reference LOD image (shared by all
    # particles: the ref projection is depth-invariant along the ray)
    px = flts_ref[0, c, 2]
    py = flts_ref[0, c, 3]
    mlo = flts_ref[0, c, 4]
    mhi = flts_ref[0, c, 5]

    T = W2p                                                   # whole window
    PB = 8 if P % 8 == 0 else 1
    NB = P // PB
    KS_LG = _slice_width(W2p, KX, ks_lg)
    # TRANSPOSED weight layout: pixels stay on the LANE axis from the u,v
    # math through the weights, the matmul N axis, the reduction, and the
    # final store — no lane<->sublane relayouts anywhere in the loop (the
    # [T]-vector-to-matrix-row path was v0's real bottleneck)
    iota_lg = jax.lax.broadcasted_iota(jnp.int32, (KS_LG, 1), 0) \
        .astype(jnp.float32)
    iota_ys = jax.lax.broadcasted_iota(jnp.int32, (KY, 1), 0) \
        .astype(jnp.float32)

    bxf = bx.astype(jnp.float32)
    byf = by.astype(jnp.float32)
    x = px + offs_ref[0:1, :]                                 # [1, T]
    y = py + offs_ref[1:2, :]

    for i in range(NB):
        hs = [[H_ref[0, 0, i * PB + j, k] for k in range(9)]
              for j in range(PB)]
        flags = [pflags_ref[0, 0, i * PB + j] for j in range(PB)]
        n_any = flags[0] * 0
        for f in flags:
            n_any = n_any + (f != 0).astype(jnp.int32)

        def _write(val, ok_blk, i=i):
            res = jnp.where(ok_blk, val, -1e9).reshape(PB, T)
            out_ref[0, 0, pl.ds(i * PB, PB), :] = res

        @pl.when(n_any > 0)
        def _blk(hs=hs, flags=flags, w=_write):
            _sample_block(hs, flags, box_f, x, y, px, py, bxf, byf,
                          h_img, w_img, mlo, mhi, iota_lg, iota_ys,
                          KX, KY, PB, precision, w)


def _run_sampler(scene: Scene, cfg: MvsConfig, H, pt, lod, margins,
                 cover: int, precise: bool, interpret: bool, act=None,
                 cover_y: int | None = None, pvalid=None):
    """Launch the sampling kernel over the full scene (see _run_sampler_raw
    for the camera-block form the view-sharded SPMD path uses)."""
    pyrs = scene.pyramids
    return _run_sampler_raw(pyrs.images, pyrs.dims, pyrs.yoff, cfg, H, pt,
                            lod, margins, cover, precise, interpret, act,
                            cover_y, pvalid)


def _run_sampler_raw(images, dims, yoff, cfg: MvsConfig, H, pt, lod, margins,
                     cover: int, precise: bool, interpret: bool, act=None,
                     cover_y: int | None = None, pvalid=None):
    """Launch the sampling kernel on a raw atlas block.

    images: [C, Ha, Wa] mip-atlas (the FULL scene, or one view shard's
    camera block — the kernel only ever indexes cameras that appear in H);
    dims: [C, L, 2] per-level dims for those same cameras; yoff: [L+1].
    H: [B, P, C, 3, 3] homographies; pt: [B, 2] reference-window centers
    (LOD coords); lod: [B]; margins: (lo, hi) bounds margins; act: [B, C]
    bool — cells to compute (inactive cells emit garbage the caller must
    mask; None = all).
    Returns warped samples [B, C, P, W2] (INVALID where out of bounds/box).
    """
    B, P, C = H.shape[:3]
    r = cfg.patch_radius
    Ha, Wa = images.shape[1], images.shape[2]
    # y is the matmul contraction dim (zero-padded to the MXU's 128 lanes
    # regardless), so keep the box SHORT in y — just enough rows for the
    # warped window footprint — and let x carry the 128-lane alignment
    if cover_y is None:
        cover_y = cover
    KY = min(_round_up(2 * cover_y + 7, 8), (Ha // 8) * 8)
    KX = min(_round_up(2 * cover + 127, 128), Wa)
    W2 = (2 * r + 1) ** 2
    W2p = _round_up(W2, 128)
    cover_y = (KY - 7) // 2
    cover_x = (KX - 127) // 2

    # box origins: median warped window center over particles, tile-aligned
    # and clamped so the [KY, KX] slab stays inside the atlas. by_lvl is the
    # origin in LEVEL coordinates (for the kernel's validity math); by_atl
    # adds the mip-band row offset (for the DMA) and may differ from
    # yoff+by_lvl only through the atlas-bounds clip, which by_lvl mirrors.
    uvc, _ = geom.homography_apply(H, pt[:, None, None, :])   # [B,P,C,2]
    uvc = jnp.where(jnp.isfinite(uvc), uvc, 0.0)
    ctr = jnp.median(uvc, axis=1)                             # [B, C, 2]
    hw = dims[jnp.arange(C)[None, :], lod[:, None]]           # [B, C, 2]
    hwf = hw.astype(jnp.float32)
    cx = jnp.round(ctr[..., 0]).astype(jnp.int32)
    cy = jnp.round(ctr[..., 1]).astype(jnp.int32)
    bx = jnp.clip(((cx - cover_x) // 128) * 128, 0, Wa - KX)
    yoff_b = yoff[lod][:, None]                               # [B, 1]
    by_atl = jnp.clip(yoff_b + ((cy - cover_y) // 8) * 8, 0, Ha - KY)
    by_lvl = by_atl - yoff_b

    # pad the particle axis to the kernel's block size (PB=8) — AFTER the
    # box-placement median above, which must see only real particles;
    # padded particles carry pflag=0 so all-padding blocks are skipped
    P_out = P
    if P > 1 and P % 8 != 0:
        P_pad = _round_up(P, 8)
        H = jnp.pad(H, ((0, 0), (0, P_pad - P), (0, 0), (0, 0), (0, 0)))
        if pvalid is None:
            pvalid = jnp.concatenate(
                [jnp.ones((B, P), bool),
                 jnp.zeros((B, P_pad - P), bool)], axis=1)
        else:
            pvalid = jnp.pad(pvalid, ((0, 0), (0, P_pad - P)))
        P = P_pad

    offs_np = F.window_offsets(r)                             # [W2, 2]
    offs_t = np.full((2, W2p), 1e7, dtype=np.float32)         # pad -> invalid
    offs_t[:, :W2] = offs_np.T
    offs = jnp.asarray(offs_t)

    Hflat = jnp.transpose(H, (0, 2, 1, 3, 4)).reshape(B, C, P, 9)

    # pack the per-(patch, view) scalars into two small SMEM arrays
    if act is None:
        act_i = jnp.ones((B, C), dtype=jnp.int32)
    else:
        act_i = act.astype(jnp.int32)
    ints = jnp.stack([bx, jnp.broadcast_to(by_atl, (B, C)),
                      jnp.broadcast_to(by_lvl, (B, C)), act_i], axis=-1)
    if pvalid is None:
        pflags = jnp.ones((B, 1, P), dtype=jnp.int32)
    else:
        pflags = pvalid.astype(jnp.int32)[:, None, :]
    mlo = jnp.full((B, C, 1), margins[0], dtype=jnp.float32)
    mhi = jnp.full((B, C, 1), margins[1], dtype=jnp.float32)
    flts = jnp.concatenate(
        [hwf, jnp.broadcast_to(pt[:, None, :], (B, C, 2)), mlo, mhi], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, C, 4), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # ints (row b)
            pl.BlockSpec((1, C, 4),                           # ints (row b+1)
                         lambda b, c: (jnp.minimum(b + 1, B - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 6), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # flts
            pl.BlockSpec((1, 1, P), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # pflags
            pl.BlockSpec(memory_space=pl.ANY),                # images
            pl.BlockSpec((1, 1, P, 9), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.SMEM),            # H (scalars)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # offs
        ],
        out_specs=pl.BlockSpec((1, 1, P, W2p),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KY, KX), images.dtype),               # box0
            pltpu.VMEM((KY, KX), images.dtype),               # box1
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    # precision None -> explicit bf16 operands (single MXU pass);
    # precise=True -> full-f32 multiplies at ~3x the MXU passes.
    prec = jax.lax.Precision.HIGHEST if precise else None
    vals = pl.pallas_call(
        functools.partial(_sample_kernel, precision=prec,
                          ks_lg=64 if cfg.pallas_fast_slice else 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, P, W2p), jnp.float32),
        interpret=interpret,
    )(ints, ints, flts, pflags, images, Hflat, offs)
    return vals[:, :, :P_out, :W2]


# ---------------------------------------------------------------------------
# fused fitness kernel (v3): samples AND the cross-camera weighted-SAD
# reduction in one pass, emitting [B, P] fitness directly
# ---------------------------------------------------------------------------

def _fused_kernel(ints_ref, ints2_ref, scal_ref, flts_ref, pflags_ref,
                  images_ref, edges_ref, H_ref, offs_ref, out_ref,
                  boxes0, boxes1, ebox0, ebox1, sam, okf, sem0, sem1,
                  esem0, esem1, *, precision, use_diff, diff_w,
                  use_dist, use_grad, grad_w, ks_lg, bf16_vpu, roll_hoist):
    """Grid (B,). One patch per step: all C camera boxes live in VMEM
    (double-buffered across patches), every particle block is sampled per
    camera into ``sam``/``okf`` scratch, and the per-pixel mean / SAD /
    adaptive-difference weighting / candidate-validity reduction
    (TMVS/mvs/patch.cpp:979-1046) happens in VMEM. Output is [1, P, 1]
    fitness — vs the v2 two-stage design this removes the [B, C, P, W2]
    sample tensor (0.6 GB/call at the bench shape) and its XLA epilogue
    passes from HBM entirely.

    ints: [1, C, 5] i32 (bx, by_atlas, by_level, act, is_ref); ints2: row
    b+1; scal: [1, 1, 4] f32 (patch_active, cam_num, -, -);
    flts: [1, C, 4] f32 (h, w, ptx, pty);
    pflags: [1, 1, P] i32 per-particle validity (facing/in-frame/hok gates);
    H: [1, C, P, 9] f32; offs: [4, W2p] f32 (dx, dy, dist-weight, pad;
    dx/dy padding -> 1e7).

    The per-patch pixel weights (Gaussian distance table x gradient
    x foreground; mvs.cpp:97-114, patch.cpp:986,1029-1038) are computed
    IN-kernel from the reference camera's box and an edge-atlas box
    (nearest lookup == bilinear at rounded coordinates, same matmul
    machinery) — the window rows are contiguous in the box, where the jnp
    path's per-element gathers cost more than the whole kernel.
    """
    b = pl.program_id(0)
    B = pl.num_programs(0)
    C, KY, KX = boxes0.shape
    P = out_ref.shape[1]
    W2p = offs_ref.shape[1]
    PB = 8 if P % 8 == 0 else 1
    NB = P // PB
    PT = PB * W2p
    par = b % 2

    def _copy(src, c, bxv, byv, buf, sem):
        return pltpu.make_async_copy(
            src.at[c, pl.ds(byv, KY), pl.ds(bxv, KX)],
            buf, sem)

    def _own(c, buf, sem):
        return _copy(images_ref, c,
                     pl.multiple_of(ints_ref[0, c, 0], 128),
                     pl.multiple_of(ints_ref[0, c, 1], 8),
                     buf.at[c], sem.at[c])

    # the reference camera's row of ints (scalar blend over is_ref)
    def _ref_scalars(iref):
        rv = iref[0, 0, 4] * 0
        rbx = rv
        rby = rv
        for c in range(C):
            isr = iref[0, c, 4]
            rv = rv + c * isr
            rbx = rbx + iref[0, c, 0] * isr
            rby = rby + iref[0, c, 1] * isr
        return rv, pl.multiple_of(rbx, 128), pl.multiple_of(rby, 8)

    rv, rbx, rby = _ref_scalars(ints_ref)
    nrv, nrbx, nrby = _ref_scalars(ints2_ref)

    def _ecopy(rvv, bxv, byv, buf, sem):
        return _copy(edges_ref, rvv, bxv, byv, buf, sem)

    @pl.when(b == 0)
    def _efirst():
        _ecopy(rv, rbx, rby, ebox0, esem0).start()

    for c in range(C):
        @pl.when((b == 0) & (ints_ref[0, c, 3] != 0))
        def _first(c=c):
            _own(c, boxes0, sem0).start()

    for c in range(C):
        @pl.when((ints_ref[0, c, 3] != 0) & (par == 0))
        def _w0(c=c):
            _own(c, boxes0, sem0).wait()

        @pl.when((ints_ref[0, c, 3] != 0) & (par == 1))
        def _w1(c=c):
            _own(c, boxes1, sem1).wait()

    @pl.when(par == 0)
    def _ew0():
        _ecopy(rv, rbx, rby, ebox0, esem0).wait()

    @pl.when(par == 1)
    def _ew1():
        _ecopy(rv, rbx, rby, ebox1, esem1).wait()

    # prefetch the next patch's boxes into the other buffer
    for c in range(C):
        nact = ints2_ref[0, c, 3]
        nbx = pl.multiple_of(ints2_ref[0, c, 0], 128)
        nby = pl.multiple_of(ints2_ref[0, c, 1], 8)

        @pl.when((b < B - 1) & (nact != 0) & (par == 0))
        def _p0(c=c, nbx=nbx, nby=nby):
            _copy(images_ref, c, nbx, nby, boxes1.at[c], sem1.at[c]).start()

        @pl.when((b < B - 1) & (nact != 0) & (par == 1))
        def _p1(c=c, nbx=nbx, nby=nby):
            _copy(images_ref, c, nbx, nby, boxes0.at[c], sem0.at[c]).start()

    @pl.when((b < B - 1) & (par == 0))
    def _ep0():
        _ecopy(nrv, nrbx, nrby, ebox1, esem1).start()

    @pl.when((b < B - 1) & (par == 1))
    def _ep1():
        _ecopy(nrv, nrbx, nrby, ebox0, esem0).start()

    @pl.when(scal_ref[0, 0, 0] == 0)
    def _dead():
        out_ref[0, :, :] = jnp.full((P, 1), float(BIG), jnp.float32)

    @pl.when(scal_ref[0, 0, 0] != 0)
    def _alive():
        _fused_body(ints_ref, scal_ref, flts_ref, pflags_ref, H_ref,
                    offs_ref, out_ref, boxes0, boxes1, ebox0, ebox1,
                    sam, okf, par, C, KY, KX, P, PB, NB, PT, W2p,
                    precision, use_diff, diff_w, use_dist, use_grad, grad_w,
                    ks_lg, bf16_vpu, roll_hoist)


def _fused_body(ints_ref, scal_ref, flts_ref, pflags_ref, H_ref, offs_ref,
                out_ref, boxes0, boxes1, ebox0, ebox1, sam, okf, par,
                C, KY, KX, P, PB, NB, PT, W2p, precision, use_diff, diff_w,
                use_dist, use_grad, grad_w, ks_lg, bf16_vpu, roll_hoist):
    cn = scal_ref[0, 0, 1]
    px = flts_ref[0, 0, 2]                  # ref-window center (all rows eq)
    py = flts_ref[0, 0, 3]
    x = px + offs_ref[0:1, :]                                 # [1, W2p]
    y = py + offs_ref[1:2, :]
    KS_LG = _slice_width(W2p, KX, ks_lg)
    KS_SM = min(64, KS_LG)
    iota_sm = jax.lax.broadcasted_iota(jnp.int32, (KS_SM, 1), 0) \
        .astype(jnp.float32)
    iota_lg = jax.lax.broadcasted_iota(jnp.int32, (KS_LG, 1), 0) \
        .astype(jnp.float32)
    iota_ys = jax.lax.broadcasted_iota(jnp.int32, (KY, 1), 0) \
        .astype(jnp.float32)
    r_c = int(np.sqrt(W2p)) // 2 + 1

    # ---- per-patch pixel weights from the ref box + edge box ----
    # (nearest == bilinear at rounded integer coordinates)
    rbxf, rbyf = 0.0, 0.0
    for c in range(C):
        isrf = ints_ref[0, c, 4].astype(jnp.float32)
        rbxf = rbxf + ints_ref[0, c, 0].astype(jnp.float32) * isrf
        rbyf = rbyf + ints_ref[0, c, 2].astype(jnp.float32) * isrf
    # hoist the parity select: one box read per camera per patch (cast
    # bf16 -> f32 at the read; rolls/blends need f32)
    box_vals = [jax.lax.cond(par == 0, lambda c=c: boxes0[c],
                             lambda c=c: boxes1[c]).astype(jnp.float32)
                for c in range(C)]
    rbox = jnp.zeros((KY, KX), jnp.float32)
    for c in range(C):
        isrf = ints_ref[0, c, 4].astype(jnp.float32)
        rbox = rbox + box_vals[c] * isrf
    ebox = jax.lax.cond(par == 0, lambda: ebox0[:, :],
                        lambda: ebox1[:, :]).astype(jnp.float32)

    # the ref window is UNWARPED (identity homography), so its span is
    # exactly 2r+1 <= the narrow slice — the nearest pass never needs the
    # wide width
    padm = offs_ref[0:1, :] < 1e6                             # real pixels
    xr = jnp.round(jnp.where(padm, x, 0.0))
    yr = jnp.round(jnp.where(padm, y, 0.0))
    xoff_r = jnp.clip(jnp.round(px).astype(jnp.int32)
                      - rbxf.astype(jnp.int32) - KS_SM // 2, 0, KX - KS_SM)
    ubr = xr - rbxf - xoff_r.astype(jnp.float32)
    vbr = yr - rbyf
    RwTr = jnp.maximum(1.0 - jnp.abs(ubr - iota_sm), 0.0)     # [KS_SM, W2p]
    CwTr = jnp.maximum(1.0 - jnp.abs(vbr - iota_ys), 0.0)     # [KY, W2p]
    rbox_s = pltpu.roll(rbox, -xoff_r, 1)[:, :KS_SM]
    ebox_s = pltpu.roll(ebox, -xoff_r, 1)[:, :KS_SM]
    in_box = ((ubr >= 0) & (ubr <= KS_SM - 2) & (vbr >= 0)
              & (vbr <= KY - 2) & padm)
    # single-pass bf16 is EXACT for the indicator weights (0/1 and integer
    # coordinates <= 256 are bf16-representable) and preserves the
    # zero-vs-nonzero foreground test (bf16 of a nonzero 1..255 intensity
    # is never 0); edge values only feed a smooth weight — but the precise
    # path keeps full f32 so strict parity vs the jnp reference holds
    def _nn(box_s):
        if precision is None:
            box_s = box_s.astype(jnp.bfloat16)
        return _bilinear_block(box_s, RwTr, CwTr, KS_SM, KY, precision)

    ref_val = _nn(rbox_s)
    fg = jnp.where(in_box & (ref_val != 0), 1.0, 0.0)
    w_pix = fg
    if use_dist:
        w_pix = w_pix * offs_ref[2:3, :]
    if use_grad:
        edge_val = _nn(ebox_s)
        safe_edge = jnp.maximum(edge_val * grad_w, 1e-20)
        w_pix = w_pix * jnp.exp(-1.0 / safe_edge)

    wt = jnp.concatenate([w_pix] * PB, axis=1)                # [1, PT]
    ft = jnp.concatenate([fg] * PB, axis=1)

    # ---- roll hoist (microbench variant R): one lane-alignment roll per
    # (patch, camera) cell instead of one per particle block — every block
    # samples from a shared KS_LG-wide slice centered on the whole-swarm
    # mean warped center. The swarm's depth range is ~1 px of parallax by
    # construction so block means cluster within a few px of the cell
    # mean; particles whose footprint still escapes the shared slice fail
    # the same [0, ks-2] bounds check the per-block slice enforces.
    shared_slices = None
    if roll_hoist:
        shared_slices = []
        for c in range(C):
            ucs = 0.0
            n_ok = ints_ref[0, 0, 0] * 0
            for j in range(P):
                wc = H_ref[0, c, j, 6] * px + H_ref[0, c, j, 7] * py \
                    + H_ref[0, c, j, 8]
                uc = (H_ref[0, c, j, 0] * px + H_ref[0, c, j, 1] * py
                      + H_ref[0, c, j, 2]) / jnp.where(wc == 0, 1.0, wc)
                fj = (pflags_ref[0, 0, j] != 0) & (wc != 0)
                ucs = ucs + jnp.where(fj, uc, 0.0)
                n_ok = n_ok + fj.astype(jnp.int32)
            center = ucs / jnp.maximum(n_ok, 1).astype(jnp.float32)
            xoff = jnp.clip(center.astype(jnp.int32) - ints_ref[0, c, 0]
                            - KS_LG // 2, 0, KX - KS_LG)
            slc = pltpu.roll(box_vals[c], -xoff, 1)[:, :KS_LG]
            if precision is None:
                slc = slc.astype(jnp.bfloat16)
            shared_slices.append((slc, xoff.astype(jnp.float32)))

    for i in range(NB):
        flags = [pflags_ref[0, 0, i * PB + j] for j in range(PB)]
        nval = flags[0] * 0
        for f in flags:
            nval = nval + (f != 0).astype(jnp.int32)

        @pl.when(nval == 0)
        def _skip(i=i):
            out_ref[0, pl.ds(i * PB, PB), :] = jnp.full(
                (PB, 1), float(BIG), jnp.float32)

        @pl.when(nval > 0)
        def _blk(i=i, flags=flags):
            sb = i % 2                        # scratch parity (see _run_fused)
            # ---- pass A: per-camera warped samples into scratch ----
            for c in range(C):
                act_c = ints_ref[0, c, 3]

                @pl.when(act_c != 0)
                def _cam(c=c, i=i, flags=flags, sb=sb):
                    hs = [[H_ref[0, c, i * PB + j, k] for k in range(9)]
                          for j in range(PB)]

                    def w(val, ok, c=c, sb=sb):
                        sam[sb, pl.ds(c, 1), :] = jnp.where(ok, val, 0.0)
                        okf[sb, pl.ds(c, 1), :] = ok.astype(jnp.float32)

                    _sample_block(
                        hs, flags, box_vals[c], x, y, px, py,
                        ints_ref[0, c, 0].astype(jnp.float32),
                        ints_ref[0, c, 2].astype(jnp.float32),
                        flts_ref[0, c, 0], flts_ref[0, c, 1],
                        2.0, 3.0, iota_lg, iota_ys,
                        KX, KY, PB, precision, w, bf16_vpu=bf16_vpu,
                        shared=None if shared_slices is None
                        else shared_slices[c])

                @pl.when(act_c == 0)
                def _cam0(c=c, sb=sb):
                    sam[sb, pl.ds(c, 1), :] = jnp.zeros((1, PT), jnp.float32)
                    okf[sb, pl.ds(c, 1), :] = jnp.ones((1, PT), jnp.float32)

            # ---- pass B: cross-camera weighted-SAD reduction (VMEM) ----
            sum_v = sam[sb, 0:1, :]
            for c in range(1, C):
                sum_v = sum_v + sam[sb, pl.ds(c, 1), :]
            mean = sum_v / cn
            absdev = jnp.zeros((1, PT), jnp.float32)
            okacc = jnp.ones((1, PT), jnp.float32)
            for c in range(C):
                # SAD masks per-CAMERA activity (actf), not per-pixel
                # validity (okf) like the jnp reference: an invalid pixel's
                # deviation only matters when the pixel carries weight, and
                # (a) foreground pixels with ANY invalid camera trigger the
                # 1e30 kill below, (b) non-foreground pixels have w_pix = 0.
                # Any change to the kill or weight logic must revisit this.
                actf = (ints_ref[0, c, 3] != 0).astype(jnp.float32)
                absdev = absdev + jnp.abs(sam[sb, pl.ds(c, 1), :] - mean) \
                    * actf
                okacc = okacc * okf[sb, pl.ds(c, 1), :]
            sad = absdev / cn

            w = wt
            if use_diff:
                w = w * jnp.exp(-sad * sad * (1.0 / diff_w))
            # fold the kill condition (fg pixel with any invalid camera,
            # patch.cpp:998-1002) into the weight row as a huge negative:
            # one lane->sublane relayout for both reductions instead of 3
            wk = w - 1e30 * (ft * (1.0 - okacc))
            both = jnp.concatenate([wk, w * sad], axis=0)     # [2, PT]
            sums = jnp.sum(both.reshape(2 * PB, W2p), axis=1,
                           keepdims=True)                     # [2PB, 1]
            sw = sums[:PB]
            sws = sums[PB:]
            fit = jnp.where(sw > 0, sws / jnp.where(sw > 0, sw, 1.0),
                            float(BIG))
            out_ref[0, pl.ds(i * PB, PB), :] = fit


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cover", "interpret", "precise"))
def warped_patch_vectors_pallas(scene: Scene, cfg: MvsConfig,
                                center, normal, ref_cam, cam_mask, lod,
                                cover: int | None = None,
                                interpret: bool = False,
                                precise: bool = False):
    """Pallas-backed equivalent of ops.fitness.warped_patch_vectors (NCC
    correlation tables; TMVS/mvs/patch.cpp:221-267, 332-386). Uses the same
    box sampler with the NCC path's looser [0, dim-1) bounds."""
    rig, pyrs = scene.rig, scene.pyramids
    B = center.shape[0]
    C = rig.num_cameras
    r = cfg.patch_radius
    if cover is None:
        cover = int((STRETCH + 0.4) * r) + 8
    cover_y = int(1.6 * r) + 10
    lod_scale = jnp.power(jnp.float32(cfg.lod_ratio), lod.astype(jnp.float32))
    H, hok = F._per_camera_homographies(scene, center, normal, ref_cam,
                                        lod_scale)            # [B, C, 3, 3]

    def _proj(Xb, c, s):
        return geom.project(Xb, rig.R[c], rig.T[c], rig.focal[c],
                            rig.principal[c], s)[0]
    pt = jax.vmap(_proj)(center, ref_cam, lod_scale)          # [B, 2]

    vals = _run_sampler(scene, cfg, H[:, None], pt, lod, (0.0, 1.0),
                        cover, precise, interpret,
                        act=cam_mask, cover_y=cover_y)        # [B, C, 1, W2]
    vals = vals[:, :, 0, :]                                   # [B, C, W2]
    vok = vals > INVALID / 2
    ok = jnp.all(jnp.all(vok, axis=-1) | ~cam_mask, axis=-1)
    ok &= jnp.all(hok | ~cam_mask, axis=-1)

    # masked cams' cells were skipped in the kernel and hold garbage —
    # zero them before the NCC normalization
    vecs = jnp.where(vok & cam_mask[:, :, None], vals, 0.0)
    return F.ncc_from_vectors(vecs, cam_mask, ok)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cover", "interpret", "precise"))
def patch_fitness_pallas(scene: Scene, cfg: MvsConfig,
                         ref_cam, cam_mask, lod, ray, pos,
                         active=None,
                         cover: int | None = None, interpret: bool = False,
                         precise: bool = False):
    """Drop-in replacement for ops.fitness.patch_fitness (same contract,
    TMVS/mvs/patch.cpp:914-3047 semantics; see module docstring for the
    box-coverage caveat).

    ``cover``: guaranteed half-extent (pixels) of the sampled footprint
    around each view's warped window center. Defaults to ~2.2x the patch
    radius + margin. Box origins are tile-aligned (rows 8, cols 128), so
    the DMA'd slab is [KY, KX] with KY >= 2*cover+7 and KX >= 2*cover+127.
    """
    # static radius ceiling: one particle's stretched warp span must fit
    # the 128-wide block slice or near-grazing hypotheses get falsely
    # BIG-fated (the r2 clipping bug class). 2.6x stretch covers the p100
    # corner-measured span on the pawn rig; beyond r=23 the premise breaks,
    # so delegate to the dense jnp reference (same contract) instead of
    # silently degrading. Static in cfg -> resolved at trace time.
    if STRETCH * (2 * cfg.patch_radius + 1) > 128.0:
        return F.patch_fitness(scene, cfg, ref_cam, cam_mask, lod, ray,
                               pos, active=active)
    rig, pyrs = scene.rig, scene.pyramids
    B, P, _ = pos.shape
    # depth-sort the particles so each kernel block's warped centers
    # cluster (the warped window center is the candidate center's
    # projection — depth-only); fitness is unsorted before returning, so
    # this is invisible to the PSO. Rank-by-counting beats argsort here:
    # P is tiny, and the O(P^2) compare + one scatter avoids XLA's
    # general sort lowering (several ms per call at B=1024).
    d = pos[..., 2]
    iot = jnp.arange(P)
    gt = ((d[:, :, None] > d[:, None, :]) |
          ((d[:, :, None] == d[:, None, :]) &
           (iot[None, :, None] > iot[None, None, :])))
    rank = jnp.sum(gt, axis=-1).astype(jnp.int32)             # [B, P] perm
    pos = jnp.zeros_like(pos).at[jnp.arange(B)[:, None], rank].set(pos)
    C = rig.num_cameras
    r = cfg.patch_radius
    if cover is None:
        cover = int((STRETCH + 0.4) * r) + 8
    cover_y = int(1.6 * r) + 10
    W2 = (2 * r + 1) ** 2

    normal = geom.spherical_to_normal(pos[..., :2])
    ref_center = rig.center[ref_cam]
    center = ray[:, None, :] * pos[..., 2:3] + ref_center[:, None, :]
    facing_bad = jnp.einsum("bpk,bk->bp", normal, rig.optical[ref_cam]) > 0
    lod_scale = jnp.power(jnp.float32(cfg.lod_ratio), lod.astype(jnp.float32))

    ref_cam_bp = jnp.broadcast_to(ref_cam[:, None], (B, P))
    H, hok = F._per_camera_homographies(
        scene, center, normal, ref_cam_bp,
        jnp.broadcast_to(lod_scale[:, None], (B, P)))         # [B,P,C,3,3]

    # depth-invariant reference-window center (LOD coords)
    def _proj(Xb, c, s):
        return geom.project(Xb, rig.R[c], rig.T[c], rig.focal[c],
                            rig.principal[c], s)[0]
    pt = jax.vmap(_proj)(center[:, 0], ref_cam, lod_scale)    # [B, 2]

    ref_dims = pyrs.dims[ref_cam, lod].astype(jnp.float32)    # [B, 2]
    in_ref = ((pt[:, 0] - r >= 2) & (pt[:, 0] + r < ref_dims[:, 1] - 3) &
              (pt[:, 1] - r >= 2) & (pt[:, 1] + r < ref_dims[:, 0] - 3))

    # per-cell activity (converged swarms / invisible cameras skip), and
    # per-particle validity (facing away / window out of the reference
    # frame / degenerate homography -> BIG without sampling)
    act = cam_mask if active is None else (active[:, None] & cam_mask)
    pvalid = ~facing_bad & in_ref[:, None] & \
        jnp.all(hok | ~cam_mask[:, None, :], axis=-1)         # [B, P]

    # (per-patch pixel weights — distance table, gradient, foreground —
    # are computed IN-kernel from the ref/edge boxes; see _fused_body)
    fit = _run_fused(scene, cfg, H, pt, lod, cover, cover_y, precise,
                     interpret, act, pvalid, active, ref_cam, cam_mask)
    return jnp.take_along_axis(fit, rank, axis=1)


def _run_fused(scene: Scene, cfg: MvsConfig, H, pt, lod, cover, cover_y,
               precise: bool, interpret: bool, act, pvalid, active,
               ref_cam, cam_mask):
    """Launch the fused fitness kernel. H: [B, P, C, 3, 3] with particles
    DEPTH-SORTED along axis 1; pt: [B, 2]; act: [B, C] cells to sample;
    pvalid: [B, P]. Returns fitness [B, P] (sorted order)."""
    pyrs = scene.pyramids
    B, P, C = H.shape[:3]
    r = cfg.patch_radius
    Ha, Wa = pyrs.images.shape[1], pyrs.images.shape[2]
    KY = min(_round_up(2 * cover_y + 7, 8), (Ha // 8) * 8)
    KX = min(_round_up(2 * cover + 127, 128), Wa)
    W2 = (2 * r + 1) ** 2
    W2p = _round_up(W2, 128)
    cover_y = (KY - 7) // 2
    cover_x = (KX - 127) // 2

    # box origins: the median-DEPTH particle's warped center (particles
    # arrive depth-sorted and u varies monotonically with depth along the
    # epipolar line, so this IS the median center — no sort needed); a
    # clipped finite mean is the fallback when that particle's homography
    # is degenerate
    uvc, _ = geom.homography_apply(H, pt[:, None, None, :])   # [B,P,C,2]
    finite = jnp.all(jnp.isfinite(uvc), axis=-1, keepdims=True)
    uvc_cl = jnp.clip(jnp.where(finite, uvc, 0.0), -8192.0, 16384.0)
    cnt = jnp.sum(finite, axis=1)                             # [B, C, 1]
    mean_ctr = jnp.sum(uvc_cl, axis=1) / jnp.maximum(cnt, 1)
    mid = uvc_cl[:, P // 2]                                   # [B, C, 2]
    ctr = jnp.where(finite[:, P // 2], mid, mean_ctr)         # [B, C, 2]
    hw = pyrs.dims[jnp.arange(C)[None, :], lod[:, None]]      # [B, C, 2]
    hwf = hw.astype(jnp.float32)
    cx = jnp.round(ctr[..., 0]).astype(jnp.int32)
    cy = jnp.round(ctr[..., 1]).astype(jnp.int32)
    bx = jnp.clip(((cx - cover_x) // 128) * 128, 0, Wa - KX)
    yoff_b = pyrs.yoff[lod][:, None]                          # [B, 1]
    by_atl = jnp.clip(yoff_b + ((cy - cover_y) // 8) * 8, 0, Ha - KY)
    by_lvl = by_atl - yoff_b

    # pad the particle axis to the kernel's block size (after the median)
    P_out = P
    if P > 1 and P % 8 != 0:
        P_pad = _round_up(P, 8)
        H = jnp.pad(H, ((0, 0), (0, P_pad - P), (0, 0), (0, 0), (0, 0)))
        pvalid = jnp.pad(pvalid, ((0, 0), (0, P_pad - P)))
        P = P_pad
    PB = 8 if P % 8 == 0 else 1

    offs_t = np.full((4, W2p), 1e7, dtype=np.float32)         # pad -> invalid
    offs_t[:2, :W2] = F.window_offsets(r).T
    offs_t[2, :] = 0.0
    if cfg.adaptive_distance_enable:
        offs_t[2, :W2] = F.dist_weight_table(cfg)
    else:
        offs_t[2, :W2] = 1.0
    offs_t[3, :] = 0.0
    offs = jnp.asarray(offs_t)

    Hflat = jnp.transpose(H, (0, 2, 1, 3, 4)).reshape(B, C, P, 9)
    is_ref = (jnp.arange(C)[None, :] == ref_cam[:, None])
    pflags = pvalid.astype(jnp.int32)[:, None, :]
    flts = jnp.concatenate(
        [hwf, jnp.broadcast_to(pt[:, None, :], (B, C, 2))], axis=-1)
    cn = jnp.sum(cam_mask, axis=-1).astype(jnp.float32)
    zeros = jnp.zeros((B,), jnp.float32)

    def _ints_scal(act_k):
        ints = jnp.stack([bx, jnp.broadcast_to(by_atl, (B, C)),
                          jnp.broadcast_to(by_lvl, (B, C)),
                          act_k.astype(jnp.int32),
                          is_ref.astype(jnp.int32)], axis=-1)
        pactive = jnp.any(act_k, axis=-1)
        if active is not None:
            pactive &= active
        scal = jnp.stack([pactive.astype(jnp.float32), cn, zeros, zeros],
                         -1)[:, None, :]                      # [B, 1, 4]
        return ints, scal

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, 5), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # ints (row b)
            pl.BlockSpec((1, C, 5),                           # ints (row b+1)
                         lambda b: (jnp.minimum(b + 1, B - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # scal
            pl.BlockSpec((1, C, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # flts
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # pflags
            pl.BlockSpec(memory_space=pl.ANY),                # images
            pl.BlockSpec(memory_space=pl.ANY),                # edges
            pl.BlockSpec((1, C, P, 9), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),            # H (scalars)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # offs
        ],
        out_specs=pl.BlockSpec((1, P, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, KY, KX), pyrs.images.dtype),       # boxes0
            pltpu.VMEM((C, KY, KX), pyrs.images.dtype),       # boxes1
            pltpu.VMEM((KY, KX), pyrs.edges.dtype),           # ebox0
            pltpu.VMEM((KY, KX), pyrs.edges.dtype),           # ebox1
            # double-buffered by particle-BLOCK parity: block i's pass B
            # (VPU SAD reduce) reads buffer i%2 while block i+1's pass A
            # (MXU sampling) writes buffer (i+1)%2 — without this, Mosaic's
            # ref-granular dependency tracking orders every next-block
            # sample store after the previous block's reduce reads,
            # throttling MXU/VPU software pipelining across blocks
            pltpu.VMEM((2, C, PB * W2p), jnp.float32),        # sam
            pltpu.VMEM((2, C, PB * W2p), jnp.float32),        # okf
            pltpu.SemaphoreType.DMA((C,)),
            pltpu.SemaphoreType.DMA((C,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    prec = jax.lax.Precision.HIGHEST if precise else None

    def _launch(act_k, ks):
        ints, scal = _ints_scal(act_k)
        return pl.pallas_call(
            functools.partial(_fused_kernel, precision=prec,
                              use_diff=bool(cfg.adaptive_difference_enable),
                              diff_w=float(cfg.diff_weighting),
                              use_dist=True,
                              use_grad=bool(cfg.adaptive_gradient_enable),
                              grad_w=float(cfg.gradient_weighting),
                              ks_lg=ks,
                              bf16_vpu=0 if precise
                              else int(cfg.pallas_bf16_vpu),
                              roll_hoist=bool(cfg.pallas_roll_hoist)),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, P, 1), jnp.float32),
            interpret=interpret,
        )(ints, ints, scal, flts, pflags, pyrs.images, pyrs.edges, Hflat,
          offs)

    ks_wide = min(128, KX)
    ks_narrow = min(_NARROW_KS, ks_wide)
    if cfg.pallas_fast_slice:
        # legacy speed knob: one narrow launch for everything (documented
        # falsely-BIG risk on near-grazing hypotheses)
        out = _launch(act, ks_narrow)
    elif cfg.pallas_span_bucket and ks_narrow < ks_wide and P > 1:
        # span bucketing: per PSO iteration, patches whose every particle
        # window PROVABLY fits the narrow slice run a KS=64 launch (~25%
        # less VPU weight-build work); the rest run the full-coverage
        # KS=128 launch. Inactive grid cells skip their DMA and body, so
        # the two launches together do ~one launch of work. Bit-identical
        # to always-wide by construction (_narrow_fit_mask mirrors the
        # kernel's slice placement with a rounding guard).
        narrow_ok = _narrow_fit_mask(H, pt, r, bx, KX, act, pvalid,
                                     ks_narrow,
                                     hoist=bool(cfg.pallas_roll_hoist))
        act_n = act & narrow_ok[:, None]
        act_w = act & ~narrow_ok[:, None]
        # an all-empty launch still pays ~6% of a full one walking its
        # grid — skip it entirely (one scalar cond per launch; typical in
        # the PSO's phases: early iterations all-wide, converged all-narrow)
        big = lambda: jnp.full((B, P, 1), float(BIG), jnp.float32)
        out_n = jax.lax.cond(jnp.any(act_n),
                             lambda: _launch(act_n, ks_narrow), big)
        out_w = jax.lax.cond(jnp.any(act_w),
                             lambda: _launch(act_w, ks_wide), big)
        out = jnp.where(narrow_ok[:, None, None], out_n, out_w)
    else:
        out = _launch(act, ks_wide)
    return out[:, :P_out, 0]


_NARROW_KS = 64
_SPAN_MARGIN = 2.0


def _narrow_fit_mask(H, pt, r, bx, KX, act, pvalid, ks, hoist=False):
    """[B] True where the ks-wide block slice PROVABLY covers every valid
    particle's warped window in every active camera — mirroring
    ``_sample_block``'s centering math (same truncation and clipping) with
    a ``_SPAN_MARGIN``-px guard for f32/op-order rounding, so narrow-bucket
    fitness is bit-identical to the wide launch's. ``hoist`` mirrors the
    roll-hoist kernel's CELL-level centering (one slice per (patch,
    camera) over the whole swarm) instead of per-block means.

    Soundness: the warp u over the window rectangle is a ratio of affine
    functions of (x, y); when the denominator w has one sign at all 4
    corners it keeps that sign everywhere inside (w is affine), and u's
    extremes over the rectangle are then attained AT the corners — so
    corner containment implies every window pixel lands in the slice.
    Sign-mixed (near-degenerate) hypotheses and edge-clipped slices simply
    fail the test and route to the wide launch, which scores them exactly
    as before.

    H: [B, P, C, 3, 3] (particle-padded); pt: [B, 2] ref-window centers;
    bx: [B, C] int32 box origins (tile-aligned); act: [B, C] cells
    computed; pvalid: [B, P] per-particle validity (padded).
    """
    B, P, C = H.shape[:3]
    if hoist:
        PB, NB = P, 1          # one cell-wide slice shared by all blocks
    else:
        PB = 8 if P % 8 == 0 else 1
        NB = P // PB
    px = pt[:, 0][:, None, None]                              # [B, 1, 1]
    py = pt[:, 1][:, None, None]

    def warp_u(x, y):
        w = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
        u = (H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]) \
            / jnp.where(w == 0, 1.0, w)
        return u, w

    # kernel scalar pass: per-block mean of the valid particles' warped
    # window centers (particles arrive depth-sorted; blocks = 8 rows)
    uc, wc = warp_u(px, py)                                   # [B, P, C]
    fj = pvalid[:, :, None] & (wc != 0)
    ucs = jnp.sum(jnp.where(fj, uc, 0.0).reshape(B, NB, PB, C), axis=2)
    n_ok = jnp.sum(fj.reshape(B, NB, PB, C), axis=2)
    center = ucs / jnp.maximum(n_ok, 1).astype(jnp.float32)   # [B, NB, C]
    xoff = jnp.clip(center.astype(jnp.int32) - bx[:, None, :] - ks // 2,
                    0, KX - ks)                               # [B, NB, C]
    base = bx[:, None, :].astype(jnp.float32) + \
        jnp.repeat(xoff, PB, axis=1).astype(jnp.float32)      # [B, P, C]

    lo = _SPAN_MARGIN
    hi = float(ks - 2) - _SPAN_MARGIN
    fit_c = wc != 0
    wpos = jnp.ones((B, P, C), bool)
    wneg = jnp.ones((B, P, C), bool)
    rr = float(r)
    for dx, dy in ((-rr, -rr), (-rr, rr), (rr, -rr), (rr, rr)):
        u, w = warp_u(px + dx, py + dy)
        ub = u - base
        fit_c &= (ub >= lo) & (ub <= hi)
        wpos &= w > 0
        wneg &= w < 0
    fit_c &= wpos | wneg
    cam_ok = fit_c | ~act[:, None, :]
    p_ok = jnp.all(cam_ok, axis=-1) | ~pvalid
    return jnp.all(p_ok, axis=1)
