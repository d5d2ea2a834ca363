"""Pallas TPU kernel for the photoconsistency hot loop.

Why the jnp path is slow on TPU: it samples every (patch, particle, pixel,
view) with element-granularity gathers, which the TPU executes serially.
This kernel restructures the work around the hardware:

  * Per (patch, view) a K x K pixel **box** around the warped window is
    DMA'd from the HBM pyramid into VMEM once; all P particles' windows
    sample from that box. The box position exploits two structural facts:
    the reference-window center is depth-invariant (the candidate center
    moves along the reference ray), and the depth search range is ~1 pixel
    of parallax by construction (TMVS/mvs/patch.cpp:463-509), so all
    particles' warped footprints cluster tightly.
  * Bilinear sampling becomes two small **matmuls on the MXU**: the
    bilinear row/column weight matrices R [T, K] and Cw [T, K] have entries
    relu(1 - |coord - index|) (built in-register from iota), and
    val = rowsum((Cw @ box) * R). No gathers anywhere.
  * The kernel emits warped intensities [B, C, P, W2]; the masked
    mean/SAD/weighting reduction stays in dense XLA (bandwidth-bound,
    fuses well).

Samples falling outside the box are flagged invalid; hypotheses needing
them score BIG — the only (documented) semantic delta vs the exact jnp
kernel, affecting extreme-skew hypotheses that the reference rejects or
scores terribly anyway. ``cover`` trades coverage for FLOPs.
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
                   precision):
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
        box_f = jax.lax.cond(par == 0, lambda: box0[:, :],
                             lambda: box1[:, :])
        _cell_body(ints_ref, flts_ref, pflags_ref, H_ref,
                   offs_ref, out_ref, box_f, c, KY, KX, P, W2p, precision)


def _cell_body(ints_ref, flts_ref, pflags_ref, H_ref, offs_ref,
               out_ref, box_f, c, KY, KX, P, W2p, precision):
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

    # one-pass bf16 multiplies unless the caller asked for full f32: the
    # images are 0..255 intensities, bf16's 8-bit mantissa keeps the
    # bilinear result within ~0.5 intensity — far below the SAD contrast
    # PSO ranks on.
    if precision is None:
        box_v = box_f.astype(jnp.bfloat16)
    else:
        box_v = box_f
    T = W2p                                                   # whole window
    # a single particle's warped footprint spans far fewer columns than the
    # box (KX is wide only for the 128-lane DMA alignment slack), so each
    # particle works on a KS-wide slice centered on its own warped center —
    # the bilinear weight matrix and the multiply-reduce shrink with it
    # the 64-column slice is only safe when a window stretched to the
    # region-ratio gate's limit (~1/0.55 = 1.8x) still fits with margin —
    # otherwise hypotheses the reference accepts would clip to BIG
    r_win = int(np.sqrt(W2p)) // 2
    span_max = 2 * int(1.8 * r_win) + 8
    if KX > 64 and span_max <= 64:
        KS = 64
    elif KX > 128:
        KS = 128
    else:
        KS = KX
    # TRANSPOSED weight layout: pixels stay on the LANE axis from the u,v
    # math through the weights, the matmul N axis, the reduction, and the
    # final store — no lane<->sublane relayouts anywhere in the loop (the
    # [T]-vector-to-matrix-row path was the kernel's real bottleneck)
    iota_xs = jax.lax.broadcasted_iota(jnp.int32, (KS, 1), 0) \
        .astype(jnp.float32)
    iota_ys = jax.lax.broadcasted_iota(jnp.int32, (KY, 1), 0) \
        .astype(jnp.float32)

    bxf = bx.astype(jnp.float32)
    byf = by.astype(jnp.float32)

    def per_particle(p, _):
        @pl.when(pflags_ref[0, 0, p] != 0)
        def _particle():
            _particle_body(p)
        return 0

    def _particle_body(p):
        h0 = H_ref[0, 0, p, 0]
        h1 = H_ref[0, 0, p, 1]
        h2 = H_ref[0, 0, p, 2]
        h3 = H_ref[0, 0, p, 3]
        h4 = H_ref[0, 0, p, 4]
        h5 = H_ref[0, 0, p, 5]
        h6 = H_ref[0, 0, p, 6]
        h7 = H_ref[0, 0, p, 7]
        h8 = H_ref[0, 0, p, 8]

        x = px + offs_ref[0:1, :]                             # [1, T]
        y = py + offs_ref[1:2, :]
        wq = h6 * x + h7 * y + h8
        sw = jnp.where(wq == 0, 1.0, wq)
        u = (h0 * x + h1 * y + h2) / sw
        v = (h3 * x + h4 * y + h5) / sw

        # this particle's column slice: centered on its warped window
        # center (px, py are the reference window center; its image under
        # H is where the footprint clusters)
        if KS < KX:
            wc = h6 * px + h7 * py + h8
            swc = jnp.where(wc == 0, 1.0, wc)
            uc = (h0 * px + h1 * py + h2) / swc
            xoff = jnp.clip((uc - bxf).astype(jnp.int32) - KS // 2,
                            0, KX - KS)
            # dynamic lane-roll + static slice (Mosaic has no dynamic
            # lane slicing); wrapped columns land beyond ub's [0, KS-2]
            # validity window, so they are never read as valid samples.
            # Roll in f32 (bf16 roll crashes the compiler), cast after.
            box_p = pltpu.roll(box_f, -xoff, 1)[:, :KS]
            if precision is None:
                box_p = box_p.astype(jnp.bfloat16)
            xofff = xoff.astype(jnp.float32)
        else:
            box_p = box_v
            xofff = 0.0

        # validity: caller's margins (fitness [2, dim-3), NCC
        # [0, dim-1)) AND inside the sliced box
        ub = u - bxf - xofff                                  # [1, T]
        vb = v - byf
        ok = ((wq != 0) & (u >= mlo) & (u < w_img - mhi)
              & (v >= mlo) & (v < h_img - mhi)
              & (ub >= 0) & (ub <= KS - 2) & (vb >= 0) & (vb <= KY - 2))

        # transposed bilinear weights: [KS, T] and [KY, T]
        RwT = jnp.maximum(1.0 - jnp.abs(ub - iota_xs), 0.0)
        CwT = jnp.maximum(1.0 - jnp.abs(vb - iota_ys), 0.0)
        if precision is None:
            tmp = jax.lax.dot_general(
                box_p, RwT.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [KY, T]
        else:
            tmp = jax.lax.dot_general(
                box_p, RwT, (((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)           # [KY, T]
        val = jnp.sum(tmp * CwT, axis=0, keepdims=True)       # [1, T]
        out_ref[0, 0, p, :] = jnp.where(ok, val, -1e9)[0]

    jax.lax.fori_loop(0, P, per_particle, 0)


def _run_sampler(scene: Scene, cfg: MvsConfig, H, pt, lod, margins,
                 cover: int, precise: bool, interpret: bool, act=None,
                 cover_y: int | None = None, pvalid=None):
    """Launch the sampling kernel.

    H: [B, P, C, 3, 3] homographies; pt: [B, 2] reference-window centers
    (LOD coords); lod: [B]; margins: (lo, hi) bounds margins; act: [B, C]
    bool — cells to compute (inactive cells emit garbage the caller must
    mask; None = all).
    Returns warped samples [B, C, P, W2] (INVALID where out of bounds/box).
    """
    pyrs = scene.pyramids
    B, P, C = H.shape[:3]
    r = cfg.patch_radius
    Ha, Wa = pyrs.images.shape[1], pyrs.images.shape[2]
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
    hw = pyrs.dims[jnp.arange(C)[None, :], lod[:, None]]      # [B, C, 2]
    hwf = hw.astype(jnp.float32)
    cx = jnp.round(ctr[..., 0]).astype(jnp.int32)
    cy = jnp.round(ctr[..., 1]).astype(jnp.int32)
    bx = jnp.clip(((cx - cover_x) // 128) * 128, 0, Wa - KX)
    yoff_b = pyrs.yoff[lod][:, None]                          # [B, 1]
    by_atl = jnp.clip(yoff_b + ((cy - cover_y) // 8) * 8, 0, Ha - KY)
    by_lvl = by_atl - yoff_b

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
            pltpu.VMEM((KY, KX), jnp.float32),                # box0
            pltpu.VMEM((KY, KX), jnp.float32),                # box1
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    # precision None -> explicit bf16 operands (single MXU pass);
    # precise=True -> full-f32 multiplies at ~3x the MXU passes.
    prec = jax.lax.Precision.HIGHEST if precise else None
    vals = pl.pallas_call(
        functools.partial(_sample_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, P, W2p), jnp.float32),
        interpret=interpret,
    )(ints, ints, flts, pflags, pyrs.images, Hflat, offs)
    return vals[..., :W2]


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
        cover = int(2.2 * r) + 8
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
    rig, pyrs = scene.rig, scene.pyramids
    B, P, _ = pos.shape
    C = rig.num_cameras
    r = cfg.patch_radius
    if cover is None:
        cover = int(2.2 * r) + 8
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

    # skip converged swarms (their fitness is ignored by the PSO) and
    # invisible cameras entirely — the kernel leaves those cells unwritten;
    # likewise per-particle for candidates that are already BIG-fated
    # (facing away from the reference camera / window out of frame —
    # exactly the cand_ok gate applied below)
    act = cam_mask if active is None else (active[:, None] & cam_mask)
    pvalid = ~facing_bad & in_ref[:, None] & \
        jnp.all(hok | ~cam_mask[:, None, :], axis=-1)         # [B, P]
    vals = _run_sampler(scene, cfg, H, pt, lod, (2.0, 3.0), cover,
                        precise, interpret, act=act,
                        cover_y=cover_y, pvalid=pvalid)       # [B, C, P, W2]
    vals = jnp.transpose(vals, (0, 2, 3, 1))                  # [B, P, W2, C]
    vok = vals > INVALID / 2

    # reference-window foreground mask + weights (per patch, not particle)
    win = pt[:, None, :] + jnp.asarray(F.window_offsets(r))[None]  # [B,W2,2]
    ref_cam_bw = jnp.broadcast_to(ref_cam[:, None], (B, W2))
    lod_bw = jnp.broadcast_to(lod[:, None], (B, W2))
    ref_int = F.nearest_gather(pyrs.images, pyrs.yoff, ref_cam_bw, lod_bw, win)
    fg = (ref_int != 0)[:, None, :]                           # [B, 1, W2]

    m = cam_mask[:, None, None, :]
    cam_num = jnp.sum(cam_mask, axis=-1).astype(vals.dtype)
    cn = cam_num[:, None, None]
    # mask by vok AND cam_mask: skipped cells hold garbage (possibly inf,
    # where a bare *0 would make NaN)
    use = vok & m
    uf = use.astype(vals.dtype)
    vals_z = jnp.where(use, vals, 0.0)
    mean = jnp.sum(vals_z, axis=-1) / cn
    sad = jnp.sum(jnp.abs(vals_z - mean[..., None]) * uf, axis=-1) / cn

    pix_ok = jnp.all(vok | ~m, axis=-1)                       # [B, P, W2]
    cand_ok = jnp.all(pix_ok | ~fg, axis=-1)
    cand_ok &= jnp.all(hok | ~m[:, :, 0, :], axis=-1)
    cand_ok &= in_ref[:, None] & ~facing_bad

    weight = jnp.ones_like(sad)
    if cfg.adaptive_distance_enable:
        weight = weight * jnp.asarray(F.dist_weight_table(cfg))[None, None, :]
    if cfg.adaptive_difference_enable:
        weight = weight * jnp.exp(-sad * sad / jnp.float32(cfg.diff_weighting))
    if cfg.adaptive_gradient_enable:
        edge = F.nearest_gather(pyrs.edges, pyrs.yoff, ref_cam_bw, lod_bw, win)
        safe_edge = jnp.maximum(edge[:, None, :]
                                * jnp.float32(cfg.gradient_weighting), 1e-20)
        weight = weight * jnp.exp(-1.0 / safe_edge)

    wfg = weight * fg.astype(weight.dtype)
    sum_w = jnp.sum(wfg, axis=-1)
    fit = jnp.sum(wfg * sad, axis=-1) / jnp.where(sum_w > 0, sum_w, 1.0)
    return jnp.where(cand_ok & (sum_w > 0), fit, BIG)
