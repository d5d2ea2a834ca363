"""SPMD patch refinement: patch-sharded swarms x view-sharded pyramids.

One ``shard_map`` over a ("patch", "view") mesh runs the whole PSO
optimization step: every device owns a slice of the patch batch and a slice
of the camera pyramids. Cross-view photoconsistency terms (per-pixel mean,
SAD, validity, reference-window lookups) compose with ``psum`` over the
view axis, so the fitness each swarm sees is exactly the single-device
value. PSO state stays view-replicated by construction (same PRNG key on
every view shard).

This is the multi-chip execution path of the hot kernel; the reference has
no equivalent (its only parallelism is OpenMP within one swarm,
TMVS/pso/psosolver.cpp:113-122).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.models.camera import CameraRig
from pais_mvs_tpu.ops import fitness as F
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops.geometry import BIG
from pais_mvs_tpu.ops.pso import gln_pso, PsoResult
from pais_mvs_tpu.parallel.mesh import PATCH_AXIS, VIEW_AXIS


def _local_view_fitness(rig: CameraRig, images_loc, edges_loc, dims_glob,
                        yoff, cfg: MvsConfig, c_local: int,
                        ref_cam, cam_mask, lod, ray, pos):
    """Per-shard fitness over the local camera block, psum-composed over the
    view axis. Mirrors ops.fitness.patch_fitness (same reference semantics,
    TMVS/mvs/patch.cpp:914-1047)."""
    B, Pn, _ = pos.shape
    vi = jax.lax.axis_index(VIEW_AXIS)
    offset = vi * c_local

    normal = geom.spherical_to_normal(pos[..., :2])
    ref_center = rig.center[ref_cam]
    center = ray[:, None, :] * pos[..., 2:3] + ref_center[:, None, :]
    facing_bad = jnp.einsum("bpk,bk->bp", normal, rig.optical[ref_cam]) > 0
    lod_scale = jnp.power(jnp.float32(cfg.lod_ratio), lod.astype(jnp.float32))

    # local camera block parameters (rig is replicated and tiny)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, offset, c_local, 0)
    R_loc, T_loc = sl(rig.R), sl(rig.T)
    f_loc, pp_loc = sl(rig.focal), sl(rig.principal)
    dims_loc = sl(dims_glob)                                   # [c, L, 2]
    cam_mask_loc = jax.lax.dynamic_slice_in_dim(cam_mask, offset, c_local, 1)

    ref_cam_bp = jnp.broadcast_to(ref_cam[:, None], (B, Pn))
    ls_bp = jnp.broadcast_to(lod_scale[:, None], (B, Pn))
    H, hok = geom.plane_homography(
        center[..., None, :], normal[..., None, :],
        rig.R[ref_cam_bp][..., None, :, :], rig.T[ref_cam_bp][..., None, :],
        rig.focal[ref_cam_bp][..., None, :],
        rig.principal[ref_cam_bp][..., None, :],
        R_loc, T_loc, f_loc, pp_loc, ls_bp[..., None])
    glob_idx = offset + jnp.arange(c_local)
    is_ref = glob_idx[None, None, :] == ref_cam[:, None, None]
    H = jnp.where(is_ref[..., None, None], jnp.eye(3, dtype=H.dtype), H)
    hok = hok | is_ref

    def _proj(Xbp, c, s):
        return geom.project(Xbp, rig.R[c], rig.T[c], rig.focal[c],
                            rig.principal[c], s)[0]
    pt = jax.vmap(jax.vmap(_proj, in_axes=(0, None, None)))(
        center, ref_cam, lod_scale)                            # [B, P, 2]

    r = cfg.patch_radius
    ref_dims = dims_glob[ref_cam, lod].astype(jnp.float32)     # replicated
    in_ref = ((pt[..., 0] - r >= 2) & (pt[..., 0] + r < ref_dims[:, None, 1] - 3) &
              (pt[..., 1] - r >= 2) & (pt[..., 1] + r < ref_dims[:, None, 0] - 3))

    offs = jnp.asarray(F.window_offsets(r))
    W2 = offs.shape[0]
    win = pt[:, :, None, :] + offs[None, None, :, :]           # [B, P, W2, 2]

    # reference-image lookups live on the shard owning ref_cam -> psum
    own = (ref_cam >= offset) & (ref_cam < offset + c_local)   # [B]
    ref_loc = jnp.clip(ref_cam - offset, 0, c_local - 1)
    ref_b = jnp.broadcast_to(ref_loc[:, None, None], (B, Pn, W2))
    lod_b = jnp.broadcast_to(lod[:, None, None], (B, Pn, W2))
    ownf = own[:, None, None].astype(jnp.float32)
    ref_int = jax.lax.psum(
        F.nearest_gather(images_loc, yoff, ref_b, lod_b, win) * ownf, VIEW_AXIS)
    fg = ref_int != 0

    # warp into local cameras
    x = win[..., 0][..., None]
    y = win[..., 1][..., None]
    Hc = H[:, :, None, :, :, :]
    w = Hc[..., 2, 0] * x + Hc[..., 2, 1] * y + Hc[..., 2, 2]
    sw = jnp.where(w == 0, 1.0, w)
    u = (Hc[..., 0, 0] * x + Hc[..., 0, 1] * y + Hc[..., 0, 2]) / sw
    v = (Hc[..., 1, 0] * x + Hc[..., 1, 1] * y + Hc[..., 1, 2]) / sw
    uv = jnp.stack([u, v], axis=-1)                            # [B,P,W2,c,2]

    cam_idx = jnp.broadcast_to(jnp.arange(c_local, dtype=jnp.int32),
                               (B, Pn, W2, c_local))
    lod_b4 = jnp.broadcast_to(lod[:, None, None, None], (B, Pn, W2, c_local))
    vals, vok = F.bilinear_gather(images_loc, yoff, cam_idx, lod_b4, uv,
                                  dims_loc, 2.0, 3.0)
    vok = vok & (w != 0)

    m = cam_mask_loc[:, None, None, :]
    mf = m.astype(vals.dtype)
    cam_num = jnp.sum(cam_mask, axis=-1).astype(vals.dtype)    # global count
    cn = cam_num[:, None, None]
    sum_v = jax.lax.psum(jnp.sum(vals * mf, axis=-1), VIEW_AXIS)
    mean = sum_v / cn
    sad = jax.lax.psum(jnp.sum(jnp.abs(vals - mean[..., None]) * mf, axis=-1),
                       VIEW_AXIS) / cn

    bad = jax.lax.psum(
        jnp.sum((~vok & m).astype(jnp.int32), axis=-1), VIEW_AXIS)
    pix_ok = bad == 0
    hbad = jax.lax.psum(
        jnp.sum((~hok & cam_mask_loc[:, None, :]).astype(jnp.int32), axis=-1),
        VIEW_AXIS)
    cand_ok = jnp.all(pix_ok | ~fg, axis=-1) & (hbad == 0) & in_ref & \
        ~facing_bad

    weight = jnp.ones_like(sad)
    if cfg.adaptive_distance_enable:
        weight = weight * jnp.asarray(F.dist_weight_table(cfg))[None, None, :]
    if cfg.adaptive_difference_enable:
        weight = weight * jnp.exp(-sad * sad / jnp.float32(cfg.diff_weighting))
    if cfg.adaptive_gradient_enable:
        edge = jax.lax.psum(
            F.nearest_gather(edges_loc, yoff, ref_b, lod_b, win) * ownf, VIEW_AXIS)
        safe_edge = jnp.maximum(edge * jnp.float32(cfg.gradient_weighting),
                                1e-20)
        weight = weight * jnp.exp(-1.0 / safe_edge)

    wfg = weight * fg.astype(weight.dtype)
    sum_w = jnp.sum(wfg, axis=-1)
    fit = jnp.sum(wfg * sad, axis=-1) / jnp.where(sum_w > 0, sum_w, 1.0)
    return jnp.where(cand_ok & (sum_w > 0), fit, BIG)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "particle_num",
                                             "max_iteration"))
def sharded_pso_refine(rig: CameraRig, images, edges, dims_glob, yoff,
                       cfg: MvsConfig, ref_cam, cam_mask, lod, ray,
                       lo, hi, init, key, mesh: Mesh,
                       particle_num: int, max_iteration: int) -> PsoResult:
    """Run the batched GLN-PSO patch optimization SPMD over the mesh.

    Shapes (global): images/edges [C, L, H, W] (C divisible by the view
    axis), ref_cam/lod [B], cam_mask [B, C], ray [B, 3], lo/hi/init [B, 3]
    (B divisible by the patch axis). Returns a PsoResult with [B, ...]
    outputs sharded over the patch axis.
    """
    vp = mesh.shape[VIEW_AXIS]
    C = images.shape[0]
    assert C % vp == 0, (C, vp)
    c_local = C // vp

    def body(rig_r, images_loc, edges_loc, dims_g, yoff_r, ref_cam,
             cam_mask, lod, ray, lo, hi, init, key):
        pk = jax.random.fold_in(key, jax.lax.axis_index(PATCH_AXIS))
        fit_fn = lambda pos, act: _local_view_fitness(
            rig_r, images_loc, edges_loc, dims_g, yoff_r, cfg, c_local,
            ref_cam, cam_mask, lod, ray, pos)
        return gln_pso(fit_fn, lo, hi, init, pk,
                       particle_num=particle_num,
                       max_iteration=max_iteration)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(VIEW_AXIS), P(VIEW_AXIS), P(), P(),
                  P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                  P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS),
                  P(PATCH_AXIS), P()),
        out_specs=PsoResult(P(PATCH_AXIS), P(PATCH_AXIS), P(PATCH_AXIS)),
        check_vma=False)
    return f(rig, images, edges, dims_glob, yoff, ref_cam, cam_mask, lod,
             ray, lo, hi, init, key)
