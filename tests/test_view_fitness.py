"""View-sharded fitness/NCC (ops/view_fitness.py) vs the flat single-device
reference paths, on the virtual CPU mesh (Pallas kernels in interpret mode).

These are the parity gates for the PRODUCTION view-sharded path (VERDICT r4
next-step #1): the psum-composed Pallas-sampled fitness must reproduce
ops.fitness.patch_fitness, and the all_gather'd NCC vectors must reproduce
ops.fitness.warped_patch_vectors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import fitness as F
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops import lifecycle as lc
from pais_mvs_tpu.ops import view_fitness as VF
from pais_mvs_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def setup4():
    """4-camera scene (the view axis needs C % vp == 0)."""
    sc = make_scene(num_cams=4, width=200, height=150, num_seeds=40)
    cfg = MvsConfig(patch_radius=5, max_lod=4, particle_num=8,
                    max_iteration=12, batch_size=64,
                    dist_weighting=5.0 / 3.0)
    scene = build_scene(sc.params, sc.images, cfg)
    return sc, cfg, scene


def _problem(sc, scene, B, P_):
    centers = sc.seed_centers[:B].astype(np.float32)
    ref = np.full(B, 2, dtype=np.int32)
    rays = centers - np.asarray(scene.rig.center)[ref]
    depths = np.linalg.norm(rays, axis=-1)
    rays = (rays / depths[:, None]).astype(np.float32)
    sph = np.asarray(geom.normal_to_spherical(
        jnp.asarray(sc.plane_normal)))
    rng = np.random.default_rng(0)
    pos = np.stack([
        sph[0] + rng.normal(scale=0.25, size=(B, P_)),
        sph[1] + rng.normal(scale=0.35, size=(B, P_)),
        depths[:, None] + rng.uniform(-0.05, 0.05, size=(B, P_)),
    ], -1).astype(np.float32)
    C = scene.rig.num_cameras
    return (jnp.asarray(ref), jnp.ones((B, C), bool),
            jnp.zeros(B, dtype=jnp.int32), jnp.asarray(rays),
            jnp.asarray(pos))


def _shard_fitness(scene, cfg, vp, fn, ref, cm, lod, rays, pos):
    """Run a view_fitness callable under shard_map on a (2, vp) mesh."""
    C = scene.rig.num_cameras
    c_local = C // vp
    mesh = mesh_mod.make_mesh((2, vp), jax.devices()[:2 * vp])
    rig_spec = jax.tree.map(lambda _: P(), scene.rig)

    def body(rig, img, edg, dims, yo, ref_c, cmk, ld, ry, ps):
        return fn(rig, img, edg, dims, yo, c_local, ref_c, cmk, ld, ry, ps)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rig_spec, P("view"), P("view"), P(), P(),
                  P("patch"), P("patch"), P("patch"), P("patch"),
                  P("patch")),
        out_specs=P("patch"), check_vma=False))
    return f(scene.rig, scene.pyramids.images, scene.pyramids.edges,
             scene.pyramids.dims, scene.pyramids.yoff, ref, cm, lod, rays,
             pos)


@pytest.mark.parametrize("vp", [2, 4])
def test_fitness_view_pallas_matches_flat(setup4, vp):
    """Pallas-sampled psum-composed fitness == the flat jnp reference
    (precise f32), and the jnp view mirror, at every view-axis width."""
    sc, cfg, scene = setup4
    B, Pn = 8, 9
    ref, cm, lod, rays, pos = _problem(sc, scene, B, Pn)
    flat = np.asarray(F.patch_fitness(scene, cfg, ref, cm, lod, rays, pos))

    def pallas_fn(rig, img, edg, dims, yo, cl, ref_c, cmk, ld, ry, ps):
        return VF.fitness_view_pallas(rig, img, edg, dims, yo, cfg, cl,
                                      ref_c, cmk, ld, ry, ps, "view",
                                      precise=True, interpret=True)

    b = np.asarray(_shard_fitness(scene, cfg, vp, pallas_fn,
                                  ref, cm, lod, rays, pos))
    big_a, big_b = flat >= 1e20, b >= 1e20
    np.testing.assert_array_equal(big_a, big_b)
    both = ~big_a
    assert both.sum() > 20
    np.testing.assert_allclose(b[both], flat[both], rtol=1e-4, atol=1e-4)

    def jnp_fn(rig, img, edg, dims, yo, cl, ref_c, cmk, ld, ry, ps):
        return VF.fitness_view_jnp(rig, img, edg, dims, yo, cfg, cl,
                                   ref_c, cmk, ld, ry, ps, "view")

    c = np.asarray(_shard_fitness(scene, cfg, vp, jnp_fn,
                                  ref, cm, lod, rays, pos))
    np.testing.assert_array_equal(big_a, c >= 1e20)
    np.testing.assert_allclose(c[both], flat[both], rtol=2e-4, atol=1e-4)


def test_fitness_view_pallas_bf16_tolerance(setup4):
    """Default (bf16 MXU) view-sharded kernel stays within the same
    intensity-scale tolerance the flat kernel is gated at."""
    sc, cfg, scene = setup4
    B, Pn = 8, 9
    ref, cm, lod, rays, pos = _problem(sc, scene, B, Pn)
    flat = np.asarray(F.patch_fitness(scene, cfg, ref, cm, lod, rays, pos))

    def pallas_fn(rig, img, edg, dims, yo, cl, ref_c, cmk, ld, ry, ps):
        return VF.fitness_view_pallas(rig, img, edg, dims, yo, cfg, cl,
                                      ref_c, cmk, ld, ry, ps, "view",
                                      interpret=True)

    b = np.asarray(_shard_fitness(scene, cfg, 2, pallas_fn,
                                  ref, cm, lod, rays, pos))
    big_a = flat >= 1e20
    np.testing.assert_array_equal(big_a, b >= 1e20)
    both = ~big_a
    np.testing.assert_allclose(b[both], flat[both], rtol=0.08, atol=0.08)


@pytest.mark.parametrize("vp,backend", [(2, "pallas"), (4, "pallas"),
                                        (2, "jnp")])
def test_warped_vectors_view_matches_flat(setup4, vp, backend):
    """all_gather-composed NCC vectors/table == warped_patch_vectors (both
    sampling backends; CPU resolve_backend picks jnp, so the Pallas branch
    is forced + interpreted)."""
    sc, cfg, scene = setup4
    cfg = cfg.replace(fitness_backend=backend)
    B = 8
    ref, cm, lod, rays, pos = _problem(sc, scene, B, 1)
    centers = jnp.asarray(sc.seed_centers[:B].astype(np.float32))
    normal = geom.spherical_to_normal(pos[:, 0, :2])

    va, ca, corra, oka = F.warped_patch_vectors(scene, cfg, centers, normal,
                                                ref, cm, lod)

    mesh = mesh_mod.make_mesh((2, vp), jax.devices()[:2 * vp])
    rig_spec = jax.tree.map(lambda _: P(), scene.rig)
    pyr_spec = type(scene.pyramids)(images=P("view"), edges=P("view"),
                                    dims=P(), rgb=P("view"), var=P("view"),
                                    yoff=P())
    scene_spec = type(scene)(rig=rig_spec, pyramids=pyr_spec)

    def body(sc_l, cen, nrm, ref_c, cmk, ld):
        return VF.warped_vectors_view(sc_l, cfg, cen, nrm, ref_c, cmk, ld,
                                      "view", interpret=True)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(scene_spec, P("patch"), P("patch"), P("patch"),
                  P("patch"), P("patch")),
        out_specs=(P("patch"), P("patch"), P("patch"), P("patch")),
        check_vma=False))
    vb, cb, corrb, okb = f(scene, centers, normal, ref, cm, lod)

    np.testing.assert_array_equal(np.asarray(oka), np.asarray(okb))
    ok = np.asarray(oka)
    # vector + table parity where the patch survives (garbage rows are
    # masked by ok exactly like the flat path)
    np.testing.assert_allclose(np.asarray(vb)[ok], np.asarray(va)[ok],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(corrb)[ok], np.asarray(corra)[ok],
                               rtol=5e-3, atol=5e-3)


def _refine_sharded(scene, cfg, pb, key, mesh, view_axis):
    """refine_batch inside shard_map: patch batch on 'patch', atlases on
    'view' (or replicated when view_axis is None)."""
    rig_spec = jax.tree.map(lambda _: P(), scene.rig)
    if view_axis:
        pyr_spec = type(scene.pyramids)(
            images=P("view"), edges=P("view"), dims=P(), rgb=P("view"),
            var=P("view"), yoff=P())
    else:
        pyr_spec = jax.tree.map(lambda _: P(), scene.pyramids)
    scene_spec = type(scene)(rig=rig_spec, pyramids=pyr_spec)
    pb_spec = jax.tree.map(lambda _: P("patch"), pb)

    def body(sc_l, pb_l, k, nr):
        return lc.refine_batch(sc_l, cfg, pb_l, k, nr, True, 1,
                               view_axis=view_axis)

    out_spec = jax.tree.map(
        lambda _: P("patch"),
        lc.RefineResult(pb, jnp.zeros(pb.capacity, jnp.int32)))
    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(scene_spec, pb_spec, P(), P()),
        out_specs=out_spec,
        check_vma=False))
    return f(scene, pb, key, jnp.float32(0.005))


def test_refine_batch_view_sharded_matches_flat_mesh(setup4):
    """The FULL refine step (PSO + NCC pruning + LOD + color + runtime
    filter) under view sharding must agree with the same step on a
    view-replicated mesh of identical patch sharding — identical PSO
    random streams, so the only difference is psum reassociation of the
    fitness sums (VERDICT r4 next-step #1's 'parity test')."""
    from pais_mvs_tpu.models import patch as patch_mod
    sc, cfg, scene = setup4
    B = 16
    pb = patch_mod.from_seeds(sc.seed_centers[:B], sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    key = jax.random.PRNGKey(3)

    mesh_flat = mesh_mod.make_mesh((2, 1), jax.devices()[:2])
    mesh_v2 = mesh_mod.make_mesh((2, 2), jax.devices()[:4])
    mesh_v4 = mesh_mod.make_mesh((2, 4), jax.devices()[:8])

    base = _refine_sharded(scene, cfg, pb, key, mesh_flat, None)
    bvalid = np.asarray(base.batch.valid)
    assert bvalid.sum() >= B * 0.5          # the yardstick itself is sane
    for mesh, va in ((mesh_v2, "view"), (mesh_v4, "view")):
        res = _refine_sharded(scene, cfg, pb, key, mesh, va)
        v = np.asarray(res.batch.valid)
        agree = (v == bvalid).mean()
        assert agree >= 0.9, (agree, v.sum(), bvalid.sum())
        both = v & bvalid
        dc = np.linalg.norm(np.asarray(res.batch.center)[both]
                            - np.asarray(base.batch.center)[both], axis=-1)
        # identical streams; only fitness-sum reassociation can move the
        # PSO — most patches land bit-close, the median must be tiny
        # (bitwise color/LOD/filter parity is asserted on the primitives
        # directly in test_view_primitives_match_flat — here the PSO's
        # chaotic amplification of the reassociation ulps is in the loop)
        assert np.median(dc) < 1e-4, np.median(dc)


def test_view_primitives_match_flat(setup4):
    """The non-fitness pyramids consumers (LOD variance search, color
    lookup, runtime filter) must be BIT-identical under view sharding on
    fixed inputs — their composition is one-hot psum routing, with no
    floating-point reassociation anywhere."""
    from pais_mvs_tpu.models import patch as patch_mod
    sc, cfg, scene = setup4
    B = 16
    pb = patch_mod.from_seeds(sc.seed_centers[:B], sc.seed_cam_masks[:B],
                              sc.seed_img_points[:B])
    pb = lc.prepare_seeds(scene, cfg, pb)
    # a refined batch gives realistic ref cams / centers / masks
    res = lc.refine_batch(scene, cfg, pb, jax.random.PRNGKey(4),
                          jnp.float32(0.005), True, 1).batch
    center = res.center
    normal = geom.spherical_to_normal(res.normal_sph)
    ref_cam = lc.set_reference_camera(scene, normal, res.cam_mask)

    lod_flat = lc.set_lod(scene, cfg, center, ref_cam)
    _, col_flat = lc.set_image_points_and_color(scene, center, ref_cam)
    keep_flat = lc.runtime_filter_static(scene, cfg, res)

    mesh = mesh_mod.make_mesh((2, 2), jax.devices()[:4])
    rig_spec = jax.tree.map(lambda _: P(), scene.rig)
    pyr_spec = type(scene.pyramids)(images=P("view"), edges=P("view"),
                                    dims=P(), rgb=P("view"), var=P("view"),
                                    yoff=P())
    scene_spec = type(scene)(rig=rig_spec, pyramids=pyr_spec)
    pb_spec = jax.tree.map(lambda _: P("patch"), res)

    def body(sc_l, pb_l, cen, rc):
        lod = lc.set_lod(sc_l, cfg, cen, rc, view_axis="view")
        _, col = lc.set_image_points_and_color(sc_l, cen, rc,
                                               view_axis="view")
        keep = lc.runtime_filter_static(sc_l, cfg, pb_l, view_axis="view")
        return lod, col, keep

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(scene_spec, pb_spec, P("patch"), P("patch")),
        out_specs=(P("patch"), P("patch"), P("patch")),
        check_vma=False))
    lod_v, col_v, keep_v = f(scene, res, center, ref_cam)
    np.testing.assert_array_equal(np.asarray(lod_flat), np.asarray(lod_v))
    np.testing.assert_array_equal(np.asarray(col_flat), np.asarray(col_v))
    np.testing.assert_array_equal(np.asarray(keep_flat),
                                  np.asarray(keep_v))


def test_expand_distributed_view_sharded(setup4):
    """Multi-round distributed expansion on a (2, 2) patch x view mesh:
    the pyramids are camera-block sharded end to end through candgen ->
    sharded refine -> insert fixpoint. Cloud must agree with the (2, 1)
    view-replicated run (identical patch sharding => identical streams)."""
    from pais_mvs_tpu.engine.reconstructor import Reconstructor
    from pais_mvs_tpu.oracle import cloud_agreement
    sc, cfg, scene = setup4
    cfg = cfg.replace(cell_size=10, min_cam_num=3, seed_refine_rounds=1)

    def run(mesh):
        rec = Reconstructor(sc.params, sc.images, cfg, verbose=False)
        rec.load_seeds(sc.seed_centers, sc.seed_cam_masks,
                       sc.seed_img_points,
                       np.full((len(sc.seed_centers), 3), 128.0))
        rec.refine_seeds()
        n_seeds = len(rec.arena.live_ids())
        rec.expand_distributed(mesh=mesh, max_rounds=3, per_shard=16)
        return rec, n_seeds

    rec_v, ns_v = run(mesh_mod.make_mesh((2, 2), jax.devices()[:4]))
    rec_f, ns_f = run(mesh_mod.make_mesh((2, 1), jax.devices()[:2]))
    pts_v, pts_f = rec_v.live_centers(), rec_f.live_centers()
    assert len(pts_v) > ns_v, "view-sharded expansion inserted nothing"
    d_v = float(np.median(sc.surface_distance(pts_v)))
    d_f = float(np.median(sc.surface_distance(pts_f)))
    assert d_v < max(1.5 * d_f, 0.003), (d_v, d_f)
    depth = float(np.linalg.norm(sc.seed_centers.mean(0)
                                 - rec_v.np_center.mean(0)))
    half_cell = 0.5 * cfg.cell_size * depth / float(rec_v.np_focal[0, 0])
    ag = cloud_agreement(pts_v, pts_f, half_cell)
    assert ag["engine_within_tol"] >= 0.9, ag
    assert ag["oracle_within_tol"] >= 0.9, ag


def test_fitness_view_realistic_texture():
    """View-sharded fitness parity on REAL photographic texture (the
    pawn-rig photo scene) — the synthetic value-noise scenes hide whole
    precision/warp-clipping error classes (CLAUDE.md; the round-2 bf16
    bug was invisible to them). The 5-camera rig is prime, so this runs
    vp=5 (one camera per shard — every cross-camera term crosses the
    view axis) on a (1, 5) mesh, Pallas sampler in precise-f32 interpret
    mode vs the flat jnp reference."""
    from pais_mvs_tpu.data.realistic import make_realistic_scene
    rsc = make_realistic_scene(num_seeds=16, seed=0)
    cfg = MvsConfig(patch_radius=6, max_lod=4, particle_num=8,
                    max_iteration=12, dist_weighting=2.0, cell_size=12,
                    min_cam_num=3, batch_size=16)
    scene = build_scene(rsc.params, rsc.images, cfg)
    C = scene.rig.num_cameras
    assert C == 5
    B, Pn = 8, 9
    centers = rsc.seed_centers[:B].astype(np.float32)
    ref = np.full(B, 2, dtype=np.int32)
    rays = centers - np.asarray(scene.rig.center)[ref]
    depths = np.linalg.norm(rays, axis=-1)
    rays = (rays / depths[:, None]).astype(np.float32)
    n0 = np.asarray(geom.estimated_normal(
        jnp.asarray(centers), scene.rig.center[None].repeat(B, 0),
        jnp.asarray(rsc.seed_cam_masks[:B])))
    sph = np.asarray(geom.normal_to_spherical(jnp.asarray(n0)))
    rng = np.random.default_rng(1)
    pos = np.stack([
        sph[:, 0:1] + rng.normal(scale=0.2, size=(B, Pn)),
        sph[:, 1:2] + rng.normal(scale=0.3, size=(B, Pn)),
        depths[:, None] + rng.uniform(-0.02, 0.02, size=(B, Pn)),
    ], -1).astype(np.float32)
    cm = jnp.asarray(rsc.seed_cam_masks[:B])
    lod = jnp.zeros(B, dtype=jnp.int32)

    flat = np.asarray(F.patch_fitness(scene, cfg, jnp.asarray(ref), cm,
                                      lod, jnp.asarray(rays),
                                      jnp.asarray(pos)))

    c_local = 1
    mesh = mesh_mod.make_mesh((1, 5), jax.devices()[:5])
    rig_spec = jax.tree.map(lambda _: P(), scene.rig)

    def body(rig, img, edg, dims, yo, ref_c, cmk, ld, ry, ps):
        return VF.fitness_view_pallas(rig, img, edg, dims, yo, cfg,
                                      c_local, ref_c, cmk, ld, ry, ps,
                                      "view", precise=True, interpret=True)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rig_spec, P("view"), P("view"), P(), P(),
                  P("patch"), P("patch"), P("patch"), P("patch"),
                  P("patch")),
        out_specs=P("patch"), check_vma=False))
    b = np.asarray(f(scene.rig, scene.pyramids.images, scene.pyramids.edges,
                     scene.pyramids.dims, scene.pyramids.yoff,
                     jnp.asarray(ref), cm, lod, jnp.asarray(rays),
                     jnp.asarray(pos)))
    big_a, big_b = flat >= 1e20, b >= 1e20
    np.testing.assert_array_equal(big_a, big_b)
    both = ~big_a
    assert both.sum() > 20, both.sum()
    np.testing.assert_allclose(b[both], flat[both], rtol=1e-4, atol=1e-4)
