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

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rig_spec, P("view"), P("view"), P(), P(),
                  P("patch"), P("patch"), P("patch"), P("patch"),
                  P("patch")),
        out_specs=P("patch"), check_vma=False)
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

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(scene_spec, P("patch"), P("patch"), P("patch"),
                  P("patch"), P("patch")),
        out_specs=(P("patch"), P("patch"), P("patch"), P("patch")),
        check_vma=False)
    vb, cb, corrb, okb = f(scene, centers, normal, ref, cm, lod)

    np.testing.assert_array_equal(np.asarray(oka), np.asarray(okb))
    ok = np.asarray(oka)
    # vector + table parity where the patch survives (garbage rows are
    # masked by ok exactly like the flat path)
    np.testing.assert_allclose(np.asarray(vb)[ok], np.asarray(va)[ok],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(corrb)[ok], np.asarray(corra)[ok],
                               rtol=5e-3, atol=5e-3)
