"""Photoconsistency fitness on analytic scenes: the ground-truth plane
hypothesis must beat perturbed hypotheses."""

import numpy as np
import jax.numpy as jnp

from pais_mvs_tpu.ops import fitness as fit
from pais_mvs_tpu.ops import geometry as geom


def _setup(tiny_scene, tiny_built):
    scene = tiny_built
    rig = scene.rig
    centers = tiny_scene.seed_centers[:8]
    B = centers.shape[0]
    n_true = tiny_scene.plane_normal
    ref = np.zeros(B, dtype=np.int32) + 2          # middle camera
    rays = centers - np.asarray(rig.center)[ref]
    depths = np.linalg.norm(rays, axis=-1)
    rays = rays / depths[:, None]
    sph = np.asarray(geom.normal_to_spherical(jnp.asarray(n_true)))
    return scene, centers, B, ref, rays, depths, sph


def test_truth_beats_perturbations(tiny_scene, tiny_built, tiny_cfg):
    scene, centers, B, ref, rays, depths, sph = _setup(tiny_scene, tiny_built)
    C = scene.rig.num_cameras
    cam_mask = jnp.ones((B, C), dtype=bool)
    lod = jnp.zeros(B, dtype=jnp.int32)

    # candidates: [truth, depth+, depth-, tilted]
    P = 4
    pos = np.zeros((B, P, 3), dtype=np.float32)
    pos[:, :, 0] = sph[0]
    pos[:, :, 1] = sph[1]
    pos[:, :, 2] = depths[:, None]
    pos[:, 1, 2] += 0.08
    pos[:, 2, 2] -= 0.08
    pos[:, 3, 0] += 0.5

    f = fit.patch_fitness(scene, tiny_cfg, jnp.asarray(ref), cam_mask, lod,
                          jnp.asarray(rays, dtype=jnp.float32),
                          jnp.asarray(pos))
    f = np.asarray(f)
    assert np.all(np.isfinite(f[:, 0]))
    assert np.all(f[:, 0] < 1e20)
    # ground truth strictly better than perturbations for most patches
    assert np.mean(f[:, 0] < f[:, 1]) > 0.9
    assert np.mean(f[:, 0] < f[:, 2]) > 0.9
    assert np.mean(f[:, 0] < f[:, 3]) > 0.9
    # truth is a small SAD value (images agree up to resampling error)
    assert np.median(f[:, 0]) < 5.0


def test_inverted_normal_rejected(tiny_scene, tiny_built, tiny_cfg):
    scene, centers, B, ref, rays, depths, sph = _setup(tiny_scene, tiny_built)
    C = scene.rig.num_cameras
    cam_mask = jnp.ones((B, C), dtype=bool)
    lod = jnp.zeros(B, dtype=jnp.int32)
    pos = np.zeros((B, 1, 3), dtype=np.float32)
    flipped = np.asarray(geom.normal_to_spherical(
        -jnp.asarray(tiny_scene.plane_normal)))
    pos[:, 0, 0] = flipped[0]
    pos[:, 0, 1] = flipped[1]
    pos[:, 0, 2] = depths
    f = fit.patch_fitness(scene, tiny_cfg, jnp.asarray(ref), cam_mask, lod,
                          jnp.asarray(rays, dtype=jnp.float32),
                          jnp.asarray(pos))
    assert np.all(np.asarray(f) >= 1e29)


def test_out_of_bounds_rejected(tiny_scene, tiny_built, tiny_cfg):
    scene, centers, B, ref, rays, depths, sph = _setup(tiny_scene, tiny_built)
    C = scene.rig.num_cameras
    cam_mask = jnp.ones((B, C), dtype=bool)
    lod = jnp.zeros(B, dtype=jnp.int32)
    pos = np.zeros((B, 1, 3), dtype=np.float32)
    pos[:, 0, 0] = sph[0]
    pos[:, 0, 1] = sph[1]
    pos[:, 0, 2] = depths * 20.0      # way behind the scene
    f = fit.patch_fitness(scene, tiny_cfg, jnp.asarray(ref), cam_mask, lod,
                          jnp.asarray(rays, dtype=jnp.float32),
                          jnp.asarray(pos))
    assert np.all(np.asarray(f) >= 1e29)


def test_fitness_depth_sweep_has_minimum_at_truth(tiny_scene, tiny_built,
                                                  tiny_cfg):
    scene, centers, B, ref, rays, depths, sph = _setup(tiny_scene, tiny_built)
    C = scene.rig.num_cameras
    cam_mask = jnp.ones((B, C), dtype=bool)
    lod = jnp.zeros(B, dtype=jnp.int32)
    P = 21
    offsets = np.linspace(-0.15, 0.15, P).astype(np.float32)
    pos = np.zeros((B, P, 3), dtype=np.float32)
    pos[:, :, 0] = sph[0]
    pos[:, :, 1] = sph[1]
    pos[:, :, 2] = depths[:, None] + offsets[None, :]
    f = np.asarray(fit.patch_fitness(
        scene, tiny_cfg, jnp.asarray(ref), cam_mask, lod,
        jnp.asarray(rays, dtype=jnp.float32), jnp.asarray(pos)))
    best = np.argmin(f, axis=1)
    # minimum within one step of the true depth for most patches
    assert np.mean(np.abs(best - P // 2) <= 2) > 0.8


def test_warped_patch_vectors_correlation(tiny_scene, tiny_built, tiny_cfg):
    scene, centers, B, ref, rays, depths, sph = _setup(tiny_scene, tiny_built)
    C = scene.rig.num_cameras
    cam_mask = jnp.ones((B, C), dtype=bool)
    lod = jnp.zeros(B, dtype=jnp.int32)
    n = jnp.broadcast_to(jnp.asarray(tiny_scene.plane_normal,
                                     dtype=jnp.float32), (B, 3))
    vecs, corr, correlation, ok = fit.warped_patch_vectors(
        scene, tiny_cfg, jnp.asarray(centers, dtype=jnp.float32), n,
        jnp.asarray(ref), cam_mask, lod)
    assert bool(jnp.all(ok))
    # on the true plane all views agree: mean pairwise NCC near 1
    assert float(jnp.min(correlation)) > 0.95
    # rows are unit vectors
    norms = np.linalg.norm(np.asarray(vecs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    # wrong plane decorrelates
    _, _, corr_bad, ok_bad = fit.warped_patch_vectors(
        scene, tiny_cfg,
        jnp.asarray(centers + np.array([0, 0, 0.4]), dtype=jnp.float32), n,
        jnp.asarray(ref), cam_mask, lod)
    good = np.asarray(ok_bad)
    if good.any():
        assert float(np.median(np.asarray(corr_bad)[good])) < \
            float(jnp.median(correlation))
