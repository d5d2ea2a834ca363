"""Pallas fitness kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.ops import fitness as F
from pais_mvs_tpu.ops import geometry as geom
from pais_mvs_tpu.ops.pallas_fitness import patch_fitness_pallas


@pytest.fixture(scope="module")
def problem(tiny_scene, tiny_built, tiny_cfg):
    scene = tiny_built
    B, P = 8, 9
    centers = tiny_scene.seed_centers[:B].astype(np.float32)
    ref = np.full(B, 2, dtype=np.int32)
    rays = centers - np.asarray(scene.rig.center)[ref]
    depths = np.linalg.norm(rays, axis=-1)
    rays = (rays / depths[:, None]).astype(np.float32)
    sph = np.asarray(geom.normal_to_spherical(
        jnp.asarray(tiny_scene.plane_normal)))
    rng = np.random.default_rng(0)
    pos = np.stack([
        sph[0] + rng.normal(scale=0.25, size=(B, P)),
        sph[1] + rng.normal(scale=0.35, size=(B, P)),
        depths[:, None] + rng.uniform(-0.05, 0.05, size=(B, P)),
    ], -1).astype(np.float32)
    C = scene.rig.num_cameras
    return (scene, jnp.asarray(ref), jnp.ones((B, C), bool),
            jnp.zeros(B, dtype=jnp.int32), jnp.asarray(rays),
            jnp.asarray(pos))


def test_pallas_matches_jnp_reference(problem, tiny_cfg):
    scene, ref, cm, lod, rays, pos = problem
    a = np.asarray(F.patch_fitness(scene, tiny_cfg, ref, cm, lod, rays, pos))
    # precise=True: full-f32 multiplies, strict parity
    b = np.asarray(patch_fitness_pallas(scene, tiny_cfg, ref, cm, lod, rays,
                                        pos, interpret=True, precise=True))
    big_a = a >= 1e20
    big_b = b >= 1e20
    np.testing.assert_array_equal(big_a, big_b)
    both = ~big_a
    assert both.sum() > 20
    np.testing.assert_allclose(b[both], a[both], rtol=1e-4, atol=1e-4)
    # default path: single-pass bf16 multiplies — intensity-scale tolerance
    # (~0.5/255 per sample, documented approximation)
    c = np.asarray(patch_fitness_pallas(scene, tiny_cfg, ref, cm, lod, rays,
                                        pos, interpret=True))
    np.testing.assert_array_equal(big_a, c >= 1e20)
    np.testing.assert_allclose(c[both], a[both], rtol=0.08, atol=0.08)


def test_pallas_gradient_weighting_matches(problem, tiny_cfg):
    scene, ref, cm, lod, rays, pos = problem
    cfg = tiny_cfg.replace(adaptive_gradient_enable=True,
                           adaptive_distance_enable=False)
    a = np.asarray(F.patch_fitness(scene, cfg, ref, cm, lod, rays, pos))
    b = np.asarray(patch_fitness_pallas(scene, cfg, ref, cm, lod, rays, pos,
                                        interpret=True, precise=True))
    both = (a < 1e20) & (b < 1e20)
    assert both.sum() > 20
    np.testing.assert_allclose(b[both], a[both], rtol=1e-4, atol=1e-4)


def test_pallas_respects_lod(problem, tiny_cfg):
    scene, ref, cm, lod, rays, pos = problem
    B = pos.shape[0]
    lod1 = jnp.ones(B, dtype=jnp.int32)
    a = np.asarray(F.patch_fitness(scene, tiny_cfg, ref, cm, lod1, rays, pos))
    b = np.asarray(patch_fitness_pallas(scene, tiny_cfg, ref, cm, lod1, rays,
                                        pos, interpret=True, precise=True))
    both = (a < 1e20) & (b < 1e20)
    assert both.sum() > 10
    np.testing.assert_allclose(b[both], a[both], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dist,diff,grad", [
    (False, False, False), (True, False, False), (False, True, False),
    (False, False, True), (True, True, False), (True, False, True),
    (False, True, True), (True, True, True)])
def test_adaptive_weight_sweep(problem, tiny_cfg, dist, diff, grad):
    """All 8 on/off combinations of the adaptive weights (BASELINE config 2:
    'adaptive NCC weighting on/off sweeps') agree between the Pallas kernel
    and the jnp reference."""
    scene, ref, cm, lod, rays, pos = problem
    cfg = tiny_cfg.replace(adaptive_distance_enable=dist,
                           adaptive_difference_enable=diff,
                           adaptive_gradient_enable=grad)
    a = np.asarray(F.patch_fitness(scene, cfg, ref, cm, lod, rays, pos))
    b = np.asarray(patch_fitness_pallas(scene, cfg, ref, cm, lod, rays, pos,
                                        interpret=True, precise=True))
    both = (a < 1e20) & (b < 1e20)
    assert both.sum() > 20
    np.testing.assert_allclose(b[both], a[both], rtol=1e-4, atol=1e-4)


def test_pallas_active_mask_skips_cells(problem, tiny_cfg):
    """Inactive swarms' rows are garbage, but active swarms' fitness must be
    bit-identical to the all-active call (kernel cell skipping)."""
    scene, ref, cm, lod, rays, pos = problem
    B = pos.shape[0]
    active = jnp.asarray(np.arange(B) % 2 == 0)
    full = np.asarray(patch_fitness_pallas(scene, tiny_cfg, ref, cm, lod,
                                           rays, pos, interpret=True))
    part = np.asarray(patch_fitness_pallas(scene, tiny_cfg, ref, cm, lod,
                                           rays, pos, active=active,
                                           interpret=True))
    act = np.asarray(active)
    np.testing.assert_array_equal(part[act], full[act])
    assert np.all(np.isfinite(full))


def test_large_radius_delegates_to_jnp(problem, tiny_cfg):
    """patch_radius beyond the 128-lane slice ceiling (2.6*(2r+1) > 128,
    i.e. r >= 24) must route to the dense jnp reference instead of
    silently BIG-clipping near-grazing windows (VERDICT r2 weak #3)."""
    scene, ref, cm, lod, rays, pos = problem
    cfg = tiny_cfg.replace(patch_radius=25)
    a = np.asarray(F.patch_fitness(scene, cfg, ref, cm, lod, rays, pos))
    b = np.asarray(patch_fitness_pallas(scene, cfg, ref, cm, lod, rays,
                                        pos))
    # the guard is static delegation -> bit-identical, windows included
    np.testing.assert_array_equal(a, b)
    assert (a < 1e20).sum() > 0


def test_span_bucket_matches_always_wide(problem, tiny_cfg):
    """Dual-width dispatch (pallas_span_bucket=True) must agree with the
    always-wide production path: identical BIG fate for every hypothesis
    (the routing mask is conservative — a narrow launch never clips), and
    fitness equal to bf16-quantization tolerance (narrow launches quantize
    a different weight matrix; pallas_fitness._bilinear_block docstring)."""
    scene, ref, cm, lod, rays, pos = problem
    wide_cfg = tiny_cfg.replace(pallas_span_bucket=False)
    dual_cfg = tiny_cfg.replace(pallas_span_bucket=True)
    a = np.asarray(patch_fitness_pallas(scene, wide_cfg, ref, cm, lod, rays,
                                        pos, interpret=True, precise=True))
    b = np.asarray(patch_fitness_pallas(scene, dual_cfg, ref, cm, lod, rays,
                                        pos, interpret=True, precise=True))
    np.testing.assert_array_equal(a >= 1e20, b >= 1e20)
    ok = a < 1e20
    assert ok.sum() > 20
    # precise=True pins f32 matmuls in BOTH launches -> strict agreement
    np.testing.assert_allclose(b[ok], a[ok], rtol=1e-5, atol=1e-5)
    # and the dual path must stay faithful to the jnp reference
    c = np.asarray(F.patch_fitness(scene, tiny_cfg, ref, cm, lod, rays, pos))
    np.testing.assert_array_equal(c >= 1e20, b >= 1e20)
    np.testing.assert_allclose(b[ok], c[ok], rtol=1e-4, atol=1e-4)


def test_roll_hoist_matches_per_block(problem, tiny_cfg):
    """The roll-hoisted kernel (cfg.pallas_roll_hoist: one lane-alignment
    roll per (patch, camera) cell, microbench variant R) must agree with
    the round-3 per-block slices: identical BIG fates on swarm-scale
    hypothesis spreads (the shared slice must cover every block's
    footprint) and fitness equal to f32 op-order tolerance under
    precise=True. Both arms ship — False is bench.py's in-run calibration
    control — so both stay parity-tested."""
    scene, ref, cm, lod, rays, pos = problem
    h = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_roll_hoist=True), ref, cm, lod,
        rays, pos, interpret=True, precise=True))
    p = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_roll_hoist=False), ref, cm, lod,
        rays, pos, interpret=True, precise=True))
    np.testing.assert_array_equal(h >= 1e20, p >= 1e20)
    ok = h < 1e20
    assert ok.sum() > 20
    np.testing.assert_allclose(h[ok], p[ok], rtol=1e-4, atol=1e-4)

    # DEFAULT precision (bf16 matmuls) — the exact program bench.py's
    # control arm runs on-device. Box values are identical rows either
    # way; only the slice's integer column offset (hence the bf16
    # contraction order and the hat-weight lane positions) differs, so
    # agreement is op-order-rounding tight, far below the 0.08
    # kernel-vs-jnp intensity-scale tolerance.
    hb = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_roll_hoist=True), ref, cm, lod,
        rays, pos, interpret=True))
    pb = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_roll_hoist=False), ref, cm, lod,
        rays, pos, interpret=True))
    np.testing.assert_array_equal(hb >= 1e20, pb >= 1e20)
    okb = hb < 1e20
    assert okb.sum() > 20
    np.testing.assert_allclose(hb[okb], pb[okb], rtol=0.05, atol=0.05)


@pytest.mark.parametrize("level", [1, 2])
def test_bf16_vpu_weight_builds_match(problem, tiny_cfg, level):
    """pallas_bf16_vpu levels must agree with the default f32-build kernel
    to bf16-quantization tolerance, and with the jnp reference to the
    documented intensity-scale tolerance. The residual hat formulation
    keeps the integer coordinate part exact in bf16 (config.py knob
    docstring), so errors are weight-rounding only — never coordinate
    quantization (the +-0.2 px raw-cast class the realistic gate catches)."""
    scene, ref, cm, lod, rays, pos = problem
    base = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg, ref, cm, lod, rays, pos, interpret=True))
    fast = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_bf16_vpu=level), ref, cm, lod, rays,
        pos, interpret=True))
    np.testing.assert_array_equal(base >= 1e20, fast >= 1e20)
    ok = base < 1e20
    assert ok.sum() > 20
    # level 1 only changes WHICH side rounds the (already-bf16) MXU hat
    # matrix; level 2 additionally rounds the MXU output (interpolated
    # intensities, +-0.5 units) before the bf16 reduce — roughly doubling
    # the documented single-pass bf16 fitness noise
    tol = 0.02 if level == 1 else 0.12
    np.testing.assert_allclose(fast[ok], base[ok], rtol=tol, atol=tol)
    a = np.asarray(F.patch_fitness(scene, tiny_cfg, ref, cm, lod, rays, pos))
    jtol = 0.08 if level == 1 else 0.15
    np.testing.assert_allclose(fast[ok], a[ok], rtol=jtol, atol=jtol)
    # pallas_precise must ignore the knob entirely (strict-f32 parity path)
    p0 = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg, ref, cm, lod, rays, pos, interpret=True,
        precise=True))
    p1 = np.asarray(patch_fitness_pallas(
        scene, tiny_cfg.replace(pallas_bf16_vpu=level), ref, cm, lod, rays,
        pos, interpret=True, precise=True))
    np.testing.assert_array_equal(p0, p1)
