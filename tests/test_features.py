"""Seeding pipeline tests (reference C9: TMVS/mvs/featuremanager.cpp).

Anchored on the synthetic textured-plane scene: keypoints must repeat
across views, matches must respect epipolar geometry, and triangulated
tracks must land on the ground-truth surface.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.features import detect as det
from pais_mvs_tpu.features import describe as dsc
from pais_mvs_tpu.features import matching as mat
from pais_mvs_tpu.features.seeding import generate_seed_patches, merge_tracks
from pais_mvs_tpu.ops import pyramid as pyr


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_cams=3, width=320, height=240, num_seeds=10,
                      seed=11)


def test_detect_finds_masked_keypoints(scene):
    gray = pyr.rgb_to_gray(scene.images[0]).astype(np.float32)
    kp, gaussians = det.detect_keypoints(jnp.asarray(gray), num_octaves=3,
                                         k_per_octave=128)
    mask = np.asarray(kp.mask)
    assert mask.sum() > 30, "textured plane should yield many DoG extrema"
    xy = np.asarray(kp.xy)[mask]
    assert np.all(xy[:, 0] >= 0) and np.all(xy[:, 0] < 320)
    assert np.all(xy[:, 1] >= 0) and np.all(xy[:, 1] < 240)
    # scores sorted-ish: every valid score positive
    assert np.all(np.asarray(kp.score)[mask] > 0)
    assert len(gaussians) == 3


def test_descriptors_unit_norm(scene):
    gray = pyr.rgb_to_gray(scene.images[0]).astype(np.float32)
    kp, gaussians = det.detect_keypoints(jnp.asarray(gray), num_octaves=2,
                                         k_per_octave=64)
    sel = np.nonzero(np.asarray(kp.octave) == 0)[0][:32]
    d = np.asarray(dsc.describe_octave(gaussians[0], kp.xy_oct[sel],
                                       kp.sigma_oct[sel], kp.level[sel]))
    norms = np.linalg.norm(d, axis=-1)
    valid = np.asarray(kp.mask)[sel]
    assert np.allclose(norms[valid], 1.0, atol=1e-4)
    assert np.all(d >= 0)


def test_fundamental_matrix_epipolar_constraint(scene):
    """x2^T F x1 = 0 for projections of the same 3D point."""
    from pais_mvs_tpu.models.camera import _np_quat_to_rotation
    ps = scene.params
    Rs, Ts, Ks = [], [], []
    for i, p in enumerate(ps[:2]):
        R = _np_quat_to_rotation(p.quaternion)
        h, w = scene.images[i].shape[:2]
        pp = np.array([w >> 1, h >> 1], dtype=np.float64)
        K = np.array([[p.focal[0], 0, pp[0]], [0, p.focal[1], pp[1]],
                      [0, 0, 1.0]])
        Rs.append(R); Ts.append(-R @ p.center); Ks.append(K)
    F = mat.fundamental_from_rig(Rs[0], Ts[0], Ks[0], Rs[1], Ts[1], Ks[1])
    # use the scene's ground-truth correspondences
    pts1 = scene.seed_img_points[:, 0]
    pts2 = scene.seed_img_points[:, 1]
    ok = scene.seed_cam_masks[:, 0] & scene.seed_cam_masks[:, 1]
    h1 = np.concatenate([pts1, np.ones((len(pts1), 1))], -1)
    h2 = np.concatenate([pts2, np.ones((len(pts2), 1))], -1)
    lines = h1 @ F.T
    resid = np.abs(np.sum(lines * h2, axis=-1))
    dist = resid / np.linalg.norm(lines[:, :2], axis=-1)
    assert np.all(dist[ok] < 0.5), dist[ok]


def test_merge_tracks_consistency():
    # cameras 0-1-2, keypoints 0..3 each; one clean 3-view track, one
    # inconsistent (two cam-2 keypoints), one 2-view track (below min=3)
    pairs = {
        (0, 1): (np.array([0, 1, 2]), np.array([0, 1, 2])),
        (1, 2): (np.array([0, 1]), np.array([0, 1])),
        (0, 2): (np.array([1, 3]), np.array([2, 3])),  # kp1->cam2:2 conflicts
    }
    tracks = merge_tracks(pairs, num_cams=3, k_per_cam=4, min_cam_num=3)
    assert {t[0] for t in tracks if 0 in t} == {0}
    t = [t for t in tracks if t.get(0) == 0][0]
    assert t == {0: 0, 1: 0, 2: 0}


def test_generate_seed_patches_on_surface(scene):
    cfg = MvsConfig(min_cam_num=3)
    centers, cam_masks, img_points, colors = generate_seed_patches(
        scene.params, scene.images, cfg, max_epipolar_dist=3.0,
        k_per_octave=160, num_octaves=3)
    assert len(centers) > 20, f"only {len(centers)} tracks"
    d = scene.surface_distance(centers)
    # seeds triangulated from matched features should lie on the plane
    assert np.median(d) < 0.01, np.median(d)
    assert np.all(cam_masks.sum(-1) >= 3)
    live = cam_masks.any(0)
    assert live.sum() == 3


def test_mixed_resolution_rig_seeding():
    """Cameras of different resolutions produce different keypoint counts
    per camera (fewer octaves on smaller images); the track union must
    handle the ragged counts without id collisions."""
    big = make_scene(num_cams=4, width=320, height=240, num_seeds=10,
                     seed=11)
    small = make_scene(num_cams=4, width=160, height=120, num_seeds=10,
                       seed=11, focal=0.5 * 1.1 * 320)
    params = [small.params[0]] + list(big.params[1:])
    images = [small.images[0]] + list(big.images[1:])
    cfg = MvsConfig(min_cam_num=3)
    centers, cam_masks, ipts, colors = generate_seed_patches(
        params, images, cfg, max_epipolar_dist=3.0,
        k_per_octave=160, num_octaves=4)
    assert len(centers) > 5, f"only {len(centers)} tracks"
    d = big.surface_distance(centers)
    assert np.median(d) < 0.01, np.median(d)
