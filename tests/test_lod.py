"""LOD selection: climb the pyramid until the patch window sees enough
texture variance (Patch::setLOD, TMVS/mvs/patch.cpp:511-610)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.config import MvsConfig
from pais_mvs_tpu.data.synthetic import make_scene
from pais_mvs_tpu.models.camera import build_scene
from pais_mvs_tpu.ops import lifecycle as lc


def _scene_with(images, base_sc, cfg):
    return build_scene(base_sc.params, images, cfg)


def test_lod_climbs_on_smooth_texture():
    cfg = MvsConfig(patch_radius=5, max_lod=4, texture_variation=36.0,
                    dist_weighting=5 / 3.0)
    sc = make_scene(num_cams=3, width=320, height=240, num_seeds=8, seed=1)

    rng = np.random.default_rng(0)
    h, w = 240, 320
    # (a) strong high-frequency texture: variance >> threshold at level 0
    noisy = np.clip(rng.uniform(30, 225, (h, w)), 1, 255).astype(np.uint8)
    # (b) very smooth, low-contrast ramp: level-0 windows are nearly flat,
    # higher levels cover a larger world footprint -> variance grows
    ramp = (100 + 40 * np.linspace(0, 1, w))[None, :] \
        + 20 * np.sin(np.linspace(0, 2 * np.pi, h))[:, None]
    smooth = np.clip(ramp, 1, 255).astype(np.uint8)

    def lod_for(img):
        images = [np.stack([img] * 3, -1)] * 3
        scene = _scene_with(images, sc, cfg)
        centers = jnp.asarray(sc.seed_centers[:4], jnp.float32)
        ref = jnp.zeros(4, dtype=jnp.int32)
        return np.asarray(lc.set_lod(scene, cfg, centers, ref))

    lod_noisy = lod_for(noisy)
    lod_smooth = lod_for(smooth)
    assert np.all(lod_noisy == 0), lod_noisy
    assert np.all(lod_smooth > 0), lod_smooth
    assert np.all(lod_smooth <= cfg.max_lod)


def test_lod_respects_min_lod():
    cfg = MvsConfig(patch_radius=5, max_lod=4, min_lod=2,
                    texture_variation=1.0, dist_weighting=5 / 3.0)
    sc = make_scene(num_cams=3, width=320, height=240, num_seeds=8, seed=1)
    scene = build_scene(sc.params, sc.images, cfg)
    centers = jnp.asarray(sc.seed_centers[:4], jnp.float32)
    ref = jnp.zeros(4, dtype=jnp.int32)
    lod = np.asarray(lc.set_lod(scene, cfg, centers, ref))
    assert np.all(lod >= 2), lod
