"""Viewer-replacement diagnostics (reference C10: showRefinedResult /
showError, TMVS/mvs/patch.cpp:764-910) + LogManager (io/logmanager)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pais_mvs_tpu.diagnostics import (warped_windows, sad_heatmap,
                                      save_patch_diagnostics,
                                      write_animate_ply)
from pais_mvs_tpu.io.logmanager import LogManager
from pais_mvs_tpu.ops import geometry as geom


def test_warped_windows_selfconsistent(tiny_scene, tiny_built, tiny_cfg):
    """The reference view's warped window must equal the direct window crop
    (H_ref = identity), and other views must agree photometrically on the
    textured plane."""
    scene = tiny_built
    i = 5
    center = tiny_scene.seed_centers[i]
    sph = np.asarray(geom.normal_to_spherical(
        jnp.asarray(tiny_scene.plane_normal, jnp.float32)))
    cam_mask = tiny_scene.seed_cam_masks[i]
    windows, valid = warped_windows(scene, tiny_cfg, center, sph, 2,
                                    cam_mask, 0)
    C = scene.rig.num_cameras
    W = 2 * tiny_cfg.patch_radius + 1
    assert windows.shape == (C, W, W)
    assert valid[2]
    # photoconsistency: visible valid views should agree within texture
    # sampling noise on the true surface with the true normal
    m = valid & cam_mask
    assert m.sum() >= 3
    w = windows[m]
    err = np.nanmean(np.abs(w - np.nanmean(w, axis=0)[None]))
    assert err < 8.0, err
    hm = sad_heatmap(windows, m)
    assert hm.shape == (W, W)
    assert np.nanmean(hm) < 8.0


def test_save_patch_diagnostics(tmp_path, tiny_scene, tiny_built, tiny_cfg):
    i = 3
    sph = np.asarray(geom.normal_to_spherical(
        jnp.asarray(tiny_scene.plane_normal, jnp.float32)))
    path = save_patch_diagnostics(
        tiny_built, tiny_cfg, tiny_scene.seed_centers[i], sph, 2,
        tiny_scene.seed_cam_masks[i], 0, str(tmp_path), 99, fitness=0.5)
    assert os.path.exists(path)
    assert os.path.exists(tmp_path / "patch99_error.png")


def test_animate_ply_order(tmp_path):
    n = 5
    centers = np.arange(15, dtype=float).reshape(5, 3)
    normals = np.tile([0.0, 0.0, 1.0], (n, 1))
    colors = np.full((n, 3), 100.0)
    out = tmp_path / "anim.ply"
    write_animate_ply(str(out), centers, normals, colors)
    lines = out.read_text().splitlines()
    assert "property float order" in lines
    body = lines[lines.index("end_header") + 1:]
    orders = [float(l.split()[-1]) for l in body]
    assert orders == sorted(orders) and orders[0] == 0.0 and orders[-1] == 1.0


def test_html_viewer(tmp_path):
    import json
    import re
    from pais_mvs_tpu.diagnostics import write_html_viewer
    n = 50
    centers = np.random.default_rng(0).normal(size=(n, 3))
    colors = np.full((n, 3), 120.0)
    normals = np.tile([0.0, 0.0, 1.0], (n, 1))
    cam_c = np.array([[0.0, 0.0, -3.0], [1.0, 0.0, -3.0]])
    cam_ax = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = tmp_path / "view.html"
    write_html_viewer(str(out), centers, colors, normals=normals,
                      ids=np.arange(n), cam_centers=cam_c, cam_axes=cam_ax,
                      cam_names=["a.jpg", "b.jpg"])
    html = out.read_text()
    m = re.search(r"const P = (\[\[.*?\]\]);", html, re.S)
    pts = json.loads(m.group(1))
    # [x,y,z, r,g,b, order, nx,ny,nz, id]
    assert len(pts) == n and all(len(p) == 11 for p in pts)
    orders = [p[6] for p in pts]
    assert orders == sorted(orders)
    assert [p[10] for p in pts] == list(range(n))
    m = re.search(r"const CAMS = (\[.*?\]);", html, re.S)
    cams = json.loads(m.group(1))
    assert len(cams) == 2 and cams[0][6] == "a.jpg"
    assert "onmousedown" in html and "onwheel" in html
    for key in ("'n'", "'v'", "patch id"):
        assert key in html, key


def test_logmanager(tmp_path):
    lm = LogManager(str(tmp_path / "log.txt"), echo=False)
    lm.log("hello")
    lm.warning("careful")
    lm.error("boom")
    lm.close()
    text = (tmp_path / "log.txt").read_text()
    assert "[Log] hello" in text
    assert "[Warning] careful" in text
    assert "[Error] boom" in text
