"""Realistic validation scene: real photographic texture, occluding
geometry, per-view photometric jitter, and the reference's actual pawn
camera rig.

The synthetic value-noise scenes (data/synthetic.py) validate numerics;
everything here exists to answer the gaps they leave (VERDICT round 1):

  * texture is a REAL photograph (matplotlib's bundled public-domain
    ``grace_hopper.jpg``) with natural intensity statistics, not
    procedural value noise;
  * the surface is a plane with a raised rectangular STEP — rays are
    cast against the union analytically, so views genuinely disagree
    near the step (occlusion boundaries, depth discontinuities);
  * each camera applies a gain/bias photometric jitter (brightness
    constancy only holds approximately, as between real exposures);
  * the camera rig is the reference's pawn benchmark: the five NVM
    camera rows from /root/reference/README.md:68-72 verbatim (real
    focals, quaternions, centers; radial distortion ~-0.2 is carried
    through parsing — projection applies it only when the config asks).

Everything is NumPy; images render once on host.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from pais_mvs_tpu.models.camera import CameraParams

# The pawn rig (reference README.md:68-72): name, focal, quaternion wxyz,
# center xyz, radial distortion. These ARE the benchmark's cameras.
PAWN_CAMERAS = [
    ("pawn0013.jpg", 614.095397949,
     (0.705410371683, 0.160690743319, 0.671401589359, 0.160605237544),
     (-0.556085150075, 0.0481223921551, -0.00781510757143), -0.199289312888),
    ("pawn0010.jpg", 616.175537109,
     (0.90353903514, 0.221746421078, 0.3576944596, 0.0806247263945),
     (-0.880841878288, 0.0327703491031, -0.684201024844), -0.209314043486),
    ("pawn0011.jpg", 612.03302002,
     (0.85241383667, 0.2037593266, 0.469072019941, 0.108830220502),
     (-0.71971232163, 0.0433857776889, -0.492035476323), -0.207263977174),
    ("pawn0012.jpg", 611.360473633,
     (0.786507583571, 0.183363764635, 0.573952646995, 0.135504187104),
     (-0.608685012281, 0.0487066227347, -0.263440114899), -0.203210786458),
    ("pawn0014.jpg", 617.585876465,
     (0.611485687162, 0.135944898976, 0.757586998462, 0.183482834469),
     (-0.572254659063, 0.0434025057556, 0.255716172724), -0.198563271584),
]

WIDTH, HEIGHT = 640, 480


def _quat_to_R(q):
    w, x, y, z = q
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def load_photo() -> np.ndarray:
    """The bundled real photograph (uint8 [H, W, 3])."""
    import matplotlib
    from PIL import Image
    path = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data", "grace_hopper.jpg")
    return np.asarray(Image.open(path).convert("RGB"))


class StepSurface(NamedTuple):
    """Plane through p0 (frame e1/e2/n) with a raised rectangular step of
    half-extents (a, b) and height h; plane half-extents (U, V)."""
    p0: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    n: np.ndarray
    U: float
    V: float
    a: float
    b: float
    h: float

    def uvw(self, X):
        d = np.asarray(X) - self.p0
        return d @ self.e1, d @ self.e2, d @ self.n

    # ---- analytic ray casting (plane + box union, nearest hit) ----
    def cast(self, o, dirs):
        """o: [3]; dirs: [N, 3] (need not be unit). Returns (t [N], hit
        kind [N] int: -1 miss, 0 plane, 1 top, 2..5 sides)."""
        N = len(dirs)
        INF = np.inf
        tbest = np.full(N, INF)
        kind = np.full(N, -1, dtype=np.int32)

        du = dirs @ self.e1
        dv = dirs @ self.e2
        dw = dirs @ self.n
        ou, ov, ow = self.uvw(o)

        def consider(t, u, v, w, ok, k):
            nonlocal tbest, kind
            ok = ok & (t > 1e-9) & (t < tbest)
            tbest = np.where(ok, t, tbest)
            kind = np.where(ok, k, kind)

        # base plane (w = 0), visible only outside the step footprint
        with np.errstate(divide="ignore", invalid="ignore"):
            t = -ow / dw
        u = ou + t * du
        v = ov + t * dv
        consider(t, u, v, 0.0, (np.abs(u) <= self.U) & (np.abs(v) <= self.V)
                 & ~((np.abs(u) < self.a) & (np.abs(v) < self.b))
                 & (dw != 0), 0)
        # top face (w = h)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (self.h - ow) / dw
        u = ou + t * du
        v = ov + t * dv
        consider(t, u, v, self.h,
                 (np.abs(u) <= self.a) & (np.abs(v) <= self.b) & (dw != 0), 1)
        # sides u = +-a, v in [-b, b], w in [0, h]
        for i, (sgn, along, dalong) in enumerate(((1, ov, dv), (-1, ov, dv))):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (sgn * self.a - ou) / du
            v = along + t * dalong
            w = ow + t * dw
            consider(t, sgn * self.a, v, w,
                     (np.abs(v) <= self.b) & (w >= 0) & (w <= self.h)
                     & (du != 0), 2 + i)
        # sides v = +-b, u in [-a, a], w in [0, h]
        for i, sgn in enumerate((1, -1)):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (sgn * self.b - ov) / dv
            u = ou + t * du
            w = ow + t * dw
            consider(t, u, sgn * self.b, w,
                     (np.abs(u) <= self.a) & (w >= 0) & (w <= self.h)
                     & (dv != 0), 4 + i)
        return tbest, kind

    # ---- distance of points to the surface (for quality gates) ----
    def distance(self, X) -> np.ndarray:
        X = np.atleast_2d(np.asarray(X, float))
        u, v, w = self.uvw(X)

        def rect_dist(uu, vv, ww, a, b):
            # distance to rectangle |u|<=a, |v|<=b at w=0 of a local frame
            du = np.maximum(np.abs(uu) - a, 0.0)
            dv = np.maximum(np.abs(vv) - b, 0.0)
            return np.sqrt(du * du + dv * dv + ww * ww)

        cands = []
        # base plane excluding the footprint: clamp the closest point out
        # of the hole via the nearest footprint edge
        inside = (np.abs(u) < self.a) & (np.abs(v) < self.b)
        edge_u = self.a - np.abs(u)
        edge_v = self.b - np.abs(v)
        lateral = np.where(inside, np.minimum(edge_u, edge_v), 0.0)
        plane_d = np.sqrt(lateral ** 2 + w ** 2)
        out_d = rect_dist(u, v, w, self.U, self.V)
        cands.append(np.where(inside, plane_d, out_d))
        # top face
        cands.append(rect_dist(u, v, w - self.h, self.a, self.b))
        # sides
        hw = self.h / 2.0
        cands.append(rect_dist(v, w - hw, u - self.a, self.b, hw))
        cands.append(rect_dist(v, w - hw, u + self.a, self.b, hw))
        cands.append(rect_dist(u, w - hw, v - self.b, self.a, hw))
        cands.append(rect_dist(u, w - hw, v + self.b, self.a, hw))
        return np.min(np.stack(cands), axis=0)


class RealisticScene(NamedTuple):
    params: list
    images: list
    surface: StepSurface
    seed_centers: np.ndarray
    seed_cam_masks: np.ndarray
    seed_img_points: np.ndarray

    def surface_distance(self, pts) -> np.ndarray:
        return self.surface.distance(pts)


def make_realistic_scene(num_seeds: int = 200, seed: int = 0,
                         step_height_frac: float = 0.06,
                         gain_jitter: float = 0.06,
                         bias_jitter: float = 4.0,
                         distort: bool = False,
                         scale: int = 1) -> RealisticScene:
    """Render the pawn rig looking at a photo-textured stepped plane.

    step_height_frac: step height as a fraction of mean viewing distance
    (0.06 ~ strong occlusion at the step edges).
    distort: render through each camera's REAL radial distortion
    (~-0.2, reference camera.cpp:148-155) — pixels then only match the
    pinhole model after undistortion (cfg.apply_distortion).
    scale: integer super-resolution factor — renders the SAME rig and
    surface at scale*(640x480) with focals scaled to match (the 2K-class
    arm of the distributed parity evidence, VERDICT r4 next-step #8).
    """
    W, H = WIDTH * scale, HEIGHT * scale
    rng = np.random.default_rng(seed)
    photo = load_photo()
    gray_photo = photo.astype(np.float64)

    Rs = [_quat_to_R(q) for _, _, q, _, _ in PAWN_CAMERAS]
    centers = np.array([c for _, _, _, c, _ in PAWN_CAMERAS])
    focals = [f for _, f, _, _, _ in PAWN_CAMERAS]
    opticals = np.array([R.T @ np.array([0, 0, 1.0]) for R in Rs])

    # surface placement: least-squares intersection of the optical axes
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for c, d in zip(centers, opticals):
        P = np.eye(3) - np.outer(d, d)
        A += P
        b += P @ c
    target = np.linalg.pinv(A) @ b
    depth = float(np.mean(np.linalg.norm(centers - target, axis=1)))

    n = -opticals.mean(axis=0)
    n /= np.linalg.norm(n)
    e1 = np.cross(n, [0.0, 0.0, 1.0])
    if np.linalg.norm(e1) < 1e-6:
        e1 = np.cross(n, [0.0, 1.0, 0.0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n, e1)

    # plane extent ~ the FOV footprint at depth; step covers the middle
    half = depth * (WIDTH / 2) / float(np.mean(focals)) * 1.15
    surf = StepSurface(p0=target, e1=e1, e2=e2, n=n,
                       U=half, V=half * 0.8,
                       a=half * 0.35, b=half * 0.3,
                       h=depth * step_height_frac)

    def tex(u, v, w, kind):
        """Photo lookup: plane and top use shifted (u, v) charts; sides a
        (tangent, height) chart — every face gets real texture."""
        ph, pw = gray_photo.shape[:2]
        su = np.where(kind == 1, u + 0.17 * surf.U, u)
        sv = np.where(kind == 1, v - 0.13 * surf.V, v)
        su = np.where(kind >= 2, v + w, su)
        sv = np.where(kind >= 2, u - 2.0 * w, sv)
        px = (su / surf.U * 0.5 + 0.5) * (pw - 2)
        py = (sv / surf.V * 0.5 + 0.5) * (ph - 2)
        px = np.clip(px, 0, pw - 2)
        py = np.clip(py, 0, ph - 2)
        x0 = np.floor(px).astype(int)
        y0 = np.floor(py).astype(int)
        fx, fy = px - x0, py - y0
        out = np.zeros(u.shape + (3,))
        for ch in range(3):
            g = gray_photo[..., ch]
            out[..., ch] = (g[y0, x0] * (1 - fx) * (1 - fy)
                            + g[y0, x0 + 1] * fx * (1 - fy)
                            + g[y0 + 1, x0] * (1 - fx) * fy
                            + g[y0 + 1, x0 + 1] * fx * fy)
        return out

    params, images = [], []
    for i, (name, f, q, c, r_dist) in enumerate(PAWN_CAMERAS):
        R = Rs[i]
        f = f * scale
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        pp = np.array([W / 2, H / 2])
        nx = (xs.ravel() - pp[0]) / f
        ny = (ys.ravel() - pp[1]) / f
        if distort:
            # pixels are DISTORTED coords: invert rho_d = (1 + r t^2) t
            # (Newton) to recover the pinhole ray
            rho = np.sqrt(nx * nx + ny * ny)
            t = rho.copy()
            for _ in range(5):
                g = t + r_dist * t ** 3 - rho
                t = t - g / (1.0 + 3.0 * r_dist * t * t)
            sc_ = np.where(rho > 1e-12, t / np.maximum(rho, 1e-12), 1.0)
            nx, ny = nx * sc_, ny * sc_
        d_cam = np.stack([nx, ny, np.ones(W * H)], axis=-1)
        dirs = d_cam @ R            # R^T rows applied -> world dirs
        t, kind = surf.cast(centers[i], dirs)
        hit = kind >= 0
        tf = np.where(hit, t, 0.0)
        X = centers[i][None] + tf[:, None] * dirs
        u, v, w = surf.uvw(X)
        col = tex(u, v, w, kind)
        # per-view photometric jitter (gain/bias), background stays 0
        gain = 1.0 + rng.uniform(-gain_jitter, gain_jitter)
        bias = rng.uniform(-bias_jitter, bias_jitter)
        col = np.clip(col * gain + bias, 1.0, 255.0)
        img = np.zeros((H * W, 3))
        img[hit] = col[hit]
        images.append(img.reshape(H, W, 3).astype(np.uint8))
        params.append(CameraParams(
            file_name=name, focal=np.array([f, f]),
            principal=np.array([-1.0, -1.0]),
            quaternion=np.asarray(q, float), center=np.asarray(c, float),
            radial_distortion=r_dist))

    # seeds on the visible surface with occlusion-aware visibility
    pts = []
    su = rng.uniform(-surf.U * 0.9, surf.U * 0.9, num_seeds * 3)
    sv = rng.uniform(-surf.V * 0.9, surf.V * 0.9, num_seeds * 3)
    on_top = (np.abs(su) < surf.a) & (np.abs(sv) < surf.b)
    w = np.where(on_top, surf.h, 0.0)
    pts = (surf.p0[None] + su[:, None] * surf.e1[None]
           + sv[:, None] * surf.e2[None] + w[:, None] * surf.n[None])

    C = len(params)
    masks = np.zeros((len(pts), C), dtype=bool)
    ipts = np.zeros((len(pts), C, 2))
    for ci in range(C):
        R, f = Rs[ci], focals[ci] * scale
        pp = np.array([W / 2, H / 2])
        xc = (pts - centers[ci]) @ R.T
        with np.errstate(divide="ignore", invalid="ignore"):
            nuv = xc[:, :2] / xc[:, 2:3]
        if distort:
            r_d = PAWN_CAMERAS[ci][4]
            nuv = nuv * (1.0 + r_d * np.sum(nuv * nuv, -1))[:, None]
        xy = nuv * f + pp
        inb = ((xy[:, 0] >= 8) & (xy[:, 0] < W - 8) & (xy[:, 1] >= 8)
               & (xy[:, 1] < H - 8) & (xc[:, 2] > 0))
        # occlusion: the camera ray must reach the point unobstructed
        dirs = pts - centers[ci]
        t, kind = surf.cast(centers[ci], dirs)
        vis = np.abs(t - 1.0) < 1e-3          # dirs are point - center
        masks[:, ci] = inb & vis & (kind >= 0)
        ipts[:, ci] = xy
    ok = masks.sum(axis=1) >= 3
    pts, masks, ipts = pts[ok][:num_seeds], masks[ok][:num_seeds], \
        ipts[ok][:num_seeds]
    return RealisticScene(params, images, surf, pts, masks, ipts)
