"""Gradient-histogram descriptors on fixed sample grids.

SIFT-style 4x4x8 = 128-d descriptors (the reference uses OpenCV SIFT,
TMVS/mvs/featuremanager.cpp:19-26), computed without any data-dependent
shapes: every keypoint samples a fixed normalized grid scaled by its sigma
and rotated by its dominant orientation, so the whole stage is one vmap —
gathers + small matmuls, no ragged work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample [H, W] image at [..., 2] (x, y) with clamped bilinear."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


_ORI_GRID = 9       # (2g+1)^2 orientation samples
_DESC_CELLS = 4     # 4x4 spatial cells
_DESC_SPC = 4       # samples per cell side -> 16x16 sample grid
_ORI_BINS = 36
_DESC_BINS = 8


def _orientation(img, xy, sigma):
    """Dominant gradient orientation around one keypoint (octave coords)."""
    g = _ORI_GRID
    step = 0.75
    ax = jnp.arange(-g, g + 1, dtype=jnp.float32) * step
    gx, gy = jnp.meshgrid(ax, ax, indexing="xy")
    pts = xy[None, None, :] + sigma * jnp.stack([gx, gy], -1)
    d = 0.5 * sigma * step
    ix1 = _bilinear(img, pts + jnp.array([d, 0.0]))
    ix0 = _bilinear(img, pts - jnp.array([d, 0.0]))
    iy1 = _bilinear(img, pts + jnp.array([0.0, d]))
    iy0 = _bilinear(img, pts - jnp.array([0.0, d]))
    dx = ix1 - ix0
    dy = iy1 - iy0
    mag = jnp.sqrt(dx * dx + dy * dy)
    w = jnp.exp(-(gx * gx + gy * gy) / (2.0 * (0.6 * g) ** 2))
    theta = jnp.arctan2(dy, dx)                     # [-pi, pi]
    binf = (theta + jnp.pi) / (2 * jnp.pi) * _ORI_BINS
    bins = jnp.clip(binf.astype(jnp.int32), 0, _ORI_BINS - 1)
    hist = jnp.zeros(_ORI_BINS).at[bins.reshape(-1)].add(
        (mag * w).reshape(-1))
    # smooth the histogram circularly, take the peak bin center
    hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    b = jnp.argmax(hist)
    return (b.astype(jnp.float32) + 0.5) / _ORI_BINS * 2 * jnp.pi - jnp.pi


def _descriptor(img, xy, sigma, ori):
    """128-d descriptor from a rotated, sigma-scaled 16x16 sample grid."""
    n = _DESC_CELLS * _DESC_SPC                      # 16
    half = n / 2.0
    ax = (jnp.arange(n, dtype=jnp.float32) - half + 0.5)
    gx, gy = jnp.meshgrid(ax, ax, indexing="xy")     # [16, 16]
    spacing = 0.9 * sigma
    ca, sa = jnp.cos(ori), jnp.sin(ori)
    rx = (ca * gx - sa * gy) * spacing
    ry = (sa * gx + ca * gy) * spacing
    pts = xy[None, None, :] + jnp.stack([rx, ry], -1)
    d = 0.5 * spacing
    # finite differences along the ROTATED axes give gradients already in
    # the keypoint frame (rotation invariance without angle subtraction)
    du = jnp.stack([ca, sa]) * d
    dv = jnp.stack([-sa, ca]) * d
    ix1 = _bilinear(img, pts + du)
    ix0 = _bilinear(img, pts - du)
    iy1 = _bilinear(img, pts + dv)
    iy0 = _bilinear(img, pts - dv)
    dxr = ix1 - ix0
    dyr = iy1 - iy0
    mag = jnp.sqrt(dxr * dxr + dyr * dyr)
    w = jnp.exp(-(gx * gx + gy * gy) / (2.0 * (0.5 * n) ** 2))
    theta = jnp.arctan2(dyr, dxr)
    binf = (theta + jnp.pi) / (2 * jnp.pi) * _DESC_BINS
    b0 = jnp.floor(binf).astype(jnp.int32) % _DESC_BINS
    b1 = (b0 + 1) % _DESC_BINS
    f = binf - jnp.floor(binf)

    cell = (gy + half - 0.5 + 1e-3).astype(jnp.int32) // _DESC_SPC * \
        _DESC_CELLS + (gx + half - 0.5 + 1e-3).astype(jnp.int32) // _DESC_SPC
    idx0 = cell * _DESC_BINS + b0
    idx1 = cell * _DESC_BINS + b1
    wm = (mag * w).reshape(-1)
    desc = jnp.zeros(_DESC_CELLS * _DESC_CELLS * _DESC_BINS)
    desc = desc.at[idx0.reshape(-1)].add(wm * (1 - f.reshape(-1)))
    desc = desc.at[idx1.reshape(-1)].add(wm * f.reshape(-1))
    norm = jnp.linalg.norm(desc)
    desc = desc / jnp.where(norm > 0, norm, 1.0)
    desc = jnp.minimum(desc, 0.2)
    norm = jnp.linalg.norm(desc)
    return desc / jnp.where(norm > 0, norm, 1.0)


@functools.partial(jax.jit, static_argnames=("scales",))
def describe_octave(gauss: jnp.ndarray, xy_oct: jnp.ndarray,
                    sigma_oct: jnp.ndarray, level: jnp.ndarray,
                    scales: int = 3):
    """Descriptors for keypoints of ONE octave.

    gauss: [S+3, Ho, Wo] blurred stack; xy_oct/sigma_oct in octave coords;
    level in [0, S) selects which blurred image to sample.
    Returns [K, 128] descriptors.
    """
    def one(xy, sig, lvl):
        img = gauss[jnp.clip(lvl + 1, 0, gauss.shape[0] - 1)]
        ori = _orientation(img, xy, sig)
        return _descriptor(img, xy, sig, ori)
    return jax.vmap(one)(xy_oct, sigma_oct, level)
