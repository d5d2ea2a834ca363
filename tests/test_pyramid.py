"""Pyramid construction oracles."""

import numpy as np

from pais_mvs_tpu.ops import pyramid as pyr


def test_area_resize_integer_factor_is_box_mean():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(8, 12))
    out = pyr.area_resize(img, 4, 6)
    expect = img.reshape(4, 2, 6, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, rtol=1e-12)


def test_area_resize_preserves_mean():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(30, 47))
    out = pyr.area_resize(img, 13, 22)
    # area resampling is mean-preserving up to partial-cell weighting
    assert abs(out.mean() - img.mean()) < 2.0


def test_sobel_magnitude_matches_manual():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(16, 16))
    e = pyr.sobel_magnitude(img)
    # manual center-pixel check (ksize=1 kernel [-1, 0, 1])
    gx = img[5, 6] - img[5, 4]
    gy = img[6, 5] - img[4, 5]
    mag = np.sqrt(gx * gx + gy * gy)
    p = np.pad(img, 1, mode="reflect")
    gxa = p[1:-1, 2:] - p[1:-1, :-2]
    gya = p[2:, 1:-1] - p[:-2, 1:-1]
    maga = np.sqrt(gxa ** 2 + gya ** 2)
    expect = (mag - maga.min()) / (maga.max() - maga.min())
    np.testing.assert_allclose(e[5, 5], expect, rtol=1e-12)
    assert e.min() == 0.0 and e.max() == 1.0


def test_max_lod_formula():
    # log(640)/log(1/0.8) = 28.95... -> 28, capped at 15
    assert pyr.max_lod_for(640, 480, 0.8, 15) == 15
    assert pyr.max_lod_for(640, 480, 0.8, 100) == 28


def test_build_and_pack_pyramids():
    rng = np.random.default_rng(3)
    g0 = rng.integers(0, 255, size=(60, 80)).astype(np.uint8)
    g1 = rng.integers(0, 255, size=(50, 70)).astype(np.uint8)
    lv0, ed0, d0 = pyr.build_pyramid(g0, 0.8, 3)
    lv1, ed1, d1 = pyr.build_pyramid(g1, 0.8, 2)
    assert len(lv0) == 4 and len(lv1) == 3
    assert d0[1].tolist() == [48, 64]
    images, edges, dims, yoff = pyr.pack_pyramids([lv0, lv1], [ed0, ed1],
                                                  [d0, d1], 4)
    # mip-atlas: bands are 8-row aligned, width 128-aligned
    # band heights: L0 max(60,50)->64, L1 max(48,40)->48, L2 ->40, L3 ->32
    assert yoff.tolist() == [0, 64, 112, 152, 184]
    assert images.shape == (2, 184, 128)
    assert dims[1, 3].tolist() == [0, 0]      # absent level
    assert dims[0, 0].tolist() == [60, 80]
    np.testing.assert_array_equal(images[0, :60, :80], lv0[0])
    np.testing.assert_array_equal(
        images[0, yoff[1]:yoff[1] + 48, :64], lv0[1])
    # gray levels are integer-quantized like the reference's uchar pyramid
    assert np.all(images == np.round(images))


def test_rgb_to_gray_bt601():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    img[1, 0] = (0, 0, 255)
    g = pyr.rgb_to_gray(img)
    assert g[0, 0] == round(0.299 * 255)
    assert g[0, 1] == round(0.587 * 255)
    assert g[1, 0] == round(0.114 * 255)


def test_area_resize_matches_dense_weights():
    """The O(n) antiderivative resampler must equal the textbook dense
    box-overlap weight matrix exactly."""
    import math
    rng = np.random.default_rng(5)

    def dense(n_in, n_out):
        scale = n_in / n_out
        W = np.zeros((n_out, n_in))
        for i in range(n_out):
            lo, hi = i * scale, (i + 1) * scale
            for j in range(int(math.floor(lo)),
                           min(int(math.ceil(hi)), n_in)):
                ov = min(hi, j + 1) - max(lo, j)
                if ov > 0:
                    W[i, j] = ov
            W[i] /= W[i].sum()
        return W

    img = rng.uniform(0, 255, (53, 71))
    ref = dense(53, 37) @ img @ dense(71, 52).T
    got = pyr.area_resize(img, 37, 52)
    np.testing.assert_allclose(got, ref, atol=1e-9)
