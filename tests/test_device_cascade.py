"""Device-resident cascade gathers vs the host CV they replace.

The bilinear deskew gather must reproduce crop_and_rotate_single_paragraph
(scipy rotate order=1 on the blob-masked bbox crop, sliced to the rotated
order-0 mask bbox), and the nearest zoom gather must reproduce
crop_lines_of_paragraph's bbox crop + rot90 + ndimage.zoom(order=0).
"""

import numpy as np
import pytest
from scipy import ndimage

import jax
import jax.numpy as jnp

from univer_ocr_tpu.interpreter.interpreter import (
    crop_and_rotate_single_paragraph, find_rotation_angle, rotate_array)
from univer_ocr_tpu.models.device_cascade import (
    rot90_inverse_affine, rotate_affine, rotated_paragraph_crops,
    zoom_output_width, zoom_ratio, zoomed_line_crops)


def _blob(h, w, seed, angle=0.0):
    """A filled rotated-rectangle blob inside an (h, w) page region."""
    mask = np.zeros((h, w), bool)
    mask[h // 4:3 * h // 4, w // 8:7 * w // 8] = True
    if angle:
        mask = ndimage.rotate(mask.astype(float), angle, order=0,
                              reshape=False) > 0.5
    return mask


def _pack_into(mask, hb, wb):
    buf = np.zeros((hb, wb), np.uint8)
    buf[:mask.shape[0], :mask.shape[1]] = mask
    return np.packbits(buf, axis=1)


def host_reference_crop(page, blob_mask):
    """The exact host path: crop_and_rotate_single_paragraph on one blob."""
    mask4 = blob_mask[None, :, :, None]
    return crop_and_rotate_single_paragraph(mask4, [page])[0]


def device_equivalent_crop(page, blob_mask, hb, wb):
    """Host geometry plan + device gather for the same blob."""
    ys, xs = np.nonzero(blob_mask)
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    h, w = y1 - y0, x1 - x0
    crop_mask = blob_mask[y0:y1, x0:x1]

    angle = find_rotation_angle(crop_mask[None, :, :, None])
    (rh, rw), (cos_a, sin_a), (off_y, off_x) = rotate_affine(angle, h, w)
    rotated_mask = rotate_array(crop_mask[None, :, :, None].astype(float),
                                angle, good_rotation=False)
    _, ry, rx, _ = ndimage.find_objects(rotated_mask > 0)[0]

    out_h, out_w = ry.stop - ry.start, rx.stop - rx.start
    assert out_h <= hb and out_w <= wb, (out_h, out_w)

    crops = jax.jit(rotated_paragraph_crops, static_argnums=())(
        jnp.asarray(page),
        jnp.asarray(_pack_into(crop_mask, hb, wb))[None],
        jnp.asarray([0], jnp.int32),
        jnp.asarray([y0], jnp.int32), jnp.asarray([x0], jnp.int32),
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        jnp.asarray([cos_a], jnp.float32), jnp.asarray([sin_a], jnp.float32),
        jnp.asarray([off_y], jnp.float32), jnp.asarray([off_x], jnp.float32),
        jnp.asarray([ry.start], jnp.int32), jnp.asarray([rx.start], jnp.int32),
        jnp.asarray([out_h], jnp.int32), jnp.asarray([out_w], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32))
    return np.asarray(crops)[0, :, :, 0], (out_h, out_w)


@pytest.mark.parametrize('angle', [0.0, 7.0, -12.5, 33.0])
def test_rotated_paragraph_crop_matches_host(angle):
    rs = np.random.RandomState(int(abs(angle) * 10) + 1)
    page = rs.rand(1, 96, 128, 1).astype(np.float32)
    blob = _blob(96, 128, seed=0, angle=angle)

    expected = host_reference_crop(page, blob)[0, :, :, 0]
    got, (out_h, out_w) = device_equivalent_crop(page, blob, hb=160, wb=160)

    assert expected.shape == (out_h, out_w)
    np.testing.assert_allclose(got[:out_h, :out_w], expected,
                               rtol=0, atol=2e-5)
    # zero padding outside the valid region
    assert np.all(got[out_h:] == 0) and np.all(got[:, out_w:] == 0)


def test_rotate_affine_matches_scipy_shape():
    for angle in (3.0, 17.5, 45.0, 88.0, 133.7):
        for h, w in ((40, 90), (33, 17)):
            arr = np.zeros((1, h, w, 1))
            expected = rotate_array(arr, angle).shape
            (rh, rw), _, _ = rotate_affine(angle, h, w)
            assert (1, rh, rw, 1) == expected, (angle, h, w)


@pytest.mark.parametrize('rotation', [None, 90, 180, 270])
def test_zoomed_line_crop_matches_host(rotation):
    rs = np.random.RandomState(3)
    crop = rs.rand(1, 80, 120, 1).astype(np.float32)
    ly, lx = slice(10, 34), slice(8, 110)      # line bbox inside the crop

    # host path (crop_lines_of_paragraph internals, pipeline.py:61-77)
    img = crop[:, ly, lx, :]
    img = rotate_array(img, rotation)
    zf = 32.0 / img.shape[1]
    expected = ndimage.zoom(img, (1, zf, zf, 1), order=0)

    h_pre, w_pre = ly.stop - ly.start, lx.stop - lx.start
    (lh, lw), (ayy, ayx, by, axy, axx, bx) = rot90_inverse_affine(
        rotation, h_pre, w_pre)
    w_out = zoom_output_width(lw, 32.0 / lh)
    assert expected.shape == (1, 32, w_out, 1)

    wc = 192                               # bucket width >= any w_out here
    assert w_out <= wc
    got = jax.jit(zoomed_line_crops, static_argnums=(11, 12))(
        jnp.asarray(crop), jnp.asarray([0], jnp.int32),
        jnp.asarray([zoom_ratio(lh, 32)], jnp.float32),
        jnp.asarray([zoom_ratio(lw, w_out)], jnp.float32),
        jnp.asarray([w_out], jnp.int32),
        jnp.asarray([ayy], jnp.int32), jnp.asarray([ayx], jnp.int32),
        jnp.asarray([by + ly.start], jnp.int32),
        jnp.asarray([axy], jnp.int32), jnp.asarray([axx], jnp.int32),
        jnp.asarray([bx + lx.start], jnp.int32),
        32, wc)
    got = np.asarray(got)[0, :, :, 0]

    np.testing.assert_allclose(got[:, :w_out], expected[0, :, :, 0],
                               rtol=0, atol=1e-6)
    assert np.all(got[:, w_out:] == 0)


@pytest.mark.parametrize('rotation', [None, 90, 180, 270])
def test_zoomed_line_crops_matmul_matches_gather(rotation):
    """The one-hot matmul sampler (the TPU fast path) must equal the
    generic gather for every rot90 parity."""
    from univer_ocr_tpu.models.device_cascade import zoomed_line_crops_matmul
    rs = np.random.RandomState(5)
    crop = rs.rand(2, 64, 96, 1).astype(np.float32)
    ly, lx = slice(6, 30), slice(4, 90)
    h_pre, w_pre = ly.stop - ly.start, lx.stop - lx.start
    (lh, lw), (ayy, ayx, by, axy, axx, bx) = rot90_inverse_affine(
        rotation, h_pre, w_pre)
    w_out = zoom_output_width(lw, 32.0 / lh)
    wc = 192
    args = (jnp.asarray(crop), jnp.asarray([1], jnp.int32),
            jnp.asarray([zoom_ratio(lh, 32)], jnp.float32),
            jnp.asarray([zoom_ratio(lw, w_out)], jnp.float32),
            jnp.asarray([w_out], jnp.int32),
            jnp.asarray([ayy], jnp.int32), jnp.asarray([ayx], jnp.int32),
            jnp.asarray([by + ly.start], jnp.int32),
            jnp.asarray([axy], jnp.int32), jnp.asarray([axx], jnp.int32),
            jnp.asarray([bx + lx.start], jnp.int32),
            32, wc)
    gather = np.asarray(zoomed_line_crops(*args))
    matmul = np.asarray(zoomed_line_crops_matmul(*args,
                                                 precision='highest'))
    np.testing.assert_allclose(matmul, gather, rtol=0, atol=1e-6)


def test_identity_affine_gather_is_exact_crop():
    """Level paragraphs ride the affine-gather program with the identity
    affine (pipeline._page_paragraph_plans); integer sample coordinates
    make the bilinear weights exact, so the result must be BIT-EQUAL to
    the plain masked bbox crop at the make_divisible_by placement."""
    rs = np.random.RandomState(9)
    pages = rs.rand(2, 64, 96, 1).astype(np.float32)
    blob = np.zeros((64, 96), bool)
    blob[10:40, 8:80] = True            # bbox (10:40, 8:80), h=30, w=72
    y0, x0, h, w = 10, 8, 30, 72
    py, px = 3, 5
    hb, wb = 48, 96

    # gather path: blob at (0, 0) bbox-local, identity affine
    blob_gather = np.zeros((hb, wb), bool)
    blob_gather[:h, :w] = blob[y0:y0 + h, x0:x0 + w]
    got = np.asarray(rotated_paragraph_crops(
        jnp.asarray(pages), jnp.asarray(np.packbits(blob_gather, axis=1))[None],
        jnp.asarray([1], jnp.int32),
        jnp.asarray([y0], jnp.int32), jnp.asarray([x0], jnp.int32),
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        jnp.asarray([1.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        jnp.asarray([py], jnp.int32), jnp.asarray([px], jnp.int32)))

    # exact NumPy reference: masked bbox crop placed at (py, px)
    ref = np.zeros((1, hb, wb, 1), np.float32)
    region = pages[1, y0:y0 + h, x0:x0 + w, 0]
    ref[0, py:py + h, px:px + w, 0] = region * blob[y0:y0 + h, x0:x0 + w]

    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Two-pass MXU resampler (the serving default; the gather above is the
# exact reference it is measured against)
# ---------------------------------------------------------------------------

def _resident_args(mono, para, angle, h, w, y0, x0, hb, wb, pad=(2, 3)):
    from univer_ocr_tpu.models.device_cascade import rotate_affine
    B = 1
    if angle is None:
        (cos_a, sin_a), off = (1.0, 0.0), (0.0, 0.0)
        out_h, out_w = h, w
    else:
        (rh, rw), (cos_a, sin_a), off = rotate_affine(angle, h, w)
        out_h, out_w = min(rh, hb), min(rw, wb)
    return [
        jnp.asarray(mono), jnp.asarray(para),
        jnp.asarray([0] * B, jnp.int32),
        jnp.asarray([y0] * B, jnp.int32), jnp.asarray([x0] * B, jnp.int32),
        jnp.asarray([h] * B, jnp.int32), jnp.asarray([w] * B, jnp.int32),
        jnp.asarray([cos_a] * B, jnp.float32),
        jnp.asarray([sin_a] * B, jnp.float32),
        jnp.asarray([off[0]] * B, jnp.float32),
        jnp.asarray([off[1]] * B, jnp.float32),
        jnp.asarray([0] * B, jnp.int32), jnp.asarray([0] * B, jnp.int32),
        jnp.asarray([out_h] * B, jnp.int32),
        jnp.asarray([out_w] * B, jnp.int32),
        jnp.asarray([pad[0]] * B, jnp.int32),
        jnp.asarray([pad[1]] * B, jnp.int32),
        hb, wb,
    ]


def test_twopass_identity_is_bit_exact():
    """Level paragraphs (identity affine) must be BIT-EQUAL between the
    two-pass resampler and the gather reference — integer positions make
    every interpolation weight exactly 0 or 1 on both paths."""
    from univer_ocr_tpu.models.device_cascade import (
        rotated_paragraph_crops_resident, twopass_paragraph_crops_resident)
    rs = np.random.RandomState(3)
    mono = rs.rand(1, 96, 128, 1).astype(np.float32)
    para = (rs.rand(1, 96, 128, 1) > 0.3).astype(np.float32)
    args = _resident_args(mono, para, None, 40, 60, 12, 20, 64, 96)
    g = np.asarray(rotated_paragraph_crops_resident(*args))
    t = np.asarray(twopass_paragraph_crops_resident(*args))
    np.testing.assert_array_equal(g, t)


@pytest.mark.parametrize('angle', [7.0, -12.5, 33.0, 80.0, 100.0, 170.0])
def test_twopass_rotated_close_to_gather(angle):
    """Rotated paragraphs: the two-pass composition differs from true 2D
    bilinear by the classic 3-tap kernel (Paeth rotation); on real
    monochrome maps (smooth blobs) the error is interpolation-scale.
    Bound the field error on noise input (worst case) and require the
    supports to coincide."""
    from univer_ocr_tpu.models.device_cascade import (
        rotated_paragraph_crops_resident, twopass_paragraph_crops_resident)
    rs = np.random.RandomState(int(abs(angle)))
    mono = rs.rand(1, 96, 128, 1).astype(np.float32)
    para = np.ones((1, 96, 128, 1), np.float32)
    args = _resident_args(mono, para, angle, 40, 60, 12, 20, 64, 96)
    g = np.asarray(rotated_paragraph_crops_resident(*args))
    t = np.asarray(twopass_paragraph_crops_resident(*args))
    assert np.abs(g - t).mean() < 0.05
    # identical zero support up to interpolation dust
    np.testing.assert_array_equal(g == 0, np.abs(t) < 1e-4)


def test_twopass_rot90_fold_exact_at_90():
    """angle=90: the parity fold reduces to an exact rot90, so values
    must match the gather to float tolerance."""
    from univer_ocr_tpu.models.device_cascade import (
        rotated_paragraph_crops_resident, twopass_paragraph_crops_resident)
    rs = np.random.RandomState(7)
    mono = rs.rand(1, 96, 128, 1).astype(np.float32)
    para = (rs.rand(1, 96, 128, 1) > 0.3).astype(np.float32)
    args = _resident_args(mono, para, 90.0, 40, 60, 12, 20, 64, 96)
    g = np.asarray(rotated_paragraph_crops_resident(*args))
    t = np.asarray(twopass_paragraph_crops_resident(*args))
    np.testing.assert_allclose(t, g, rtol=0, atol=1e-4)


def test_twopass_blob_identity_is_bit_exact():
    from univer_ocr_tpu.models.device_cascade import (
        rotated_paragraph_crops, twopass_paragraph_crops)
    rs = np.random.RandomState(5)
    mono = rs.rand(1, 96, 128, 1).astype(np.float32)
    hb, wb = 64, 96
    blob = np.zeros((1, hb, wb), bool)
    blob[:, :40, :60] = rs.rand(40, 60) > 0.4
    args = [
        jnp.asarray(mono), jnp.asarray(np.packbits(blob, axis=2)),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([12], jnp.int32), jnp.asarray([20], jnp.int32),
        jnp.asarray([40], jnp.int32), jnp.asarray([60], jnp.int32),
        jnp.asarray([1.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([40], jnp.int32), jnp.asarray([60], jnp.int32),
        jnp.asarray([2], jnp.int32), jnp.asarray([3], jnp.int32),
    ]
    g = np.asarray(rotated_paragraph_crops(*args))
    t = np.asarray(twopass_paragraph_crops(*args))
    np.testing.assert_array_equal(g, t)
