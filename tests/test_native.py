"""Native C++ host-CV kernels vs scipy references."""

import numpy as np
import pytest
from scipy import ndimage

from univer_ocr_tpu import native


@pytest.fixture(scope='module', autouse=True)
def built():
    if not native.available():
        native.build()
    assert native.available()


def test_ccl_matches_scipy():
    rs = np.random.RandomState(0)
    mask = (rs.rand(64, 80) > 0.7)
    ref_labels, ref_n = ndimage.label(mask)
    got_labels, got_n = native.label(mask)
    assert got_n == ref_n
    np.testing.assert_array_equal(got_labels, ref_labels)


def test_ccl_shapes_and_order():
    mask = np.zeros((10, 10), dtype=bool)
    mask[1:3, 1:3] = True      # component 1 (first in raster order)
    mask[5:8, 6:9] = True      # component 2
    labels, n = native.label(mask)
    assert n == 2
    assert labels[1, 1] == 1 and labels[6, 7] == 2


def test_find_objects_matches_scipy():
    rs = np.random.RandomState(1)
    mask = (rs.rand(48, 48) > 0.75)
    ref_labels, n = ndimage.label(mask)
    ref_boxes = ndimage.find_objects(ref_labels)
    labels, n2 = native.label(mask)
    boxes = native.find_objects(labels, n2)
    assert n2 == n
    assert boxes == ref_boxes


def test_rotate_close_to_scipy():
    rs = np.random.RandomState(2)
    arr = rs.rand(40, 60, 1).astype(np.float32)
    for angle in (17.0, 90.0, 135.0):
        ref = ndimage.rotate(arr, angle, axes=(1, 0), order=1, reshape=True)
        got = native.rotate(arr, angle, order=1)
        assert got.shape == ref.shape, (angle, got.shape, ref.shape)
        # interpolation details differ slightly at edges; compare interior
        interior = (slice(2, -2), slice(2, -2), slice(None))
        diff = np.abs(got[interior] - ref[interior])
        assert np.median(diff) < 0.05
        assert np.mean(diff) < 0.1


def test_zoom_shapes():
    rs = np.random.RandomState(3)
    arr = rs.rand(17, 50, 2).astype(np.float32)
    out = native.zoom(arr, 32, 94)
    assert out.shape == (32, 94, 2)
    # corners endpoint-aligned
    np.testing.assert_allclose(out[0, 0], arr[0, 0])
    np.testing.assert_allclose(out[-1, -1], arr[-1, -1])
