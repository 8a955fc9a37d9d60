"""Interpreter stage tests: analytic deskew vs scipy rotation, paragraph
and line cropping, bit-plane char labeling, prediction decoding."""

import random

import numpy as np
import pytest
from scipy import ndimage

from univer_ocr_tpu import interpreter as I
from univer_ocr_tpu.interpreter.interpreter import (
    crop_and_rotate_single_paragraph, find_rotation_angle, label_char_line,
    label_layer, pred_to_text_line, rearrange_lines, rotate_array)
from univer_ocr_tpu.primitives import BITS_COUNT, CHARS, CHARS_IDS, encode_char


def tilted_bar_mask(angle, h=120, w=120):
    mask = np.zeros((1, h, w, 1))
    mask[0, h // 2 - 3:h // 2 + 3, 10:w - 10, 0] = 1
    return rotate_array(mask, angle, good_rotation=False)


@pytest.mark.parametrize('true_angle', [10, 45, 90, 135, 170])
def test_find_rotation_angle_matches_scipy_height(true_angle):
    """The analytic projection search must find an angle whose scipy-rotated
    height is (near-)minimal — the quantity the reference's ternary search
    minimized via ndimage.rotate probes (interpreter.py:320-338)."""
    tilted = tilted_bar_mask(true_angle)
    angle = find_rotation_angle(tilted, eps=1.0)
    assert angle is not None
    rot = rotate_array(tilted, angle, good_rotation=False)
    _, ry, _, _ = ndimage.find_objects(rot > 0)[0]
    height = ry.stop - ry.start
    # flat bar is 6px tall (+ rotation blur); deskewed height must be small
    assert height <= 12


def test_find_rotation_angle_level_returns_none():
    mask = np.zeros((1, 60, 120, 1))
    mask[0, 28:34, 10:110, 0] = 1
    assert find_rotation_angle(mask, eps=1.0) is None


def test_crop_and_rotate_single_paragraph():
    mask = np.zeros((1, 64, 64, 1))
    mask[0, 20:40, 10:50, 0] = 1
    payload = np.zeros((1, 64, 64, 2))
    payload[0, 20:40, 10:50, :] = 3.0
    out = crop_and_rotate_single_paragraph(mask.astype(bool), [payload],
                                           find_rotation=False)
    assert len(out) == 1
    assert out[0].shape == (1, 20, 40, 2)
    np.testing.assert_array_equal(out[0], 3.0 * np.ones((1, 20, 40, 2)))


def test_crop_and_rotate_paragraphs_pool():
    masks = np.zeros((1, 96, 96, 1))
    masks[0, 5:25, 5:45, 0] = 1.0     # paragraph 0
    masks[0, 60:80, 40:90, 0] = 1.0   # paragraph 1
    payload = np.random.RandomState(0).rand(1, 96, 96, 1)
    crop = I.CropAndRotateParagraphs(workers_count=2, find_rotation=False)
    result = crop(masks, [payload])
    assert len(result) == 1           # one co-registered image
    assert len(result[0]) == 2        # two paragraphs
    assert result[0][0].shape == (1, 20, 40, 1)
    assert result[0][1].shape == (1, 20, 50, 1)


def make_line_bands(n_lines=3, h=100, w=200, flip=None):
    """Synthetic top/bottom band mask pairs (channels 0/1)."""
    mask = np.zeros((1, h, w, 2))
    for i in range(n_lines):
        y0 = 10 + i * 30
        mask[0, y0:y0 + 8, 20:180, 0] = 1.0       # top band
        mask[0, y0 + 10:y0 + 18, 20:180, 1] = 1.0  # bottom band
    return mask


def test_rearrange_lines_upright():
    mask = make_line_bands()
    top = label_layer(mask[:, :, :, 0:1] > 0.5)
    bottom = label_layer(mask[:, :, :, 1:2] > 0.5)
    tops, bottoms, rotation = rearrange_lines(top, bottom)
    assert rotation is None
    # sorted top-to-bottom
    centers = [ndimage.center_of_mass(t)[1] for t in tops]
    assert centers == sorted(centers)


def test_rearrange_lines_upside_down():
    mask = make_line_bands()
    # flip vertically: top bands now below bottom bands -> 180 rotation
    flipped = mask[:, ::-1, :, :].copy()
    top = label_layer(flipped[:, :, :, 0:1] > 0.5)
    bottom = label_layer(flipped[:, :, :, 1:2] > 0.5)
    tops, bottoms, rotation = rearrange_lines(top, bottom)
    assert rotation == 180


def test_rearrange_lines_sideways():
    mask = make_line_bands()
    # rotate the page 90° CW: text reads top-to-bottom, top bands to the
    # right of bottom bands -> rotation 90 to restore
    cw = np.rot90(mask, k=-1, axes=(1, 2)).copy()
    top = label_layer(cw[:, :, :, 0:1] > 0.5)
    bottom = label_layer(cw[:, :, :, 1:2] > 0.5)
    _, _, rotation = rearrange_lines(top, bottom)
    assert rotation == 90
    # and 90° CCW -> rotation 270
    ccw = np.rot90(mask, k=1, axes=(1, 2)).copy()
    top = label_layer(ccw[:, :, :, 0:1] > 0.5)
    bottom = label_layer(ccw[:, :, :, 1:2] > 0.5)
    _, _, rotation = rearrange_lines(top, bottom)
    assert rotation == 270


def test_orientation_code():
    """Sign-test replacement for the reference's `dist_point *= 1000`
    amplification loop: the loop's fixpoint is the displacement sign."""
    from univer_ocr_tpu.interpreter.interpreter import _orientation_code
    assert _orientation_code(-10.0, 1.0) is None      # top above bottom
    assert _orientation_code(10.0, 1.0) == 180        # top below bottom
    assert _orientation_code(1.0, 10.0) == 90         # top right of bottom
    assert _orientation_code(1.0, -10.0) == 270       # top left of bottom
    assert _orientation_code(0.0, 0.0) is None        # degenerate: upright
    # equal magnitudes resolve on the x axis (reference's strict abs(dy)>abs(dx))
    assert _orientation_code(5.0, 5.0) == 90


def test_crop_rotate_and_zoom_lines():
    mask = make_line_bands(n_lines=2)
    payload = np.random.RandomState(1).rand(1, 100, 200, 1)
    pool = I.CropRotateAndZoomLines(workers_count=2, zoomed_height=32,
                                    minimal_width=8)
    result = pool([mask], [[payload]])
    assert len(result) == 1           # one array kind
    assert len(result[0]) == 1        # one paragraph
    assert len(result[0][0]) == 2     # two lines
    for line in result[0][0]:
        assert line.shape[1] == 32    # zoomed to char input height
        assert line.shape[2] >= 8


def bit_plane_line(text, char_w=6, h=10):
    """Build a (1, h, W, 9) bit-plane crop: each char drawn char_w wide with
    a 2px zero gap (the letter-spacing-removed geometry)."""
    W = len(text) * (char_w + 2)
    arr = np.zeros((1, h, W, BITS_COUNT + 1))
    for i, ch in enumerate(text):
        bits = encode_char(ch)
        x0 = i * (char_w + 2)
        for b, bit in enumerate(bits):
            if bit == '1':
                arr[0, :, x0:x0 + char_w, b] = 1.0
    return arr


def test_label_char_line():
    text = 'ab1'
    arr = bit_plane_line(text)
    labels = label_char_line(arr)
    assert labels.shape == (arr.shape[2], len(CHARS))
    # columns under each char map to its id; gap columns decode to id 0
    # (all bits zero -> '\t'), giving the tab separator one-hot
    assert labels[0, CHARS_IDS['a']] == 1
    assert labels[8, CHARS_IDS['b']] == 1
    assert labels[16, CHARS_IDS['1']] == 1
    assert labels[6, CHARS_IDS['\t']] == 1  # gap column


def test_label_char_line_unknown_id_gives_zero_row():
    arr = np.zeros((1, 4, 4, BITS_COUNT + 1))
    arr[0, :, :, :BITS_COUNT] = 1.0   # id 255 -> unknown
    labels = label_char_line(arr)
    assert labels.sum() == 0


def test_pred_to_text_line_reference_semantics():
    # columns: b b <tab> o o.  'b' is unpaired so its run stays expanded;
    # 'o' belongs to the о/o similar pair, so its repeat is dropped by the
    # self-similarity quirk (reference :608-613) -> 'bbo'.
    ids = [CHARS_IDS['b'], CHARS_IDS['b'], 0, CHARS_IDS['o'], CHARS_IDS['o']]
    pred = np.zeros((5, len(CHARS)))
    for i, cid in enumerate(ids):
        pred[i, cid] = 1.0
    assert pred_to_text_line(pred) == 'bbo'
    # collapse_runs=True collapses to per-char text
    assert pred_to_text_line(pred, collapse_runs=True) == 'bo'


def test_pred_to_text_line_similar_pair_dedup():
    # Cyrillic а then Latin a: the similar-pair rule drops the second even
    # without collapse (reference :608-613)
    ids = [CHARS_IDS['а'], CHARS_IDS['a']]
    pred = np.zeros((2, len(CHARS)))
    for i, cid in enumerate(ids):
        pred[i, cid] = 1.0
    assert pred_to_text_line(pred) == 'а'


def test_pred_to_text_zero_columns_skipped():
    pred = np.zeros((3, len(CHARS)))
    pred[1, CHARS_IDS['x']] = 0.7
    assert pred_to_text_line(pred) == 'x'


def test_pred_ids_to_text_min_run_filter():
    """collapse_runs=k drops sub-k runs (boundary noise) while keeping
    tab resets and similar-pair suppression."""
    import numpy as np
    from univer_ocr_tpu.interpreter.interpreter import pred_ids_to_text
    from univer_ocr_tpu.primitives import CHARS
    a, b = 5, 9
    ids = np.array([a] * 4 + [b] + [a] * 2 + [0] * 2 + [b] * 3 + [a])
    valid = np.ones(len(ids), bool)
    # plain collapse keeps the single-column noise
    assert pred_ids_to_text(ids, valid, True) == (
        CHARS[a] + CHARS[b] + CHARS[a] + CHARS[b] + CHARS[a])
    # min_run=2 drops the 1-column runs; the two `a` runs split by the
    # dropped noise merge into one glyph; tab still resets
    assert pred_ids_to_text(ids, valid, 2) == CHARS[a] + CHARS[b]
    # min_run=1 (int) equals collapse=True
    assert pred_ids_to_text(ids, valid, 1) == pred_ids_to_text(
        ids, valid, True)
