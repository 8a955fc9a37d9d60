"""Fused cascade tail (models/fused_tail.py): device decode, device
line planning, and the fused paragraph->text program, each pinned
against the host implementation it replaces."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univer_ocr_tpu.interpreter.interpreter import pred_ids_to_text
from univer_ocr_tpu.models.fused_tail import (MAX_GLYPHS,
                                              decode_ids_device,
                                              glyphs_to_text)
from univer_ocr_tpu.primitives import CHARS


def _random_run_ids(rs, W, n_classes=162):
    """Run-structured ids like real per-column argmax output: glyph runs
    of 3-14 columns, 1-2-column boundary noise, tab runs, invalid
    tails."""
    ids = np.zeros(W, np.int32)
    valid = np.ones(W, bool)
    i = 0
    while i < W:
        r = rs.rand()
        if r < 0.15:
            n = rs.randint(1, 3)            # boundary noise
        elif r < 0.25:
            n = rs.randint(4, 9)
            ids[i:i + n] = 0                # tab run
            i += n
            continue
        else:
            n = rs.randint(3, 15)
        ids[i:i + n] = rs.randint(1, n_classes)
        i += n
    if rs.rand() < 0.5:
        cut = rs.randint(W // 2, W)
        valid[cut:] = False
    if rs.rand() < 0.3:
        valid[rs.randint(0, W, size=5)] = False  # holes mid-run
    return ids, valid


@pytest.mark.parametrize('min_run', [1, 2, 4])
def test_decode_matches_host(min_run):
    rs = np.random.RandomState(min_run)
    B, W = 16, 320
    ids = np.zeros((B, W), np.int32)
    valid = np.zeros((B, W), bool)
    for b in range(B):
        ids[b], valid[b] = _random_run_ids(rs, W)

    fn = jax.jit(lambda i, v: decode_ids_device(i, v, min_run))
    glyphs, n_glyphs, overflow = fn(jnp.asarray(ids), jnp.asarray(valid))
    glyphs, n_glyphs = np.asarray(glyphs), np.asarray(n_glyphs)
    assert not np.asarray(overflow).any()

    collapse = True if min_run == 1 else min_run
    for b in range(B):
        expected = pred_ids_to_text(ids[b], valid[b], collapse)
        got = glyphs_to_text(glyphs[b], n_glyphs[b])
        assert got == expected, (b, got, expected)


def test_decode_overflow_flag():
    # 200 distinct 4-column runs -> 200 glyphs > MAX_GLYPHS
    W = 800
    ids = np.repeat(np.arange(200) % 160 + 1, 4)[None, :].astype(np.int32)
    # make consecutive runs distinct ids
    ids = np.repeat((np.arange(200) % 2) * 50 + np.arange(200) % 40 + 1,
                    4)[None, :].astype(np.int32)
    valid = np.ones((1, W), bool)
    glyphs, n_glyphs, overflow = decode_ids_device(
        jnp.asarray(ids), jnp.asarray(valid), 4)
    assert bool(np.asarray(overflow)[0])
    assert int(np.asarray(n_glyphs)[0]) == MAX_GLYPHS


# ---------------------------------------------------------------------------
# Device line planner vs the host tables planner
# ---------------------------------------------------------------------------

def _bands_tables(bands):
    """Tables + chosen axis from synthetic (1, H, W, 2) bool bands."""
    from univer_ocr_tpu.models.device_cascade import (band_blob_tables,
                                                      choose_stacking_axis)
    tbl, nb, _sh = jax.jit(band_blob_tables)(jnp.asarray(bands))
    axis = jax.jit(choose_stacking_axis)(tbl, nb)
    return np.asarray(tbl)[0], np.asarray(nb)[0], int(np.asarray(axis)[0])


def _synthetic_bands(rs, H=128, W=192, n_lines=4, rotated=False):
    bands = np.zeros((1, H, W, 2), bool)
    y = 8
    for _ in range(n_lines):
        h_band = rs.randint(3, 6)
        gap = rs.randint(2, 5)
        w0 = rs.randint(0, 20)
        w1 = W - rs.randint(1, 30)
        bands[0, y:y + h_band, w0:w1, 0] = True            # top
        yb = y + h_band + gap
        bands[0, yb:yb + h_band, w0:w1, 1] = True          # bottom
        y = yb + h_band + rs.randint(6, 14)
        if y > H - 12:
            break
    if rotated:
        bands = np.swapaxes(bands, 1, 2)
    return bands


@pytest.mark.parametrize('rotated', [False, True])
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_plan_lines_matches_host(seed, rotated):
    from univer_ocr_tpu.models.fused_tail import (PLAN_FIELDS,
                                                  _plan_lines_single)
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    rs = np.random.RandomState(seed)
    bands = _synthetic_bands(rs, rotated=rotated)
    tbl, nb, axis = _bands_tables(bands)

    pipe = OCRPipeline.__new__(OCRPipeline)   # only the planner is used
    host_plans = pipe._plan_lines_from_tables(tbl, nb, axis)

    plans, n_lines, overflow = jax.jit(_plan_lines_single)(
        jnp.asarray(tbl), jnp.asarray(nb), jnp.asarray(axis))
    plans = np.asarray(plans)
    assert not bool(np.asarray(overflow))
    assert int(np.asarray(n_lines)) == len(host_plans), (
        int(np.asarray(n_lines)), len(host_plans))
    for li, hp in enumerate(host_plans):
        for fi, f in enumerate(PLAN_FIELDS):
            if f in ('out_h', 'out_w'):
                continue
            dev = plans[li, fi]
            assert abs(dev - float(hp[f])) < 1e-3, (li, f, dev, hp[f])


# ---------------------------------------------------------------------------
# End-to-end: fused tail vs the classic tables path
# ---------------------------------------------------------------------------

def test_fused_pipeline_matches_classic():
    """The fused tail must decode the SAME text as the classic
    tables-mode path (pull tables -> host plan -> line stage -> host
    decode) — same planner, same decode semantics, same crops."""
    import json
    import random
    from univer_ocr_tpu.image_generator import (LayeredImage, random_font,
                                                random_text)
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.datasets import encode_layers
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')

    random.seed(7)
    np.random.seed(7)
    pages = []
    for _ in range(2):
        img = LayeredImage(416, 272, (255, 255, 255, 255))
        while img.paragraphs_added == 0:
            for _ in range(40):
                img.add_paragraph(random_text(), random_font(16, 32))
        img.make_divisible_by(16, 16)
        layers = encode_layers({'image': img.get_raw()['image'].convert('L')})
        pages.append(layers['image'].astype(np.float32))

    kw = dict(weights=weights, chunk=2, workers=2, device_cascade=True,
              precision='highest', collapse_runs=4)
    classic = OCRPipeline(pages[0].shape, fused_tail=False, **kw)
    fused = OCRPipeline(pages[0].shape, fused_tail=True, **kw)
    assert fused.fused_tail and not classic.fused_tail

    expected = classic.ocr_pages(pages)
    got = fused.ocr_pages(pages)
    assert got == expected, (got, expected)
    # the fused path must have decoded most paragraphs on device
    st = fused.escalation_stats
    assert st['paragraphs'] > 0


def test_fused_overflow_escalates_to_classic_text(monkeypatch):
    """Force the fused tail's capacity caps to overflow (tiny LINE_POOL /
    MAX_GLYPHS) and verify correctness never depends on them: every
    overflowing paragraph must be flagged suspect, re-run through the
    host escalation path, and decode the SAME text as the classic
    tables-mode pipeline (VERDICT r3 weak item 4)."""
    import json
    import random
    from univer_ocr_tpu.image_generator import (LayeredImage, random_font,
                                                random_text)
    from univer_ocr_tpu.models import fused_tail as ft
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.datasets import encode_layers
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')

    random.seed(11)
    np.random.seed(11)
    img = LayeredImage(416, 272, (255, 255, 255, 255))
    while img.paragraphs_added == 0:
        for _ in range(40):
            img.add_paragraph(random_text(), random_font(16, 32))
    img.make_divisible_by(16, 16)
    layers = encode_layers({'image': img.get_raw()['image'].convert('L')})
    pages = [layers['image'].astype(np.float32)]

    kw = dict(weights=weights, chunk=1, workers=2, device_cascade=True,
              precision='highest', collapse_runs=4)
    expected = OCRPipeline(pages[0].shape, fused_tail=False,
                           **kw).ocr_pages(pages)
    assert any(t for page in expected for para in page for t in para)

    # every real line now overflows the pool and the glyph cap
    monkeypatch.setattr(ft, 'LINE_POOL', 2)
    monkeypatch.setattr(ft, 'MAX_GLYPHS', 8)
    fused = OCRPipeline(pages[0].shape, fused_tail=True, **kw)
    got = fused.ocr_pages(pages)
    assert got == expected, (got, expected)
    st = fused.escalation_stats
    assert st.get('pool_of', 0) + st.get('glyph_of', 0) > 0, st
    assert st['suspect'] > 0, st
