"""On-device band blob tables (device_cascade.band_blob_tables): the
line-planning payload that replaces shipping bit-packed band masks to the
host (reference interpreter.py:421-523 planned lines on host CCL over
those masks)."""

import numpy as np
import pytest

import jax

from univer_ocr_tpu.models.device_cascade import (band_blob_tables,
                                                  band_blob_tables_host)
from univer_ocr_tpu.models.pipeline import OCRPipeline

PAGE_SHAPE = (1, 496, 736, 1)


def _random_bands(rs, B=3, H=64, W=96, n_blobs=4, frag=False):
    """Horizontal stripe pairs (top/bottom bands) with optional
    fragmentation, as the Line model emits them."""
    bands = np.zeros((B, H, W, 2), bool)
    for b in range(B):
        y = 4
        for _ in range(n_blobs):
            h = rs.randint(2, 4)
            x0 = rs.randint(0, 8)
            x1 = rs.randint(W - 8, W)
            if frag and rs.rand() < 0.5:
                xm = (x0 + x1) // 2
                bands[b, y:y + h, x0:xm - 2, 0] = True
                bands[b, y:y + h, xm + 2:x1, 0] = True
            else:
                bands[b, y:y + h, x0:x1, 0] = True
            yb = y + h + rs.randint(2, 4)
            bands[b, yb:yb + h, x0:x1, 1] = True
            y = yb + h + rs.randint(6, 10)
            if y >= H - 8:
                break
    return bands


def test_device_tables_match_host_reference():
    rs = np.random.RandomState(0)
    bands = _random_bands(rs, frag=True)
    # add an empty channel case and random speckle
    bands[1, :, :, 1] = False
    bands[2] |= rs.rand(*bands.shape[1:]) > 0.999

    dev_tbl, dev_nb = jax.jit(band_blob_tables)(bands)
    host_tbl, host_nb = band_blob_tables_host(bands)

    np.testing.assert_array_equal(np.asarray(dev_nb), host_nb)
    dev_tbl = np.asarray(dev_tbl)
    # integer fields exact; centers to float tolerance
    np.testing.assert_array_equal(dev_tbl[:, :, :, :5, :],
                                  host_tbl[:, :, :, :5, :])
    np.testing.assert_allclose(dev_tbl[:, :, :, 5:, :],
                               host_tbl[:, :, :, 5:, :],
                               rtol=0, atol=1e-4)


def test_tables_planner_matches_exact_planner_on_clean_bands():
    """Without fragmentation the table planner must produce the plans the
    exact (CCL) planner produces."""
    rs = np.random.RandomState(1)
    pipe = OCRPipeline(PAGE_SHAPE, weights=None, chunk=1, workers=1,
                       device_cascade=True)
    for _ in range(5):
        bands = _random_bands(rs, B=1, frag=False)[0]
        tbl, nb = band_blob_tables_host(bands[None])
        plans_t = pipe._plan_lines_from_tables(tbl[0], nb[0])
        plans_e = pipe._plan_lines(bands)
        assert len(plans_t) == len(plans_e)
        for a, b in zip(plans_t, plans_e):
            assert a == b


def test_tables_merge_fragmented_bands():
    """Same-row fragments (horizontal splits at word gaps) must group
    into ONE line where the exact CCL path splits them — the band
    fragmentation that dominated round-2 end-to-end errors."""
    bands = np.zeros((1, 32, 64, 2), bool)
    bands[0, 4:7, 2:20, 0] = True        # top band, split in the middle
    bands[0, 4:7, 30:60, 0] = True
    bands[0, 10:13, 2:60, 1] = True      # bottom band, whole
    pipe = OCRPipeline(PAGE_SHAPE, weights=None, chunk=1, workers=1,
                       device_cascade=True)
    tbl, nb = band_blob_tables_host(bands)
    plans_t = pipe._plan_lines_from_tables(tbl[0], nb[0])
    plans_e = pipe._plan_lines(bands[0])
    assert len(plans_e) == 2             # CCL sees two top blobs
    assert len(plans_t) == 1             # run grouping sees one line


def test_tables_close_small_vertical_gaps():
    """A 1-2 row gap inside a band (vertical fragmentation) closes; a
    real inter-line gap does not."""
    bands = np.zeros((1, 48, 64, 2), bool)
    bands[0, 4:6, 2:60, 0] = True        # fragment A
    bands[0, 7:9, 2:60, 0] = True        # 1-row gap -> same band
    bands[0, 20:23, 2:60, 0] = True      # real second line (11-row gap)
    bands[0, 12:15, 2:60, 1] = True
    bands[0, 28:31, 2:60, 1] = True
    tbl, nb = band_blob_tables_host(bands)
    assert nb[0, 0, 0] == 2              # rows axis, top channel
    tbl_d, nb_d = jax.jit(band_blob_tables)(bands)
    np.testing.assert_array_equal(np.asarray(nb_d), nb)


def test_tables_vertical_text_uses_column_axis():
    """90-degree text: bands are vertical stripes; the planner must pick
    the column decomposition and stitch the same line set."""
    bands = np.zeros((1, 64, 32, 2), bool)
    # two vertical line pairs (text reading top-to-bottom)
    bands[0, 2:60, 4:7, 0] = True
    bands[0, 2:60, 10:13, 1] = True
    bands[0, 2:60, 18:21, 0] = True
    bands[0, 2:60, 24:27, 1] = True
    pipe = OCRPipeline(PAGE_SHAPE, weights=None, chunk=1, workers=1,
                       device_cascade=True)
    tbl, nb = band_blob_tables_host(bands)
    assert nb[0, 1, 0] == 2 and nb[0, 0, 0] == 1
    plans_t = pipe._plan_lines_from_tables(tbl[0], nb[0])
    plans_e = pipe._plan_lines(bands[0])
    assert len(plans_t) == len(plans_e) == 2
    for a, b in zip(plans_t, plans_e):
        assert a == b


def test_device_cascade_tables_mode_end_to_end():
    """Tables mode (serving default) vs exact-bands mode on the trained
    checkpoint: same paragraph structure, never more lines (fragments can
    only merge), and at least as accurate against the geometric ground
    truth — the CCL path splits fragmented bands into multiple bogus
    lines, the table planner's run grouping recovers the real ones."""
    import json
    import random
    from difflib import SequenceMatcher
    from univer_ocr_tpu.interpreter import interpret
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.datasets import encode_layers
    from univer_ocr_tpu.image_generator import (LayeredImage, random_font,
                                                random_text)
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')

    random.seed(21)
    np.random.seed(21)
    pages, truths = [], []
    for _ in range(2):
        img = LayeredImage(720, 480, (255, 255, 255, 255))
        while img.paragraphs_added == 0:
            for _ in range(100):
                img.add_paragraph(random_text(), random_font(12, 36))
        img.make_divisible_by(16, 16)
        raw = img.get_raw()
        truths.append('\n'.join(
            t for _, t in sorted(interpret(raw).items())))
        pages.append(encode_layers(
            {'image': raw['image'].convert('L')})['image']
            .astype(np.float32))

    exact = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2, workers=2,
                        device_cascade=True, exact_bands=True,
                        precision='highest', collapse_runs=4)
    tables = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2, workers=2,
                         device_cascade=True, precision='highest',
                         collapse_runs=4)
    got_e = exact.ocr_pages(pages)
    got_t = tables.ocr_pages(pages)
    sim_e = sim_t = 0.0
    for truth, pe, pt in zip(truths, got_e, got_t):
        assert len(pe) == len(pt)            # same paragraphs
        for para_e, para_t in zip(pe, pt):
            assert len(para_t) <= len(para_e)
        text_e = '\n'.join(l for para in pe for l in para)
        text_t = '\n'.join(l for para in pt for l in para)
        sim_e += SequenceMatcher(None, truth, text_e).ratio()
        sim_t += SequenceMatcher(None, truth, text_t).ratio()
    # the merge may only help
    assert sim_t >= sim_e - 0.02, (sim_t, sim_e)
