"""The single-page fused chain: device paragraph planner parity with the
host planner, end-to-end decode against the chunk path, and the not-ok
fallback."""

import json
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
from univer_ocr_tpu.models.datasets import GeneratorDataset
from univer_ocr_tpu.models.device_cascade import (PARAGRAPH_FLT_FIELDS,
                                                  PARAGRAPH_INT_FIELDS,
                                                  device_page_plans)
from univer_ocr_tpu.models.pipeline import OCRPipeline

PAGE_SHAPE = (1, 288, 432, 1)


def _weights():
    try:
        return json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')


def test_device_planner_matches_host_planner():
    """Every plan-matrix field equals pipeline._page_paragraph_plans on
    generated GT paragraph masks (level and rotated components)."""
    random.seed(5)
    np.random.seed(5)
    ds = GeneratorDataset(6, 416, 272)
    pipe = OCRPipeline(PAGE_SHAPE, weights=None, chunk=1, workers=1,
                       device_cascade=True, collapse_runs=4)
    hb, wb = pipe.line_shape_menu[-1]
    fn = jax.jit(lambda p: device_page_plans(p, hb, wb, k_max=16))
    ni = len(PARAGRAPH_INT_FIELDS)

    def synthetic_rotated():
        # a tilted solid bar: find_rotation_angle fires (~14 degrees),
        # covering the deskew branch the random corpus may not draw
        from scipy import ndimage
        bar = np.zeros((60, 160), np.float32)
        bar[20:40, 10:150] = 1.0
        rot = ndimage.rotate(bar, -14.0, reshape=True, order=0)
        para = np.zeros((288, 432), np.float32)
        para[40:40 + rot.shape[0], 60:60 + rot.shape[1]] = rot > 0.5
        return para

    cases = [np.asarray(
        ds.get(i, layer_tags=['paragraph'])['paragraph'][0, :, :, 0]
        > 0.5, np.float32) for i in range(6)] + [synthetic_rotated()]
    rotated_seen = 0
    for i, para in enumerate(cases):
        host = pipe._page_paragraph_plans(0, para)
        lab, roots, plan, n_comp, ok = fn(jnp.asarray(para))
        plan = np.asarray(plan)
        assert bool(ok)
        assert int(n_comp) == len(host)
        for k, hp in enumerate(host):
            rotated_seen += bool(hp['rotated'])
            for ci, f in enumerate(PARAGRAPH_INT_FIELDS):
                if f in ('page', 'start_y', 'start_x'):
                    continue
                assert int(plan[k][ci]) == int(hp[f]), (i, k, f)
            for ci, f in enumerate(PARAGRAPH_FLT_FIELDS):
                assert abs(plan[k][ni + ci] - hp[f]) < 1e-3, (i, k, f)
    assert rotated_seen, 'no rotated paragraph was exercised'


def test_chain_decode_matches_chunk_path_quality():
    """Chain decode must match the chunk path structurally (paragraph and
    line counts) and textually up to the menu-frame shear quantization
    (the chain crops at the largest menu shape; measured at parity —
    0.5701 vs 0.5694 mean similarity on the eval corpus)."""
    from difflib import SequenceMatcher
    weights = _weights()
    random.seed(7)
    np.random.seed(7)
    ds = GeneratorDataset(2, 416, 272)
    pages = [ds.get(i, layer_tags=['image'])['image'].astype(np.float32)
             for i in range(2)]
    pipe = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2, workers=2,
                       device_cascade=True, precision='highest',
                       collapse_runs=4)
    assert pipe._single_page_chain is not None
    chunk_res = pipe.ocr_pages(pages)
    single_res = [pipe.ocr_pages([p])[0] for p in pages]
    for a, b in zip(chunk_res, single_res):
        assert len(a) == len(b)                  # same paragraphs
        for pa, pb in zip(a, b):
            assert len(pa) == len(pb)            # same lines
        ta = '\n'.join(l for para in a for l in para)
        tb = '\n'.join(l for para in b for l in para)
        assert SequenceMatcher(None, ta, tb).ratio() > 0.9, (ta, tb)


def test_chain_component_overflow_falls_back_to_host_path():
    """>2*DEVICE_BATCH components flag the chain not-ok; the fallback
    must return the classic path's exact result."""
    weights = _weights()
    pipe = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2, workers=2,
                       device_cascade=True, precision='highest',
                       collapse_runs=4)
    # a 6x8 grid of separated ink blobs detects as 48 paragraph
    # components (> K2=32), so the chain MUST take the not-ok fallback
    # — whose result is the classic path, hence exactly equal
    page = np.ones(PAGE_SHAPE, np.float32)
    for gy in range(6):
        for gx in range(8):
            y, x = 12 + gy * 44, 12 + gx * 52
            page[0, y:y + 10, x:x + 24, 0] = 0.0
    single = pipe.ocr_pages([page])[0]
    assert pipe.escalation_stats.get('chain_fallback', 0) == 1
    chunk = pipe.ocr_pages([page, page])[0]
    assert single == chunk
