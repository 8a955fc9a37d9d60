"""Device-planned chunk dispatch: decode equality with the classic
host-planned path, and the per-page fallback."""

import json
import random

import numpy as np
import pytest

from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
from univer_ocr_tpu.models.datasets import GeneratorDataset
from univer_ocr_tpu.models.pipeline import OCRPipeline

PAGE_SHAPE = (1, 288, 432, 1)


def _weights():
    try:
        return json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')


def _pipe(weights):
    return OCRPipeline(PAGE_SHAPE, weights=weights, chunk=4, workers=2,
                       device_cascade=True, precision='highest',
                       collapse_runs=4)


def test_planned_chunk_equals_host_planned_chunk():
    """The device chunk planner must reproduce the classic dispatch's
    decoded text EXACTLY: per-plan menu choice replicates
    _line_menu_shape, plan fields replicate _page_paragraph_plans, and
    label-exact masking equals the blob-upload semantics."""
    weights = _weights()
    random.seed(7)
    np.random.seed(7)
    ds = GeneratorDataset(4, 416, 272)
    pages = [ds.get(i, layer_tags=['image'])['image'].astype(np.float32)
             for i in range(4)]
    planned = _pipe(weights)
    classic = _pipe(weights)
    classic._chunk_planner = None            # force the host-planned path
    assert planned._chunk_planner is not None
    got = planned.ocr_pages(pages)
    want = classic.ocr_pages(pages)
    assert got == want
    assert planned.escalation_stats.get('chain_fallback', 0) == 0


def test_planned_chunk_page_fallback():
    """A page with > CHUNK_PLAN_K components falls back to the host
    planner FOR THAT PAGE and still decodes identically to the classic
    path; other pages in the chunk stay device-planned."""
    weights = _weights()
    random.seed(9)
    np.random.seed(9)
    ds = GeneratorDataset(1, 416, 272)
    normal = ds.get(0, layer_tags=['image'])['image'].astype(np.float32)
    dense = np.ones(PAGE_SHAPE, np.float32)
    for gy in range(7):
        for gx in range(8):
            y, x = 8 + gy * 38, 12 + gx * 52
            dense[0, y:y + 10, x:x + 24, 0] = 0.0
    planned = _pipe(weights)
    classic = _pipe(weights)
    classic._chunk_planner = None
    got = planned.ocr_pages([normal, dense])
    assert planned.escalation_stats.get('chain_fallback', 0) >= 1
    want = classic.ocr_pages([normal, dense])
    assert got == want
