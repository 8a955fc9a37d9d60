"""Batched OCRPipeline must produce the same text as the per-page
ModelSystem PREDICT path on the same weights."""

import random

import numpy as np
import pytest

from univer_ocr_tpu.models import Modes, make_model_system
from univer_ocr_tpu.models.datasets import GeneratorDataset
from univer_ocr_tpu.models.pipeline import OCRPipeline

PAGE_SHAPE = (1, 496, 736, 1)


@pytest.fixture(scope='module')
def pages():
    random.seed(11)
    np.random.seed(11)
    dataset = GeneratorDataset(2, 720, 480)
    return [dataset.get(i, layer_tags=['image'])['image'].astype(np.float32)
            for i in range(2)]


def test_pipeline_matches_model_system(pages):
    # shared random weights: build the system first, reuse its weights
    system, models, _ = make_model_system(PAGE_SHAPE, mode=Modes.PREDICT)
    weights = {name: w for m in models.values()
               for name, w in m.get_weights().items()}

    pipeline = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2,
                           workers=2, quantized_transfers=False)

    expected = []
    for page in pages:
        context = {'monochrome_X': page}
        system.predict(context)
        expected.append(context['text'])

    got = pipeline.ocr_pages(pages)
    assert got == expected


def test_pipeline_handles_empty_detections():
    pipeline = OCRPipeline(PAGE_SHAPE, weights=None, chunk=2, workers=2)
    blank = np.ones(PAGE_SHAPE, np.float32)
    results = pipeline.ocr_pages([blank])
    assert len(results) == 1
    assert isinstance(results[0], list)


def test_pipeline_pallas_front_matches(pages):
    """use_pallas front (fused monochrome kernel) == XLA front."""
    import jax.numpy as jnp
    a = OCRPipeline(PAGE_SHAPE, weights=None, chunk=2, workers=2)
    weights = {n: {p: np.asarray(v).tolist() for p, v in lp.items()}
               for n, lp in a.front_params.items()}
    b = OCRPipeline(PAGE_SHAPE, weights=weights, chunk=2, workers=2,
                    use_pallas=True)
    batch = np.concatenate([(p * 255).astype(np.uint8) for p in pages])
    m_a, p_a = a._front(a.front_params, jnp.asarray(batch))
    m_b, p_b = b._front(b.front_params, jnp.asarray(batch))
    # u8-quantized outputs: allow 1 ulp of quantization flips
    assert np.abs(np.asarray(m_a).astype(int)
                  - np.asarray(m_b).astype(int)).max() <= 1
