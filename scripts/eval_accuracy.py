"""Measure OCR accuracy of the trained cascade against ground truth.

Generates N pages, recovers the true text geometrically (interpret() on
the GT masks), runs the OCR pipeline on the page images, and reports
char-level similarity (difflib ratio) and exact-line rate.

    python scripts/eval_accuracy.py [n_pages] [--collapse]
"""
import os
import sys
from difflib import SequenceMatcher

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from univer_ocr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import json
import random

from univer_ocr_tpu.image_generator import LayeredImage, random_font, random_text
from univer_ocr_tpu.interpreter import interpret
from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
from univer_ocr_tpu.models.datasets import encode_layers
from univer_ocr_tpu.models.pipeline import OCRPipeline


def main(n_pages=8, collapse=True, seed=123):
    random.seed(seed)
    np.random.seed(seed)

    pages = []
    truths = []
    for _ in range(n_pages):
        img = LayeredImage(720, 480, (255, 255, 255, 255))
        while img.paragraphs_added == 0:
            for _ in range(100):
                img.add_paragraph(random_text(), random_font(12, 36))
        img.make_divisible_by(16, 16)
        raw = img.get_raw()
        truths.append(interpret(raw))
        layers = encode_layers({'image': raw['image'].convert('L')})
        pages.append(layers['image'].astype(np.float32))

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    pipe = OCRPipeline((1, 496, 736, 1), weights=weights,
                       collapse_runs=collapse)
    results = pipe.ocr_pages(pages)

    ratios = []
    exact = 0
    total_lines = 0
    for truth, result in zip(truths, results):
        true_lines = [truth[k] for k in sorted(truth)]
        pred_lines = [line for para in result for line in para]
        true_text = '\n'.join(true_lines)
        pred_text = '\n'.join(pred_lines)
        ratio = SequenceMatcher(None, true_text, pred_text).ratio()
        ratios.append(ratio)
        total_lines += len(true_lines)
        pred_set = set(pred_lines)
        exact += sum(1 for line in true_lines if line in pred_set)
        print(f'page: {len(true_lines)} true lines, '
              f'{len(pred_lines)} predicted, similarity {ratio:.3f}')
        if true_lines and pred_lines:
            print(f'  true[0]: {true_lines[0][:60]!r}')
            print(f'  pred[0]: {pred_lines[0][:60]!r}')

    print(f'\nmean char similarity: {np.mean(ratios):.4f}')
    print(f'exact line rate: {exact}/{total_lines}')


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(n, collapse='--no-collapse' not in sys.argv)
