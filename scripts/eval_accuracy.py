"""Measure OCR accuracy of the trained cascade against ground truth.

Generates N pages, recovers the true text geometrically (interpret() on
the GT masks), runs the OCR pipeline on the page images, and reports
char-level similarity (difflib ratio) and exact-line rate.

    python scripts/eval_accuracy.py [n_pages] [--collapse]
"""
import os
import sys
from difflib import SequenceMatcher

import _bootstrap  # noqa: F401  (repo-root import shim)

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
from univer_ocr_tpu.primitives import SIMILAR_CHARS_PAIRS_LIST

#: Look-alike canonicalization: the registered RU/EN similar pairs
#: (primitives, reference :16-42) render pixel-identically in DejaVu, so
#: no model can tell them apart; the decode itself suppresses them when
#: consecutive (are_similar).  For scoring, both sides map through a
#: canonical representative so a С-for-C read is not counted as an error.
_CANON = {ru: en for ru, en in SIMILAR_CHARS_PAIRS_LIST}


def canonical(text):
    return ''.join(_CANON.get(c, c) for c in text)


def main(n_pages=8, collapse=True, seed=123, chunk=8):
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
    # measure the serving configuration (explicit: the constructor
    # default is the f32 parity mode); --f32 evaluates exact numerics
    precision = 'highest' if '--f32' in sys.argv else 'bf16'
    pipe = OCRPipeline((1, 496, 736, 1), weights=weights,
                       collapse_runs=collapse, chunk=chunk,
                       device_cascade='--host-cascade' not in sys.argv,
                       precision=precision,
                       escalation='--no-escalation' not in sys.argv)
    if '--exact-bands' in sys.argv:
        pipe = OCRPipeline((1, 496, 736, 1), weights=weights,
                           collapse_runs=collapse, device_cascade=True,
                           precision=precision, exact_bands=True)
    results = pipe.ocr_pages(pages)

    ratios = []
    canon = []
    matched = []
    exact = 0
    exact_canon = 0
    total_lines = 0
    for truth, result in zip(truths, results):
        true_lines = [truth[k] for k in sorted(truth)]
        pred_lines = [line for para in result for line in para]
        true_text = '\n'.join(true_lines)
        pred_text = '\n'.join(pred_lines)
        # concat similarity understates when detected paragraph ORDER
        # differs from the generator's insertion order (both are valid
        # serializations of the same 2D page); matched-line similarity
        # scores content order-independently
        ratio = SequenceMatcher(None, true_text, pred_text).ratio()
        ratios.append(ratio)
        canon.append(SequenceMatcher(None, canonical(true_text),
                                     canonical(pred_text)).ratio())
        m = line_matched_similarity(true_lines, pred_lines)
        matched.append(m)
        total_lines += len(true_lines)
        pred_set = set(pred_lines)
        exact += sum(1 for line in true_lines if line in pred_set)
        canon_set = {canonical(p) for p in pred_lines}
        exact_canon += sum(1 for line in true_lines
                           if canonical(line) in canon_set)
        print(f'page: {len(true_lines)} true lines, '
              f'{len(pred_lines)} predicted, similarity {ratio:.3f}, '
              f'matched {m:.3f}')
        if true_lines and pred_lines:
            print(f'  true[0]: {true_lines[0][:60]!r}')
            print(f'  pred[0]: {pred_lines[0][:60]!r}')

    print(f'\nmean char similarity (concat): {np.mean(ratios):.4f}')
    print(f'mean char similarity (concat, look-alikes canonical): '
          f'{np.mean(canon):.4f}')
    print(f'mean char similarity (matched lines): {np.mean(matched):.4f}')
    print(f'exact line rate: {exact}/{total_lines} '
          f'(look-alikes canonical: {exact_canon}/{total_lines})')


def line_matched_similarity(true_lines, pred_lines):
    """Order-independent page score: greedily match each true line to
    its most-similar unused predicted line; char-weighted mean of the
    match ratios, with unmatched predicted chars diluting the
    denominator (hallucinated or duplicated lines cost score)."""
    true_lines = [t.strip() for t in true_lines]
    pred = [p.strip() for p in pred_lines]
    pairs = sorted(
        ((SequenceMatcher(None, t, p).ratio(), ti, pi)
         for ti, t in enumerate(true_lines)
         for pi, p in enumerate(pred)),
        key=lambda x: -x[0])
    used_t, used_p = set(), set()
    num = 0.0
    for r, ti, pi in pairs:
        if ti in used_t or pi in used_p:
            continue
        used_t.add(ti)
        used_p.add(pi)
        num += r * len(true_lines[ti])
    den = (sum(len(t) for t in true_lines)
           + sum(len(p) for i, p in enumerate(pred) if i not in used_p))
    return num / max(den, 1)


def main_gt_crops(n_pages=8, collapse=True, seed=123):
    """Char-model accuracy on GROUND-TRUTH-geometry crops: paragraphs and
    line boxes come from the GT masks (no Paragraph/Line model error),
    isolating the Char model's recognition quality.  Reports char-level
    similarity of the decoded text vs the geometric ground truth."""
    random.seed(seed)
    np.random.seed(seed)
    from univer_ocr_tpu.interpreter.interpreter import (
        crop_and_rotate_single_paragraph, label_layer)
    from univer_ocr_tpu.models.model import (CHAR_FIXED_WIDTH,
                                             CHAR_INPUT_HEIGHT,
                                             make_divisible_by)
    from univer_ocr_tpu.models.pipeline import (OCRPipeline,
                                                crop_lines_of_paragraph)
    from univer_ocr_tpu.interpreter.interpreter import pred_ids_to_text

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    precision = 'highest' if '--f32' in sys.argv else 'bf16'
    pipe = OCRPipeline((1, 496, 736, 1), weights=weights,
                       collapse_runs=collapse, precision=precision)

    ratios = []
    for _ in range(n_pages):
        img = LayeredImage(720, 480, (255, 255, 255, 255))
        while img.paragraphs_added == 0:
            for _ in range(100):
                img.add_paragraph(random_text(), random_font(12, 36))
        img.make_divisible_by(16, 16)
        raw = img.get_raw()
        truth = interpret(raw)
        mono = encode_layers(
            {'image_monochrome': raw['image_monochrome'].convert('L')}
        )['monochrome'].astype(np.float32)
        line = encode_layers(
            {'line_top': raw['line_top'].convert('L'),
             'line_bottom': raw['line_bottom'].convert('L')}
        )['line'].astype(np.float32)
        para = encode_layers(
            {'paragraph': raw['paragraph'].convert('L')}
        )['paragraph'].astype(np.float32)

        pred_lines = []
        for mask in label_layer(para):
            mono_c, line_c = crop_and_rotate_single_paragraph(
                mask, [mono, line])
            mono_c = make_divisible_by(mono_c, 16, 16)
            line_c = make_divisible_by(line_c, 16, 16)
            lines = crop_lines_of_paragraph(
                line_c, mono_c, CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH)
            for ids, valid in pipe._run_char_batched(lines):
                pred_lines.append(pred_ids_to_text(ids, valid, collapse))

        true_lines = [truth[k] for k in sorted(truth)]
        ratio = SequenceMatcher(None, '\n'.join(true_lines),
                                '\n'.join(pred_lines)).ratio()
        ratios.append(ratio)
        print(f'page: {len(true_lines)} true lines, '
              f'{len(pred_lines)} GT-crop lines, similarity {ratio:.3f}')
        if true_lines and pred_lines:
            print(f'  true[0]: {true_lines[0][:60]!r}')
            print(f'  pred[0]: {pred_lines[0][:60]!r}')
    print(f'\nmean GT-crop char similarity: {np.mean(ratios):.4f}')


if __name__ == '__main__':
    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    n = int(positional[0]) if positional else 8
    collapse = '--no-collapse' not in sys.argv
    chunk = 8
    for a in sys.argv[1:]:
        if a.startswith('--min-run='):
            collapse = int(a.split('=')[1])
        if a.startswith('--chunk='):
            chunk = int(a.split('=')[1])
    if '--gt-crops' in sys.argv:
        main_gt_crops(n, collapse=collapse)
    else:
        main(n, collapse=collapse, chunk=chunk)
