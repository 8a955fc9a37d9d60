"""End-to-end OCR accuracy evaluation + the trainer's eval gate.

Stage-local validation loss is proven NON-predictive of end-to-end OCR
quality: two checkpoint regressions in rounds 3 and 4 (BASELINE.md) both
improved per-stage val losses while collapsing decoded-text similarity,
and both were caught only by manual triage with scripts/eval_accuracy.py.
This module makes that measurement a first-class, reusable component:

  * `build_eval_corpus` — a seeded fixed corpus of rendered pages with
    geometric ground-truth text (interpret() on the GT masks, the same
    decoder scripts/eval_accuracy.py scores against);
  * `score_weights` — decoded-text similarity of a weight dict through
    the serving OCRPipeline configuration;
  * `make_eval_gate` — a save-time gate for the trainers: a stage result
    may only overwrite the committed checkpoint if the END-TO-END score
    does not regress (mirroring the reference's save-best-on-validation
    callback, reference my_model/trainer.py:282-286, but on the metric
    that actually ships).
"""

import json
import random
from difflib import SequenceMatcher

import numpy as np

from ..image_generator import LayeredImage, random_font, random_text
from ..interpreter import interpret
from ..primitives import SIMILAR_CHARS_PAIRS_LIST
from .datasets import encode_layers

#: Look-alike canonicalization (see scripts/eval_accuracy.py): registered
#: RU/EN similar pairs render pixel-identically in DejaVu, so a С-for-C
#: read is not a model error; both sides map through a representative.
_CANON = {ru: en for ru, en in SIMILAR_CHARS_PAIRS_LIST}


def canonical(text):
    return ''.join(_CANON.get(c, c) for c in text)


def build_eval_corpus(n_pages=8, seed=123, width=720, height=480):
    """Seeded pages + geometric ground truth: [(1,H,W,1) f32], [truth]."""
    rng_state = random.getstate()
    np_state = np.random.get_state()
    random.seed(seed)
    np.random.seed(seed)
    try:
        pages, truths = [], []
        for _ in range(n_pages):
            img = LayeredImage(width, height, (255, 255, 255, 255))
            while img.paragraphs_added == 0:
                for _ in range(100):
                    img.add_paragraph(random_text(), random_font(12, 36))
            img.make_divisible_by(16, 16)
            raw = img.get_raw()
            truths.append(interpret(raw))
            layers = encode_layers({'image': raw['image'].convert('L')})
            pages.append(layers['image'].astype(np.float32))
    finally:
        random.setstate(rng_state)
        np.random.set_state(np_state)
    return pages, truths


def score_results(truths, results):
    """Similarity metrics of decoded pipeline output vs ground truth."""
    ratios, canon, matched = [], [], []
    exact = exact_canon = total_lines = 0
    for truth, result in zip(truths, results):
        true_lines = [truth[k] for k in sorted(truth)]
        pred_lines = [line for para in result for line in para]
        true_text = '\n'.join(true_lines)
        pred_text = '\n'.join(pred_lines)
        ratios.append(
            SequenceMatcher(None, true_text, pred_text).ratio())
        canon.append(SequenceMatcher(None, canonical(true_text),
                                     canonical(pred_text)).ratio())
        matched.append(line_matched_similarity(true_lines, pred_lines))
        total_lines += len(true_lines)
        pred_set = set(pred_lines)
        exact += sum(1 for line in true_lines if line in pred_set)
        canon_set = {canonical(p) for p in pred_lines}
        exact_canon += sum(1 for line in true_lines
                           if canonical(line) in canon_set)
    return {
        'concat': float(np.mean(ratios)),
        'canonical': float(np.mean(canon)),
        'matched': float(np.mean(matched)),
        'exact_lines': exact,
        'exact_lines_canonical': exact_canon,
        'total_lines': total_lines,
        'per_page': ratios,
    }


def line_matched_similarity(true_lines, pred_lines):
    """Order-independent page score: greedily match each true line to its
    most-similar unused predicted line; char-weighted mean of the match
    ratios, unmatched predicted chars diluting the denominator."""
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


def score_weights(weights, pages, truths, collapse=4, chunk=8,
                  precision='bf16', device_cascade=True,
                  page_shape=(1, 496, 736, 1), pipeline_cls=None):
    """Run the serving pipeline configuration on the eval corpus and
    score the decoded text.  `collapse` is the decode run-length filter
    (collapse_runs; 4 is the shipping bench decode — BASELINE.md)."""
    if pipeline_cls is None:
        from .pipeline import OCRPipeline as pipeline_cls
    pipe = pipeline_cls(page_shape, weights=weights,
                        collapse_runs=collapse, chunk=chunk,
                        device_cascade=device_cascade, precision=precision)
    return score_results(truths, pipe.ocr_pages(pages))


def make_eval_gate(checkpoint_path, n_pages=8, seed=123, collapse=4,
                   margin=0.0, device_cascade=True, precision='bf16',
                   page_shape=(1, 496, 736, 1), log=print,
                   score_fn=None):
    """Save-time gate: `gate(models) -> (ok, score, incumbent)`.

    `models` is a {name: model} dict of candidate stage results.  The
    candidate weights are the committed checkpoint overlaid with the
    candidates'; the gate scores them END-TO-END on a fixed seeded corpus
    and approves only if the concat similarity does not regress below the
    incumbent score by more than `margin`.  The incumbent score is
    measured from the checkpoint file on first use and advances on every
    approval, so a later stage cannot ratchet quality back down.

    `score_fn(weights) -> float` injects a stub for unit tests.
    """
    state = {'incumbent': None, 'corpus': None}

    def default_score(weights):
        if state['corpus'] is None:
            state['corpus'] = build_eval_corpus(n_pages, seed)
        pages, truths = state['corpus']
        return score_weights(weights, pages, truths, collapse=collapse,
                             device_cascade=device_cascade,
                             precision=precision,
                             page_shape=page_shape)['concat']

    score = score_fn or default_score

    def load_checkpoint():
        try:
            return json.load(open(checkpoint_path))
        except OSError:
            return {}

    def gate(models):
        weights = load_checkpoint()
        if state['incumbent'] is None:
            state['incumbent'] = score(weights) if weights else -1.0
            log(f'[eval-gate] incumbent end-to-end score: '
                f'{state["incumbent"]:.4f}')
        candidate = dict(weights)
        for model in models.values():
            candidate.update(model.get_weights())
        cand_score = score(candidate)
        ok = cand_score >= state['incumbent'] - margin
        log(f'[eval-gate] candidate {cand_score:.4f} vs incumbent '
            f'{state["incumbent"]:.4f}: '
            f'{"APPROVE" if ok else "REJECT (checkpoint kept)"}')
        if ok:
            state['incumbent'] = max(state['incumbent'], cand_score)
        return ok, cand_score, state['incumbent']

    return gate
