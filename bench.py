"""End-to-end OCR inference benchmark on one TPU chip.

Measures pages/sec through the full cascade (Monochrome -> Paragraph ->
paragraph crop/deskew -> Line -> line crop/zoom -> Char -> text) over
synthetic 720x480 pages, using the trained model_weights.json checkpoint
when present (random weights otherwise — stages with no detections then
short-circuit, which is reported in the metric name via stderr notes).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pages/sec", "vs_baseline": N/62.5}

vs_baseline: BASELINE.json's north star is >=500 pages/sec on a v5e-8 (8
chips); the per-chip share is 62.5 pages/sec.  The reference itself
publishes no numbers (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n_pages=32, warmup=2):
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    log('devices:', jax.devices())

    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.train_data_generator import (DataGenerator,
                                                            generate_picture)
    from univer_ocr_tpu.models.datasets import encode_layers

    # ---- generate the page corpus up front (not timed) ------------------
    log(f'generating {n_pages + warmup} pages...')
    gen = DataGenerator(generator_func=generate_picture,
                        func_args=(720, 480, False))
    gen.start()
    pages = []
    for _ in range(n_pages + warmup):
        images = gen.get_data()
        layers = encode_layers(
            {k: v.convert('L') for k, v in images.items() if k == 'image'})
        pages.append(layers['image'].astype(np.float32))
    gen.stop()
    page_shape = pages[0].shape
    log('page shape:', page_shape)

    # ---- build the inference engine -------------------------------------
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
        log(f'loaded checkpoint with {len(weights)} layer entries')
    except OSError:
        weights = None
        log('WARNING: no model_weights.json — random weights')

    from univer_ocr_tpu.models.pipeline import OCRPipeline
    device_cascade = '--host-cascade' not in sys.argv
    precision = 'highest' if '--f32' in sys.argv else 'bf16'
    chunk = 32
    for a in sys.argv[1:]:
        if a.startswith('--chunk='):
            chunk = int(a.split('=')[1])
    log('device_cascade:', device_cascade, 'precision:', precision,
        'chunk:', chunk)
    # collapse_runs=4: report real characters, not per-column duplicates
    # (the reference's own decode keeps duplicates for chars outside its
    # similar-pairs table — a flaw, not a feature; VERDICT r1), with the
    # run-length filter that suppresses 1-3-column boundary
    # misclassifications (the best-measured decode, scripts/eval_accuracy)
    pipeline = OCRPipeline(page_shape, weights=weights, chunk=chunk,
                           workers=8, device_cascade=device_cascade,
                           precision=precision, collapse_runs=4)

    # ---- warmup (compiles the fixed program menu; persistently cached) ---
    log('warmup...')
    t0 = time.time()
    pipeline.warmup()
    # real-data warmup at EXACTLY the canonical chunk batch: any other
    # batch would compile its own front program (~30s remote compile)
    w = (pages[:warmup] * (chunk // warmup + 1))[:chunk]
    pipeline.ocr_pages(w)
    log(f'warmup took {time.time() - t0:.1f}s')

    # ---- timed run ------------------------------------------------------
    # 3 repetitions, median: the tunneled link's per-run wire variance is
    # ~2x on a single 32-page chunk (measured 13.6-26.9 pages/s on
    # identical code within minutes), so one draw is a lottery; the
    # median over three is the steady-state number
    reps = []
    for r in range(3):
        t0 = time.time()
        texts = pipeline.ocr_pages(pages[warmup:warmup + n_pages])
        elapsed = time.time() - t0
        reps.append(elapsed)
        n_chars = sum(len(line) for text in texts
                      for para in text for line in para)
        log(f'rep {r + 1}: {n_pages} pages in {elapsed:.2f}s -> '
            f'{n_pages / elapsed:.2f} pages/s; {n_chars} chars decoded')
    elapsed = sorted(reps)[1]

    pages_per_sec = n_pages / elapsed
    rep_rates = sorted(round(n_pages / e, 2) for e in reps)
    log(f'median: {n_pages} pages in {elapsed:.2f}s -> '
        f'{pages_per_sec:.2f} pages/s')

    # p50 single-page latency (BASELINE.json tracked metric): one page
    # through the full cascade, nothing to batch against
    lat = []
    for i in range(8):
        t0 = time.time()
        pipeline.ocr_pages(pages[i:i + 1])
        lat.append(time.time() - t0)
    p50_ms = sorted(lat)[len(lat) // 2] * 1e3
    log(f'p50 single-page latency: {p50_ms:.0f}ms')
    if getattr(pipeline, 'escalation_stats', None):
        log('escalation stats:', dict(pipeline.escalation_stats))

    # The reference publishes no numbers (BASELINE.md); the measured
    # baseline is the same cascade + checkpoint on host CPU via
    # scripts/bench_configs.py config 1 (1.83 pages/s warm, trained
    # weights — remeasured round 4 after the native-CCL/analytic-deskew
    # host-path speedups; round-1 number was 1.53).  The north-star
    # share is BASELINE.json's 500 pages/s on v5e-8 / 8 chips.
    CPU_REFERENCE_PAGES_PER_SEC = 1.83
    print(json.dumps({
        'metric': 'end_to_end_ocr_pages_per_sec_1chip',
        'value': round(pages_per_sec, 3),
        'unit': 'pages/sec',
        'vs_baseline': round(pages_per_sec / CPU_REFERENCE_PAGES_PER_SEC, 3),
        'north_star_share_62.5': round(pages_per_sec / 62.5, 4),
        'p50_page_latency_ms': round(p50_ms, 1),
        # per-rep spread: the tracked value is a median of 3 in-process
        # reps since round 4 (earlier rounds were single runs — semantics
        # note in BASELINE.md); the dominant variance is per-PROCESS
        # tunnel quality, which the spread makes visible in history
        'rep_pages_per_sec': rep_rates,
    }))


if __name__ == '__main__':
    # flags (--f32, --host-cascade, --chunk=N) are read inside main();
    # the only positional argument is the page count
    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    main(int(positional[0]) if positional else 32)
