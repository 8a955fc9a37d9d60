"""Per-stage wall-clock breakdown of the device-cascade serving path.

Runs the same workload as bench.py (synthetic 720x480 pages, trained
checkpoint) with OCRPipeline.timers attached, printing where the chunk
loop actually spends its time (dispatch vs sync-pull vs host geometry)
plus device-launch counts.  Usage:

    python scripts/profile_cascade.py [n_pages] [--host-cascade] [--f32]
        [--replay]

--replay re-executes the recorded chunk-run's device program sequence
with all inputs pre-staged in HBM and no D2H pulls: the compute-bound
pages/s a co-located (non-tunneled) deployment would see from the same
program stream.  It substantiates the "the tunnel, not the TPU, is the
limit" claim with a measured number instead of an extrapolation.
"""

import json
import os
import sys
import time

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def main(n_pages=32):
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    print('devices:', jax.devices(), file=sys.stderr)

    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.train_data_generator import (DataGenerator,
                                                            generate_picture)
    from univer_ocr_tpu.models.datasets import encode_layers
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    from univer_ocr_tpu.utils.profiling import StageTimers

    gen = DataGenerator(generator_func=generate_picture,
                        func_args=(720, 480, False))
    gen.start()
    pages = []
    for _ in range(n_pages + 2):
        images = gen.get_data()
        layers = encode_layers(
            {k: v.convert('L') for k, v in images.items() if k == 'image'})
        pages.append(layers['image'].astype(np.float32))
    gen.stop()

    chunk = 8
    collapse = False
    for a in sys.argv[1:]:
        if a.startswith('--chunk='):
            chunk = int(a.split('=')[1])
        if a.startswith('--collapse='):
            # --collapse=4 matches the bench/serving decode and turns the
            # fused tail on (pipeline defaults fused_tail from it)
            collapse = int(a.split('=')[1])
    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    pipeline = OCRPipeline(pages[0].shape, weights=weights, chunk=chunk,
                           workers=8, collapse_runs=collapse,
                           device_cascade='--host-cascade' not in sys.argv,
                           precision='highest' if '--f32' in sys.argv
                           else 'bf16')
    print('warmup...', file=sys.stderr)
    pipeline.warmup()
    pipeline.ocr_pages(pages[:2])

    # count device launches by wrapping the jitted callables; --replay
    # additionally records (fn, args) of every launch for the
    # device-only re-execution pass
    counts = {}
    record = [] if '--replay' in sys.argv else None

    def counted(name, fn):
        def wrapper(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            if record is not None:
                record.append((name, fn, a, k))
            return fn(*a, **k)
        return wrapper

    for name in ('_front_resident', '_front', '_paragraph_stage',
                 '_paragraph_stage_rot_res', '_paragraph_stage_fused',
                 '_paragraph_stage_res_fused', '_line_stage',
                 '_line_masks_fn', '_char_fn'):
        if hasattr(pipeline, name):
            setattr(pipeline, name, counted(name, getattr(pipeline, name)))

    pipeline.timers = StageTimers()
    t0 = time.time()
    texts = pipeline.ocr_pages(pages[2:2 + n_pages])
    elapsed = time.time() - t0
    n_chars = sum(len(line) for text in texts
                  for para in text for line in para)
    print(f'{n_pages} pages in {elapsed:.2f}s -> '
          f'{n_pages / elapsed:.2f} pages/s; {n_chars} chars')
    print('launch counts:', counts)
    print('escalations:', pipeline.escalation_stats)
    pipeline.timers.print(prefix='  ')
    tracked = sum(pipeline.timers.totals.values())
    print(f'  (tracked {tracked:.2f}s of {elapsed:.2f}s)')

    # wire timeline: per-tag bytes + busy time (union of intervals)
    from collections import defaultdict
    tl = pipeline.timeline
    if tl:
        by_tag = defaultdict(list)
        for tag, a, b, nb in tl:
            by_tag[tag].append((a, b, nb))
        all_iv = []
        for tag, items in sorted(by_tag.items()):
            tot_b = sum(nb for _, _, nb in items)
            span = sum(b - a for a, b, _ in items)
            ivs = sorted((a, b) for a, b, _ in items)
            union = 0.0
            cur_a, cur_b = ivs[0]
            for a, b in ivs[1:]:
                if a > cur_b:
                    union += cur_b - cur_a
                    cur_a, cur_b = a, b
                else:
                    cur_b = max(cur_b, b)
            union += cur_b - cur_a
            all_iv += ivs
            print(f'  wire[{tag}]: {tot_b / 1e6:.2f}MB in {len(items)} '
                  f'pulls, busy(union) {union:.2f}s, sum {span:.2f}s, '
                  f'{tot_b / union / 1e6:.1f}MB/s effective')
        all_iv.sort()
        union = 0.0
        cur_a, cur_b = all_iv[0]
        for a, b in all_iv[1:]:
            if a > cur_b:
                union += cur_b - cur_a
                cur_a, cur_b = a, b
            else:
                cur_b = max(cur_b, b)
        union += cur_b - cur_a
        tot = sum(nb for _, _, _, nb in tl)
        print(f'  wire[ALL D2H]: {tot / 1e6:.2f}MB, busy {union:.2f}s '
              f'({tot / union / 1e6:.1f}MB/s), idle '
              f'{elapsed - union:.2f}s of the timed run')

    if record:
        import jax
        import jax.numpy as jnp

        def stage(x):
            if isinstance(x, (np.ndarray, np.generic)):
                return jax.device_put(jnp.asarray(x))
            return x

        staged = [(name, fn, tuple(stage(x) for x in a),
                   {kk: stage(v) for kk, v in k.items()})
                  for name, fn, a, k in record]
        outs = [fn(*a, **k) for _, fn, a, k in staged]
        jax.block_until_ready(outs)  # warm + on-device arg caches
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            outs = [fn(*a, **k) for _, fn, a, k in staged]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f'  device-only replay: {len(staged)} launches x {reps} reps '
              f'in {dt:.3f}s -> {n_pages * reps / dt:.1f} pages/s '
              f'(compute-bound, no D2H/host geometry)')

        # per-family breakdown: time each program family's launches alone
        fams = {}
        for name, fn, a, k in staged:
            fams.setdefault(name, []).append((fn, a, k))
        for name, items in fams.items():
            t0 = time.time()
            for _ in range(reps):
                outs = [fn(*a, **k) for fn, a, k in items]
            jax.block_until_ready(outs)
            fdt = (time.time() - t0) / reps
            print(f'    replay[{name}]: {len(items)} launches, '
                  f'{fdt:.3f}s/rep ({fdt / len(items) * 1e3:.1f}ms/launch)')


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    main(int(args[0]) if args else 32)
