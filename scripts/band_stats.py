"""Measure the real structure of the Line model's band masks: how many
rows are solid runs, runs-per-row histogram, violations per slot."""

import json
import os
import sys

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def main(n_pages=8):
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.train_data_generator import (DataGenerator,
                                                            generate_picture)
    from univer_ocr_tpu.models.datasets import encode_layers
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    gen = DataGenerator(generator_func=generate_picture,
                        func_args=(720, 480, False))
    gen.start()
    pages = []
    for _ in range(n_pages):
        images = gen.get_data()
        layers = encode_layers(
            {k: v.convert('L') for k, v in images.items() if k == 'image'})
        pages.append(layers['image'].astype(np.float32))
    gen.stop()

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    pipe = OCRPipeline(pages[0].shape, weights=weights, chunk=8, workers=8,
                       device_cascade=True, exact_bands=True,
                       precision='bf16')
    batch = np.concatenate([(p * 255).astype(np.uint8) for p in pages])
    mono_dev, para_bits_dev = pipe._front_resident(pipe.front_params,
                                                   jnp.asarray(batch))
    state = pipe._dispatch_chunk_device(n_pages, mono_dev,
                                        np.asarray(para_bits_dev))

    # re-dispatch to grab raw packed planes (exact-mode stage payload)
    para_bits = np.asarray(para_bits_dev)
    para_dev = pipe._prep_stacks(jnp.asarray(para_bits))
    para = np.unpackbits(para_bits, axis=2)
    para = para[:, :, :pipe.page_shape[2], 0]
    plans = [p for page in range(n_pages)
             for p in pipe._page_paragraph_plans(page, para[page])]
    launches = pipe._dispatch_paragraph_stage((mono_dev, para_dev), plans)

    viol_rows = 0
    nonempty_rows = 0
    slots = 0
    slot_viol_counts = []
    runs_hist = {}
    for sel, crops_dev, packed_dev, _masks in launches:
        packed = np.asarray(packed_dev)
        bands = np.unpackbits(packed, axis=2)
        for bi in range(len(sel)):
            plan = plans[sel[bi]]
            view = bands[bi, :plan['hv'], :plan['wv'], :] > 0
            slots += 1
            sv = 0
            for ch in range(2):
                m = view[:, :, ch]
                for r in range(m.shape[0]):
                    row = m[r]
                    if not row.any():
                        continue
                    nonempty_rows += 1
                    d = np.diff(row.astype(np.int8))
                    runs = int((d == 1).sum()) + int(row[0])
                    runs_hist[runs] = runs_hist.get(runs, 0) + 1
                    if runs != 1:
                        viol_rows += 1
                        sv += 1
            slot_viol_counts.append(sv)
    print(f'slots: {slots}, nonempty rows: {nonempty_rows}, '
          f'violating rows: {viol_rows} '
          f'({viol_rows / max(1, nonempty_rows):.1%})')
    print('runs-per-row histogram:', dict(sorted(runs_hist.items())))
    print('violations per slot: ', sorted(slot_viol_counts, reverse=True)[:20])


if __name__ == '__main__':
    main()
