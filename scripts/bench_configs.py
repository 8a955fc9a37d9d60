"""BASELINE.json measurement configs 1-2: the CPU reference-path numbers
and the accelerator-vs-CPU layer parity suite.

    python scripts/bench_configs.py          # CPU config 1
    python scripts/bench_configs.py identity # config 2 (needs idle TPU)
"""
import os
import sys
import time

import _bootstrap  # noqa: F401  (repo-root import shim)


def config1_cpu_single_page():
    """Single synthetic page forward pass, CPU backend (the reference's
    single_iteration path)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import random

    import numpy as np

    from univer_ocr_tpu.models import (Modes, make_model_system)
    from univer_ocr_tpu.models.datasets import GeneratorDataset

    import json

    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH

    random.seed(0)
    np.random.seed(0)
    page = GeneratorDataset(1, 720, 480).get(0, layer_tags=['image'])[
        'image'].astype(np.float32)
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        weights = None
    system, models, _ = make_model_system(page.shape, weights=weights,
                                          mode=Modes.PREDICT)

    context = {'monochrome_X': page}
    t0 = time.time()
    system.predict(context)
    cold = time.time() - t0

    times = []
    for _ in range(3):
        context = {'monochrome_X': page}
        t0 = time.time()
        system.predict(context)
        times.append(time.time() - t0)
    print(f'config1 single-page CPU forward: cold {cold:.2f}s, '
          f'warm {min(times):.2f}s ({1/min(times):.2f} pages/s)')


def config2_identity():
    from univer_ocr_tpu.nn.test import test_identity
    ok = test_identity.main(use_gpu=True)
    print('config2 identity suite:', 'PASS' if ok else 'FAIL')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'identity':
        config2_identity()
    else:
        config1_cpu_single_page()
