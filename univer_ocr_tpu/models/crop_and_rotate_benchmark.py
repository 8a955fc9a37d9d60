"""Interpreter-chain benchmark/integration test (reference
my_model/crop_and_rotate_benchmark.py:29-146): run ParagraphCrop ->
LineCrop -> CharLabel -> PredToText over the generated train set for
workers in {1,2,4} x {threading, multiprocessing}, print per-stage
cumulative timers, and write decoded text for inspection."""

from datetime import datetime as dt

from ..interpreter import (MP, CropAndRotateParagraphs, CropRotateAndZoomLines,
                           LabelChar, PredToText)
from .constants import GENERATED_FILES_PATH
from .datasets import train_dataset
from .model import CHAR_FIXED_WIDTH, CHAR_INPUT_HEIGHT, make_divisible_by

OUTPUT_PATH = GENERATED_FILES_PATH / 'crop_and_rotate_benchmark'


def run_chain(dataset, workers_count, limit=None, save_text=False):
    crop_paragraphs = CropAndRotateParagraphs(workers_count)
    crop_lines = CropRotateAndZoomLines(workers_count, CHAR_INPUT_HEIGHT,
                                        CHAR_FIXED_WIDTH)
    label_char = LabelChar(workers_count)
    pred_to_text = PredToText(workers_count)

    timers = {
        'ParagraphCrop': dt.now() - dt.now(),
        'LineCrop': dt.now() - dt.now(),
        'CharLabel': dt.now() - dt.now(),
        'PredToText': dt.now() - dt.now(),
    }

    n = len(dataset) if limit is None else min(limit, len(dataset))
    texts = []
    for idx in range(n):
        layers = dataset.get(idx, layer_tags=[
            'monochrome', 'paragraph', 'line', 'char'])

        ts = dt.now()
        cropped = crop_paragraphs(layers['paragraph'],
                                  [layers['monochrome'], layers['line'],
                                   layers['char']])
        cropped = [
            [make_divisible_by(t, 16, 16) for t in arrays]
            for arrays in cropped
        ]
        timers['ParagraphCrop'] += dt.now() - ts

        ts = dt.now()
        lines = crop_lines(cropped[1], [cropped[0], cropped[2]])
        timers['LineCrop'] += dt.now() - ts

        ts = dt.now()
        labels = label_char(lines[1])
        timers['CharLabel'] += dt.now() - ts

        ts = dt.now()
        text = pred_to_text(labels)
        timers['PredToText'] += dt.now() - ts
        texts.append(text)

    if save_text:
        OUTPUT_PATH.mkdir(parents=True, exist_ok=True)
        with open(OUTPUT_PATH / 'decoded.txt', 'w') as fp:
            for idx, text in enumerate(texts):
                print(f'=== page {idx} ===', file=fp)
                for p_id, para in enumerate(text):
                    for l_id, line in enumerate(para):
                        print(f'[{p_id}][{l_id}] {line}', file=fp)

    return timers


def main(use_gpu=False, limit=10):
    dataset = train_dataset()
    limit = int(limit)

    for backend_name, backend_setter in [
            ('threading', MP.use_threading),
            ('multiprocessing', MP.use_multiprocessing)]:
        backend_setter()
        for workers in [1, 2, 4]:
            ts = dt.now()
            timers = run_chain(dataset, workers, limit=limit,
                               save_text=(backend_name == 'threading'
                                          and workers == 4))
            total = dt.now() - ts
            stages = ', '.join(f'{k}={v}' for k, v in timers.items())
            print(f'{backend_name} x{workers}: total={total} | {stages}')
    MP.use_threading()


if __name__ == '__main__':
    main()
