"""Copy one training iteration's progress PNGs into a flat directory
(reference single_iteration_from_train_progress.py:9-27)."""

import os
import shutil
import sys

from univer_ocr_tpu.models.constants import (
    SINGLE_ITERATION_FROM_TRAIN_PROGRESS_PATH, TRAIN_PROGRESS_PATH)


def main(epoch_id, train_val='train', iter_id=0):
    epoch_id = int(epoch_id)
    assert train_val in ['train', 'validation']
    iter_id = int(iter_id)

    if SINGLE_ITERATION_FROM_TRAIN_PROGRESS_PATH.exists():
        for fpath in SINGLE_ITERATION_FROM_TRAIN_PROGRESS_PATH.iterdir():
            os.remove(fpath)
    else:
        os.makedirs(SINGLE_ITERATION_FROM_TRAIN_PROGRESS_PATH, exist_ok=True)

    for picture_type in TRAIN_PROGRESS_PATH.iterdir():
        for i, pic in enumerate(['X', 'y', 'pred', 'thresholded']):
            pic_path = picture_type / (
                f'{epoch_id}_{train_val}_{iter_id}_{i + 1}_{pic}.png')
            if not pic_path.exists():
                continue
            new_path = SINGLE_ITERATION_FROM_TRAIN_PROGRESS_PATH / (
                f'{epoch_id}_{train_val}_{iter_id}_{picture_type.name}_'
                f'{i + 1}_{pic}.png')
            shutil.copyfile(pic_path, new_path)


if __name__ == '__main__':
    main(*sys.argv[1:])
