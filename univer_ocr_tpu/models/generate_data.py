"""`run generate_data`: render the train/validation page corpora to PNG
layer files (reference my_model/generate_data.py)."""

try:
    from tqdm import tqdm
except ImportError:          # pragma: no cover
    def tqdm(x, *a, **k):
        return x

from .constants import (TRAIN_DATA_PATH, TRAIN_DATASET_LENGTH,
                        VALIDATION_DATA_PATH, VALIDATION_DATASET_LENGTH)
from .train_data_generator import DataGenerator, generate_picture


def main(*args, **kwargs):
    data_generator = DataGenerator(
        generator_func=generate_picture, func_args=(720, 480, False))
    data_generator.start()

    TRAIN_DATA_PATH.mkdir(parents=True, exist_ok=True)
    VALIDATION_DATA_PATH.mkdir(parents=True, exist_ok=True)

    for i in tqdm(range(TRAIN_DATASET_LENGTH)):
        images = data_generator.get_data()
        for layer_name, image in images.items():
            image.save(TRAIN_DATA_PATH / f'{i}_{layer_name}.png')

    for i in tqdm(range(VALIDATION_DATASET_LENGTH)):
        images = data_generator.get_data()
        for layer_name, image in images.items():
            image.save(VALIDATION_DATA_PATH / f'{i}_{layer_name}.png')

    data_generator.stop()


if __name__ == '__main__':
    main()
