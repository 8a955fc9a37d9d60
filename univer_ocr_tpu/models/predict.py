"""`run predict`: load checkpoint, run the full cascade on one image,
write X.png + result.txt (reference my_model/predict.py)."""

import json
import random

from PIL import Image

from ..nn.backend import DB
from ..utils.cache import enable_persistent_cache
from .constants import (MODEL_WEIGHTS_FILE_PATH, PREDICTION_RESULT_PATH,
                        PREDICTION_SOURCE_PATH)
from .datasets import encode_X, validation_dataset
from .model import make_divisible_by, make_model_system


def load_model_system(input_shape):
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH, 'r'))
    except OSError:
        print('No model_weights.json file found')
        weights = {}

    model_system, models, *_ = make_model_system(input_shape)
    for model in models.values():
        model.set_weights(weights)
    return model_system


def main(use_gpu=False, filename=None):
    enable_persistent_cache()
    if use_gpu:
        DB.use_tpu()
        print('Using accelerator')
    else:
        DB.use_cpu()
        print('Using CPU')

    if filename is None:
        dataset = validation_dataset()
        print('Using validation dataset')

        idx = random.randint(0, len(dataset) - 1)
        print(f'Data #{idx}')

        layer_images = dataset.get_images(idx, ['image'])
        X_image = layer_images['image']

    else:
        print(f'Using file {filename}')
        X_image = Image.open(PREDICTION_SOURCE_PATH / filename)

    X = encode_X(X_image.convert('L'))
    X = make_divisible_by(X, 16, 16)
    context = {}
    context['monochrome_X'] = X

    input_shape = X.shape
    print(f'Input shape: {input_shape}')

    model_system = load_model_system(input_shape)
    model_system.predict(context)

    pred_text = context['text']

    save_path = PREDICTION_RESULT_PATH
    save_path.mkdir(parents=True, exist_ok=True)
    X_image.save(save_path / 'X.png')

    with open(save_path / 'result.txt', 'w') as fp:
        print(pred_text, file=fp)


if __name__ == '__main__':
    main()
