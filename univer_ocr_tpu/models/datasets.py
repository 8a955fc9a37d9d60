"""Datasets: disk-backed PNG layers, on-the-fly generation, random subsets
(reference my_model/datasets.py)."""

import random

import numpy as np
from PIL import Image

from .constants import (LAYER_NAMES, LAYER_NAMES_PLAIN, LAYER_TAGS,
                        TRAIN_DATA_PATH, TRAIN_DATASET_LENGTH,
                        VALIDATION_DATA_PATH, VALIDATION_DATASET_LENGTH)
from .train_data_generator import encode_layers, generate_picture


def encode_X(image):
    """PIL L image -> (1, H, W, 1) float in [0, 1] (reference :16-19)."""
    X = np.asarray(image)
    X = np.reshape(X, (1, *X.shape, 1)) / 255
    return X


def decode_X(X):
    if isinstance(X, list):
        X = X[0]
    X = np.asarray(X[0, :, :, 0] * 255).astype(np.uint8)
    return Image.fromarray(X)


def encode_ys(images):
    ys = []
    idx = 0
    for tag in LAYER_TAGS:
        y = []
        for _ in LAYER_NAMES[tag]:
            y.append(np.asarray(images[idx]))
            idx += 1
        y = np.moveaxis(np.array(y), 0, -1)
        y = np.reshape(y, (1, *y.shape)) / 255
        ys.append(y)
    return ys


def decode_y(y, normalize=False, four_dims=True):
    """Prediction channels -> (images, thresholded-at-mean images)
    (reference :44-65)."""
    pred_images = []
    thresholded_images = []
    y = np.asarray(y)
    if four_dims:
        y = [y[0, :, :, i] for i in range(y.shape[-1])]
    else:
        y = [y]
    for yi in y:
        yi = np.array(yi, dtype=np.float64)
        if normalize:
            yi -= np.min(yi)
            max_val = np.max(yi)
            if not np.isclose(max_val, 0):
                yi /= max_val
        cm = np.mean(yi)
        thresholded = ((yi >= cm) * 255).astype(np.uint8)
        yi = (yi * 255).astype(np.uint8)
        pred_images.append(Image.fromarray(yi))
        thresholded_images.append(Image.fromarray(thresholded))
    return pred_images, thresholded_images


def decode_ys(ys, normalize=False):
    pred_images = []
    thresholded_images = []
    for y in ys:
        p, th = decode_y(y, normalize)
        pred_images.extend(p)
        thresholded_images.extend(th)
    return pred_images, thresholded_images


def get_layer_names(layer_tags=None):
    return [
        name
        for tag in LAYER_TAGS
        if layer_tags is None or tag in layer_tags
        for name in LAYER_NAMES[tag]
    ]


class BaseDataset:
    def __init__(self, size):
        self.size = size

    def get(self, idx, layer_images=None, layer_tags=None):
        if layer_images is None:
            layer_images = self.get_images(idx, layer_tags=layer_tags)
        elif layer_tags is not None:
            layer_names = get_layer_names(layer_tags)
            layer_images = {name: layer_images[name] for name in layer_names}
        return encode_layers(layer_images)

    def get_images(self, idx, layer_tags=None):
        raise NotImplementedError()

    def __len__(self):
        return self.size


class Dataset(BaseDataset):
    """Reads `{idx}_{layer_name}.png` files (reference :108-124).

    Decoded images are cached in memory: the trainer touches every sample
    every epoch, and PNG decode dominated the reference's per-step host
    time (the corpus is ~100 pages — it fits)."""

    def __init__(self, size, dirpath, cache=True):
        super().__init__(size)
        self.dirpath = dirpath
        self._cache = {} if cache else None

    def get_images(self, idx, layer_tags=None):
        layer_names = get_layer_names(layer_tags)
        wanted = [name for name in LAYER_NAMES_PLAIN
                  if layer_tags is None or name in layer_names]
        images = {}
        for layer_name in wanted:
            key = (idx, layer_name)
            if self._cache is not None and key in self._cache:
                images[layer_name] = self._cache[key]
                continue
            img = Image.open(
                self.dirpath / f'{idx}_{layer_name}.png').convert('L')
            if self._cache is not None:
                self._cache[key] = img
            images[layer_name] = img
        return images


class GeneratorDataset(BaseDataset):
    """On-the-fly page generation (reference :127-143)."""

    def __init__(self, size, width, height):
        super().__init__(size)
        self.width = width
        self.height = height

    def get_images(self, idx, layer_tags=None, width=None, height=None,
                   rotate=False):
        width = self.width if width is None else width
        height = self.height if height is None else height
        picture = generate_picture(width, height, rotate)
        layer_names = get_layer_names(layer_tags)
        return {
            layer_name: image.convert('L')
            for layer_name, image in picture.items()
            if layer_name in layer_names
        }


class RandomSelectDataset(BaseDataset):
    """Random distinct-index subset view (reference :146-157)."""

    def __init__(self, size, source_dataset):
        super().__init__(size)
        self.source_dataset = source_dataset
        self.selected = []
        while len(self.selected) < self.size:
            idx = random.choice(range(len(source_dataset)))
            if idx not in self.selected:
                self.selected.append(idx)

    def get_images(self, idx, layer_tags=None):
        return self.source_dataset.get_images(self.selected[idx],
                                              layer_tags=layer_tags)


def train_dataset():
    return Dataset(TRAIN_DATASET_LENGTH, TRAIN_DATA_PATH)


def validation_dataset():
    return Dataset(VALIDATION_DATASET_LENGTH, VALIDATION_DATA_PATH)
