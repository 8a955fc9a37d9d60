"""Datasets over the synthetic page corpus.

Three sources behind one interface — PNG layers on disk, on-the-fly
rendering, random subset views — plus the array<->image codecs the web
views and progress dumps share (the surface of reference
my_model/datasets.py, reorganized around a single codec helper and
in-memory caching: PNG decode dominated the reference's per-step host
time on a ~100-page corpus that easily fits in RAM)."""

import random

import numpy as np
from PIL import Image

from .constants import (LAYER_NAMES, LAYER_NAMES_PLAIN, LAYER_TAGS,
                        TRAIN_DATA_PATH, TRAIN_DATASET_LENGTH,
                        VALIDATION_DATA_PATH, VALIDATION_DATASET_LENGTH)
from .train_data_generator import encode_layers, render_page

# ---------------------------------------------------------------------------
# Array <-> image codecs
# ---------------------------------------------------------------------------


def _to_unit_nhwc(plane):
    """2D uint8 grid -> (1, H, W, 1) float in [0, 1]."""
    plane = np.asarray(plane)
    return plane.reshape((1,) + plane.shape + (1,)) / 255.0


def encode_X(image):
    """PIL L image -> (1, H, W, 1) float input tensor."""
    return _to_unit_nhwc(image)


def decode_X(X):
    """Input tensor (or a singleton list of one) -> PIL L image."""
    if isinstance(X, list):
        X = X[0]
    grid = np.asarray(X)[0, :, :, 0] * 255
    return Image.fromarray(grid.astype(np.uint8))


def encode_ys(images):
    """Flat list of per-layer PIL images (LAYER_TAGS order) -> list of
    (1, H, W, C) float targets, one per tag."""
    ys = []
    flat = iter(images)
    for tag in LAYER_TAGS:
        group = [np.asarray(next(flat)) for _ in LAYER_NAMES[tag]]
        ys.append(np.stack(group, axis=-1)[None] / 255.0)
    return ys


def _channel_images(grid, normalize):
    """One 2D float map -> (raw PIL image, thresholded-at-mean image)."""
    grid = np.asarray(grid, np.float64)
    if normalize:
        grid = grid - grid.min()
        peak = grid.max()
        if not np.isclose(peak, 0):
            grid = grid / peak
    binary = (grid >= grid.mean()).astype(np.uint8) * 255
    return (Image.fromarray((grid * 255).astype(np.uint8)),
            Image.fromarray(binary))


def decode_y(y, normalize=False, four_dims=True):
    """Prediction channels -> (images, thresholded-at-mean images)."""
    y = np.asarray(y)
    channels = ([y[0, :, :, i] for i in range(y.shape[-1])]
                if four_dims else [y])
    decoded = [_channel_images(c, normalize) for c in channels]
    return [d[0] for d in decoded], [d[1] for d in decoded]


def decode_ys(ys, normalize=False):
    """Per-tag predictions -> flat (images, thresholded images) lists."""
    pred_images, thresholded_images = [], []
    for y in ys:
        raw, binary = decode_y(y, normalize)
        pred_images += raw
        thresholded_images += binary
    return pred_images, thresholded_images


def get_layer_names(layer_tags=None):
    tags = LAYER_TAGS if layer_tags is None else layer_tags
    return [name for tag in LAYER_TAGS if tag in tags
            for name in LAYER_NAMES[tag]]


# ---------------------------------------------------------------------------
# Dataset sources
# ---------------------------------------------------------------------------


class BaseDataset:
    """A sized source of per-page layer images; `get` returns them
    encoded as {tag: (1, H, W, C) float} ready for the model system."""

    def __init__(self, size):
        self.size = size

    def __len__(self):
        return self.size

    def get(self, idx, layer_images=None, layer_tags=None):
        if layer_images is None:
            layer_images = self.get_images(idx, layer_tags=layer_tags)
        elif layer_tags is not None:
            keep = set(get_layer_names(layer_tags))
            layer_images = {name: img for name, img in layer_images.items()
                            if name in keep}
        return encode_layers(layer_images)

    def get_images(self, idx, layer_tags=None):
        raise NotImplementedError()


class Dataset(BaseDataset):
    """`{idx}_{layer_name}.png` files under a directory, decoded lazily
    and cached in memory."""

    def __init__(self, size, dirpath, cache=True):
        super().__init__(size)
        self.dirpath = dirpath
        self._cache = {} if cache else None

    def _load(self, idx, layer_name):
        key = (idx, layer_name)
        if self._cache is not None and key in self._cache:
            return self._cache[key]
        img = Image.open(
            self.dirpath / f'{idx}_{layer_name}.png').convert('L')
        if self._cache is not None:
            self._cache[key] = img
        return img

    def get_images(self, idx, layer_tags=None):
        keep = (set(get_layer_names(layer_tags))
                if layer_tags is not None else None)
        return {name: self._load(idx, name)
                for name in LAYER_NAMES_PLAIN
                if keep is None or name in keep}


class GeneratorDataset(BaseDataset):
    """Pages rendered on demand (no disk corpus needed)."""

    def __init__(self, size, width, height):
        super().__init__(size)
        self.width = width
        self.height = height

    def get_images(self, idx, layer_tags=None, width=None, height=None,
                   rotate=False):
        picture = render_page(width or self.width, height or self.height,
                              rotate)
        keep = set(get_layer_names(layer_tags))
        return {name: img.convert('L') for name, img in picture.items()
                if name in keep}


class RandomSelectDataset(BaseDataset):
    """A random fixed subset of another dataset (the reference drew
    50-page training subsets per curriculum stage this way)."""

    def __init__(self, size, source_dataset):
        super().__init__(size)
        self.source_dataset = source_dataset
        self.selected = random.sample(range(len(source_dataset)), size)

    def get_images(self, idx, layer_tags=None):
        return self.source_dataset.get_images(self.selected[idx],
                                              layer_tags=layer_tags)


def _corpus_or_generator(length, dirpath):
    """The on-disk PNG corpus when `run generate_data` has produced it;
    otherwise render pages on demand at the corpus dimensions (720x480,
    generate_data.py) so training works from a clean checkout."""
    if (dirpath / '0_image.png').exists():
        return Dataset(length, dirpath)
    return GeneratorDataset(length, 720, 480)


def train_dataset():
    return _corpus_or_generator(TRAIN_DATASET_LENGTH, TRAIN_DATA_PATH)


def validation_dataset():
    return _corpus_or_generator(VALIDATION_DATASET_LENGTH,
                                VALIDATION_DATA_PATH)
