"""Parallel synthetic-page generation (reference train_data_generator.py).

N daemon worker processes render pages with PIL and push encoded tensors
into a bounded queue — the host-side input pipeline that feeds TPU steps
(the reference used the same pattern to feed its GPU, :44-87).
"""

import os
import random
from multiprocessing import Event, Process, Queue
from queue import Empty, Full

import numpy as np

from ..image_generator import LayeredImage, random_font, random_text
from .constants import LAYER_NAMES, LAYER_TAGS


def generate_picture(width, height, rotate=False):
    """White page, up to 100 random paragraphs (>=1 guaranteed), optional
    rotation, /16 padding (reference :12-21)."""
    bg_color = (255, 255, 255, 255)
    layers = LayeredImage(width, height, bg_color)
    while layers.paragraphs_added == 0:
        for _ in range(100):
            layers.add_paragraph(random_text(), random_font(12, 36))
    if rotate:
        layers = layers.rotate(random.uniform(0, 360))
    layers = layers.make_divisible_by(16, 16)
    return layers.get_raw()


def encode_layers(images):
    """PIL layer images -> {tag: (1, H, W, C) float array} (reference :24-37)."""
    layers = {}
    for tag in LAYER_TAGS:
        layer = np.array([
            np.asarray(images[layer_name].convert('L'))
            for layer_name in LAYER_NAMES[tag]
            if layer_name in images.keys()
        ])
        if layer.shape == (0,):
            continue
        layer = np.moveaxis(layer, 0, -1)
        layer = np.reshape(layer, (1, *layer.shape)) / 255
        layers[tag] = layer
    return layers


def generate_train_data(width, height, rotate=False):
    return encode_layers(generate_picture(width, height, rotate))


class DataGenerator:
    """min(queue_size, cpu) daemon processes producing into a bounded queue
    (reference :44-87)."""

    def __init__(self, queue_size=None, generator_func=generate_train_data,
                 func_args=(), func_kwargs={}):
        self.queue_size = os.cpu_count() if queue_size is None else queue_size
        self.generator_func = generator_func
        self.func_args = func_args
        self.func_kwargs = func_kwargs
        self.done = Event()
        self.data_queue = Queue(maxsize=self.queue_size)
        self.workers = [
            Process(target=self._run, daemon=True, args=(
                self.done, self.data_queue,
                self.generator_func, self.func_args, self.func_kwargs))
            for _ in range(min(self.queue_size, os.cpu_count()))
        ]

    def start(self):
        self.done.clear()
        for worker in self.workers:
            worker.start()

    def stop(self):
        self.done.set()

    @staticmethod
    def _run(done, queue, generator_func, func_args, func_kwargs):
        # re-seed per worker so parallel workers produce distinct pages
        random.seed(os.getpid() ^ int.from_bytes(os.urandom(4), 'little'))
        np.random.seed(os.getpid() & 0x7fffffff)
        train_data = None
        while not done.is_set():
            if train_data is None:
                train_data = generator_func(*func_args, **func_kwargs)
            try:
                queue.put(train_data, timeout=0.1)
                train_data = None
            except Full:
                pass

    def get_data(self):
        result = None
        while result is None and not self.done.is_set():
            try:
                result = self.data_queue.get(timeout=0.1)
            except Empty:
                pass
        return result
