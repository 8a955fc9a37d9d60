"""Host-side synthetic page feed.

The reference streamed pages one at a time from daemon worker processes
into a bounded queue to keep its GPU fed (reference
my_model/train_data_generator.py:44-87).  The TPU build keeps the same
role — PIL rendering is host work and must overlap device compute — but
is organized around the way device steps consume data:

  * `render_page` is the single-page renderer (placement loop, optional
    whole-page rotation, /16 padding), usable synchronously anywhere;
  * `DataGenerator` is the parallel feed: a pool of render processes
    with explicit per-worker RNG streams and a bounded queue for
    backpressure (rendering halts while the consumer is behind, so a
    slow step never piles up hundreds of pages of host memory);
  * `get_batch(n)` assembles fixed-count batches for batched/DP train
    steps (the reference fed batch-1; see parallel/data_parallel.py).
"""

import os
import random
from multiprocessing import Event, Process, Queue
from queue import Empty, Full

import numpy as np

from ..image_generator import LayeredImage, random_font, random_text
from .constants import LAYER_NAMES, LAYER_TAGS

PAGE_BACKGROUND = (255, 255, 255, 255)
#: placement attempts per round before re-checking that anything landed
PLACEMENT_ROUND = 100


def render_page(width, height, rotate=False, min_font=12, max_font=36):
    """Render one synthetic page: random paragraphs are placed in rounds
    of PLACEMENT_ROUND collision-checked attempts until at least one
    fits, then the page is optionally rotated and padded to /16
    (the contract of reference train_data_generator.py:12-21).

    Returns the raw {layer_name: PIL image} dict."""
    page = LayeredImage(width, height, PAGE_BACKGROUND)
    attempts = 0
    while True:
        page.add_paragraph(random_text(), random_font(min_font, max_font))
        attempts += 1
        if attempts % PLACEMENT_ROUND == 0 and page.paragraphs_added > 0:
            break
    if rotate:
        page = page.rotate(random.uniform(0, 360))
    return page.make_divisible_by(16, 16).get_raw()


def generate_picture(width, height, rotate=False):
    """Reference-named alias of render_page (run.py surface parity)."""
    return render_page(width, height, rotate)


def encode_layers(images):
    """{layer_name: PIL image} -> {tag: (1, H, W, C) float array in
    [0, 1]}, channels stacked in LAYER_NAMES order per tag (the array
    contract of reference train_data_generator.py:24-37)."""
    encoded = {}
    for tag in LAYER_TAGS:
        planes = [np.asarray(images[name].convert('L'))
                  for name in LAYER_NAMES[tag] if name in images]
        if planes:
            encoded[tag] = np.stack(planes, axis=-1)[None] / 255.0
    return encoded


def generate_train_data(width, height, rotate=False):
    """Rendered page as encoded tag arrays (the default worker task)."""
    return encode_layers(render_page(width, height, rotate))


def _feed_worker(stop, sink, seed, task, args, kwargs):
    """Render loop of one feed process: seed this worker's RNG streams,
    then produce into the bounded queue until told to stop.  A full
    queue blocks production — that is the backpressure."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 31))
    item = None
    while not stop.is_set():
        if item is None:
            item = task(*args, **kwargs)
        try:
            sink.put(item, timeout=0.2)
        except Full:
            continue
        item = None


class DataGenerator:
    """Parallel page feed with bounded buffering.

    `workers` render processes (default: one per CPU, capped by the
    buffer size) stream `generator_func(*func_args, **func_kwargs)`
    results into a queue of `queue_size` slots.  Each worker gets a
    distinct seed derived from `seed` (or from OS entropy), so parallel
    streams never duplicate pages and a fixed seed reproduces the feed.
    """

    def __init__(self, queue_size=None, generator_func=generate_train_data,
                 func_args=(), func_kwargs=None, workers=None, seed=None):
        self.queue_size = queue_size or os.cpu_count()
        n_workers = min(workers or os.cpu_count(), self.queue_size)
        self.done = Event()
        self.data_queue = Queue(maxsize=self.queue_size)
        if seed is None:
            seed = int.from_bytes(os.urandom(4), 'little')
        self.workers = [
            Process(target=_feed_worker, daemon=True,
                    args=(self.done, self.data_queue, seed + 977 * i,
                          generator_func, func_args, func_kwargs or {}))
            for i in range(n_workers)
        ]

    # -- lifecycle ----------------------------------------------------
    def start(self):
        self.done.clear()
        for proc in self.workers:
            proc.start()
        return self

    def stop(self):
        self.done.set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- consumption --------------------------------------------------
    def get_data(self):
        """One item; returns None only after stop() with a drained
        queue."""
        while not self.done.is_set():
            try:
                return self.data_queue.get(timeout=0.2)
            except Empty:
                continue
        try:
            return self.data_queue.get_nowait()
        except Empty:
            return None

    def get_batch(self, n):
        """Exactly n items, for batched/data-parallel device steps."""
        batch = []
        while len(batch) < n:
            item = self.get_data()
            if item is None:
                break
            batch.append(item)
        return batch

    def __iter__(self):
        while True:
            item = self.get_data()
            if item is None:
                return
            yield item
