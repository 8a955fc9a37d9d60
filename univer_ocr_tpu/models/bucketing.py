"""Shape-bucketing helpers: bound XLA recompilation over variable shapes.

Paragraph and line crops vary per page, and every distinct shape is a new
XLA compilation (SURVEY §7 "hard parts").  Bucketing rounds shapes up to a
bucket multiple so one compiled program serves many crop sizes.

Plain pad-and-trim (`pad_to_bucket` + `trim_*`) is only exact for a
*single* linear+pointwise stage: in a multi-layer conv stack the bias makes
the padded region nonzero, and the next layer's boundary reads those values
instead of the implicit zero padding of the unpadded computation.  The
cascade's bucketed inference therefore uses the masked forward paths in
fastpath.py, which re-zero the invalid region after every conv and are
exactly equivalent (asserted by tests/test_cascade.py).
"""

import numpy as np


def round_up(n, multiple):
    return -(-n // multiple) * multiple


def pad_to_bucket(arr, h_multiple=None, w_multiple=None):
    """Right/bottom zero-pad NHWC H/W to bucket multiples.

    Returns (padded, (orig_h, orig_w)).
    """
    arr = np.asarray(arr)
    b, h, w, c = arr.shape
    nh = round_up(h, h_multiple) if h_multiple else h
    nw = round_up(w, w_multiple) if w_multiple else w
    if nh == h and nw == w:
        return arr, (h, w)
    out = np.zeros((b, nh, nw, c), dtype=arr.dtype)
    out[:, :h, :w, :] = arr
    return out, (h, w)


def trim_nhwc(arr, h, w):
    return arr[:, :h, :w, :]


def trim_rows(arr, n):
    """Trim the leading batch rows (Char model: width -> batch)."""
    return arr[:n]
