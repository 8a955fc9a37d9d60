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


#: Char-stage width menu: every line pads to the next entry, so a whole
#: run compiles at most len(menu) char programs (widths past the last
#: entry round up to its multiple).
CHAR_WIDTH_MENU = (256, 512, 1024, 2048)


def line_shape_menu(page_shape):
    """Canonical (H, W) menu for paragraph crops: two small entries cover
    most paragraphs, the last fits any crop of a page padded by the
    16-px stack margin.  Serving (pipeline.py) and batched training
    (dp_train.py) share this menu so they hit the same compiled programs.
    """
    max_shape = (round_up(page_shape[1] + 16, 128),
                 round_up(page_shape[2] + 16, 128))
    return [(128, 256), (256, 512), max_shape]


def pick_line_shape(menu, h, w):
    """Smallest menu entry containing (h, w); falls back to the last."""
    for hb, wb in menu:
        if h <= hb and w <= wb:
            return (hb, wb)
    return menu[-1]


def pick_char_width(w):
    """Smallest CHAR_WIDTH_MENU entry >= w, else round up to the last
    entry's multiple (one extra program per oversized width)."""
    for wb in CHAR_WIDTH_MENU:
        if w <= wb:
            return wb
    return round_up(w, CHAR_WIDTH_MENU[-1])


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
