"""Device-resident cascade: crop, deskew, and zoom as TPU gathers.

The reference pipeline ships the monochrome map to the host between every
model and does all inter-stage CV there (reference interpreter.py:195-523:
paragraph crop + ndimage.rotate deskew, line crop + ndimage.zoom).  Over a
tunneled TPU the D2H of the monochrome map is the dominant cost of the
whole cascade (BASELINE.md round 1) while the chip sits idle.

This module keeps every image tensor in HBM for the cascade's lifetime.
The host sees only *bit-packed masks* (paragraph mask, line band masks —
1/32nd the f32 bytes) and decides geometry; the pixels it used to crop and
resample on the CPU are instead gathered on device:

  * `rotated_paragraph_crops` — the equivalent of crop + blob-mask +
    `ndimage.rotate(order=1)` + rotated-bbox slice, as ONE fused bilinear
    gather from the monochrome page stack.  The output->input affine uses
    scipy's exact rotate convention (out = ptp(R @ corners) + 0.5; offset =
    in_center - R @ out_center), computed per sample on the host.
  * `zoomed_line_crops` — the equivalent of line-bbox crop + `np.rot90`
    orientation fix + `ndimage.zoom(order=0)` + min-width pad, as one
    nearest gather from the device-resident paragraph crops (scipy's
    endpoint-aligned (in-1)/(out-1) zoom mapping, floor(x+0.5) rounding).

Both compose with the masked Line/Char forwards (fastpath.py) into single
fused programs, so a page makes exactly one H2D trip (the page itself) and
the per-stage D2H is packed masks and int32 char ids.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..ops import precision as precision_policy
from .fastpath import _mask_hw, line_forward_masked

# ---------------------------------------------------------------------------
# Host-side geometry (scipy conventions, computed per sample)
# ---------------------------------------------------------------------------


def rotate_affine(angle_deg, in_h, in_w):
    """Output shape and output->input affine of
    `scipy.ndimage.rotate(angle, axes=(2, 1), reshape=True)` on an
    (in_h, in_w) plane: in = R @ out + offset."""
    if angle_deg is None:
        return (in_h, in_w), (1.0, 0.0), (0.0, 0.0)
    rad = np.deg2rad(angle_deg)
    cos_a, sin_a = float(np.cos(rad)), float(np.sin(rad))
    rot = np.array([[cos_a, sin_a], [-sin_a, cos_a]])
    corners = rot @ np.array([[0, 0, in_h, in_h], [0, in_w, 0, in_w]], float)
    out_shape = (np.ptp(corners, axis=1) + 0.5).astype(int)
    offset = ((np.array([in_h, in_w]) - 1) / 2.0
              - rot @ ((out_shape - 1) / 2.0))
    return ((int(out_shape[0]), int(out_shape[1])),
            (cos_a, sin_a), (float(offset[0]), float(offset[1])))


#: inverse affine of np.rot90(k, axes=(2, 1)) per k on an (h, w) plane:
#: rotated[yr, xr] == original[ys, xs] with
#: ys = A[0]*yr + A[1]*xr + A[2](h, w), xs = A[3]*yr + A[4]*xr + A[5](h, w)
_ROT90_INVERSE = {
    0: lambda h, w: (1, 0, 0, 0, 1, 0),
    1: lambda h, w: (0, -1, h - 1, 1, 0, 0),
    2: lambda h, w: (-1, 0, h - 1, 0, -1, w - 1),
    3: lambda h, w: (0, 1, 0, -1, 0, w - 1),
}


def rot90_inverse_affine(rotation, h, w):
    """Inverse index map of `rotate_array(x, rotation)` for right-angle
    rotations (np.rot90 with k = (4 - rotation//90) % 4).  Returns the
    rotated shape and the 6 affine coefficients."""
    k = 0 if rotation is None else (4 - int(rotation) // 90) % 4
    out_shape = (h, w) if k % 2 == 0 else (w, h)
    return out_shape, _ROT90_INVERSE[k](h, w)


def zoom_output_width(w, zoom):
    """scipy.ndimage.zoom output length for one axis."""
    return int(round(w * zoom))


def zoom_ratio(in_len, out_len):
    """scipy's endpoint-aligned coordinate ratio (grid_mode=False)."""
    if out_len <= 1:
        return 0.0
    return (in_len - 1) / (out_len - 1)


# ---------------------------------------------------------------------------
# Device gathers
# ---------------------------------------------------------------------------


def rotated_paragraph_crops(mono_stack, blob_bits, page_idx,
                            src_y0, src_x0, src_h, src_w,
                            cos_a, sin_a, off_y, off_x,
                            out_y0, out_x0, out_h, out_w,
                            pad_y, pad_x):
    """Deskewed, blob-masked paragraph crops as one bilinear gather.

    Equivalent to crop_and_rotate_single_paragraph (interpreter.py) on the
    monochrome map: (mono * blob)[bbox] rotated by the deskew angle and
    sliced to the rotated-mask bbox — but computed as a gather from the
    device-resident page stack, zero-padded into a static (B, HB, WB, 1)
    bucket.

    mono_stack : (N, H, W, 1) f32 monochrome predictions (device).
    blob_bits  : (B, HB, WB//8) uint8 — paragraph blob mask of each
                 sample's bbox, bit-packed along width, zero-padded.
    page_idx   : (B,) int32 page of each paragraph.
    src_*      : (B,) int32 paragraph bbox (y0, x0, h, w) in page coords.
    cos/sin/off: (B,) f32 scipy rotate affine (out -> in, bbox-local).
    out_y0/x0  : (B,) int32 rotated-mask bbox offset in the rotated grid.
    out_h/out_w: (B,) int32 rotated-mask bbox extent — output is zeroed
                 beyond it (the host path's bbox slice; bilinear support
                 can bleed one pixel past the order-0 mask bbox).
    pad_y/pad_x: (B,) int32 placement offset of the content inside the
                 bucket, replicating make_divisible_by's CENTER padding
                 (model.py:57-69) — the stride-2 Line convs are phase
                 sensitive, so the placement must match the host path.
    """
    B, HB = blob_bits.shape[0], blob_bits.shape[1]
    WB = blob_bits.shape[2] * 8
    blob = jnp.unpackbits(blob_bits, axis=2).astype(jnp.float32)  # (B,HB,WB)

    def col(v, dtype=jnp.float32):
        return jnp.asarray(v, dtype).reshape(B, 1, 1)

    grid_y = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 1)
              + col(out_y0) - col(pad_y))
    grid_x = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 2)
              + col(out_x0) - col(pad_x))
    cos_c, sin_c = col(cos_a), col(sin_a)
    in_y = cos_c * grid_y + sin_c * grid_x + col(off_y)
    in_x = -sin_c * grid_y + cos_c * grid_x + col(off_x)

    y_floor = jnp.floor(in_y)
    x_floor = jnp.floor(in_x)
    wy = in_y - y_floor
    wx = in_x - x_floor
    y_base = y_floor.astype(jnp.int32)
    x_base = x_floor.astype(jnp.int32)

    pages = mono_stack[:, :, :, 0]
    page_h, page_w = pages.shape[1], pages.shape[2]
    b_idx = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 0)
    page = page_idx.reshape(B, 1, 1).astype(jnp.int32)
    sy0, sx0 = (col(src_y0, jnp.int32), col(src_x0, jnp.int32))
    sh, sw = (col(src_h, jnp.int32), col(src_w, jnp.int32))

    # scipy mode='constant': a coordinate anywhere outside [0, size-1] is
    # entirely cval (no partial edge interpolation)
    sh_f, sw_f = col(src_h), col(src_w)
    in_domain = ((in_y >= 0) & (in_y <= sh_f - 1)
                 & (in_x >= 0) & (in_x <= sw_f - 1))

    def corner(dy, dx):
        # in-domain coords have all four corners within [0, size-1] after
        # clamping (the +1 corner only exceeds it with zero weight)
        yy = jnp.minimum(y_base + dy, sh - 1)
        xx = jnp.minimum(x_base + dx, sw - 1)
        yy = jnp.maximum(yy, 0)
        xx = jnp.maximum(xx, 0)
        yb = jnp.clip(yy, 0, HB - 1)
        xb = jnp.clip(xx, 0, WB - 1)
        yp = jnp.clip(sy0 + yy, 0, page_h - 1)
        xp = jnp.clip(sx0 + xx, 0, page_w - 1)
        return pages[page, yp, xp] * blob[b_idx, yb, xb]

    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bottom = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    value = top * (1 - wy) + bottom * wy

    out_rows = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 1)
    out_cols = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 2)
    py, px = col(pad_y, jnp.int32), col(pad_x, jnp.int32)
    in_slice = ((out_rows >= py) & (out_rows < py + col(out_h, jnp.int32))
                & (out_cols >= px) & (out_cols < px + col(out_w, jnp.int32)))
    return jnp.where(in_domain & in_slice, value, 0.0)[..., None]


def zoomed_line_crops(crop_stack, para_idx,
                      ratio_y, ratio_x, w_out,
                      a_yy, a_yx, b_y, a_xy, a_xx, b_x,
                      out_h, out_w):
    """Zoomed line crops as one nearest gather from the paragraph crops.

    Equivalent to crop_lines_of_paragraph's per-line bbox crop + rot90
    orientation fix + ndimage.zoom(order=0) + zero min-width pad
    (pipeline.py) — composed into a single integer index map evaluated on
    device.  Output is (Bl, out_h, out_w, 1) with columns >= w_out zeroed.

    crop_stack : (P, HB, WB, 1) f32 rotated paragraph crops (device).
    para_idx   : (Bl,) int32 source crop of each line.
    ratio_y/x  : (Bl,) f32 scipy zoom coordinate ratios per axis.
    w_out      : (Bl,) int32 true zoomed width of each line.
    a_*/b_*    : (Bl,) int32 rot90-inverse affine composed with the line
                 bbox offset (maps post-rot90 coords to crop coords).
    out_h/out_w: static output bucket dims (32, width-menu entry).
    """
    Bl = para_idx.shape[0]
    shape = (Bl, out_h, out_w)

    def col(v, dtype):
        return jnp.asarray(v, dtype).reshape(Bl, 1, 1)

    grid_y = lax.broadcasted_iota(jnp.float32, shape, 1)
    grid_x = lax.broadcasted_iota(jnp.float32, shape, 2)
    # scipy zoom: in = out * ratio, spline order 0 rounds via floor(x+0.5)
    yr = jnp.floor(grid_y * col(ratio_y, jnp.float32) + 0.5).astype(jnp.int32)
    xr = jnp.floor(grid_x * col(ratio_x, jnp.float32) + 0.5).astype(jnp.int32)

    ys = (col(a_yy, jnp.int32) * yr + col(a_yx, jnp.int32) * xr
          + col(b_y, jnp.int32))
    xs = (col(a_xy, jnp.int32) * yr + col(a_xx, jnp.int32) * xr
          + col(b_x, jnp.int32))

    HB, WB = crop_stack.shape[1], crop_stack.shape[2]
    ys = jnp.clip(ys, 0, HB - 1)
    xs = jnp.clip(xs, 0, WB - 1)
    values = crop_stack[para_idx.reshape(Bl, 1, 1).astype(jnp.int32),
                        ys, xs, 0]
    cols = lax.broadcasted_iota(jnp.int32, shape, 2)
    values = jnp.where(cols < col(w_out, jnp.int32), values, 0.0)
    return values[..., None]


# ---------------------------------------------------------------------------
# Packed plan vectors
#
# Every stage launch carries ~20 per-sample scalars (bbox, affine, padding,
# valid extents).  Shipping them as separate (B,) arrays costs one H2D
# round trip EACH over the tunneled link (~10-30ms apiece — more than the
# whole launch's compute); the dispatcher packs them into one int32 and
# one f32 matrix per launch and the stage programs slice columns out.
# ---------------------------------------------------------------------------

#: column order of the paragraph-stage int32 plan matrix
PARAGRAPH_INT_FIELDS = ('page', 'y0', 'x0', 'h', 'w', 'ry0', 'rx0',
                        'out_h', 'out_w', 'py', 'px', 'hv', 'wv',
                        'start_y', 'start_x')
#: column order of the paragraph-stage f32 plan matrix
PARAGRAPH_FLT_FIELDS = ('cos', 'sin', 'off_y', 'off_x')
#: column order of the line-stage int32 plan matrix
LINE_INT_FIELDS = ('para_idx', 'w_out', 'a_yy', 'a_yx', 'b_y',
                   'a_xy', 'a_xx', 'b_x', 'w_valid')
#: column order of the line-stage f32 plan matrix
LINE_FLT_FIELDS = ('ratio_y', 'ratio_x')


def unpack_paragraph_plan(ints, floats):
    """(B, 15) int32 + (B, 4) f32 -> per-field (B,) column dicts."""
    iv = {name: ints[:, i] for i, name in enumerate(PARAGRAPH_INT_FIELDS)}
    fv = {name: floats[:, i] for i, name in enumerate(PARAGRAPH_FLT_FIELDS)}
    return iv, fv


def unpack_line_plan(ints, floats):
    iv = {name: ints[:, i] for i, name in enumerate(LINE_INT_FIELDS)}
    fv = {name: floats[:, i] for i, name in enumerate(LINE_FLT_FIELDS)}
    return iv, fv


# ---------------------------------------------------------------------------
# Fused stage programs
# ---------------------------------------------------------------------------


def _thresholded_bands(params, crops, h_valid, w_valid, precision=None):
    """Masked Line forward + the reference's band thresholding
    (arr > 0.5*(mean+max) over the valid region, interpreter.py:437-438).
    Returns the (B, H, W, 2) boolean band masks."""
    pred = line_forward_masked(params, crops, h_valid, w_valid,
                               prefix='Line', precision=precision)
    pred = _mask_hw(pred, h_valid, w_valid)
    hv = h_valid.reshape(-1, 1, 1, 1).astype(jnp.float32)
    wv = w_valid.reshape(-1, 1, 1, 1).astype(jnp.float32)
    rows = lax.broadcasted_iota(jnp.int32, pred.shape, 1)
    cols = lax.broadcasted_iota(jnp.int32, pred.shape, 2)
    valid = ((rows < h_valid.reshape(-1, 1, 1, 1))
             & (cols < w_valid.reshape(-1, 1, 1, 1)))
    mean = jnp.sum(pred, axis=(1, 2), keepdims=True) / (hv * wv)
    peak = jnp.max(pred, axis=(1, 2), keepdims=True)
    return (pred > 0.5 * (mean + peak)) & valid


def _band_masks(params, crops, h_valid, w_valid, precision=None,
                tables=False):
    """Band geometry payload of the paragraph stage.

    tables=False: the (B, H, W/8, 2) uint8 bit-packed masks — the exact
    payload the host CCL path consumes.  (A compact per-row run encoding
    was evaluated and rejected: 56% of nonempty band rows carry 2-15 runs
    — word gaps — so the 1-bit planes are already the minimal exact
    payload; scripts/band_stats.py.)

    tables=True: per-blob summary tables (band_blob_tables) — ~20-100x
    fewer D2H bytes AND no host CCL/argwhere work; the serving default.
    """
    bands = _thresholded_bands(params, crops, h_valid, w_valid,
                               precision=precision)
    if tables:
        return band_blob_tables(bands)
    return jnp.packbits(bands.astype(jnp.uint8), axis=2)


# ---------------------------------------------------------------------------
# On-device band blob tables (line planning without shipping masks)
# ---------------------------------------------------------------------------
#
# The reference plans line crops on the host: scipy CCL over each band
# channel, per-blob bbox + center of mass, nearest-center top/bottom
# pairing (interpreter.py:421-523).  Shipping the band masks off-device
# for that was the cascade's largest remaining D2H payload (BASELINE.md
# round 2: 14.3 MB / ~2.1 s busy per 32 pages) and the host CCL its
# largest compute block (~4.5 s).
#
# These tables compute the SAME per-blob quantities on device, exploiting
# the problem's structure instead of general CCL: text-line bands are
# horizontal (or, for 90-degree-rotated paragraphs, vertical) stripes, so
# connected components coincide with maximal runs of consecutive
# non-empty rows (resp. columns).  Both decompositions are computed; the
# host picks the axis with more blobs in the top channel (a level
# paragraph yields one blob per line along rows and a single blob along
# columns; rotated paragraphs the reverse; for a single line both agree).
#
# Two deliberate differences from per-pixel CCL, both accuracy-POSITIVE
# (band fragmentation was the dominant end-to-end error source,
# BASELINE.md round 2):
#   * fragments of one band that share rows (horizontal splits at word
#     gaps) group into one blob;
#   * runs separated by <= 2*CLOSE_RADIUS empty rows merge (1D
#     morphological closing on the row-occupancy vector) — real
#     inter-line gaps are an x-height or more.

#: blob-table capacity per (paragraph, channel, axis); a paragraph holds
#: <= ~15 lines, and same-row fragments already share a blob
MAX_BAND_BLOBS = 48
#: 1D closing radius on the occupancy vector: fills <= 2-row gaps
CLOSE_RADIUS = 1


def _close_runs(occ, radius):
    """1D morphological closing along axis 1 of an (B, L, C) {0,1} float
    occupancy tensor: dilation then erosion, window 2*radius+1.  Padding
    is the reduction's identity, so boundary runs neither grow past the
    array nor get eroded by it."""
    if not radius:
        return occ > 0.5
    win = (1, 2 * radius + 1, 1)
    one = (1, 1, 1)
    dil = lax.reduce_window(occ, -jnp.inf, lax.max, win, one, 'SAME')
    ero = lax.reduce_window(dil, jnp.inf, lax.min, win, one, 'SAME')
    return ero > 0.5


def _axis_blob_tables(bands, close_radius, max_blobs):
    """Row-axis blob decomposition of (B, H, W, C) boolean band masks.

    Returns (table, n_blobs): table is (B, max_blobs, 7, C) f32 with
    fields [count, y0, y1, x0, x1, cy, cx] per blob (bbox half-open,
    cy/cx the pixel center of mass — matching np.argwhere(mask).mean(0)),
    n_blobs (B, C) int32.  Call on the transposed masks for the
    column-axis decomposition (fields then come back y<->x swapped)."""
    b = bands.astype(jnp.float32)                           # (B,H,W,C)
    B, H, W, C = b.shape
    colsf = jnp.arange(W, dtype=jnp.float32).reshape(1, 1, W, 1)
    colsi = jnp.arange(W, dtype=jnp.int32).reshape(1, 1, W, 1)
    cnt_r = jnp.sum(b, axis=2)                              # (B,H,C)
    sumx_r = jnp.sum(b * colsf, axis=2)                     # (B,H,C)
    minx_r = jnp.min(jnp.where(bands, colsi, W), axis=2)    # (B,H,C)
    maxx_r = jnp.max(jnp.where(bands, colsi, -1), axis=2)   # (B,H,C)
    occ = cnt_r > 0                                         # (B,H,C)

    closed = _close_runs(occ.astype(jnp.float32), close_radius)
    prev = jnp.pad(closed[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    starts = closed & ~prev
    ids = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1  # (B,H,C)
    n_blobs = jnp.max(jnp.where(closed, ids, -1), axis=1) + 1   # (B,C)

    blob_ids = jnp.arange(max_blobs, dtype=jnp.int32)
    member = ((ids[:, :, None, :] == blob_ids.reshape(1, 1, -1, 1))
              & closed[:, :, None, :])                      # (B,H,M,C)
    oh = member.astype(jnp.float32)
    rowsf = jnp.arange(H, dtype=jnp.float32).reshape(1, H, 1)
    cnt_b = jnp.einsum('bhmc,bhc->bmc', oh, cnt_r)
    sumx_b = jnp.einsum('bhmc,bhc->bmc', oh, sumx_r)
    sumy_b = jnp.einsum('bhmc,bhc->bmc', oh, cnt_r * rowsf)

    # bbox extremes over the blob's truly-occupied rows (closing's filler
    # rows are empty and must not extend the bbox)
    filled = member & occ[:, :, None, :]
    rowsi = jnp.arange(H, dtype=jnp.int32).reshape(1, H, 1, 1)
    y0 = jnp.min(jnp.where(filled, rowsi, H), axis=1)       # (B,M,C)
    y1 = jnp.max(jnp.where(filled, rowsi, -1), axis=1) + 1
    x0 = jnp.min(jnp.where(filled, minx_r[:, :, None, :], W), axis=1)
    x1 = jnp.max(jnp.where(filled, maxx_r[:, :, None, :], -1), axis=1) + 1

    denom = jnp.maximum(cnt_b, 1.0)
    table = jnp.stack([
        cnt_b,
        y0.astype(jnp.float32), y1.astype(jnp.float32),
        x0.astype(jnp.float32), x1.astype(jnp.float32),
        sumy_b / denom, sumx_b / denom,
    ], axis=2)                                              # (B,M,7,C)
    # zero the unused slots (the min/max identities above would otherwise
    # leave H/W sentinels there)
    used = blob_ids.reshape(1, -1, 1) < n_blobs[:, None, :]  # (B,M,C)
    table = table * used[:, :, None, :].astype(jnp.float32)
    return table, n_blobs


def band_blob_tables(bands, close_radius=CLOSE_RADIUS,
                     max_blobs=MAX_BAND_BLOBS):
    """Both-axis blob tables of (B, H, W, C) boolean band masks.

    Returns (tables, n_blobs): tables (B, 2, max_blobs, 7, C) f32 with
    axis 1 = {0: row-run decomposition, 1: column-run decomposition},
    fields [count, y0, y1, x0, x1, cy, cx] in ORIGINAL image coordinates
    for both axes; n_blobs (B, 2, C) int32."""
    rows_tbl, rows_n = _axis_blob_tables(bands, close_radius, max_blobs)
    cols_tbl, cols_n = _axis_blob_tables(
        jnp.transpose(bands, (0, 2, 1, 3)), close_radius, max_blobs)
    # un-transpose the column-axis fields back to image coordinates
    cols_tbl = cols_tbl[:, :, (0, 3, 4, 1, 2, 6, 5), :]
    tables = jnp.stack([rows_tbl, cols_tbl], axis=1)
    n_blobs = jnp.stack([rows_n, cols_n], axis=1)
    return tables, n_blobs


def band_blob_tables_host(bands, close_radius=CLOSE_RADIUS,
                          max_blobs=MAX_BAND_BLOBS):
    """NumPy reference of band_blob_tables (same fields, same merge
    semantics) — the equality pin for the device kernel and the host
    fallback when planning without a device round trip."""
    bands = np.asarray(bands, bool)
    B, H, W, C = bands.shape
    tables = np.zeros((B, 2, max_blobs, 7, C), np.float32)
    n_blobs = np.zeros((B, 2, C), np.int32)
    for axis in range(2):
        view = bands if axis == 0 else bands.transpose(0, 2, 1, 3)
        L = view.shape[1]
        for bi in range(B):
            for c in range(C):
                m = view[bi, :, :, c]
                occ = m.any(axis=1)
                closed = occ.copy()
                if close_radius:
                    r = close_radius
                    dil = np.zeros_like(occ)
                    for s in range(-r, r + 1):
                        lo, hi = max(0, -s), min(L, L - s)
                        dil[lo:hi] |= occ[lo + s:hi + s]
                    closed = np.ones_like(occ)
                    for s in range(-r, r + 1):
                        pad = np.ones(L, bool)
                        lo, hi = max(0, -s), min(L, L - s)
                        pad[lo:hi] = dil[lo + s:hi + s]
                        closed &= pad
                starts = closed & ~np.concatenate([[False], closed[:-1]])
                ids = np.cumsum(starts) - 1
                nb = int(ids[closed].max() + 1) if closed.any() else 0
                n_blobs[bi, axis, c] = nb
                for blob in range(min(nb, max_blobs)):
                    rows = np.where(closed & (ids == blob) & occ)[0]
                    ys, xs = np.nonzero(m[rows])
                    cnt = len(ys)
                    y0, y1 = rows.min(), rows.max() + 1
                    x0, x1 = xs.min(), xs.max() + 1
                    cy = (rows[ys]).mean()
                    cx = xs.mean()
                    entry = ([cnt, y0, y1, x0, x1, cy, cx] if axis == 0
                             else [cnt, x0, x1, y0, y1, cx, cy])
                    tables[bi, axis, blob, :, c] = entry
    return tables, n_blobs


def level_paragraph_crops(padded_stack, blob_bits, page_idx,
                          start_y, start_x):
    """Level (no-deskew) paragraph crops as per-sample dynamic slices.

    TPU gathers with arbitrary 2D indices are orders of magnitude slower
    than contiguous DMA; for the common angle=None paragraph the "rotation"
    is the identity, so the crop is a static-size dynamic_slice from the
    padded page stack multiplied by the blob mask (which the host packs
    pre-ALIGNED to the same placement, so the multiply also applies the
    make_divisible_by positioning and zeroes everything outside).

    padded_stack : (N, H', W', 1) f32 pages, padded so no slice clamps:
                   top/left by PAD, bottom/right by the largest menu dims.
    start_y/x    : (B,) int32 slice origins = bbox - placement + PAD.
    """
    HB = blob_bits.shape[1]
    WB = blob_bits.shape[2] * 8
    blob = jnp.unpackbits(blob_bits, axis=2).astype(padded_stack.dtype)

    def one(args):
        page, sy, sx = args
        zero = jnp.zeros((), page.dtype)
        return lax.dynamic_slice(
            padded_stack, (page, sy, sx, zero), (1, HB, WB, 1))[0, :, :, 0]

    crops = lax.map(one, (page_idx, start_y, start_x))
    return (crops * blob)[..., None]


def paragraph_stage_fast(params, padded_stack, blob_bits, page_idx,
                         start_y, start_x, h_valid, w_valid,
                         precision=None, tables=False):
    """Fused level-paragraph stage: dynamic-slice crop + masked Line FCN +
    band thresholding.  Returns (crops, packed_bands)."""
    crops = level_paragraph_crops(padded_stack, blob_bits, page_idx,
                                  start_y, start_x)
    packed = _band_masks(params, crops, h_valid, w_valid,
                         precision=precision, tables=tables)
    return crops, packed


def level_paragraph_crops_resident(padded_stack, padded_para, page_idx,
                                   start_y, start_x, src_h, src_w,
                                   pad_y, pad_x, out_hb, out_wb):
    """Level paragraph crops with the blob taken from the DEVICE-RESIDENT
    paragraph mask instead of a host-uploaded bit plane.

    Valid exactly when the paragraph's bbox contains no pixel of any
    OTHER component (the host checks this against its labels map): then
    blob == para_mask ∩ bbox, and the same dynamic slice that positions
    the monochrome crop positions the mask.  Saves the (B, HB, WB/8)
    per-launch H2D upload — measured at ~20MB/32 pages, as large as the
    entire band-mask D2H (scripts/profile_cascade.py wire timeline).

    pad_y/pad_x/src_h/src_w replicate the host's make_divisible_by CENTER
    placement: content occupies rows [pad_y, pad_y+src_h) of the bucket.
    """
    def one(args):
        page, sy, sx = args
        zero = jnp.zeros((), page.dtype)
        mono = lax.dynamic_slice(
            padded_stack, (page, sy, sx, zero), (1, out_hb, out_wb, 1))
        para = lax.dynamic_slice(
            padded_para, (page, sy, sx, zero), (1, out_hb, out_wb, 1))
        return mono[0, :, :, 0], para[0, :, :, 0]

    mono, para = lax.map(one, (page_idx, start_y, start_x))
    B = page_idx.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (B, out_hb, out_wb), 1)
    cols = lax.broadcasted_iota(jnp.int32, (B, out_hb, out_wb), 2)

    def col(v):
        return jnp.asarray(v, jnp.int32).reshape(B, 1, 1)

    rect = ((rows >= col(pad_y)) & (rows < col(pad_y) + col(src_h))
            & (cols >= col(pad_x)) & (cols < col(pad_x) + col(src_w)))
    return (mono * para * rect.astype(mono.dtype))[..., None]


def paragraph_stage_resident(params, padded_stack, padded_para, page_idx,
                             start_y, start_x, src_h, src_w, pad_y, pad_x,
                             h_valid, w_valid, out_hb, out_wb,
                             precision=None, tables=False):
    """paragraph_stage_fast without the blob upload (single-component
    bboxes; see level_paragraph_crops_resident)."""
    crops = level_paragraph_crops_resident(
        padded_stack, padded_para, page_idx, start_y, start_x,
        src_h, src_w, pad_y, pad_x, out_hb, out_wb)
    packed = _band_masks(params, crops, h_valid, w_valid,
                         precision=precision, tables=tables)
    return crops, packed


def rotated_paragraph_crops_resident(mono_stack, para_stack, page_idx,
                                     src_y0, src_x0, src_h, src_w,
                                     cos_a, sin_a, off_y, off_x,
                                     out_y0, out_x0, out_h, out_w,
                                     pad_y, pad_x, out_hb, out_wb):
    """rotated_paragraph_crops with the blob sampled from the device-
    resident paragraph mask (single-component bboxes only): the bilinear
    gather reads mono and mask at the same source coordinates."""
    B = page_idx.shape[0]
    HB, WB = out_hb, out_wb

    def col(v, dtype=jnp.float32):
        return jnp.asarray(v, dtype).reshape(B, 1, 1)

    grid_y = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 1)
              + col(out_y0) - col(pad_y))
    grid_x = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 2)
              + col(out_x0) - col(pad_x))
    cos_c, sin_c = col(cos_a), col(sin_a)
    in_y = cos_c * grid_y + sin_c * grid_x + col(off_y)
    in_x = -sin_c * grid_y + cos_c * grid_x + col(off_x)

    y_floor = jnp.floor(in_y)
    x_floor = jnp.floor(in_x)
    wy = in_y - y_floor
    wx = in_x - x_floor
    y_base = y_floor.astype(jnp.int32)
    x_base = x_floor.astype(jnp.int32)

    pages = mono_stack[:, :, :, 0]
    paras = para_stack[:, :, :, 0]
    page_h, page_w = pages.shape[1], pages.shape[2]
    page = page_idx.reshape(B, 1, 1).astype(jnp.int32)
    sy0, sx0 = (col(src_y0, jnp.int32), col(src_x0, jnp.int32))
    sh, sw = (col(src_h, jnp.int32), col(src_w, jnp.int32))

    sh_f, sw_f = col(src_h), col(src_w)
    in_domain = ((in_y >= 0) & (in_y <= sh_f - 1)
                 & (in_x >= 0) & (in_x <= sw_f - 1))

    def corner(dy, dx):
        yy = jnp.minimum(y_base + dy, sh - 1)
        xx = jnp.minimum(x_base + dx, sw - 1)
        yy = jnp.maximum(yy, 0)
        xx = jnp.maximum(xx, 0)
        yp = jnp.clip(sy0 + yy, 0, page_h - 1)
        xp = jnp.clip(sx0 + xx, 0, page_w - 1)
        return pages[page, yp, xp] * paras[page, yp, xp]

    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bottom = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    value = top * (1 - wy) + bottom * wy

    out_rows = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 1)
    out_cols = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 2)
    py, px = col(pad_y, jnp.int32), col(pad_x, jnp.int32)
    in_slice = ((out_rows >= py) & (out_rows < py + col(out_h, jnp.int32))
                & (out_cols >= px) & (out_cols < px + col(out_w, jnp.int32)))
    return jnp.where(in_domain & in_slice, value, 0.0)[..., None]


def paragraph_stage_rot_resident(params, mono_stack, para_stack, page_idx,
                                 src_y0, src_x0, src_h, src_w,
                                 cos_a, sin_a, off_y, off_x,
                                 out_y0, out_x0, out_h, out_w,
                                 pad_y, pad_x, h_valid, w_valid,
                                 out_hb, out_wb, precision=None,
                                 tables=False):
    """paragraph_stage without the blob upload (deskewed single-component
    bboxes)."""
    crops = rotated_paragraph_crops_resident(
        mono_stack, para_stack, page_idx, src_y0, src_x0, src_h, src_w,
        cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h, out_w,
        pad_y, pad_x, out_hb, out_wb)
    packed = _band_masks(params, crops, h_valid, w_valid,
                         precision=precision, tables=tables)
    return crops, packed


def paragraph_stage(params, mono_stack, blob_bits, page_idx,
                    src_y0, src_x0, src_h, src_w,
                    cos_a, sin_a, off_y, off_x, out_y0, out_x0,
                    out_h, out_w, pad_y, pad_x, h_valid, w_valid,
                    precision=None, tables=False):
    """Fused deskewed-paragraph stage (the rare angle!=None path): bilinear
    rotation gather + masked Line FCN + band thresholding.
    Returns (crops, packed_bands)."""
    crops = rotated_paragraph_crops(
        mono_stack, blob_bits, page_idx, src_y0, src_x0, src_h, src_w,
        cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h, out_w,
        pad_y, pad_x)
    packed = _band_masks(params, crops, h_valid, w_valid,
                         precision=precision, tables=tables)
    return crops, packed


def zoomed_line_crops_matmul(crop_stack, para_idx,
                             ratio_y, ratio_x, w_out,
                             a_yy, a_yx, b_y, a_xy, a_xx, b_x,
                             out_h, out_w, precision=None):
    """Zoomed line crops as two one-hot matmuls on the MXU.

    The zoom + rot90 index map is separable: the source row depends on
    exactly one output axis and the source column on the other (which axis
    depends on the rot90 parity).  One-hot selector matrices turn the
    nearest-neighbor sampling into projections the MXU executes in
    microseconds — where the equivalent arbitrary-index gather costs
    hundreds of milliseconds on TPU.  Both parities are computed and
    selected per sample, so one program serves every rotation.

    Same semantics as zoomed_line_crops (scipy endpoint-aligned zoom,
    floor(x+0.5) rounding, columns >= w_out zeroed).
    """
    Bl = para_idx.shape[0]
    HB, WB = crop_stack.shape[1], crop_stack.shape[2]

    def col(v, dtype):
        return jnp.asarray(v, dtype).reshape(Bl, 1)

    # nearest pre-rot90 coordinates along each OUTPUT axis
    yr = jnp.floor(jnp.arange(out_h, dtype=jnp.float32)[None, :]
                   * col(ratio_y, jnp.float32) + 0.5).astype(jnp.int32)
    xr = jnp.floor(jnp.arange(out_w, dtype=jnp.float32)[None, :]
                   * col(ratio_x, jnp.float32) + 0.5).astype(jnp.int32)

    ayy, ayx = col(a_yy, jnp.int32), col(a_yx, jnp.int32)
    axy, axx = col(a_xy, jnp.int32), col(a_xx, jnp.int32)
    by, bx = col(b_y, jnp.int32), col(b_x, jnp.int32)

    # parity 0 (rot90 k even): src row <- output row, src col <- output col
    row_sel0 = ayy * yr + by                                # (Bl, out_h)
    col_sel0 = axx * xr + bx                                # (Bl, out_w)
    # parity 1 (k odd): src row <- output col, src col <- output row
    row_sel1 = ayx * xr + by                                # (Bl, out_w)
    col_sel1 = axy * yr + bx                                # (Bl, out_h)

    img = jnp.take(crop_stack[:, :, :, 0], para_idx, axis=0)  # (Bl, HB, WB)
    mode = precision_policy.resolve(precision)
    if mode == 'bf16':
        img = img.astype(jnp.bfloat16)
        sel_dtype, mxu = jnp.bfloat16, lax.Precision.DEFAULT
    else:
        sel_dtype, mxu = jnp.float32, lax.Precision.HIGHEST

    def one_hot(sel, size):
        return (sel[:, :, None]
                == jnp.arange(size, dtype=jnp.int32)).astype(sel_dtype)

    def project(row_sel, col_sel):
        rows = one_hot(row_sel, HB)                 # (Bl, R, HB)
        cols = one_hot(col_sel, WB)                 # (Bl, C, WB)
        tmp = jnp.einsum('brh,bhw->brw', rows, img, precision=mxu,
                         preferred_element_type=jnp.float32)
        return jnp.einsum('brw,bcw->brc', tmp, cols, precision=mxu,
                          preferred_element_type=jnp.float32)

    out0 = project(row_sel0, col_sel0)                       # (Bl, oh, ow)
    out1 = jnp.swapaxes(project(row_sel1, col_sel1), 1, 2)   # (Bl, oh, ow)
    parity_odd = ((ayx != 0) | (axy != 0))[:, :, None]
    values = jnp.where(parity_odd, out1, out0)

    cols_idx = lax.broadcasted_iota(jnp.int32, values.shape, 2)
    values = jnp.where(cols_idx < col(w_out, jnp.int32)[:, :, None],
                       values, 0.0)
    return values[..., None]
