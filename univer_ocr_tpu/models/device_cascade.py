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


def unpack_paragraph_plan(plan):
    """ONE (B, 19) f32 plan matrix -> per-field (B,) column dicts.

    Integer fields ride the f32 matrix and cast back exactly (all plan
    values < 2^24).  One matrix instead of an int32 + f32 pair because
    the tunnel charges ~a round trip PER TRANSFER, so each extra leaf
    per launch is pure latency (see pack_tables_payload)."""
    ni = len(PARAGRAPH_INT_FIELDS)
    ints = plan[:, :ni].astype(jnp.int32)
    iv = {name: ints[:, i] for i, name in enumerate(PARAGRAPH_INT_FIELDS)}
    fv = {name: plan[:, ni + i]
          for i, name in enumerate(PARAGRAPH_FLT_FIELDS)}
    return iv, fv


def unpack_line_plan(plan):
    """ONE (B, 11) f32 plan matrix -> per-field (B,) column dicts (see
    unpack_paragraph_plan)."""
    ni = len(LINE_INT_FIELDS)
    ints = plan[:, :ni].astype(jnp.int32)
    iv = {name: ints[:, i] for i, name in enumerate(LINE_INT_FIELDS)}
    fv = {name: plan[:, ni + i] for i, name in enumerate(LINE_FLT_FIELDS)}
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
    """Band geometry payload of the paragraph stage (exact mode).

    The (B, H, W/8, 2) uint8 bit-packed masks — the exact payload the
    host CCL path consumes.  (A compact per-row run encoding was
    evaluated and rejected: 56% of nonempty band rows carry 2-15 runs
    — word gaps — so the 1-bit planes are already the minimal exact
    payload; scripts/band_stats.py.)"""
    assert not tables, 'tables mode goes through _finish_paragraph_stage'
    bands = _thresholded_bands(params, crops, h_valid, w_valid,
                               precision=precision)
    return jnp.packbits(bands.astype(jnp.uint8), axis=2)


def _finish_paragraph_stage(params, crops, h_valid, w_valid,
                            precision=None, tables=False, margin=False,
                            resolve_suspects=True):
    """Shared tail of every paragraph-stage program: Line forward + band
    thresholding, then either the exact bit-packed masks (tables=False)
    or the sheared per-blob tables (tables=True) — ~20-100x fewer D2H
    bytes AND no host CCL/argwhere work; the serving default.

    In tables mode the returned crops are sheared by the chosen stacking
    axis's residual tilt, so the line bboxes (measured in sheared
    coordinates) index them directly and the Char stage reads de-tilted
    glyphs.  Payload: ONE (B, NBYTES) uint8 buffer —
    pack_tables_payload(tables, n_blobs, shears, axis, suspect,
    profile); `suspect` flags paragraphs whose run decomposition
    provably merged lines (merge_suspect), `profile` is the bit-packed
    closed column-group occupancy of the chosen-axis view that their
    grid-CCL escalation re-plans on
    (OCRPipeline._plan_lines_from_profile)."""
    bands = _thresholded_bands(params, crops, h_valid, w_valid,
                               precision=precision)
    if not tables:
        return crops, jnp.packbits(bands.astype(jnp.uint8), axis=2)
    (crops, tbl, n_blobs, shears, axis, suspect,
     packed_prof) = tables_state(bands, crops, margin=margin,
                                 resolve_suspects=resolve_suspects)
    return crops, pack_tables_payload(tbl, n_blobs, shears, axis,
                                      suspect, packed_prof)


def tables_state(bands, crops, margin=False, resolve_suspects=True):
    """Tables-mode core shared by the classic paragraph stage and the
    fused tail (models/fused_tail.py): both-axis blob tables + suspect
    flags + the folded escalation profile, and the crops sheared by the
    chosen axis's residual tilt.  Returns (crops, tbl, n_blobs, shears,
    axis, suspect, packed_prof).

    resolve_suspects=True (the serving default) additionally re-plans
    merge-suspect paragraphs ON DEVICE: 2D grid CCL over the folded
    closed profile (grid_ccl_tables — the same components, in the same
    quantized coordinates, the host escalation planner would derive
    from the pulled payload), replacing the chosen axis's blob tables
    and CLEARING the suspect flag, so these paragraphs decode directly
    instead of costing a tables pull + line/Char relaunch per launch
    (12-19% of real paragraphs fire; BENCH_r04).  Suspects whose
    component count overflows the table capacity keep the flag and the
    host escalation path."""
    # both-axis tables + suspect flags + escalation profiles in ONE
    # group-stats pass per axis — no full-resolution mask is sheared or
    # gathered anywhere in tables mode (BENCH r2->r3: the per-column
    # take_along_axis shears were ~400 ms of every paragraph launch)
    row_stats, col_stats = _group_stats_both(bands)
    t0, n0, s0, sus0, pr0 = _axis_pack(
        None, margin=margin, stats=row_stats, extent=bands.shape[2])
    t1, n1, s1, sus1, pr1 = _axis_pack(
        None, margin=margin, stats=col_stats, extent=bands.shape[1])
    tbl = jnp.stack([t0, t1[:, :, (0, 3, 4, 1, 2, 6, 5), :]], axis=1)
    n_blobs = jnp.stack([n0, n1], axis=1)
    shears = jnp.stack([s0, s1], axis=1)
    axis = choose_stacking_axis(tbl, n_blobs)
    B = crops.shape[0]
    s_row = jnp.where(axis == 0, shears[:, 0], 0.0)
    s_col = jnp.where(axis == 1, shears[:, 1], 0.0)

    def off(s, extent):
        S = _shear_span(extent)
        return (jnp.where(s != 0.0, S, 0) if margin
                else jnp.zeros((B,), jnp.int32)).astype(jnp.int32)

    def shear_both(arr):
        arr = _shear_rows(arr, s_row, off(s_row, arr.shape[2]))
        arr_t = jnp.transpose(arr, (0, 2, 1, 3))
        arr_t = _shear_rows(arr_t, s_col, off(s_col, arr_t.shape[2]))
        return jnp.transpose(arr_t, (0, 2, 1, 3))

    crops = shear_both(crops)
    suspect = jnp.where(axis == 0, sus0, sus1)
    # escalation payload: the CLOSED column-group occupancy profile of
    # the chosen-axis view, row-OR-folded by PROFILE_ROW_DS and
    # bit-packed — (L/DS, G*C/8) ~ 2-4 KB, vs the ~70 KB full band
    # masks it replaces.  Bands are >= ~5 px tall and inter-line gaps an
    # x-height, so 2-px row bins keep the grid-CCL separation; the
    # profile was the largest slice of the per-launch D2H payload
    # (8.2 of 13.6 KB/paragraph at L=512).
    L = max(pr0.shape[1], pr1.shape[1])
    Ld = -(-L // PROFILE_ROW_DS)

    def pack(p):
        p = jnp.pad(p, ((0, 0), (0, Ld * PROFILE_ROW_DS - p.shape[1]),
                        (0, 0), (0, 0)))
        p = p.reshape(B, Ld, PROFILE_ROW_DS, -1).any(axis=2)
        return p

    prof = jnp.where((axis == 0)[:, None, None], pack(pr0), pack(pr1))
    packed_prof = jnp.packbits(prof.astype(jnp.uint8), axis=2)

    if resolve_suspects:
        # device escalation: rebuild suspect paragraphs' chosen-axis
        # tables from the profile's 2D components (the host planner's
        # exact quantized geometry) and clear the flag
        H, W = bands.shape[1], bands.shape[2]
        _, gw_r, _ = _group_centers(W)
        _, gw_c, _ = _group_centers(H)
        ch = axis == 0
        view_h = jnp.where(ch, H, W).astype(jnp.int32)
        view_w = jnp.where(ch, W, H).astype(jnp.int32)
        gw_sel = jnp.where(ch, gw_r, gw_c).astype(jnp.int32)
        prof4 = prof.reshape(B, prof.shape[1], -1, bands.shape[3])
        t2, n2, converged = grid_ccl_tables(prof4, view_h, view_w,
                                            gw_sel)
        # image coordinates: the column-axis view swaps y<->x fields
        t2 = jnp.where((~ch)[:, None, None, None],
                       t2[:, :, (0, 3, 4, 1, 2, 6, 5), :], t2)
        fits = (jnp.max(n2, axis=1) <= t2.shape[1]) & converged
        fix = suspect & fits
        chosen_t = jnp.where(ch[:, None, None, None], tbl[:, 0],
                             tbl[:, 1])
        chosen_n = jnp.where(ch[:, None], n_blobs[:, 0], n_blobs[:, 1])
        new_t = jnp.where(fix[:, None, None, None], t2, chosen_t)
        new_n = jnp.where(fix[:, None], n2, chosen_n)
        tbl = jnp.stack(
            [jnp.where(ch[:, None, None, None], new_t, tbl[:, 0]),
             jnp.where(ch[:, None, None, None], tbl[:, 1], new_t)],
            axis=1)
        n_blobs = jnp.stack(
            [jnp.where(ch[:, None], new_n, n_blobs[:, 0]),
             jnp.where(ch[:, None], n_blobs[:, 1], new_n)], axis=1)
        suspect = suspect & ~fits

    return crops, tbl, n_blobs, shears, axis, suspect, packed_prof


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
#: row OR-fold factor of the escalation profile payload (see
#: _finish_paragraph_stage); the host planner upscales coordinates back
PROFILE_ROW_DS = 2

# ---------------------------------------------------------------------------
# Residual-tilt (shear) correction
#
# The run decomposition assumes distinct lines' bands occupy disjoint row
# ranges.  Deskew leaves rotated paragraphs with ~1-3 degrees of residual
# tilt (the angle comes from the paragraph blob's outline, not the text
# baselines), and over a 500-700px crop that skews each band across
# 10-30 rows — enough to chain every line of the paragraph into ONE
# row-run while 2D CCL still separates them (measured: a 7-line rotated
# paragraph collapsed to 1 blob; eval pages 0/1/5).
#
# The fix is the classic projection-profile deskew done ON DEVICE: sweep
# K candidate slopes, score each by the number of occupied sheared rows
# (fewer = better separated), shear the band masks by the winner, and run
# the unchanged run decomposition on the sheared masks.  The paragraph
# crop itself is sheared identically (per the chosen stacking axis), so
# line bboxes measured in sheared coordinates index the returned crop
# stack directly and the separable line-crop matmul gather needs no
# changes — and the Char model sees de-tilted glyphs.
#
# All shears are integer per-column row shifts implemented as a static
# enumeration of shifted slices (no arbitrary-index gathers, which are
# slow on TPU); round-half-to-even everywhere so the NumPy mirror
# (band_blob_tables_host) is bit-identical.
# ---------------------------------------------------------------------------

#: candidate slope grid (odd count so 0.0 is exactly representable)
SHEAR_CANDIDATES = 27
#: max |slope| swept: 0.08 = 4.6 degrees of residual tilt (measured
#: need: a deskewed 7-line paragraph at slope 0.07, eval page 5)
MAX_SHEAR = 0.08
#: column groups for the candidate-scoring profile
SHEAR_GROUPS = 64


def _f32_bytes(x):
    """(…) numeric -> little-endian f32 byte view (…, 4) uint8."""
    return lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint8)


def pack_tables_payload(tbl, n_blobs, shears, axis, suspect, profile):
    """Flatten the tables-mode paragraph payload into ONE (B, NBYTES)
    uint8 buffer.

    The tunnel to the TPU charges ~a full round trip per TRANSFER OP
    regardless of size (measured: a fresh 6-leaf payload pull is 194 ms,
    the same bytes as one buffer 45 ms), so the per-launch D2H must be a
    single array.  Integer/bool pieces ride as f32 bytes (values < 2^24,
    exact); the profile is already uint8."""
    B = tbl.shape[0]
    parts = [
        _f32_bytes(tbl).reshape(B, -1),
        _f32_bytes(n_blobs).reshape(B, -1),
        _f32_bytes(shears).reshape(B, -1),
        _f32_bytes(axis).reshape(B, -1),
        _f32_bytes(suspect.astype(jnp.float32)).reshape(B, -1),
        profile.reshape(B, -1),
    ]
    return jnp.concatenate(parts, axis=1)


def unpack_tables_payload(buf, max_blobs=MAX_BAND_BLOBS):
    """Host inverse of pack_tables_payload: (B, NBYTES) uint8 ->
    (tables, n_blobs, shears, axis, suspect, profile) NumPy arrays;
    profile comes back as (B, L, G*C/8) bit-packed rows."""
    buf = np.asarray(buf)
    B = buf.shape[0]

    def f32(n, o):
        return buf[:, o:o + 4 * n].copy().view(np.float32), o + 4 * n

    o = 0
    tbl, o = f32(2 * max_blobs * 7 * 2, o)
    tbl = tbl.reshape(B, 2, max_blobs, 7, 2)
    n_blobs, o = f32(4, o)
    n_blobs = n_blobs.astype(np.int32).reshape(B, 2, 2)
    shears, o = f32(2, o)
    axis, o = f32(1, o)
    axis = axis.astype(np.int32).reshape(B)
    suspect, o = f32(1, o)
    suspect = suspect.astype(bool).reshape(B)
    profile = buf[:, o:].reshape(B, -1, SHEAR_GROUPS * 2 // 8)
    return tbl, n_blobs, shears.reshape(B, 2), axis, suspect, profile



def _shear_span(extent):
    """Max |integer row shift| a MAX_SHEAR tilt produces over `extent`
    columns (shear is measured from the center column)."""
    import math
    return int(math.ceil(MAX_SHEAR * (extent - 1) / 2.0)) + 1


def _shear_candidates():
    return np.linspace(-MAX_SHEAR, MAX_SHEAR, SHEAR_CANDIDATES)


def _group_centers(W):
    """Column-group partition used by the scoring profile: G groups of
    ceil(W/G) columns; returns (G, group_width, center offsets)."""
    G = SHEAR_GROUPS
    gw = -(-W // G)
    centers = (np.arange(G) * gw + (gw - 1) / 2.0) - (W - 1) / 2.0
    return G, gw, centers


def _best_shear(bands):
    """Per-paragraph residual tilt of (B, L, W, C) boolean band masks:
    the slope s minimizing the number of occupied sheared rows
    r = y - round(s * center_{g(x)}) (per column group, _group_shifts).
    Returns (B,) f32 from the candidate grid (exactly 0.0 for
    well-leveled content: equal scores tie-break toward |s| = 0)."""
    B, L, W, C = bands.shape
    m = jnp.any(bands, axis=3)                              # (B, L, W)
    G, gw, centers = _group_centers(W)
    Wp = G * gw
    if Wp != W:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, Wp - W)))
    prof = m.reshape(B, L, G, gw).any(axis=3)               # (B, L, G)
    return _best_shear_from_prof(prof, W)


def _best_shear_from_prof(prof, W):
    """_best_shear's candidate sweep from the (B, L, G) column-group
    occupancy profile of a view whose run-axis extent is W."""
    B, L, G = prof.shape
    S = _shear_span(W)
    _, _, centers = _group_centers(W)

    slopes = _shear_candidates()
    shifts = jnp.asarray(
        np.clip(np.round(slopes[:, None] * centers[None, :]), -S, S)
        .astype(np.int32))                                  # (K, G)
    # score over the FULL sheared range [-S, L+S) so content shifted
    # past the window edge still counts as occupied
    R = L + 2 * S
    profp = jnp.pad(prof, ((0, 0), (2 * S, 2 * S), (0, 0)))
    # occ[b, k, r, g] = profp[b, r + shifts[k, g] + S, g], materialized
    # as ceil(log2(2S+1)) static-slice selects over the K-tiled profile
    # (the _log_shift_rows trick): arbitrary-index gathers neither tile
    # onto the VPU nor stream from HBM, and this sweep runs inside every
    # paragraph-stage program in the serving menu
    K = shifts.shape[0]
    v = (shifts + S).astype(jnp.int32)                      # (K, G)
    cur = jnp.broadcast_to(profp[:, None],
                           (B, K) + profp.shape[1:])
    k = 0
    while (1 << k) <= 2 * S:
        step = 1 << k
        shifted = jnp.concatenate(
            [cur[:, :, step:], jnp.zeros_like(cur[:, :, :step])], axis=2)
        bit = ((v >> k) & 1).astype(bool)                   # (K, G)
        cur = jnp.where(bit[None, :, None, :], shifted, cur)
        k += 1
    occ = cur[:, :, :R]
    score = jnp.sum(jnp.any(occ, axis=3), axis=2).astype(jnp.float32)
    score = score + jnp.asarray(
        1e-3 * np.abs(slopes) / MAX_SHEAR, jnp.float32)[None, :]
    return jnp.asarray(slopes, jnp.float32)[jnp.argmin(score, axis=1)]


def _group_shifts(s, W):
    """Per-column-group integer shear shifts d[b, g] =
    clip(round(s_b * center_g), -S, S) — the SAME shifts _best_shear
    scores the candidates with, so scoring and application agree.  The
    shear is a per-group (not per-column) row shift: round(s*x) already
    staircases every 1/|s| >= 12.5 px at MAX_SHEAR, the same order as
    the ~12 px group width, and whole groups moving together is what
    lets the blob tables decompose exactly onto per-group row stats."""
    S = _shear_span(W)
    _, _, centers = _group_centers(W)
    d = jnp.clip(jnp.round(s[:, None]
                           * jnp.asarray(centers, jnp.float32)[None, :]),
                 -S, S)
    return d.astype(jnp.int32)                              # (B, G)


def _log_shift_rows(padded, v, H):
    """out[b, r, q, c] = padded[b, r + v[b, q], q, c] for v in [0, Vmax],
    as ceil(log2(Vmax+1)) static-slice selects (no arbitrary-index
    gathers, which cost ~100x more on TPU).  `padded` must carry at
    least H + Vmax rows; rows sliding past its end read the last row
    (callers pad the bottom with their fill value)."""
    Vmax = int(padded.shape[1]) - H
    cur = padded
    k = 0
    while (1 << k) <= Vmax:
        step = 1 << k
        shifted = jnp.concatenate(
            [cur[:, step:], jnp.repeat(cur[:, -1:], step, axis=1)], axis=1)
        bit = ((v >> k) & 1).astype(bool)                   # (B, Q)
        cur = jnp.where(bit[:, None, :, None], shifted, cur)
        k += 1
    return cur[:, :H]


def _shear_rows(arr, s, off):
    """Integer row shear: out[b, r, x, c] = arr[b, r - t, x, c] with
    t = off_b - d[b, g(x)] (per column GROUP, see _group_shifts);
    out-of-range reads are zero.

    `off` (B,) int32 in [0, _shear_span(W)] shifts content DOWN so rows
    sheared upward stay in frame (rotated crops put content at row 0);
    the caller adds the same margin when sizing the crop bucket.
    Works on boolean band masks and f32 crops alike."""
    B, H, W, C = arr.shape
    S = _shear_span(W)
    G, gw, _ = _group_centers(W)
    d = _group_shifts(s, W)                                 # (B, G)
    # v[b, g] = 2S - t in [0, 3S]; expand group -> column
    v = 2 * S - off[:, None].astype(jnp.int32) + d
    vx = jnp.repeat(v, gw, axis=1)[:, :W]                   # (B, W)
    padded = jnp.pad(arr, ((0, 0), (2 * S, S), (0, 0), (0, 0)))
    return _log_shift_rows(padded, vx, H)


def _interval_overlap_score(tbl, lo, hi):
    """Sum of positive top/bottom blob interval overlaps for one axis
    table (B, M, 7, 2) using fields [lo, hi); zeroed unused slots
    contribute nothing (their [0, 0) intervals are empty)."""
    t_lo, t_hi = tbl[:, :, lo, 0], tbl[:, :, hi, 0]         # (B, M)
    b_lo, b_hi = tbl[:, :, lo, 1], tbl[:, :, hi, 1]
    ov = (jnp.minimum(t_hi[:, :, None], b_hi[:, None, :])
          - jnp.maximum(t_lo[:, :, None], b_lo[:, None, :]))
    return jnp.sum(jnp.maximum(ov, 0.0), axis=(1, 2))       # (B,)


def choose_stacking_axis(tables, n_blobs):
    """Per-paragraph text-stacking axis: a line's top band lies strictly
    above (rows) or left of (columns) its bottom band along the stacking
    axis, so the two channels' blob intervals are disjoint there and
    overlap almost completely along the other.  Pick the axis with the
    smaller top<->bottom interval overlap; ties fall to rows (level
    text).  tables (B, 2, M, 7, C), n_blobs (B, 2, C) -> (B,) int32."""
    del n_blobs  # zeroed unused slots already contribute no overlap
    ov_rows = _interval_overlap_score(tables[:, 0], 1, 2)
    ov_cols = _interval_overlap_score(tables[:, 1], 3, 4)
    return (ov_rows > ov_cols).astype(jnp.int32)


#: a column-group run must span this many rows to count as line
#: structure in merge_suspect — real bands are >=3 rows at the smallest
#: generator font, while the Line model's speckle noise is 1-2 rows;
#: counting every run made ~90% of real paragraphs "suspect" and the
#: escalation mask pulls erased the whole band-tables win (measured:
#: 14.2 -> 3.1 pages/s, 54 of 58 band pulls were escalations)
MERGE_MIN_ROWS = 3


def _suspect_profile(bands):
    """merge_suspect flags PLUS the closed column-group occupancy
    profile they were computed from — the (B, H, G, C) grid the
    escalation planner consumes (see merge_suspect)."""
    B, H, W, C = bands.shape
    G, gw, _ = _group_centers(W)
    Wp = G * gw
    m = bands
    if Wp != W:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    prof = m.reshape(B, H, G, gw, C).any(axis=3)            # (B,H,G,C)
    return _suspect_from_prof(prof)


def _suspect_from_prof(prof):
    """merge_suspect core from a (B, H, G, C) column-group occupancy
    profile (sheared or not)."""
    B, H, G, C = prof.shape
    profc = _close_runs(
        prof.reshape(B, H, G * C).astype(jnp.float32),
        CLOSE_RADIUS).reshape(B, H, G, C)

    def tall_runs(occ):
        # erosion by MERGE_MIN_ROWS: a run's first row survives iff the
        # run is tall enough; then count rising edges
        er = occ
        for s in range(1, MERGE_MIN_ROWS):
            pad = ((0, 0), (0, s)) + ((0, 0),) * (occ.ndim - 2)
            er = er & jnp.pad(occ[:, s:], pad)
        pad = ((0, 0), (1, 0)) + ((0, 0),) * (occ.ndim - 2)
        prev = jnp.pad(er[:, :-1], pad)
        return jnp.sum((er & ~prev).astype(jnp.int32), axis=1)

    local = jnp.max(tall_runs(profc), axis=1)               # (B,C)
    glob = tall_runs(_close_runs(
        prof.any(axis=2).astype(jnp.float32), CLOSE_RADIUS))  # (B,C)
    return jnp.any((local > glob) & (glob > 0), axis=1), profc


def merge_suspect(bands):
    """Per-paragraph flag: the 1D row-run decomposition provably merged
    structure that survives at column-group granularity — some column
    group's (closed) occupancy has more TALL (>= MERGE_MIN_ROWS) runs
    than the global (closed) row profile.  That happens when distinct
    lines' bands chain through staggered or wavy content the shear sweep
    could not level (measured failure class: deskewed rotated
    paragraphs, eval pages 0/5).  Such paragraphs escalate to CCL
    planning on their pulled column-group profile
    (OCRPipeline._plan_lines_from_profile).

    bands: (B, H, W, C) bool, already sheared for the axis under test
    -> (B,) bool."""
    return _suspect_profile(bands)[0]


# ---------------------------------------------------------------------------
# On-device grid CCL: resolve merge suspects without a host round trip
#
# merge-suspect paragraphs used to escalate to the HOST: pull the packed
# profile, 2D-CCL it with scipy, re-plan, and relaunch line/Char — one
# RTT-bound tables pull plus one extra launch per suspect, and 12-19% of
# real paragraphs fire (BENCH_r04: 200/1035, every one changing
# geometry, so the rate cannot be tuned away).  The re-plan itself is
# tiny — 8-connectivity components of a ~250x64 boolean grid with <= ~7
# components (measured on the eval corpus) — so run it ON DEVICE inside
# the paragraph-stage program: iterative min-label propagation (row-
# segmented min scans + 8-neighbour relaxation under lax.while_loop),
# then rebuild the suspect paragraphs' blob tables from the component
# stats in the HOST PLANNER'S exact quantized coordinates
# (pipeline._plan_lines_from_profile) and clear the flag.  The fused
# tail's device line planner then decodes these paragraphs directly —
# same geometry as the host escalation, zero extra wire ops.
# ---------------------------------------------------------------------------

#: label sentinel for unoccupied grid cells (>> any linear cell index)
_CCL_BIG = np.int32(2 ** 30)
#: relaxation cap: one sweep moves labels across a full row run and one
#: row vertically, so components converge in O(vertical serpentine
#: length); text components span a handful of folded rows (measured
#: <= ~10 sweeps).  Hitting the cap reports converged=False and the
#: caller keeps the host escalation path — labels are never trusted
#: un-converged.
GRID_CCL_MAX_ITERS = 128


def _shift_fill(a, dy, dx, fill):
    """out[:, y, g] = a[:, y+dy, g+dx], `fill` outside the grid."""
    if dy:
        a = jnp.pad(a[:, max(dy, 0):a.shape[1] + min(dy, 0)],
                    ((0, 0), (max(-dy, 0), max(dy, 0)),
                     (0, 0), (0, 0)), constant_values=fill)
    if dx:
        a = jnp.pad(a[:, :, max(dx, 0):a.shape[2] + min(dx, 0)],
                    ((0, 0), (0, 0),
                     (max(-dx, 0), max(dx, 0)), (0, 0)),
                    constant_values=fill)
    return a


def _seg_cummin(lab, occ, reverse, axis=2):
    """Min-scan of labels along `axis` (G by default), restarting at
    unoccupied cells (labels propagate only through consecutive occupied
    cells)."""
    def comb(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    v, _ = lax.associative_scan(comb, (lab, ~occ), axis=axis,
                                reverse=reverse)
    return jnp.where(occ, v, _CCL_BIG)


def grid_ccl_labels(occ, max_iters=None, column_scan=False):
    """8-connectivity connected-component labels of (B, L, G, C)
    boolean grids (each (b, c) plane independent).  Occupied cells get
    their component's minimum linear index y*G+g — the raster-first
    cell, i.e. scipy.ndimage.label's component ORDER — unoccupied cells
    _CCL_BIG.  Returns (labels (B, L, G, C) i32, lin (L, G) i32,
    converged bool — False iff the sweep cap was hit while labels were
    still moving; callers must not trust un-converged labels).

    max_iters: static sweep cap (default GRID_CCL_MAX_ITERS).  NOTE it
    bakes into the traced program — vary it only through a fresh
    closure, never by mutating the module constant around a cached
    jit.

    column_scan=True additionally min-scans along the row axis each
    sweep: vertical label propagation jumps whole vertical runs instead
    of one row, so page-scale components (device_page_plans) converge in
    O(alternations of the component's monotone serpentine), not O(rows).
    The folded-profile callers keep the cheaper row-only sweep."""
    cap = GRID_CCL_MAX_ITERS if max_iters is None else max_iters
    B, L, G, C = occ.shape
    lin = (jnp.arange(L, dtype=jnp.int32)[:, None] * G
           + jnp.arange(G, dtype=jnp.int32)[None, :])
    lab0 = jnp.where(occ, lin[None, :, :, None], _CCL_BIG)

    def sweep(lab):
        m = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, _shift_fill(lab, dy, dx, _CCL_BIG))
        lab = jnp.where(occ, jnp.minimum(lab, m), _CCL_BIG)
        lab = _seg_cummin(lab, occ, reverse=False)
        lab = _seg_cummin(lab, occ, reverse=True)
        if column_scan:
            lab = _seg_cummin(lab, occ, reverse=False, axis=1)
            lab = _seg_cummin(lab, occ, reverse=True, axis=1)
        return lab

    def cond(state):
        lab, prev, it = state
        return (it < cap) & jnp.any(lab != prev)

    def body(state):
        lab, _, it = state
        return sweep(lab), lab, it + 1

    lab, prev, _ = lax.while_loop(cond, body,
                                  (sweep(lab0), lab0, jnp.int32(1)))
    return lab, lin, ~jnp.any(lab != prev)


def grid_ccl_tables(prof, view_h, view_w, gw, ds=PROFILE_ROW_DS,
                    max_blobs=MAX_BAND_BLOBS):
    """Blob tables from 2D components of the folded closed profile —
    the device twin of the host escalation planner's geometry
    (pipeline._plan_lines_from_profile): same folded grid, same
    8-connectivity, same quantized bbox/center coordinates
    (y*ds .. (y+1)*ds clipped to view_h; g*gw .. (g+1)*gw clipped to
    view_w; centers mean*step + (step-1)/2).

    prof: (B, L, G, C) bool folded closed profile (rows >= the view are
    zero-padding); view_h/view_w/gw: (B,) i32 per-paragraph view dims +
    group width of the chosen axis.  Returns (table (B, M, 7, C) f32 in
    VIEW coordinates [count, y0, y1, x0, x1, cy, cx], n_blobs (B, C)
    i32 — may exceed M, in which case the caller must keep the host
    escalation path — and converged: scalar bool from
    grid_ccl_labels)."""
    B, L, G, C = prof.shape
    # the host planner slices bits[:ceil(view_h/ds)] — cells at or past
    # that row are not part of its grid
    rows_ok = (jnp.arange(L, dtype=jnp.int32)[None, :] * ds
               < view_h[:, None])                           # (B, L)
    occ = prof & rows_ok[:, :, None, None]
    lab, lin, converged = grid_ccl_labels(occ)

    flat = lab.reshape(B, L * G, C)
    linf = lin.reshape(L * G)
    is_root = flat == linf[None, :, None]                   # (B, K, C)
    n_blobs = jnp.sum(is_root.astype(jnp.int32), axis=1)    # (B, C)
    roots = jnp.sort(
        jnp.where(is_root, linf[None, :, None], _CCL_BIG),
        axis=1)[:, :max_blobs, :]                           # (B, M, C)

    member = ((lab[:, :, :, None, :] == roots[:, None, None, :, :])
              & (roots < _CCL_BIG)[:, None, None, :, :])    # (B,L,G,M,C)
    mf = member.astype(jnp.float32)
    ysf = jnp.arange(L, dtype=jnp.float32).reshape(1, L, 1, 1, 1)
    gsf = jnp.arange(G, dtype=jnp.float32).reshape(1, 1, G, 1, 1)
    cnt = jnp.sum(mf, axis=(1, 2))                          # (B, M, C)
    sy = jnp.sum(mf * ysf, axis=(1, 2))
    sg = jnp.sum(mf * gsf, axis=(1, 2))
    ysi = jnp.arange(L, dtype=jnp.int32).reshape(1, L, 1, 1, 1)
    gsi = jnp.arange(G, dtype=jnp.int32).reshape(1, 1, G, 1, 1)
    y0 = jnp.min(jnp.where(member, ysi, L), axis=(1, 2))    # (B, M, C)
    y1 = jnp.max(jnp.where(member, ysi, -1), axis=(1, 2))
    g0 = jnp.min(jnp.where(member, gsi, G), axis=(1, 2))
    g1 = jnp.max(jnp.where(member, gsi, -1), axis=(1, 2))

    dsf = jnp.float32(ds)
    gwf = gw[:, None, None].astype(jnp.float32)
    denom = jnp.maximum(cnt, 1.0)
    y0v = (y0 * ds).astype(jnp.float32)
    y1v = jnp.minimum((y1 + 1) * ds,
                      view_h[:, None, None]).astype(jnp.float32)
    x0v = (g0 * gw[:, None, None]).astype(jnp.float32)
    x1v = jnp.minimum((g1 + 1) * gw[:, None, None],
                      view_w[:, None, None]).astype(jnp.float32)
    cy = sy / denom * dsf + (dsf - 1.0) / 2.0
    cx = sg / denom * gwf + (gwf - 1.0) / 2.0
    used = (cnt > 0).astype(jnp.float32)[:, :, None, :]
    table = jnp.stack([cnt, y0v, y1v, x0v, x1v, cy, cx], axis=2) * used
    return table, n_blobs, converged


def grid_ccl_tables_host(prof, view_h, view_w, gw, ds=PROFILE_ROW_DS):
    """NumPy/scipy mirror of grid_ccl_tables for ONE paragraph's
    (L, G, C) profile: scipy.ndimage 8-connectivity components with the
    host planner's exact coordinate math.  Returns (table (M', 7, C)
    f32 in view coordinates, n_blobs (C,)) with M' = max component
    count (unpadded)."""
    from scipy import ndimage

    L, G, C = prof.shape
    rows = -(-view_h // ds)
    occ = prof.copy()
    occ[rows:] = False
    eight = np.ones((3, 3), bool)
    per_chan = []
    n_blobs = np.zeros((C,), np.int32)
    for c in range(C):
        labels, cnt = ndimage.label(occ[:, :, c], structure=eight)
        n_blobs[c] = cnt
        rows_out = []
        for blob in range(1, cnt + 1):
            pts = np.argwhere(labels == blob).astype(float)
            (py0, pg0), (py1, pg1) = pts.min(axis=0), pts.max(axis=0)
            rows_out.append([
                len(pts),
                py0 * ds, min((py1 + 1) * ds, view_h),
                pg0 * gw, min((pg1 + 1) * gw, view_w),
                pts[:, 0].mean() * ds + (ds - 1) / 2.0,
                pts[:, 1].mean() * gw + (gw - 1) / 2.0,
            ])
        per_chan.append(np.asarray(rows_out, np.float32).reshape(-1, 7))
    M = max(int(n_blobs.max()), 1)
    table = np.zeros((M, 7, C), np.float32)
    for c in range(C):
        table[:n_blobs[c], :, c] = per_chan[c]
    return table, n_blobs


def _close_1d_host(occ, radius):
    """NumPy mirror of _close_runs for ONE (L,) bool occupancy vector."""
    if not radius:
        return occ.copy()
    L = len(occ)
    dil = np.zeros_like(occ)
    for s in range(-radius, radius + 1):
        lo, hi = max(0, -s), min(L, L - s)
        dil[lo:hi] |= occ[lo + s:hi + s]
    closed = np.ones_like(occ)
    for s in range(-radius, radius + 1):
        pad = np.ones(L, bool)
        lo, hi = max(0, -s), min(L, L - s)
        pad[lo:hi] = dil[lo + s:hi + s]
        closed &= pad
    return closed


def suspect_profile_host(bands):
    """NumPy mirror of _suspect_profile: (B, H, W, C) bool ->
    ((B,) bool, (B, H, G, C) bool closed profile)."""
    bands = np.asarray(bands, bool)
    B, H, W, C = bands.shape
    G, gw, _ = _group_centers(W)
    Wp = G * gw
    m = bands
    if Wp != W:
        m = np.pad(m, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    prof = m.reshape(B, H, G, gw, C).any(axis=3)            # (B,H,G,C)
    out = np.zeros(B, bool)
    profc = np.zeros_like(prof)

    def _tall_runs(v):
        er = v.copy()
        for s in range(1, MERGE_MIN_ROWS):
            sh = np.zeros_like(v)
            sh[:len(v) - s] = v[s:]
            er &= sh
        return int((er & ~np.concatenate([[False], er[:-1]])).sum())

    for bi in range(B):
        for c in range(C):
            for g in range(G):
                profc[bi, :, g, c] = _close_1d_host(prof[bi, :, g, c],
                                                    CLOSE_RADIUS)
            ng = _tall_runs(_close_1d_host(prof[bi, :, :, c].any(axis=1),
                                           CLOSE_RADIUS))
            nl = max(_tall_runs(profc[bi, :, g, c]) for g in range(G))
            if ng > 0 and nl > ng:
                out[bi] = True
    return out, profc


def merge_suspect_host(bands):
    """NumPy mirror of merge_suspect: (B, H, W, C) bool -> (B,) bool."""
    return suspect_profile_host(bands)[0]


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
    return _blob_tables_from_row_stats(cnt_r, sumx_r, minx_r, maxx_r, W,
                                       close_radius, max_blobs)


def _blob_tables_from_row_stats(cnt_r, sumx_r, minx_r, maxx_r, W,
                                close_radius, max_blobs):
    """Blob tables from per-row aggregates (B, H, C): count, sum of
    occupied column indices, min/max occupied column (sentinels W / -1
    on empty rows).  Exactly _axis_blob_tables' tail — a blob is a run
    of occupied rows, and every per-blob field is a sum/min/max of
    per-row stats, so group-sheared stats (whole column groups shift
    together) reproduce the full-resolution tables bit for bit."""
    B, H, C = cnt_r.shape
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


def _group_row_stats(bands):
    """Per-(row, column-group) aggregates of a (B, H, W, C) boolean
    view: (cnt f32, sumx f32, minx i32, maxx i32), each (B, H, G, C),
    with x the IN-VIEW column index and sentinels W / -1 on empty
    cells.  Four fused reduction passes over the full-resolution mask —
    the only full-resolution work the tables need; everything after
    runs on tensors W/G (~12x) smaller."""
    B, H, W, C = bands.shape
    G, gw, _ = _group_centers(W)
    Wp = G * gw
    m = bands
    if Wp != W:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    m = m.reshape(B, H, G, gw, C)
    xs = jnp.arange(Wp, dtype=jnp.int32).reshape(1, 1, G, gw, 1)
    mf = m.astype(jnp.float32)
    cnt = jnp.sum(mf, axis=3)                               # (B,H,G,C)
    sumx = jnp.sum(mf * xs.astype(jnp.float32), axis=3)
    minx = jnp.min(jnp.where(m, xs, W), axis=3)
    maxx = jnp.max(jnp.where(m, xs, -1), axis=3)
    return cnt, sumx, minx, maxx


def _group_col_stats(bands):
    """Column-axis twin of _group_row_stats WITHOUT materializing the
    transposed mask: per-(column, row-group) aggregates of the
    (B, W, H, C) transposed view, computed by reducing row groups on
    the original (B, H, W, C) layout and transposing the ~12x-smaller
    grouped result.  Bit-identical to
    _group_row_stats(transpose(bands, (0, 2, 1, 3)))."""
    B, H, W, C = bands.shape
    G, gh, _ = _group_centers(H)
    Hp = G * gh
    m = bands
    if Hp != H:
        m = jnp.pad(m, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    m = m.reshape(B, G, gh, W, C)
    ys = jnp.arange(Hp, dtype=jnp.int32).reshape(1, G, gh, 1, 1)
    mf = m.astype(jnp.float32)
    cnt = jnp.sum(mf, axis=2)                               # (B,G,W,C)
    sumy = jnp.sum(mf * ys.astype(jnp.float32), axis=2)
    miny = jnp.min(jnp.where(m, ys, H), axis=2)
    maxy = jnp.max(jnp.where(m, ys, -1), axis=2)

    def tr(t):
        return jnp.transpose(t, (0, 2, 1, 3))               # (B,W,G,C)

    return tr(cnt), tr(sumy), tr(miny), tr(maxy)


def _group_stats_both(bands):
    """Both axes' group stats from ONE channel-major relayout.

    bands is (B, H, W, C) with C = 2-3 — on TPU the minor dim maps to
    the 128 lanes, so every full-resolution pass over the NHWC masks
    runs at ~2 % lane utilization.  Relayout once to (B, C, H, W)
    (W on lanes) and take all eight reduction passes there; the grouped
    results are ~12x smaller and transpose back cheaply.

    Bit-identical to (_group_row_stats(bands),
    _group_col_stats(bands)): counts and index sums are integers below
    2^24, exact in f32 under any reduction order."""
    B, H, W, C = bands.shape
    bt = jnp.transpose(bands, (0, 3, 1, 2))                 # (B,C,H,W)

    def tr(t):                                              # grouped ->
        return jnp.transpose(t, (0, 2, 3, 1))               # (B,*,G,C)

    # rows view: per-(row, column-group) stats
    G, gw, _ = _group_centers(W)
    Wp = G * gw
    m = bt if Wp == W else jnp.pad(
        bt, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    m = m.reshape(B, C, H, G, gw)
    xs = jnp.arange(Wp, dtype=jnp.int32).reshape(1, 1, 1, G, gw)
    mf = m.astype(jnp.float32)
    rows = (tr(jnp.sum(mf, axis=4)),
            tr(jnp.sum(mf * xs.astype(jnp.float32), axis=4)),
            tr(jnp.min(jnp.where(m, xs, W), axis=4)),
            tr(jnp.max(jnp.where(m, xs, -1), axis=4)))

    # cols view: per-(column, row-group) stats of the transposed view
    Gh, gh, _ = _group_centers(H)
    Hp = Gh * gh
    mc = bt if Hp == H else jnp.pad(
        bt, ((0, 0), (0, 0), (0, Hp - H), (0, 0)))
    mc = mc.reshape(B, C, Gh, gh, W)
    ys = jnp.arange(Hp, dtype=jnp.int32).reshape(1, 1, Gh, gh, 1)
    mcf = mc.astype(jnp.float32)

    def trc(t):                                             # (B,C,G,W)
        return jnp.transpose(t, (0, 3, 2, 1))               # (B,W,G,C)

    cols = (trc(jnp.sum(mcf, axis=3)),
            trc(jnp.sum(mcf * ys.astype(jnp.float32), axis=3)),
            trc(jnp.min(jnp.where(mc, ys, H), axis=3)),
            trc(jnp.max(jnp.where(mc, ys, -1), axis=3)))
    return rows, cols


def band_blob_tables(bands, close_radius=CLOSE_RADIUS,
                     max_blobs=MAX_BAND_BLOBS, margin=False):
    """Both-axis blob tables of (B, H, W, C) boolean band masks, each
    axis decomposed AFTER shearing away that axis's residual tilt
    (_best_shear), so bands that bleed across rows (columns) still
    separate into per-line runs.

    Returns (tables, n_blobs, shears): tables (B, 2, max_blobs, 7, C)
    f32 with axis 1 = {0: row-run decomposition, 1: column-run
    decomposition}, fields [count, y0, y1, x0, x1, cy, cx] in SHEARED
    image coordinates per axis (identical to original coordinates for
    untilted content); n_blobs (B, 2, C) int32; shears (B, 2) f32 per-
    axis slopes.  margin=True additionally shifts tilted content down
    (right) by the shear span so up-sheared rows stay in frame — used
    for rotated crops, whose content starts at row 0; the host adds the
    same margin when sizing the crop bucket.

    The shear is per column group (_group_shifts), so the tables
    decompose EXACTLY onto the per-group row stats: whole groups shift
    together, and every blob field is a sum/min/max of per-row
    aggregates.  No full-resolution mask is ever sheared or gathered."""
    row_stats, col_stats = _group_stats_both(bands)
    t0, n0, s0, _, _ = _axis_pack(None, close_radius, max_blobs, margin,
                                  stats=row_stats,
                                  extent=bands.shape[2])
    t1, n1, s1, _, _ = _axis_pack(None, close_radius, max_blobs, margin,
                                  stats=col_stats,
                                  extent=bands.shape[1])
    # un-transpose the column-axis fields back to image coordinates
    t1 = t1[:, :, (0, 3, 4, 1, 2, 6, 5), :]
    return (jnp.stack([t0, t1], axis=1), jnp.stack([n0, n1], axis=1),
            jnp.stack([s0, s1], axis=1))


def _axis_pack(view, close_radius=CLOSE_RADIUS, max_blobs=MAX_BAND_BLOBS,
               margin=False, stats=None, extent=None):
    """One stacking axis's full tables pipeline from a (B, L, E, C)
    boolean view (E = the run axis' extent): group row stats ->
    best shear -> sheared stats -> blob tables + the sheared
    unclosed/closed profiles the suspect test and the escalation
    payload need.  Returns (table (B,M,7,C), n_blobs (B,C), shear (B,),
    suspect (B,), closed profile (B,L,G,C)).

    `stats`/`extent` take precomputed (cnt, sumx, minx, maxx) group
    stats with the view's run-axis extent — the column-axis caller
    passes _group_col_stats(bands) so no full-resolution transpose is
    ever materialized (`view` is then ignored and may be None)."""
    if stats is None:
        B, L, E, C = view.shape
        cnt, sumx, minx, maxx = _group_row_stats(view)
    else:
        cnt, sumx, minx, maxx = stats
        B, L, _, C = cnt.shape
        E = extent
    S = _shear_span(E)
    prof_any = jnp.any(cnt > 0, axis=3)                     # (B,L,G)
    s = _best_shear_from_prof(prof_any, E)
    off = (jnp.where(s != 0.0, S, 0) if margin
           else jnp.zeros((B,), jnp.int32)).astype(jnp.int32)
    v = 2 * S - off[:, None] + _group_shifts(s, E)          # (B,G)

    def shear(stat, fill):
        pad_val = jnp.asarray(fill, stat.dtype)
        padded = jnp.concatenate([
            jnp.full((B, 2 * S) + stat.shape[2:], pad_val, stat.dtype),
            stat,
            jnp.full((B, S) + stat.shape[2:], pad_val, stat.dtype),
        ], axis=1)
        return _log_shift_rows(padded, v, L)

    cnt_s = shear(cnt, 0.0)
    sumx_s = shear(sumx, 0.0)
    minx_s = shear(minx, E)
    maxx_s = shear(maxx, -1)

    tbl, n = _blob_tables_from_row_stats(
        jnp.sum(cnt_s, axis=2), jnp.sum(sumx_s, axis=2),
        jnp.min(minx_s, axis=2), jnp.max(maxx_s, axis=2),
        E, close_radius, max_blobs)
    suspect, profc = _suspect_from_prof(cnt_s > 0)
    return tbl, n, s, suspect, profc


def _best_shear_host(view_b):
    """NumPy mirror of _best_shear for ONE paragraph's (L, W, C) mask."""
    L, W, C = view_b.shape
    S = _shear_span(W)
    m = view_b.any(axis=2)                                  # (L, W)
    G, gw, centers = _group_centers(W)
    Wp = G * gw
    if Wp != W:
        m = np.pad(m, ((0, 0), (0, Wp - W)))
    prof = m.reshape(L, G, gw).any(axis=2)                  # (L, G)
    slopes = _shear_candidates()
    shifts = np.clip(np.round(slopes[:, None] * centers[None, :]),
                     -S, S).astype(np.int32)                # (K, G)
    R = L + 2 * S
    profp = np.pad(prof, ((2 * S, 2 * S), (0, 0)))
    occ = np.zeros((SHEAR_CANDIDATES, R, G), bool)
    for d in range(-S, S + 1):
        sel = (shifts == d)[:, None, :]
        occ |= profp[None, d + S:d + S + R, :] & sel
    score = occ.any(axis=2).sum(axis=1).astype(np.float32)
    score = score + (1e-3 * np.abs(slopes) / MAX_SHEAR).astype(np.float32)
    return np.float32(slopes[int(np.argmin(score))])


def _shear_rows_host(view_b, s, off):
    """NumPy mirror of _shear_rows for ONE paragraph's (L, W, C) mask:
    per column-GROUP shifts (the same _group_shifts the device applies
    and _best_shear scores with)."""
    L, W, C = view_b.shape
    S = _shear_span(W)
    G, gw, centers = _group_centers(W)
    d = np.clip(np.round(np.float32(s) * centers), -S, S).astype(np.int32)
    t = off - np.repeat(d, gw)[:W]                          # (W,)
    padded = np.pad(view_b, ((2 * S, S), (0, 0), (0, 0)))
    out = np.zeros_like(view_b)
    for xi in range(W):
        out[:, xi] = padded[2 * S - t[xi]:2 * S - t[xi] + L, xi]
    return out


def band_blob_tables_host(bands, close_radius=CLOSE_RADIUS,
                          max_blobs=MAX_BAND_BLOBS, margin=False):
    """NumPy reference of band_blob_tables (same fields, same shear and
    merge semantics) — the equality pin for the device kernel and the
    host fallback when planning without a device round trip."""
    bands = np.asarray(bands, bool)
    B, H, W, C = bands.shape
    tables = np.zeros((B, 2, max_blobs, 7, C), np.float32)
    n_blobs = np.zeros((B, 2, C), np.int32)
    shears = np.zeros((B, 2), np.float32)
    for axis in range(2):
        view = bands if axis == 0 else bands.transpose(0, 2, 1, 3)
        L = view.shape[1]
        for bi in range(B):
            s = _best_shear_host(view[bi])
            shears[bi, axis] = s
            off = _shear_span(view.shape[2]) if (margin and s != 0.0) else 0
            sheared = _shear_rows_host(view[bi], s, off)
            for c in range(C):
                m = sheared[:, :, c]
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
    return tables, n_blobs, shears


def choose_stacking_axis_host(tables, n_blobs):
    """NumPy mirror of choose_stacking_axis: (B,) int32."""
    tables = np.asarray(tables)

    def overlap(tbl, lo, hi):
        t_lo, t_hi = tbl[:, :, lo, 0], tbl[:, :, hi, 0]
        b_lo, b_hi = tbl[:, :, lo, 1], tbl[:, :, hi, 1]
        ov = (np.minimum(t_hi[:, :, None], b_hi[:, None, :])
              - np.maximum(t_lo[:, :, None], b_lo[:, None, :]))
        return np.maximum(ov, 0.0).sum(axis=(1, 2))

    del n_blobs
    return (overlap(tables[:, 0], 1, 2)
            > overlap(tables[:, 1], 3, 4)).astype(np.int32)


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


# ---------------------------------------------------------------------------
# Two-pass affine paragraph crops (MXU resampling, no arbitrary gathers)
#
# The bilinear-gather crops above are the EXACT reference (pinned to the
# host scipy path at 2e-5), but an arbitrary-index gather over a
# (B, HB, WB) grid costs ~770 ms/launch on TPU (measured, round 3) — it
# cannot tile onto the MXU or the VPU lanes.  Serving uses this
# decomposition instead:
#
#   1. parity fold: angles in (45, 135) degrees are reduced by an exact
#      rot90 of the source (baked into the extraction one-hots), so the
#      residual rotation always has |cos| >= |sin|;
#   2. bbox extraction as two one-hot matmuls (exact, integer indices);
#   3. rotation as two 1D resample passes (Catmull-Smith / Paeth): each
#      pass is a per-line integer shift (log2 static-slice selects) +
#      a per-line 2-tap fractional blend + a shared-scale bilinear
#      one-hot matmul on the MXU.
#
# Level paragraphs (cos=1, sin=0 — the identity affine) reduce to pure
# one-hot projections: bit-exact with the gather and the host crop.
# Rotated paragraphs differ from true 2D bilinear by the classic
# two-pass interpolation composition (a 3-tap effective kernel, the same
# approximation Paeth rotation makes); the end-to-end OCR equality tests
# bound the effect.  ~3-5 ms/launch replaces ~770.
# ---------------------------------------------------------------------------


def _log_shift_cols(padded, v, K):
    """out[b, i, x] = padded[b, i, x + v[b, i]] for x in [0, K), v in
    [0, Vmax], as ceil(log2(Vmax+1)) static-slice selects.  Reads past
    the end repeat the last column (callers pad the tail with their fill
    value)."""
    Vmax = int(padded.shape[2]) - K
    cur = padded
    k = 0
    while (1 << k) <= Vmax:
        step = 1 << k
        shifted = jnp.concatenate(
            [cur[:, :, step:], jnp.repeat(cur[:, :, -1:], step, axis=2)],
            axis=2)
        bit = ((v >> k) & 1).astype(bool)
        cur = jnp.where(bit[:, :, None], shifted, cur)
        k += 1
    return cur[:, :, :K]


def _affine_pass(src, scale, line_off, pos_off, S, sel_dtype, mxu):
    """One resample pass: dst[b, i, j] = linear interp of src[b, i, .]
    at position scale_b*j + line_off_b*(i - I//2) + pos_off_b, reading
    zero outside [0, K-1].  S is the static bound on
    |line_off*(i - I//2)| (callers derive it from the parity-fold
    guarantee |line_off| <= 1 for the x pass, <= sin(45deg) for y)."""
    B, I, K = src.shape
    i_rel = jnp.arange(I, dtype=jnp.float32) - (I // 2)
    q = line_off[:, None] * i_rel[None, :]                  # (B, I)
    d = jnp.floor(q)
    f = (q - d).astype(src.dtype)
    d = jnp.clip(d.astype(jnp.int32), -S, S)
    padded = jnp.concatenate([
        jnp.zeros((B, I, 2 * S), src.dtype), src,
        jnp.zeros((B, I, 2 * S + 1), src.dtype)], axis=2)
    shifted = _log_shift_cols(padded, S + d, K + 2 * S + 1)
    # per-line fractional blend: blended[x] = src[x - S + q] zero-ext.
    blended = (shifted[:, :, :K + 2 * S] * (1 - f)[:, :, None]
               + shifted[:, :, 1:] * f[:, :, None])
    pos0 = (scale[:, None] * jnp.arange(K, dtype=jnp.float32)[None, :]
            + pos_off[:, None])                             # (B, J=K)
    x0 = jnp.floor(pos0)
    w = (pos0 - x0).astype(src.dtype)
    xi = x0.astype(jnp.int32) + S
    ar = jnp.arange(K + 2 * S, dtype=jnp.int32)
    sel = ((xi[:, :, None] == ar).astype(sel_dtype) * (1 - w)[:, :, None]
           + ((xi + 1)[:, :, None] == ar).astype(sel_dtype)
           * w[:, :, None])                                 # (B, J, K+2S)
    return jnp.einsum('bix,bjx->bij', blended, sel, precision=mxu)


def _twopass_crops(pages, blob, page_idx, src_y0, src_x0, src_h, src_w,
                   cos_a, sin_a, off_y, off_x, out_y0, out_x0,
                   out_h, out_w, pad_y, pad_x, out_hb, out_wb,
                   precision=None):
    """Shared core of the two-pass crop variants.

    pages : (N, HP, WP) f32 page planes, already paragraph-masked for the
            resident path (mono*para commutes with resampling because the
            gather reference also multiplies at integer corner coords).
    blob  : (B, HB, WB) f32 bbox-local blob mask or None.
    Other args as rotated_paragraph_crops.  Returns (B, HB, WB, 1) f32.
    """
    B = page_idx.shape[0]
    HB, WB = out_hb, out_wb
    mode = precision_policy.resolve(precision)
    if mode == 'bf16':
        sel_dtype, mxu = jnp.bfloat16, lax.Precision.DEFAULT
    else:
        sel_dtype, mxu = jnp.float32, lax.Precision.HIGHEST
    pg = jnp.take(pages.astype(sel_dtype), page_idx, axis=0)  # (B,HP,WP)
    HP, WP = pg.shape[1], pg.shape[2]

    sy0 = jnp.asarray(src_y0, jnp.int32)[:, None]
    sx0 = jnp.asarray(src_x0, jnp.int32)[:, None]
    sh = jnp.asarray(src_h, jnp.int32)
    sw = jnp.asarray(src_w, jnp.int32)
    cos_v = jnp.asarray(cos_a, jnp.float32)
    sin_v = jnp.asarray(sin_a, jnp.float32)
    oy = jnp.asarray(off_y, jnp.float32)
    ox = jnp.asarray(off_x, jnp.float32)

    # parity fold: sample the rot90'd source when |sin| > |cos|, so the
    # residual rotation satisfies |cos_r| >= |sin_r| (>= cos 45deg)
    par = jnp.abs(sin_v) > jnp.abs(cos_v)
    c_r = jnp.where(par, sin_v, cos_v)
    s_r = jnp.where(par, -cos_v, sin_v)
    swf = sw.astype(jnp.float32)
    oy_r = jnp.where(par, swf - 1.0 - ox, oy)
    ox_r = jnp.where(par, oy, ox)

    def one_hot(idx, size, valid):
        ar = jnp.arange(size, dtype=jnp.int32)
        return ((idx[:, :, None] == ar) & valid[:, :, None]).astype(
            sel_dtype)

    iH = jnp.arange(HB, dtype=jnp.int32)[None, :]
    iW = jnp.arange(WB, dtype=jnp.int32)[None, :]
    # parity 0: E0[i, j] = pg[sy0+i, sx0+j]
    r0 = one_hot(sy0 + iH, HP, iH < sh[:, None])            # (B,HB,HP)
    c0 = one_hot(sx0 + iW, WP, iW < sw[:, None])            # (B,WB,WP)
    e0 = jnp.einsum('biy,byx->bix', r0, pg, precision=mxu)
    e0 = jnp.einsum('bix,bjx->bij', e0, c0, precision=mxu)  # (B,HB,WB)
    # parity 1: E90[i, j] = pg[sy0+j, sx0+sw-1-i]  (rot90 CCW of the
    # bbox crop, computed transposed then flipped back)
    r1 = one_hot(sy0 + iW, HP, iW < sh[:, None])            # (B,WB,HP)
    c1 = one_hot(sx0 + sw[:, None] - 1 - iH, WP,
                 iH < sw[:, None])                          # (B,HB,WP)
    d90 = jnp.einsum('bjy,byx->bjx', r1, pg, precision=mxu)
    d90 = jnp.einsum('bjx,bix->bji', d90, c1, precision=mxu)  # (B,WB,HB)
    if blob is not None:
        blob = blob.astype(sel_dtype)
        e0 = e0 * blob
        # d90[j, i] needs blob[j, sw-1-i]; j spans WB slots (content
        # j < sh), so resize the blob's row axis to WB first
        if WB >= HB:
            blobr = jnp.pad(blob, ((0, 0), (0, WB - HB), (0, 0)))
        else:
            blobr = blob[:, :WB, :]
        fl = one_hot(sw[:, None] - 1 - iH, WB, iH < sw[:, None])
        d90 = d90 * jnp.einsum('bjx,bix->bji', blobr, fl, precision=mxu)
    src = jnp.where(par[:, None, None], jnp.transpose(d90, (0, 2, 1)), e0)

    gy0 = (jnp.asarray(out_y0, jnp.float32) - jnp.asarray(pad_y, jnp.float32))
    gx0 = (jnp.asarray(out_x0, jnp.float32) - jnp.asarray(pad_x, jnp.float32))

    # pass 1 (x): X'(y, g) = (1/c)(g + gx0) - (s/c) y + ox + (s/c) oy —
    # the x position that, composed with pass 2's row positions, lands
    # exactly on the affine's backward map (X'(Y(r,g), g) == in_x(r,g))
    inv_c = 1.0 / c_r
    t = s_r * inv_c                                         # |t| <= 1
    S1 = HB - HB // 2 + 1
    h_mid = _affine_pass(
        src, inv_c, -t,
        inv_c * gx0 + ox_r + t * oy_r - t * (HB // 2),
        S1, sel_dtype, mxu)
    # pass 2 (y): Y(r, g) = c (r + gy0) + s (g + gx0) + oy, along rows
    # of the transposed intermediate
    S2 = int(np.ceil(0.70711 * (WB - WB // 2))) + 1
    out_t = _affine_pass(
        jnp.transpose(h_mid, (0, 2, 1)), c_r, s_r,
        c_r * gy0 + s_r * gx0 + oy_r + s_r * (WB // 2),
        S2, sel_dtype, mxu)
    crops = jnp.transpose(out_t, (0, 2, 1)).astype(jnp.float32)

    # domain and output-window masks, from the ORIGINAL affine — the
    # same expressions (and hence the same boundary-epsilon behavior) as
    # the gather reference; the residual-frame coordinates describe the
    # identical region but wobble differently at exact edges
    grid_y = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 1)
              + gy0[:, None, None])
    grid_x = (lax.broadcasted_iota(jnp.float32, (B, HB, WB), 2)
              + gx0[:, None, None])
    in_y = cos_v[:, None, None] * grid_y + sin_v[:, None, None] * grid_x \
        + oy[:, None, None]
    in_x = -sin_v[:, None, None] * grid_y + cos_v[:, None, None] * grid_x \
        + ox[:, None, None]
    shf = sh.astype(jnp.float32)
    in_domain = ((in_y >= 0) & (in_y <= shf[:, None, None] - 1)
                 & (in_x >= 0) & (in_x <= swf[:, None, None] - 1))
    out_rows = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 1)
    out_cols = lax.broadcasted_iota(jnp.int32, (B, HB, WB), 2)
    py = jnp.asarray(pad_y, jnp.int32)[:, None, None]
    px = jnp.asarray(pad_x, jnp.int32)[:, None, None]
    oh = jnp.asarray(out_h, jnp.int32)[:, None, None]
    ow = jnp.asarray(out_w, jnp.int32)[:, None, None]
    in_slice = ((out_rows >= py) & (out_rows < py + oh)
                & (out_cols >= px) & (out_cols < px + ow))
    return jnp.where(in_domain & in_slice, crops, 0.0)[..., None]


def twopass_paragraph_crops(mono_stack, blob_bits, page_idx,
                            src_y0, src_x0, src_h, src_w,
                            cos_a, sin_a, off_y, off_x,
                            out_y0, out_x0, out_h, out_w,
                            pad_y, pad_x, precision=None):
    """rotated_paragraph_crops semantics via the two-pass MXU resampler
    (bit-exact for level paragraphs, Paeth-style two-pass for rotated)."""
    B, HB = blob_bits.shape[0], blob_bits.shape[1]
    WB = blob_bits.shape[2] * 8
    blob = jnp.unpackbits(blob_bits, axis=2).astype(jnp.float32)
    return _twopass_crops(mono_stack[:, :, :, 0], blob, page_idx,
                          src_y0, src_x0, src_h, src_w, cos_a, sin_a,
                          off_y, off_x, out_y0, out_x0, out_h, out_w,
                          pad_y, pad_x, HB, WB, precision=precision)


def twopass_paragraph_crops_resident(mono_stack, para_stack, page_idx,
                                     src_y0, src_x0, src_h, src_w,
                                     cos_a, sin_a, off_y, off_x,
                                     out_y0, out_x0, out_h, out_w,
                                     pad_y, pad_x, out_hb, out_wb,
                                     precision=None):
    """rotated_paragraph_crops_resident semantics via the two-pass MXU
    resampler.  The paragraph mask multiplies the page plane BEFORE
    resampling — equivalent to the gather's corner-level multiply, since
    both read the product at the same integer source coordinates."""
    masked = mono_stack[:, :, :, 0] * para_stack[:, :, :, 0]
    return _twopass_crops(masked, None, page_idx, src_y0, src_x0,
                          src_h, src_w, cos_a, sin_a, off_y, off_x,
                          out_y0, out_x0, out_h, out_w, pad_y, pad_x,
                          out_hb, out_wb, precision=precision)


def paragraph_stage_rot_resident(params, mono_stack, para_stack, page_idx,
                                 src_y0, src_x0, src_h, src_w,
                                 cos_a, sin_a, off_y, off_x,
                                 out_y0, out_x0, out_h, out_w,
                                 pad_y, pad_x, h_valid, w_valid,
                                 out_hb, out_wb, precision=None,
                                 tables=False, sampler='twopass'):
    """paragraph_stage without the blob upload (deskewed single-component
    bboxes)."""
    crops = extract_paragraph_crops_resident(
        mono_stack, para_stack, page_idx, src_y0, src_x0, src_h, src_w,
        cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h, out_w,
        pad_y, pad_x, out_hb, out_wb, precision=precision,
        sampler=sampler)
    return _finish_paragraph_stage(params, crops, h_valid, w_valid,
                                   precision=precision, tables=tables,
                                   margin=True)


def extract_paragraph_crops_resident(mono_stack, para_stack, page_idx,
                                     src_y0, src_x0, src_h, src_w,
                                     cos_a, sin_a, off_y, off_x,
                                     out_y0, out_x0, out_h, out_w,
                                     pad_y, pad_x, out_hb, out_wb,
                                     precision=None, sampler='twopass'):
    """Sampler-dispatching crop extraction (resident-mask variant)."""
    if sampler == 'twopass':
        return twopass_paragraph_crops_resident(
            mono_stack, para_stack, page_idx, src_y0, src_x0, src_h,
            src_w, cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h,
            out_w, pad_y, pad_x, out_hb, out_wb, precision=precision)
    return rotated_paragraph_crops_resident(
        mono_stack, para_stack, page_idx, src_y0, src_x0, src_h,
        src_w, cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h,
        out_w, pad_y, pad_x, out_hb, out_wb)


def paragraph_stage(params, mono_stack, blob_bits, page_idx,
                    src_y0, src_x0, src_h, src_w,
                    cos_a, sin_a, off_y, off_x, out_y0, out_x0,
                    out_h, out_w, pad_y, pad_x, h_valid, w_valid,
                    precision=None, tables=False, sampler='twopass'):
    """Fused deskewed-paragraph stage: paragraph crop resampling
    (two-pass MXU by default, exact bilinear gather on request) +
    masked Line FCN + band thresholding.
    Returns (crops, packed_bands | packed tables payload)."""
    crops = extract_paragraph_crops(
        mono_stack, blob_bits, page_idx, src_y0, src_x0, src_h, src_w,
        cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h, out_w,
        pad_y, pad_x, precision=precision, sampler=sampler)
    return _finish_paragraph_stage(params, crops, h_valid, w_valid,
                                   precision=precision, tables=tables,
                                   margin=True)


def extract_paragraph_crops(mono_stack, blob_bits, page_idx,
                            src_y0, src_x0, src_h, src_w,
                            cos_a, sin_a, off_y, off_x,
                            out_y0, out_x0, out_h, out_w,
                            pad_y, pad_x, precision=None,
                            sampler='twopass'):
    """Sampler-dispatching crop extraction (uploaded-blob variant)."""
    if sampler == 'twopass':
        return twopass_paragraph_crops(
            mono_stack, blob_bits, page_idx, src_y0, src_x0, src_h,
            src_w, cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h,
            out_w, pad_y, pad_x, precision=precision)
    return rotated_paragraph_crops(
        mono_stack, blob_bits, page_idx, src_y0, src_x0, src_h,
        src_w, cos_a, sin_a, off_y, off_x, out_y0, out_x0, out_h,
        out_w, pad_y, pad_x)


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


# ---------------------------------------------------------------------------
# Device paragraph planner — the single-page fused chain's replacement for
# the host's pull-bits -> scipy-CCL -> plan loop (pipeline.
# _page_paragraph_plans).  Same component order, same deskew angle search,
# same twopass plan arithmetic, computed where the mask already lives.
# ---------------------------------------------------------------------------

#: full-page CCL sweep cap: paragraph blobs are fat row-run components,
#: so label propagation crosses them in a handful of sweeps; the cap only
#: bounds the compiled while_loop (non-convergence flags the chain not-ok
#: and the host keeps its classic path)
PAGE_CCL_MAX_ITERS = 96


def _page_component_plans(lab, lin, menu, k_max):
    """Plan rows of ONE page from its CCL labels (the shared core of
    device_page_plans / device_chunk_plans).

    lab: (H, W) i32 component labels (grid_ccl_labels), lin (H, W) i32
    linear indices, menu: STATIC tuple of (hb, wb) crop shapes.  Returns
    (roots (K,) i32, plan (K, 20) f32 — the 19 PARAGRAPH_*_FIELDS
    columns plus the component root label for label-exact crop masking —
    menu_idx (K,) i32 into `menu`, n_comp i32).

    Mirrors pipeline._page_paragraph_plans field arithmetic exactly
    (see device_page_plans docstring); the menu pick replicates
    pipeline._line_menu_shape(shear_margin=True) and every clamp uses
    the CHOSEN menu entry, so host-side launch grouping reproduces
    today's per-shape program menu.
    """
    H, W = lab.shape
    flat = lab.reshape(-1)
    linf = lin.reshape(-1)
    is_root = (flat == linf) & (flat < _CCL_BIG)
    n_comp = jnp.sum(is_root.astype(jnp.int32))
    roots = jnp.sort(jnp.where(is_root, linf, _CCL_BIG))[:k_max]
    live = roots < _CCL_BIG                                 # (K,)

    member = lab[None, :, :] == roots[:, None, None]        # (K, H, W)
    ih = jnp.arange(H, dtype=jnp.int32)
    iw = jnp.arange(W, dtype=jnp.int32)
    rows_any = member.any(axis=2)                           # (K, H)
    xmin_r = jnp.min(jnp.where(member, iw[None, None, :], W), axis=2)
    xmax_r = jnp.max(jnp.where(member, iw[None, None, :], -1), axis=2)
    y0 = jnp.min(jnp.where(rows_any, ih[None, :], H), axis=1)
    y1 = jnp.max(jnp.where(rows_any, ih[None, :], -1), axis=1)
    cols_any = member.any(axis=1)                           # (K, W)
    x0 = jnp.min(jnp.where(cols_any, iw[None, :], W), axis=1)
    x1 = jnp.max(jnp.where(cols_any, iw[None, :], -1), axis=1)
    h = jnp.maximum(y1 - y0 + 1, 1)
    w = jnp.maximum(x1 - x0 + 1, 1)
    hf, wf = h.astype(jnp.float32), w.astype(jnp.float32)

    # --- deskew angle: height of the projection y*cos - x*sin over the
    # per-row extremal points (bbox-local), 1-degree grid over [0, 180]
    ysl = (ih[None, :] - y0[:, None]).astype(jnp.float32)   # (K, H)
    xlo = (xmin_r - x0[:, None]).astype(jnp.float32)
    xhi = (xmax_r - x0[:, None]).astype(jnp.float32)
    ang = jnp.arange(0.0, 181.0, 1.0, dtype=jnp.float32)
    tc = jnp.cos(jnp.deg2rad(ang))                          # (A,)
    ts = jnp.sin(jnp.deg2rad(ang))
    big = jnp.float32(3.0e8)
    vm = rows_any[:, :, None]

    def proj(x):
        return (ysl[:, :, None] * tc[None, None, :]
                - x[:, :, None] * ts[None, None, :])        # (K, H, A)

    plo, phi = proj(xlo), proj(xhi)
    pmax = jnp.maximum(jnp.max(jnp.where(vm, plo, -big), axis=1),
                       jnp.max(jnp.where(vm, phi, -big), axis=1))
    pmin = jnp.minimum(jnp.min(jnp.where(vm, plo, big), axis=1),
                       jnp.min(jnp.where(vm, phi, big), axis=1))
    aidx = jnp.argmin(pmax - pmin, axis=1)                  # (K,) first-min
    angle = aidx.astype(jnp.float32)
    level = (angle < 1.0) | (angle > 179.0)

    # --- rotate_affine: scipy rotate(angle, reshape=True) geometry
    rad = jnp.deg2rad(angle)
    ca, sa = jnp.cos(rad), jnp.sin(rad)
    cyc = jnp.stack([jnp.zeros_like(hf), jnp.zeros_like(hf), hf, hf], 1)
    cxc = jnp.stack([jnp.zeros_like(wf), wf, jnp.zeros_like(wf), wf], 1)
    py_c = ca[:, None] * cyc + sa[:, None] * cxc            # (K, 4)
    px_c = -sa[:, None] * cyc + ca[:, None] * cxc
    rh = jnp.floor(py_c.max(1) - py_c.min(1) + 0.5).astype(jnp.int32)
    rw = jnp.floor(px_c.max(1) - px_c.min(1) + 0.5).astype(jnp.int32)
    rhf, rwf = rh.astype(jnp.float32), rw.astype(jnp.float32)
    off_y = (hf - 1.0) / 2.0 - (ca * (rhf - 1.0) / 2.0
                                + sa * (rwf - 1.0) / 2.0)
    off_x = (wf - 1.0) / 2.0 - (-sa * (rhf - 1.0) / 2.0
                                + ca * (rwf - 1.0) / 2.0)

    # --- rotated bbox of the extremal points + sampling margin
    dy = ysl - off_y[:, None]                               # (K, H)
    dlo = xlo - off_x[:, None]
    dhi = xhi - off_x[:, None]
    py_lo = ca[:, None] * dy - sa[:, None] * dlo
    py_hi = ca[:, None] * dy - sa[:, None] * dhi
    px_lo = sa[:, None] * dy + ca[:, None] * dlo
    px_hi = sa[:, None] * dy + ca[:, None] * dhi
    vr = rows_any
    py_min = jnp.minimum(jnp.min(jnp.where(vr, py_lo, big), 1),
                         jnp.min(jnp.where(vr, py_hi, big), 1))
    py_max = jnp.maximum(jnp.max(jnp.where(vr, py_lo, -big), 1),
                         jnp.max(jnp.where(vr, py_hi, -big), 1))
    px_min = jnp.minimum(jnp.min(jnp.where(vr, px_lo, big), 1),
                         jnp.min(jnp.where(vr, px_hi, big), 1))
    px_max = jnp.maximum(jnp.max(jnp.where(vr, px_lo, -big), 1),
                         jnp.max(jnp.where(vr, px_hi, -big), 1))
    marg = (jnp.abs(ca) + jnp.abs(sa)) / 2.0
    ry0 = jnp.maximum(jnp.floor(py_min - marg), 0.0).astype(jnp.int32)
    rx0 = jnp.maximum(jnp.floor(px_min - marg), 0.0).astype(jnp.int32)
    ry1 = jnp.minimum(jnp.ceil(py_max + marg).astype(jnp.int32), rh - 1)
    rx1 = jnp.minimum(jnp.ceil(px_max + marg).astype(jnp.int32), rw - 1)
    out_h = ry1 - ry0 + 1
    out_w = rx1 - rx0 + 1

    # --- level override (identity affine)
    ca = jnp.where(level, 1.0, ca)
    sa = jnp.where(level, 0.0, sa)
    off_y = jnp.where(level, 0.0, off_y)
    off_x = jnp.where(level, 0.0, off_x)
    ry0 = jnp.where(level, 0, ry0)
    rx0 = jnp.where(level, 0, rx0)
    out_h = jnp.where(level, h, out_h)
    out_w = jnp.where(level, w, out_w)

    # --- /16 center pad (make_divisible_by: always adds >= 1)
    pad_h = 16 - out_h % 16
    pad_w = 16 - out_w % 16
    hv = out_h + pad_h
    wv = out_w + pad_w
    py = pad_h // 2
    px = pad_w // 2

    # --- menu pick (pipeline._line_menu_shape, shear_margin=True) +
    # clamp to the chosen entry (the host's fallback clamps to menu[-1])
    fold = jnp.abs(sa) > jnp.abs(ca)
    need_h = jnp.maximum(jnp.maximum(h, hv), jnp.where(fold, w, 0))
    need_w = jnp.maximum(jnp.maximum(w, wv), jnp.where(fold, h, 0))
    menu_idx = jnp.full_like(need_h, len(menu) - 1)
    for mi in range(len(menu) - 1, -1, -1):
        mhb, mwb = menu[mi]
        fits = ((need_h + 2 * _shear_span(mwb) <= mhb)
                & (need_w + 2 * _shear_span(mhb) <= mwb))
        menu_idx = jnp.where(fits, mi, menu_idx)
    hb_sel = jnp.asarray([mh for mh, _ in menu], jnp.int32)[menu_idx]
    wb_sel = jnp.asarray([mw for _, mw in menu], jnp.int32)[menu_idx]
    out_h = jnp.minimum(out_h, hb_sel)
    hv = jnp.minimum(hv, hb_sel)
    out_w = jnp.minimum(out_w, wb_sel)
    wv = jnp.minimum(wv, wb_sel)

    # --- filler rows for dead slots (the warmup filler plan: a 4x4
    # identity crop at the page origin — decodes to zero lines)
    def pick(real, filler):
        return jnp.where(live, real, jnp.asarray(filler, real.dtype))

    k_idx = jnp.arange(k_max, dtype=jnp.int32)
    ints = {
        'page': k_idx, 'y0': pick(y0, 4), 'x0': pick(x0, 4),
        'h': pick(h, 4), 'w': pick(w, 4),
        'ry0': pick(ry0, 0), 'rx0': pick(rx0, 0),
        'out_h': pick(out_h, 4), 'out_w': pick(out_w, 4),
        'py': pick(py, 0), 'px': pick(px, 0),
        'hv': pick(hv, 4), 'wv': pick(wv, 4),
        'start_y': jnp.full((k_max,), 16, jnp.int32),
        'start_x': jnp.full((k_max,), 16, jnp.int32),
    }
    flts = {
        'cos': pick(ca, 1.0), 'sin': pick(sa, 0.0),
        'off_y': pick(off_y, 0.0), 'off_x': pick(off_x, 0.0),
    }
    plan = jnp.stack(
        [ints[k].astype(jnp.float32) for k in PARAGRAPH_INT_FIELDS]
        + [flts[k] for k in PARAGRAPH_FLT_FIELDS]
        + [jnp.where(live, roots, -1).astype(jnp.float32)], axis=1)
    return roots, plan, menu_idx, n_comp


def device_page_plans(para2d, out_hb, out_wb, k_max=32):
    """Paragraph-stage plan matrix of ONE page, computed on device (the
    single-page fused chain's planner).

    para2d: (H, W) f32/bool predicted paragraph mask.  Returns
    (labels (H, W) i32 — grid_ccl_labels raster-first component ids,
    roots (k_max,) i32, plan (k_max, 19) f32 rows in
    PARAGRAPH_INT_FIELDS + PARAGRAPH_FLT_FIELDS order, n_comp i32,
    ok bool — False iff the CCL hit its sweep cap or components exceed
    k_max; callers must fall back to the host planner when not ok).

    Mirrors pipeline._page_paragraph_plans (twopass branch) field for
    field: scipy.ndimage.label component order (grid_ccl_labels
    docstring), interpreter.find_rotation_angle's 1-degree projection
    sweep over per-row extremal points, rotate_affine's scipy rotate
    geometry, the (|cos|+|sin|)/2 outward margin, /16 center pad, and
    the host's clamp-to-largest-menu fallback — the chain always crops
    at the largest menu shape, whose frame the host branch also clamps
    to, so content is placement-identical.  'page' is the plan's slot
    index: the chain crops from a per-component masked page stack, which
    makes every plan blob-exact (the host needs_blob upload variant
    exists only because its resident mask mixes components).
    """
    occ = (para2d > 0)[None, :, :, None]
    lab4, lin, converged = grid_ccl_labels(occ,
                                           max_iters=PAGE_CCL_MAX_ITERS,
                                           column_scan=True)
    lab = lab4[0, :, :, 0]
    roots, plan, _menu_idx, n_comp = _page_component_plans(
        lab, lin, ((out_hb, out_wb),), k_max)
    ok = converged & (n_comp <= k_max)
    return lab, roots, plan[:, :19], n_comp, ok


def device_chunk_plans(para_stack, menu, k_max=48):
    """Batched device paragraph planner for the CHUNK path.

    para_stack: (B, H, W) f32 predicted paragraph masks (the resident
    _prep_stacks output, channel dropped).  menu: STATIC tuple of
    (hb, wb) crop shapes (pipeline.line_shape_menu).  Returns
    (labels (B, H, W) i32, plans (B, k_max, 20) f32 — 19 plan fields +
    root label — menu_idx (B, k_max) i32, n_comp (B,) i32,
    converged bool).  Pages with n_comp > k_max (or an un-converged
    CCL) must fall back to the host planner; the pipeline pulls ONE
    (B, k_max, 22) matrix instead of the bit-packed paragraph masks
    (the largest D2H payload of the classic chunk dispatch)."""
    occ = (para_stack > 0)[:, :, :, None]
    lab4, lin, converged = grid_ccl_labels(occ,
                                           max_iters=PAGE_CCL_MAX_ITERS,
                                           column_scan=True)
    lab = lab4[:, :, :, 0]                                  # (B, H, W)

    def one(lb):
        roots, plan, menu_idx, n_comp = _page_component_plans(
            lb, lin, menu, k_max)
        return plan, menu_idx, n_comp

    plans, menu_idx, n_comp = lax.map(one, lab)
    return lab, plans, menu_idx, n_comp, converged
