"""Fused cascade tail: device line planning + crop + Char + decode.

The device-resident cascade (device_cascade.py) still returned to the
host between the paragraph and line stages: the host pulled the band
blob tables (~150 KB/launch), planned line crops, dispatched line/Char
launches, and pulled per-column char ids — 2+ RTT-bound transfer ops
per launch on a tunnel that charges ~30 ms per op.

This module keeps going on device: the SAME pairing / orientation /
ordering logic as the host planner (pipeline._plan_lines_from_tables),
the zoom-gather line crops, the Char forward, the per-column argmax,
and the run-length text decode (interpreter.pred_ids_to_text) all run
inside the paragraph-stage program.  The host pulls one small buffer of
COLLAPSED GLYPH IDS (~6 KB/launch) and maps them to characters; the
band-tables payload is only pulled for paragraphs the device flags for
escalation (merge_suspect, table overflow, line-pool overflow).

Every step is arrays + one-hot matmuls + one lax.scan (the decode),
shapes static: line slots cap at MAX_LINES per paragraph and the
launch-level crop pool at LINE_POOL slots x CHAR_POOL_WIDTH columns;
overflow marks the paragraph suspect, which routes it through the
existing host escalation path (correctness never depends on the caps).

Reference being replaced: interpreter.py:421-614 (line geometry +
PredToText) — here as a single XLA program per paragraph batch.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..primitives import CHARS, SIMILAR_CHARS_PAIRS_LIST

#: per-paragraph line-slot cap (a generator paragraph holds <= ~15
#: lines; more marks the paragraph suspect)
MAX_LINES = 20
#: per-launch compacted line-crop pool (measured: ~40 real lines per
#: 16-paragraph launch, ZERO pool overflows in a 273-paragraph profile
#: with per-bit counters — the round-3 "capacity" escalations were all
#: glyph overflows); overflow marks the tail paragraphs suspect
LINE_POOL = 64
#: fixed Char-stage width of the pooled crops: w_out = w * 32/h tops
#: out near 2048 for the widest/shortest real lines (w<=768, h>=12)
CHAR_POOL_WIDTH = 2048

#: glyph capacity per decoded line: random_text wraps at up to 100
#: columns, so real lines reach ~100 glyphs — 64 overflowed on 15 of
#: 273 profiled paragraphs (every one a tables pull + line/Char launch
#: + char-id pull on the RTT-bound tunnel); 128 covers the generator's
#: maximum.  Overflow truncates and flags the line's paragraph.
MAX_GLYPHS = 128


def _similar_table():
    """(162, 162) bool: SIM[a, b] iff (a, b) is a registered look-alike
    pair (order-free, as primitives.are_similar)."""
    n = len(CHARS)
    t = np.zeros((n, n), bool)
    for a, b in SIMILAR_CHARS_PAIRS_LIST:
        ia, ib = CHARS.index(a), CHARS.index(b)
        t[ia, ib] = t[ib, ia] = True
    return t


_SIM = _similar_table()


def decode_ids_device(ids, valid, min_run):
    """Device run-length decode: per-column argmax ids -> collapsed
    glyph ids, matching interpreter.pred_ids_to_text(ids, valid, k)
    for integer k >= 1 exactly.

    ids   : (B, W) int32 per-column class ids.
    valid : (B, W) bool column validity (invalid columns are SKIPPED —
            runs continue across them, as the host decode does).
    min_run : static int (the k of collapse_runs=k).

    Returns (glyphs (B, MAX_GLYPHS) int32 zero-padded,
             n_glyphs (B,) int32,
             overflow (B,) bool — more than MAX_GLYPHS glyphs emitted).

    Emission happens at run END (the first column whose valid id
    differs, or one past the sequence): a run of length n >= min_run
    whose id is not tab (0), not equal to the previously EMITTED char,
    and not its registered look-alike, emits; tab resets the memory
    regardless of length.
    """
    B, W = ids.shape
    sim = jnp.asarray(_SIM)
    # sentinel column flushes the final run: valid, id -2 (!= any real)
    ids_x = jnp.concatenate(
        [jnp.where(valid, ids, -1), jnp.full((B, 1), -2, jnp.int32)],
        axis=1)
    valid_x = jnp.concatenate(
        [valid, jnp.ones((B, 1), bool)], axis=1)

    def step(carry, col):
        run_id, run_len, prev = carry
        cid, v = col
        starts = v & (run_len == 0)
        ends = v & (run_len > 0) & (cid != run_id)
        # decide emission of the ENDING run
        is_tab = run_id == 0
        long_enough = run_len >= min_run
        run_ok = run_id > 0
        prev_ok = jnp.where(
            prev < 0, True,
            (run_id != prev) & ~sim[jnp.maximum(run_id, 0),
                                    jnp.maximum(prev, 0)])
        emit = ends & run_ok & long_enough & prev_ok
        # tab resets prev unconditionally when ITS run ends (the host
        # decode resets on seeing the tab run, before the length check)
        new_prev = jnp.where(ends & is_tab, -1,
                             jnp.where(emit, run_id, prev))
        out_id = jnp.where(emit, run_id, 0)
        # continue/extend/start the run
        new_run_id = jnp.where(ends | starts, cid, run_id)
        new_run_len = jnp.where(
            v, jnp.where(ends | starts, 1, run_len + 1), run_len)
        return (new_run_id, new_run_len, new_prev), (emit, out_id)

    init = (jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32),
            jnp.full((B,), -1, jnp.int32))
    cols = (jnp.swapaxes(ids_x, 0, 1), jnp.swapaxes(valid_x, 0, 1))
    # unroll: each scan iteration is a handful of (B,)-vector ops, so
    # loop-carry overhead dominates at W=2048; 16 columns per iteration
    # cuts the trip count 16x at identical math
    _, (emits, out_ids) = lax.scan(step, init, cols, unroll=16)
    emits = jnp.swapaxes(emits, 0, 1)                   # (B, W+1)
    out_ids = jnp.swapaxes(out_ids, 0, 1)

    pos = jnp.cumsum(emits.astype(jnp.int32), axis=1) - 1
    n_glyphs = jnp.sum(emits.astype(jnp.int32), axis=1)
    slot = jnp.arange(MAX_GLYPHS, dtype=jnp.int32)
    hit = (pos[:, :, None] == slot) & emits[:, :, None]  # (B, W+1, G)
    glyphs = jnp.einsum('bwg,bw->bg', hit.astype(jnp.float32),
                        out_ids.astype(jnp.float32),
                        precision=lax.Precision.HIGHEST)
    return (glyphs.astype(jnp.int32), jnp.minimum(n_glyphs, MAX_GLYPHS),
            n_glyphs > MAX_GLYPHS)


def glyphs_to_text(glyphs, n_glyphs):
    """Host inverse of decode_ids_device for one line."""
    return ''.join(CHARS[g] for g in np.asarray(glyphs[:int(n_glyphs)]))


# ---------------------------------------------------------------------------
# Device line planning (pipeline._plan_lines_from_tables as arrays)
# ---------------------------------------------------------------------------

#: line-plan field order of the (MAX_LINES, 12) f32 plan matrix
PLAN_FIELDS = ('ratio_y', 'ratio_x', 'w_out', 'a_yy', 'a_yx', 'b_y',
               'a_xy', 'a_xx', 'b_x', 'w_valid', 'out_h', 'out_w')

#: rot90_inverse_affine coefficient table indexed by rotation//90:
#: (a_yy, a_yx, b_y_h, b_y_w, b_y_c, a_xy, a_xx, b_x_h, b_x_w, b_x_c,
#:  swap) — b_y = b_y_h*h + b_y_w*w + b_y_c, swap=1 when (lh,lw)=(w,h)
_ROT_TABLE = np.array([
    # rotation 0   -> k=0: ys=yr, xs=xr, out (h, w)
    [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
    # rotation 90  -> k=3: ys=xr, xs=-yr+(w-1), out (w, h)
    [0, 1, 0, 0, 0, -1, 0, 0, 1, -1, 1],
    # rotation 180 -> k=2: ys=-yr+(h-1), xs=-xr+(w-1), out (h, w)
    [-1, 0, 1, 0, -1, 0, -1, 0, 1, -1, 0],
    # rotation 270 -> k=1: ys=-xr+(h-1), xs=yr, out (w, h)
    [0, -1, 1, 0, -1, 1, 0, 0, 0, 0, 1],
], np.float32)


def _plan_lines_single(tbl, nb, axis, char_h=32, char_min_w=8):
    """One paragraph's line plans from its blob tables.

    tbl (2, M, 7, 2) f32, nb (2, 2) i32, axis scalar i32.  Returns
    (plans (MAX_LINES, 12) f32 in PLAN_FIELDS order, n_lines i32,
    overflow bool).  Same pairing / orientation / ordering / merge as
    pipeline._plan_lines_from_tables."""
    M = tbl.shape[1]
    big = jnp.float32(1e9)
    t = jnp.where(axis == 0, tbl[0], tbl[1])                # (M, 7, 2)
    n_top = jnp.minimum(nb[axis, 0], M)
    n_bot = jnp.minimum(nb[axis, 1], M)
    sl = jnp.arange(M, dtype=jnp.int32)
    tv = sl < n_top
    bv = sl < n_bot
    top, bot = t[:, :, 0], t[:, :, 1]                       # (M, 7)
    cm_t, cm_b = top[:, 5:7], bot[:, 5:7]

    d = jnp.linalg.norm(cm_t[:, None, :] - cm_b[None, :, :], axis=-1)
    d = jnp.where(bv[None, :], d, big)
    pick = jnp.argmin(d, axis=1).astype(jnp.int32)          # (M,)
    bot_p = bot[pick]
    cm_bp = cm_b[pick]

    delta = cm_t[0] - cm_bp[0]
    dy, dx = delta[0], delta[1]
    rot_i = jnp.where(
        jnp.abs(dy) > jnp.abs(dx),
        jnp.where(dy > 0, 2, 0),
        jnp.where(dx > 0, 1, jnp.where(dx < 0, 3, 0)))      # rotation//90
    ax_idx = jnp.where((rot_i == 0) | (rot_i == 2), 0, 1)
    # _ORIENTATION_KEYS: None:(cy,+1) 180:(cy,-1) 270:(cx,+1) 90:(cx,-1)
    sign = jnp.where(rot_i == 0, 1.0,
                     jnp.where(rot_i == 2, -1.0,
                               jnp.where(rot_i == 3, 1.0, -1.0)))
    key_t = jnp.where(tv, sign * cm_t[:, ax_idx], big)
    key_b = jnp.where(tv, sign * cm_bp[:, ax_idx], big)
    order_t = jnp.argsort(key_t, stable=True)
    order_b = jnp.argsort(key_b, stable=True)
    top_o = top[order_t]
    bot_o = bot_p[order_b]
    picks_o = pick[order_t]                                 # (M,)

    y0 = jnp.minimum(top_o[:, 1], bot_o[:, 1])
    y1 = jnp.maximum(top_o[:, 2], bot_o[:, 2])
    x0 = jnp.minimum(top_o[:, 3], bot_o[:, 3])
    x1 = jnp.maximum(top_o[:, 4], bot_o[:, 4])

    # merge rows whose tops picked the SAME bottom (first occurrence
    # keeps the line slot; unions over the group)
    valid_k = tv[order_t]
    same = (picks_o[None, :] == picks_o[:, None]) & valid_k[None, :]
    gy0 = jnp.min(jnp.where(same, y0[None, :], big), axis=1)
    gy1 = jnp.max(jnp.where(same, y1[None, :], -big), axis=1)
    gx0 = jnp.min(jnp.where(same, x0[None, :], big), axis=1)
    gx1 = jnp.max(jnp.where(same, x1[None, :], -big), axis=1)
    earlier = same & (sl[None, :] < sl[:, None])
    first_occ = ~jnp.any(earlier, axis=1)
    line_mask = first_occ & valid_k & (n_top > 0) & (n_bot > 0)

    h_l = jnp.floor(gy1) - jnp.floor(gy0)
    w_l = jnp.floor(gx1) - jnp.floor(gx0)
    # (host: slice(int(min), int(max)) — table fields are exact ints)
    coef = jnp.asarray(_ROT_TABLE)[rot_i]                   # (11,)
    swap = coef[10]
    lh = jnp.where(swap > 0, w_l, h_l)
    lw = jnp.where(swap > 0, h_l, w_l)
    lh = jnp.maximum(lh, 1.0)
    lw = jnp.maximum(lw, 1.0)
    zf = char_h / lh
    w_out = jnp.round(lw * zf)
    ratio_y = jnp.where(char_h > 1, (lh - 1.0) / (char_h - 1.0), 0.0)
    ratio_x = jnp.where(w_out > 1, (lw - 1.0) / (w_out - 1.0), 0.0)
    b_y = coef[2] * h_l + coef[3] * w_l + coef[4] + jnp.floor(gy0)
    b_x = coef[7] * h_l + coef[8] * w_l + coef[9] + jnp.floor(gx0)
    w_valid = jnp.maximum(w_out, float(char_min_w))

    plans = jnp.stack([
        ratio_y, ratio_x, w_out,
        jnp.broadcast_to(coef[0], (M,)), jnp.broadcast_to(coef[1], (M,)),
        b_y,
        jnp.broadcast_to(coef[5], (M,)), jnp.broadcast_to(coef[6], (M,)),
        b_x, w_valid,
        jnp.broadcast_to(jnp.float32(char_h), (M,)), w_out,
    ], axis=1)                                              # (M, 12)

    # compact line slots to MAX_LINES in order
    idx = jnp.cumsum(line_mask.astype(jnp.int32)) - 1
    n_lines = jnp.sum(line_mask.astype(jnp.int32))
    slot = jnp.arange(MAX_LINES, dtype=jnp.int32)
    hit = (idx[:, None] == slot[None, :]) & line_mask[:, None]
    out = jnp.einsum('mf,ml->lf', plans, hit.astype(jnp.float32),
                     precision=lax.Precision.HIGHEST)       # (L, 12)
    return out, jnp.minimum(n_lines, MAX_LINES), n_lines > MAX_LINES


def _cross_axis_single(tbl, nb, axis):
    """Device port of pipeline._cross_axis_escalation for ONE paragraph:
    True when the non-chosen axis resolves more blobs than the chosen
    one AND those blobs are separated by gaps above ~0.8x their
    cross-extent (side-by-side lines the paragraph CCL merged)."""
    M = tbl.shape[1]
    big = jnp.float32(1e9)
    other = 1 - axis
    t_all = jnp.where(other == 0, tbl[0], tbl[1])           # (M, 7, 2)
    # run-interval fields of `other` / cross-extent fields
    lo = jnp.where(other == 0, 1, 3)
    clo = jnp.where(other == 0, 3, 1)
    sl = jnp.arange(M, dtype=jnp.int32)

    def chan(ch):
        t = t_all[:, :, ch]                                 # (M, 7)
        n_o = jnp.minimum(nb[other, ch], M)
        n_c = jnp.minimum(nb[axis, ch], M)
        v = sl < n_o
        starts = jnp.where(v, t[:, lo], big)
        order = jnp.argsort(starts, stable=True)
        ts = t[order]
        vs = v[order]
        ivs0, ivs1 = ts[:, lo], ts[:, lo + 1]
        gaps = ivs0[1:] - ivs1[:-1]
        heights = ts[:, clo + 1] - ts[:, clo]
        hmin = jnp.minimum(heights[1:], heights[:-1])
        pair_ok = vs[1:] & vs[:-1]
        fire = jnp.any(pair_ok & (gaps > 0.8 * hmin))
        return (n_o > jnp.maximum(n_c, 1)) & fire

    return chan(0) | chan(1)


# ---------------------------------------------------------------------------
# The fused program: paragraph tail -> line crops -> Char -> glyphs
# ---------------------------------------------------------------------------

def fused_paragraph_tail(line_params, char_params, crops,
                         h_valid, w_valid, precision=None, margin=False,
                         min_run=4, char_head='xla',
                         resolve_suspects=True):
    """Everything after the paragraph crop, in ONE program.

    crops: (B, HB, WB, 1) f32 paragraph crops (level or deskewed).
    Returns (crops_sheared, small_payload (NBYTES,) uint8,
    tables_payload (B, NB) uint8): the small payload carries the
    decoded glyph ids + line bookkeeping (pack/unpack_fused_payload);
    the tables payload is the classic escalation payload — the host
    pulls it ONLY when a suspect flag is set.

    Device-side caps (MAX_LINES / LINE_POOL / CHAR_POOL_WIDTH /
    MAX_GLYPHS) never lose text silently: any overflow marks the owning
    paragraph suspect, and suspects re-run through the host escalation
    path on the same sheared crops.
    """
    import jax

    from .device_cascade import _thresholded_bands, tables_state
    from .device_cascade import pack_tables_payload
    from .device_cascade import zoomed_line_crops_matmul
    from .fastpath import char_forward_masked

    B = crops.shape[0]
    bands = _thresholded_bands(line_params, crops, h_valid, w_valid,
                               precision=precision)
    (crops, tbl, n_blobs, shears, axis, suspect,
     packed_prof) = tables_state(bands, crops, margin=margin,
                                 resolve_suspects=resolve_suspects)

    plans, n_lines, over_lines = jax.vmap(_plan_lines_single)(
        tbl, n_blobs, axis)                                 # (B, L, 12)
    M = tbl.shape[2]
    over_tbl = jnp.max(n_blobs, axis=(1, 2)) > M

    # launch-level line pool: compact (B, MAX_LINES) slots in order
    L = MAX_LINES
    P = LINE_POOL
    line_valid = (jnp.arange(L)[None, :] < n_lines[:, None]).reshape(-1)
    pos = jnp.cumsum(line_valid.astype(jnp.int32)) - 1     # (B*L,)
    in_pool = line_valid & (pos < P)
    over_pool = (line_valid & (pos >= P)).reshape(B, L).any(axis=1)
    sel = ((pos[:, None] == jnp.arange(P)[None, :])
           & in_pool[:, None])                              # (B*L, P)
    self_f = sel.astype(jnp.float32)
    pooled = jnp.einsum('kf,kp->pf', plans.reshape(B * L, -1), self_f,
                        precision=lax.Precision.HIGHEST)    # (P, 12)
    para_f = jnp.repeat(jnp.arange(B, dtype=jnp.float32), L)
    para_of = jnp.einsum('k,kp->p', para_f, self_f,
                         precision=lax.Precision.HIGHEST)
    pool_used = jnp.any(sel, axis=0)                        # (P,)
    para_idx = jnp.where(pool_used, para_of.astype(jnp.int32), 0)

    def fld(name, dtype=jnp.float32):
        v = pooled[:, PLAN_FIELDS.index(name)]
        return v.astype(dtype)

    w_out = fld('w_out')
    trunc = pool_used & (w_out > CHAR_POOL_WIDTH)
    over_trunc = jnp.zeros((B,), bool).at[para_idx].max(
        trunc, mode='drop')
    w_out_c = jnp.minimum(w_out, CHAR_POOL_WIDTH).astype(jnp.int32)
    w_val = jnp.minimum(fld('w_valid'), CHAR_POOL_WIDTH).astype(jnp.int32)

    lines = zoomed_line_crops_matmul(
        crops, para_idx, fld('ratio_y'), fld('ratio_x'), w_out_c,
        fld('a_yy', jnp.int32), fld('a_yx', jnp.int32),
        fld('b_y', jnp.int32), fld('a_xy', jnp.int32),
        fld('a_xx', jnp.int32), fld('b_x', jnp.int32),
        32, CHAR_POOL_WIDTH, precision=precision)           # (P,32,W,1)

    logits = char_forward_masked(char_params, lines, w_val,
                                 precision=precision, head=char_head)
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)     # (P, Wc)
    cols = jnp.arange(logits.shape[1], dtype=jnp.int32)[None, :]
    valid = (cols < w_val[:, None]) & pool_used[:, None]
    glyphs, n_glyphs, over_gl = decode_ids_device(ids, valid, min_run)
    over_glyph = jnp.zeros((B,), bool).at[para_idx].max(
        over_gl & pool_used, mode='drop')

    cross = jax.vmap(_cross_axis_single)(tbl, n_blobs, axis)
    # suspect byte = component bitmask (nonzero -> escalate); the host
    # counts components in escalation_stats
    suspect_mask = (suspect.astype(jnp.uint8)
                    | (cross.astype(jnp.uint8) << 1)
                    | (over_tbl.astype(jnp.uint8) << 2)
                    | (over_lines.astype(jnp.uint8) << 3)
                    | (over_pool.astype(jnp.uint8) << 4)
                    | (over_trunc.astype(jnp.uint8) << 5)
                    | (over_glyph.astype(jnp.uint8) << 6))
    suspect_all = suspect_mask > 0

    small = jnp.concatenate([
        jnp.clip(glyphs, 0, 255).astype(jnp.uint8).reshape(-1),
        n_glyphs.astype(jnp.uint8),
        jnp.where(pool_used, para_idx, 255).astype(jnp.uint8),
        n_lines.astype(jnp.uint8),
        suspect_mask,
    ])
    tables_payload = pack_tables_payload(tbl, n_blobs, shears, axis,
                                         suspect_all, packed_prof)
    return crops, small, tables_payload


def fused_payload_nbytes(launch_batch):
    """Length of fused_paragraph_tail's small payload for one launch of
    `launch_batch` paragraph slots (the pipeline sizes its per-chunk
    accumulation buffer from this)."""
    return LINE_POOL * MAX_GLYPHS + 2 * LINE_POOL + 2 * launch_batch


def unpack_fused_payload(buf, n_paragraphs, n_shards=1):
    """Host inverse of fused_paragraph_tail's small payload.

    Returns (texts: [n_paragraphs][lines-in-reading-order] str,
             suspect (n_paragraphs,) uint8 component bitmask — nonzero
             means escalate; bits: merge_suspect, cross_axis, table
             overflow, line-slot overflow, pool overflow, width
             truncation, glyph overflow).

    Under a mesh the stage runs as a shard_map over the launch batch:
    each of `n_shards` data shards compacts its OWN line pool and its
    payload segment concatenates along the buffer (out_specs P('data')).
    The merge is pure bookkeeping: unpack each segment with its share of
    the batch and stitch texts/suspects back in batch order."""
    buf = np.asarray(buf)
    if n_shards > 1:
        segments = np.split(buf, n_shards)
        # device slots per shard, from the segment layout
        b_local = (segments[0].shape[0] - LINE_POOL * MAX_GLYPHS
                   - 2 * LINE_POOL) // 2
        texts, suspects = [], []
        for s, seg in enumerate(segments):
            n_s = min(max(n_paragraphs - s * b_local, 0), b_local)
            if n_s == 0:
                break
            t, su = unpack_fused_payload(seg, n_s)
            texts.extend(t)
            suspects.append(su)
        return texts, np.concatenate(suspects)
    P, G = LINE_POOL, MAX_GLYPHS
    # the device wrote n_lines/suspect for the FULL launch batch
    # (including filler slots); real paragraphs are the first
    # n_paragraphs entries
    b_dev = (buf.shape[0] - P * G - 2 * P) // 2
    o = 0
    glyphs = buf[o:o + P * G].reshape(P, G); o += P * G
    n_glyphs = buf[o:o + P]; o += P
    para_of = buf[o:o + P]; o += P + b_dev         # skip n_lines
    B = n_paragraphs
    suspect = buf[o:o + B]

    # pool slots were assigned in (paragraph, line-slot) order, so each
    # paragraph's lines appear in reading order
    texts = [[] for _ in range(B)]
    for p in range(P):
        b = int(para_of[p])
        if b >= B:
            continue
        texts[b].append(glyphs_to_text(glyphs[p], int(n_glyphs[p])))
    return texts, suspect
