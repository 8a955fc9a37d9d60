"""Bisect the fused paragraph-tail program: time each sub-piece on the
real device to find where the ~48ms/launch goes (profile_cascade
--replay round 4).  Timing methodology: dispatch N reps back-to-back,
then force completion with ONE tiny D2H pull (block_until_ready does
not fence over the tunnel — BASELINE.md round 3); per-rep cost is
(total - 1 RTT) / N.

    python scripts/bisect_fused_cost.py [--menu=256x512]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def timed(tag, fn, *args, n=10):
    import jax
    import numpy as np
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))       # compile+settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))       # fence
    dt = (time.perf_counter() - t0) / n
    print(f'{tag:55s} {dt * 1e3:8.2f} ms/rep')
    return dt


def main():
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from univer_ocr_tpu.models import device_cascade as dc
    from univer_ocr_tpu.models import fused_tail as ft
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.fastpath import char_forward_masked
    from univer_ocr_tpu.models.model import make_char, make_line

    print('devices:', jax.devices(), file=sys.stderr)
    menu = (256, 512)
    for a in sys.argv[1:]:
        if a.startswith('--menu='):
            h, w = a.split('=')[1].split('x')
            menu = (int(h), int(w))
    HB, WB = menu
    B, P, G = 16, ft.LINE_POOL, ft.MAX_GLYPHS
    WC = ft.CHAR_POOL_WIDTH

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    line = make_line((1, 496, 736, 1))
    char = make_char((1, 496, 736, 1))
    line.set_weights(weights)
    char.set_weights(weights)

    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.rand(B, HB, WB, 1).astype(np.float32))
    hv = jnp.full((B,), HB - 16, jnp.int32)
    wv = jnp.full((B,), WB - 16, jnp.int32)

    bands_fn = jax.jit(partial(dc._thresholded_bands, precision='bf16'))
    bands = bands_fn(line.params, crops, hv, wv)
    timed('thresholded_bands (Line fwd + threshold)', bands_fn,
          line.params, crops, hv, wv)

    ts_fn = jax.jit(partial(dc.tables_state, margin=True))
    st = ts_fn(bands, crops)
    timed('tables_state (shear sweep + blob tables)', ts_fn, bands, crops)
    _, tbl, n_blobs, _sh, axis, _sus, _prof = st

    ap_fn = jax.jit(partial(dc._axis_pack, margin=True))
    timed('  _axis_pack rows view', ap_fn, bands)
    bands_t = jnp.transpose(bands, (0, 2, 1, 3))
    timed('  _axis_pack cols view (transposed)', ap_fn, bands_t)
    gc_fn = jax.jit(lambda b: dc._axis_pack(
        None, margin=True, stats=dc._group_col_stats(b),
        extent=b.shape[1]))
    timed('  _axis_pack cols view (grouped, no transpose)', gc_fn, bands)

    s_row = jnp.full((B,), 0.04, jnp.float32)
    off = jnp.full((B,), dc._shear_span(WB), jnp.int32)
    sh_fn = jax.jit(dc._shear_rows)
    timed('  _shear_rows on f32 crops', sh_fn, crops, s_row, off)

    gs_fn = jax.jit(dc._group_row_stats)
    timed('  _group_row_stats', gs_fn, bands)
    prof_any = jnp.any(gs_fn(bands)[0] > 0, axis=3)
    bs_fn = jax.jit(partial(dc._best_shear_from_prof, W=WB))
    timed('  _best_shear_from_prof', bs_fn, prof_any)

    plans_fn = jax.jit(jax.vmap(ft._plan_lines_single))
    timed('vmap _plan_lines_single', plans_fn, tbl, n_blobs, axis)

    pidx = jnp.asarray(rng.randint(0, B, (P,)).astype(np.int32))
    ry = jnp.full((P,), 0.8, jnp.float32)
    rx = jnp.full((P,), 0.8, jnp.float32)
    w_out = jnp.full((P,), WC, jnp.int32)
    one = jnp.ones((P,), jnp.int32)
    zero = jnp.zeros((P,), jnp.int32)

    crop_fn = jax.jit(partial(dc.zoomed_line_crops_matmul,
                              precision='bf16'), static_argnums=(11, 12))
    lines = crop_fn(crops, pidx, ry, rx, w_out, one, zero, zero, zero,
                    one, zero, 32, WC)
    timed(f'zoomed_line_crops_matmul ({P},32,{WC})', crop_fn, crops,
          pidx, ry, rx, w_out, one, zero, zero, zero, one, zero, 32, WC)

    wval = jnp.full((P,), WC, jnp.int32)
    for head in ('xla', 'conv', 'pallas'):
        cf = jax.jit(partial(char_forward_masked, precision='bf16',
                             head=head))
        try:
            logits = cf(char.params, lines, wval)
            timed(f'char_forward_masked ({P},32,{WC}) head={head}', cf,
                  char.params, lines, wval)
        except Exception as e:                      # pallas may be N/A
            print(f'char head={head}: {type(e).__name__}: {e}')

    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = jnp.ones(ids.shape, bool)
    dec_fn = jax.jit(partial(ft.decode_ids_device, min_run=4))
    timed(f'decode_ids_device scan ({P},{ids.shape[1]})', dec_fn, ids,
          valid)

    full_fn = jax.jit(partial(ft.fused_paragraph_tail, precision='bf16',
                              margin=True, min_run=4, char_head='xla'))
    timed(f'FULL fused_paragraph_tail {menu}', full_fn, line.params,
          char.params, crops, hv, wv)


if __name__ == '__main__':
    main()
