"""Batched OCR inference pipeline — the production serving path.

The per-page ModelSystem (model.py) mirrors the reference's sequential
component order and is the parity path.  This engine restructures the same
computation for throughput on TPU:

  * **front-end batching**: Monochrome + Paragraph run fused in ONE jitted
    program over a whole chunk of pages (one dispatch + one transfer each
    way per chunk, instead of four per page);
  * **host fan-out**: paragraph crop/deskew and line cropping run in a
    thread pool across all pages of the chunk (NumPy/scipy release the
    GIL in their hot loops; the native C++ kernels release it entirely);
  * **global batching of Line/Char**: every paragraph crop of the chunk is
    bucket-grouped and driven through the masked Line fastpath together;
    every line of every page likewise through the masked Char fastpath —
    a handful of program launches per chunk regardless of page contents.

Numerics are identical to the per-page path (masked fastpaths are exact —
fastpath.py; the host CV is the same code), asserted by
tests/test_pipeline.py.
"""

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from threading import Thread

import numpy as np

import jax
import jax.numpy as jnp

from scipy import ndimage

from ..interpreter.interpreter import (_extremal_coords,
                                       crop_and_rotate_single_paragraph,
                                       find_rotation_angle, label_layer,
                                       pred_ids_to_text, rearrange_lines,
                                       rotate_array)
from .bucketing import (CHAR_WIDTH_MENU, line_shape_menu, pick_char_width,
                        pick_line_shape, round_up)
from .device_cascade import (paragraph_stage,
                             paragraph_stage_rot_resident,
                             rot90_inverse_affine, rotate_affine,
                             zoom_output_width, zoom_ratio,
                             zoomed_line_crops_matmul)
from .fastpath import (_mask_hw, char_forward_masked, line_forward_masked,
                       monochrome_forward)
from .model import (CHAR_FIXED_WIDTH, CHAR_INPUT_HEIGHT, make_char,
                    make_divisible_by, make_line, make_monochrome,
                    make_paragraph)


def crop_lines_of_paragraph(line_pred, mono_crop, zoomed_height,
                            minimal_width, thresholded_input=False):
    """Line bands of one paragraph -> list of zoomed line crops of the
    monochrome image (the logic of CropRotateAndZoomLines._func,
    interpreter.py:436-523, as a pure function).  `thresholded_input` marks
    line_pred as already-boolean band masks (device-side thresholding)."""
    def thresholded(arr):
        if thresholded_input:
            return arr > 0
        return arr > 0.5 * (np.mean(arr) + np.max(arr))

    top = thresholded(line_pred[:, :, :, 0:1])
    bottom = thresholded(line_pred[:, :, :, 1:2])
    tops, bottoms, rotation = rearrange_lines(
        label_layer(top), label_layer(bottom))

    lines = []
    for top_mask, bottom_mask in zip(tops, bottoms):
        _, ty, tx, _ = ndimage.find_objects(top_mask)[0]
        _, by, bx, _ = ndimage.find_objects(bottom_mask)[0]
        y = slice(min(ty.start, by.start), max(ty.stop, by.stop))
        x = slice(min(tx.start, bx.start), max(tx.stop, bx.stop))
        img = mono_crop[:, y, x, :]
        if rotation is not None:
            img = rotate_array(img, rotation)
        if zoomed_height is not None:
            zf = zoomed_height / img.shape[1]
            img = ndimage.zoom(img, (1, zf, zf, 1), order=0)
        if minimal_width is not None and img.shape[2] < minimal_width:
            bs, h, w, ch = img.shape
            tmp = np.zeros((bs, h, minimal_width, ch), dtype=img.dtype)
            tmp[:, :, :w, :] = img
            img = tmp
        lines.append(img)
    return lines


class OCRPipeline:
    #: Char-stage width menu (shared with batched training so both hit
    #: the same compiled programs — bucketing.CHAR_WIDTH_MENU).
    CHAR_WIDTH_MENU = CHAR_WIDTH_MENU
    #: Fixed device batch for Line/Char launches (pow2 padding per launch
    #: would multiply the compile menu by the number of batch sizes).
    DEVICE_BATCH = 16
    #: per-page plan-slot cap of the device chunk planner (pages with
    #: more components fall back to the host planner)
    CHUNK_PLAN_K = 48
    #: line/Char-stage launch batch (device_cascade): a chunk of 8 pages
    #: carries ~160 lines, and every launch costs one RTT-bound char-id
    #: pull on this tunnel, so lines batch 4x wider than paragraph crops
    #: (tail-slot D2H waste is ~12 KB against a ~25 ms RTT saved)
    LINE_DEVICE_BATCH = 64
    #: top/left padding of the device page stack so level-paragraph
    #: dynamic slices never clamp (bottom/right pad by the largest menu)
    STACK_PAD = 16
    #: fused-tail glyph payloads accumulate into one (SMALL_SLOTS, NB)
    #: device buffer and come home in ONE pull per wave of launches —
    #: the tunnel charges ~a round trip per transfer op, so per-launch
    #: pulls cost ~K RTTs where the coalesced pull costs 1.  A wave of
    #: 8 (~2 waves per 32-page chunk) lets the first wave's host-side
    #: escalation work overlap the second wave's device compute.
    SMALL_SLOTS = 8

    def __init__(self, page_shape, weights=None, chunk=8, workers=8,
                 line_bucket=64, char_bucket=64, collapse_runs=False,
                 quantized_transfers=True, mesh=None, use_pallas=None,
                 device_cascade=False, precision='highest',
                 exact_bands=False, escalation=True, sampler=None,
                 fused_tail=None):
        self.page_shape = page_shape
        self.chunk = chunk
        self.line_bucket = line_bucket
        self.char_bucket = char_bucket
        self.collapse_runs = collapse_runs
        self.quantized_transfers = quantized_transfers
        self.device_cascade = device_cascade
        #: device_cascade band geometry payload.  False (default): the
        #: paragraph stage returns per-blob summary TABLES computed on
        #: device (device_cascade.band_blob_tables) — ~20-100x fewer D2H
        #: bytes, no host CCL, and same-row/small-gap band fragments merge
        #: (an accuracy win: fragmentation was the dominant end-to-end
        #: error, BASELINE.md round 2).  True: bit-packed band masks +
        #: host scipy CCL, bit-identical to the host-cascade geometry —
        #: the parity mode the equality tests pin.
        self.exact_bands = exact_bands
        self.band_tables = device_cascade and not exact_bands
        #: tables-mode escalation: paragraphs the device flags as
        #: suspect (merge_suspect / cross-axis disagreement) re-plan
        #: with 2D CCL on their pulled column-group profile (~8 KB).
        #: Each fire costs one D2H pull on the critical path; False
        #: plans every paragraph from the tables alone.
        self.escalation = escalation
        #: MXU policy for every model forward in this pipeline.  The
        #: constructor default is 'highest' (full-f32, numerics match the
        #: host path) so correctness-focused callers get exact results
        #: without opting in; serving call sites (bench.py, web/app.py)
        #: pass 'bf16' explicitly for the one-pass MXU fast path with f32
        #: accumulation (see ops/precision.py).
        self.precision = precision
        #: paragraph-crop resampler: 'twopass' (MXU one-hot matmuls +
        #: log-shift shears — ~3 ms/launch; bit-exact for level
        #: paragraphs, Paeth-style two-pass interpolation for rotated
        #: ones) or 'gather' (arbitrary-index bilinear, pinned to the
        #: host scipy path at 2e-5 but ~770 ms/launch on TPU).  Default:
        #: 'gather' in the exact_bands parity mode (whose point is
        #: bit-parity with the host path), 'twopass' otherwise.
        if sampler is None:
            sampler = 'gather' if exact_bands else 'twopass'
        self.sampler = sampler
        #: fused tail (models/fused_tail.py): line planning, line crop,
        #: Char forward and run-length decode all inside the paragraph
        #: program — the host pulls ~6 KB of glyph ids per launch and
        #: only pulls the tables payload for device-flagged suspects.
        #: Requires tables mode and an integer collapse_runs (the device
        #: decode implements the run-length semantics); bool collapse
        #: modes and exact_bands stay on the classic path.
        if fused_tail is None:
            # default ON whenever the decode semantics allow it; under a
            # mesh the stage runs as a shard_map over the launch batch —
            # each data shard compacts its OWN line pool (the cumsum
            # stays shard-local, no cross-chip collectives) and the host
            # merges the per-shard payload segments
            fused_tail = (self.band_tables
                          and isinstance(collapse_runs, int)
                          and not isinstance(collapse_runs, bool)
                          and collapse_runs >= 1)
        self.fused_tail = fused_tail and self.band_tables
        if use_pallas is None:
            # Pallas kernels target the TPU memory hierarchy; the XLA path
            # serves CPU runs (tests) where pallas would need interpret mode
            use_pallas = jax.devices()[0].platform != 'cpu'
        self.use_pallas = use_pallas
        # paragraph crops pad to a tiny menu of canonical shapes: program
        # count is the scarce resource (a remote compile is minutes), but
        # most paragraphs are far smaller than a page, so a 3-entry menu
        # buys back most of the padded transfer/compute
        self.line_shape_menu = line_shape_menu(page_shape)

        mono = make_monochrome(page_shape)
        para = make_paragraph(page_shape)
        self.line_model = make_line(page_shape)
        self.char_model = make_char(page_shape)
        for model in (mono, para, self.line_model, self.char_model):
            if weights:
                model.set_weights(weights)

        self.front_params = {**mono.params, **para.params}
        quantized = quantized_transfers

        # the Paragraph model shares the Line topology/key-schema; its
        # full-extent masked forward is the same computation as
        # para.forward_fn, with the precision policy threaded through
        H_page, W_page = page_shape[1], page_shape[2]

        def para_forward_fn(params, m):
            return line_forward_masked(params, m, H_page, W_page,
                                       prefix='Paragraph',
                                       precision=precision)

        if use_pallas:
            from ..ops.pallas import fused_monochrome
            interp = jax.devices()[0].platform == 'cpu'
            H = page_shape[1]
            # largest strip height <= 128 dividing H (VMEM budget for the
            # 16-channel intermediate); Mosaic requires the sublane block
            # dim divisible by 8 unless it spans the whole axis
            strips = [d for d in range(8, 129, 8) if H % d == 0]
            strip = max(strips) if strips else H

            def mono_fwd(params, x):
                # Pallas fused monochrome block; the chunk batch is part
                # of the kernel grid (one launch per chunk)
                w1 = params['Monochrome/conv_1']['w']
                b1 = params['Monochrome/conv_1']['b']
                w2 = params['Monochrome/conv_2']['w']
                b2 = params['Monochrome/conv_2']['b']
                return fused_monochrome(x, w1, b1, w2, b2,
                                        strip_h=strip, interpret=interp)
        else:
            mono_fwd = partial(monochrome_forward, precision=precision)

        def front(params, batch_u8):
            # pages upload as uint8 (4x less tunnel traffic); exact:
            # u8/255 reproduces the host encode_layers normalization.
            x = batch_u8.astype(jnp.float32) / 255.0
            m = mono_fwd(params, x)
            p = para_forward_fn(params, m)
            # threshold the paragraph mask on device (mean per page, the
            # label_layer rule) and ship one byte per pixel instead of four
            mean = jnp.mean(p, axis=(1, 2, 3), keepdims=True)
            # 1e-6 guard: the host rule (label_layer, np.mean in f64)
            # leaves a CONSTANT map empty (x > x), but the device's f32
            # mean can land an epsilon below the constant and flip the
            # whole page on; real detections sit far above the mean
            p_mask = ((p - mean) > 1e-6).astype(jnp.uint8)
            if quantized:
                p_mask = jnp.packbits(p_mask, axis=2)
                # the monochrome map ships quantized to uint8: D2H is the
                # scarce resource here, and 1/255 quantization of a sigmoid
                # map is far below the detection thresholds it feeds
                m = jnp.round(m * 255.0).astype(jnp.uint8)
            return m, p_mask

        self.mesh = mesh
        line_fwd = partial(line_forward_masked, prefix='Line',
                           precision=precision)
        if mesh is not None:
            # multi-chip serving: every launch batch shards over the
            # 'data' axis, params replicated (parallel/serving.py).  The
            # fixed DEVICE_BATCH and the chunked front batch must divide
            # across the data shards (ocr_pages pads the front batch).
            from ..parallel.serving import (replicate_params,
                                            shard_fn_over_batch)
            n_data = mesh.shape.get('data', 1)
            assert self.DEVICE_BATCH % n_data == 0, (
                f'DEVICE_BATCH={self.DEVICE_BATCH} must divide over the '
                f'data axis ({n_data} shards)')
            self.front_params = replicate_params(self.front_params, mesh)
            self.line_model.params = replicate_params(
                self.line_model.params, mesh)
            self.char_model.params = replicate_params(
                self.char_model.params, mesh)
            self._front = shard_fn_over_batch(front, mesh, n_batch_args=1)
            self._line_fn = shard_fn_over_batch(line_fwd, mesh,
                                                n_batch_args=3)
        else:
            self._front = jax.jit(front)
            self._line_fn = jax.jit(line_fwd)

        def line_masks(params, x_u8, h_valid, w_valid):
            x = x_u8.astype(jnp.float32) / 255.0
            # threshold the band maps on device over each sample's valid
            # region (the reference rule: arr > 0.5*(mean+max),
            # interpreter.py:437-438) and bit-pack: the f32 band maps are
            # the biggest D2H payload of the cascade (24 MB/launch -> 0.75)
            pred = line_forward_masked(params, x, h_valid, w_valid,
                                       prefix='Line', precision=precision)
            # zero the invalid region BEFORE the stats: the final sigmoid
            # is not masked inside line_forward_masked, and a small crop in
            # the canonical pad would otherwise have its mean dominated by
            # the padding's constant sigmoid(b), emptying the mask
            pred = _mask_hw(pred, h_valid, w_valid)
            import jax.lax as lax
            hv = h_valid.reshape(-1, 1, 1, 1).astype(jnp.float32)
            wv = w_valid.reshape(-1, 1, 1, 1).astype(jnp.float32)
            rows = lax.broadcasted_iota(jnp.int32, pred.shape, 1)
            cols = lax.broadcasted_iota(jnp.int32, pred.shape, 2)
            valid = ((rows < h_valid.reshape(-1, 1, 1, 1))
                     & (cols < w_valid.reshape(-1, 1, 1, 1)))
            area = hv * wv
            mean = (jnp.sum(pred, axis=(1, 2), keepdims=True)
                    / area)                      # pred is 0 outside valid
            mx = jnp.max(pred, axis=(1, 2), keepdims=True)
            # same f32-mean guard as the paragraph threshold: a constant
            # map must stay empty, as the host f64 rule leaves it
            mask = ((pred - 0.5 * (mean + mx)) > 1e-6) & valid
            return jnp.packbits(mask.astype(jnp.uint8), axis=2)

        if mesh is not None:
            from ..parallel.serving import shard_fn_over_batch
            self._line_masks_fn = shard_fn_over_batch(line_masks, mesh,
                                                      n_batch_args=3)
        else:
            self._line_masks_fn = jax.jit(line_masks)

        # measured at the fused-tail shape (64, 32, 2048) on v5e
        # (scripts/bisect_fused_cost.py, round 4): conv head 11.2ms vs
        # XLA-gather head 17.6ms vs Pallas 19.4ms — the width-8-conv
        # formulation of unfold+dense_1 skips the gathered-window tensor
        # entirely; pallas stays available for the narrow-width
        # host-cascade buckets
        char_head = 'pallas' if use_pallas else 'xla'
        fused_char_head = 'conv'

        def char_ids(params, x, w_valid):
            # argmax on device: ship (N, W) ids + validity instead of the
            # (N, W, 162) float logits (650x less traffic per line).  A
            # column is valid iff it lies inside the sample's true width —
            # the same structural mask char_forward_masked applies (the
            # reference skipped columns whose max score was exactly 0,
            # interpreter.py:596-601, which holds only by construction of
            # the masking; the width test makes the invariant explicit).
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            logits = char_forward_masked(params, x, w_valid,
                                         precision=precision,
                                         head=char_head)
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            cols = jnp.arange(logits.shape[1], dtype=jnp.int32)[None, :]
            valid = cols < w_valid.reshape(-1, 1)
            return ids, valid

        # --- device-resident cascade programs (device_cascade=True) ------
        # front: monochrome map STAYS in HBM; only the bit-packed
        # paragraph mask ships to host (1/32nd the f32 bytes)
        def front_resident(params, batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            m = mono_fwd(params, x)
            p = para_forward_fn(params, m)
            mean = jnp.mean(p, axis=(1, 2, 3), keepdims=True)
            # same f32-mean guard as the transfer front (constant map
            # stays empty, matching the host f64 rule)
            p_mask = ((p - mean) > 1e-6).astype(jnp.uint8)
            return m, jnp.packbits(p_mask, axis=2)

        tables = self.band_tables
        from .device_cascade import (unpack_line_plan,
                                     unpack_paragraph_plan)

        # jit roots take ONE packed f32 plan matrix per launch (the
        # tunnel charges ~a round trip per transfer op, so every extra
        # leaf per launch is pure latency; integer fields round-trip
        # f32 exactly — device_cascade.unpack_paragraph_plan)
        sampler = self.sampler

        def stage_rot_blob(params, mono_stack, blob, plan):
            iv, fv = unpack_paragraph_plan(plan)
            return paragraph_stage(
                params, mono_stack, blob, iv['page'], iv['y0'], iv['x0'],
                iv['h'], iv['w'], fv['cos'], fv['sin'], fv['off_y'],
                fv['off_x'], iv['ry0'], iv['rx0'], iv['out_h'],
                iv['out_w'], iv['py'], iv['px'], iv['hv'], iv['wv'],
                precision=precision, tables=tables, sampler=sampler)

        def stage_rot_res(params, mono_stack, para_stack, plan, hb, wb):
            iv, fv = unpack_paragraph_plan(plan)
            return paragraph_stage_rot_resident(
                params, mono_stack, para_stack, iv['page'], iv['y0'],
                iv['x0'], iv['h'], iv['w'], fv['cos'], fv['sin'],
                fv['off_y'], fv['off_x'], iv['ry0'], iv['rx0'],
                iv['out_h'], iv['out_w'], iv['py'], iv['px'], iv['hv'],
                iv['wv'], hb, wb, precision=precision, tables=tables,
                sampler=sampler)

        if self.fused_tail:
            from .device_cascade import (extract_paragraph_crops,
                                         extract_paragraph_crops_resident)
            from .fused_tail import fused_paragraph_tail
            min_run = max(int(self.collapse_runs), 1)

            def stage_blob_fused(params2, mono_stack, blob, plan):
                iv, fv = unpack_paragraph_plan(plan)
                line_p, char_p = params2
                crops = extract_paragraph_crops(
                    mono_stack, blob, iv['page'], iv['y0'], iv['x0'],
                    iv['h'], iv['w'], fv['cos'], fv['sin'], fv['off_y'],
                    fv['off_x'], iv['ry0'], iv['rx0'], iv['out_h'],
                    iv['out_w'], iv['py'], iv['px'],
                    precision=precision, sampler=sampler)
                return fused_paragraph_tail(
                    line_p, char_p, crops, iv['hv'], iv['wv'],
                    precision=precision, margin=True, min_run=min_run,
                    char_head=fused_char_head)

            def stage_res_fused(params2, mono_stack, para_stack, plan,
                                hb, wb):
                iv, fv = unpack_paragraph_plan(plan)
                line_p, char_p = params2
                crops = extract_paragraph_crops_resident(
                    mono_stack, para_stack, iv['page'], iv['y0'],
                    iv['x0'], iv['h'], iv['w'], fv['cos'], fv['sin'],
                    fv['off_y'], fv['off_x'], iv['ry0'], iv['rx0'],
                    iv['out_h'], iv['out_w'], iv['py'], iv['px'],
                    hb, wb, precision=precision, sampler=sampler)
                return fused_paragraph_tail(
                    line_p, char_p, crops, iv['hv'], iv['wv'],
                    precision=precision, margin=True, min_run=min_run,
                    char_head=fused_char_head)
        else:
            stage_blob_fused = stage_res_fused = None

        if mesh is not None:
            from ..parallel.serving import (shard_cascade_stage,
                                            shard_fn_over_batch)
            self._char_fn = shard_fn_over_batch(char_ids, mesh,
                                                n_batch_args=2)
            self._front_resident = shard_fn_over_batch(front_resident,
                                                       mesh, n_batch_args=1)
            # paragraph/line stages: the page/crop/mask stacks are
            # shared gather sources -> replicated; plan matrices shard
            self._paragraph_stage = shard_cascade_stage(
                stage_rot_blob, mesh, n_replicated=2)
            self._paragraph_stage_rot_res = shard_cascade_stage(
                stage_rot_res, mesh, n_replicated=3, static_argnums=(4, 5))
            if self.fused_tail:
                # shard the fused tail over the launch batch with
                # shard-LOCAL line pools: each data shard plans, crops,
                # classifies and decodes its own B/n paragraphs (the
                # glyph compaction cumsum never crosses shards); the
                # small payloads concatenate along the buffer axis and
                # unpack_fused_payload(n_shards=) merges them
                from jax import shard_map
                from jax.sharding import PartitionSpec as PS
                rep_s, dat_s = PS(), PS('data')

                def shard_fused(stage_fn, n_replicated, static_argnums=()):
                    cache = {}

                    def wrapped(*args):
                        statics = tuple(args[i] for i in static_argnums)
                        if statics not in cache:
                            dyn = [i for i in range(len(args))
                                   if i not in static_argnums]
                            in_specs = tuple(
                                rep_s if i < n_replicated else dat_s
                                for i in dyn)
                            fn = (stage_fn if not statics else
                                  (lambda *a, _s=statics:
                                   stage_fn(*a, *_s)))
                            cache[statics] = jax.jit(shard_map(
                                fn, mesh=mesh, in_specs=in_specs,
                                out_specs=(dat_s, dat_s, dat_s),
                                check_vma=False))
                        from jax.sharding import NamedSharding
                        placed = [
                            jax.device_put(
                                jax.tree_util.tree_map(jnp.asarray, a),
                                NamedSharding(
                                    mesh,
                                    rep_s if i < n_replicated else dat_s))
                            for i, a in enumerate(args)
                            if i not in static_argnums]
                        return cache[statics](*placed)

                    return wrapped

                self._paragraph_stage_fused = shard_fused(
                    stage_blob_fused, n_replicated=2)
                self._paragraph_stage_res_fused = shard_fused(
                    stage_res_fused, n_replicated=3, static_argnums=(4, 5))
        else:
            self._char_fn = jax.jit(char_ids)
            self._front_resident = jax.jit(front_resident)
            self._paragraph_stage = jax.jit(stage_rot_blob)
            self._paragraph_stage_rot_res = jax.jit(
                stage_rot_res, static_argnums=(4, 5))
            if self.fused_tail:
                self._paragraph_stage_fused = jax.jit(stage_blob_fused)
                self._paragraph_stage_res_fused = jax.jit(
                    stage_res_fused, static_argnums=(4, 5))
        if self.fused_tail:
            from .fused_tail import fused_payload_nbytes
            self._fused_shards = (mesh.shape.get('data', 1)
                                  if mesh is not None else 1)
            self._fused_nb = self._fused_shards * fused_payload_nbytes(
                self.DEVICE_BATCH // self._fused_shards)

            def write_small(acc, payload, slot):
                return jax.lax.dynamic_update_slice(
                    acc, payload[None, :],
                    (slot, jnp.zeros((), slot.dtype)))

            self._write_small = jax.jit(write_small, donate_argnums=(0,))

        W_page_pad = page_shape[2]

        def prep_stacks(para_packed):
            """Unpack the device-resident paragraph mask stack (the
            affine-gather programs read mono and mask unpadded)."""
            para = jnp.unpackbits(para_packed, axis=2)
            return para[:, :, :W_page_pad, :].astype(jnp.float32)

        self._prep_stacks = jax.jit(prep_stacks)

        if self.fused_tail and mesh is None:
            from .device_cascade import _twopass_crops, device_page_plans
            from .fused_tail import fused_paragraph_tail

            def single_page_chain(params, params2, page_u8, hb, wb, k2):
                """The 1-page latency path as ONE compiled program:
                front -> device paragraph planner (full-page CCL + the
                host plan arithmetic, device_page_plans) -> blob-exact
                per-component crops -> fused tails.  The host uploads the
                page and pulls ONE coalesced small payload; the classic
                path's para-bits pull + host-CCL planning round trips
                disappear.  Crops/tables stay resident for (rare)
                suspect escalation; para bits stay resident for the
                not-ok fallback (CCL cap / component overflow)."""
                line_p, char_p = params2
                m, para_packed = front_resident(params, page_u8)
                para = prep_stacks(para_packed)
                lab, roots, plan, n_comp, ok = device_page_plans(
                    para[0, :, :, 0], hb, wb, k_max=k2)
                # per-component masked page stack: every plan's crop is
                # blob-exact (the host's needs_blob upload variant exists
                # only because its resident mask mixes components)
                masked = (m[0, :, :, 0][None]
                          * (lab[None] == roots[:, None, None]))
                B = k2 // 2
                smalls, keep = [], []
                for g in range(2):
                    iv, fv = unpack_paragraph_plan(plan[g * B:(g + 1) * B])
                    crops = _twopass_crops(
                        masked, None, iv['page'], iv['y0'], iv['x0'],
                        iv['h'], iv['w'], fv['cos'], fv['sin'],
                        fv['off_y'], fv['off_x'], iv['ry0'], iv['rx0'],
                        iv['out_h'], iv['out_w'], iv['py'], iv['px'],
                        hb, wb, precision=precision)
                    crops_s, small, tables_payload = fused_paragraph_tail(
                        line_p, char_p, crops, iv['hv'], iv['wv'],
                        precision=precision, margin=True,
                        min_run=min_run, char_head=fused_char_head)
                    smalls.append(small)
                    keep.append((crops_s, tables_payload))
                meta = jnp.stack([
                    ok.astype(jnp.uint8),
                    jnp.clip(n_comp, 0, 255).astype(jnp.uint8)])
                small_all = jnp.concatenate(smalls + [meta])
                return (small_all, keep[0][0], keep[0][1],
                        keep[1][0], keep[1][1], m, para_packed)

            self._single_page_chain = jax.jit(single_page_chain,
                                              static_argnums=(3, 4, 5))

            def stage_labeled_fused(params2, mono_stack, labels_stack,
                                    plan20, hb, wb):
                """Label-exact fused paragraph stage for device-planned
                chunks: col 19 of the plan matrix is the component's
                root label; each plan's crop source is its page masked
                to ITS component — the blob-upload variant's semantics
                with zero H2D payload."""
                iv, fv = unpack_paragraph_plan(plan20[:, :19])
                root = plan20[:, 19].astype(jnp.int32)
                line_p, char_p = params2
                pg = jnp.take(mono_stack[:, :, :, 0], iv['page'], axis=0)
                lb = jnp.take(labels_stack, iv['page'], axis=0)
                masked = pg * (lb == root[:, None, None]).astype(pg.dtype)
                crops = _twopass_crops(
                    masked, None,
                    jnp.arange(masked.shape[0], dtype=jnp.int32),
                    iv['y0'], iv['x0'], iv['h'], iv['w'], fv['cos'],
                    fv['sin'], fv['off_y'], fv['off_x'], iv['ry0'],
                    iv['rx0'], iv['out_h'], iv['out_w'], iv['py'],
                    iv['px'], hb, wb, precision=precision)
                return fused_paragraph_tail(
                    line_p, char_p, crops, iv['hv'], iv['wv'],
                    precision=precision, margin=True, min_run=min_run,
                    char_head=fused_char_head)

            self._paragraph_stage_labeled_fused = jax.jit(
                stage_labeled_fused, static_argnums=(4, 5))

            from .device_cascade import device_chunk_plans

            def chunk_planner(para_stack, menu, k):
                """Device chunk planner + single-payload packing: ONE
                f32 pull [plans (B,K,20) | menu_idx (B,K) | n_comp (B) |
                converged] replaces the chunk's bit-packed paragraph
                mask pull (the classic dispatch's largest D2H payload)."""
                labels, plans, menu_idx, n_comp, conv = device_chunk_plans(
                    para_stack, menu, k_max=k)
                packed = jnp.concatenate([
                    plans.reshape(-1),
                    menu_idx.astype(jnp.float32).reshape(-1),
                    n_comp.astype(jnp.float32),
                    conv.astype(jnp.float32)[None]])
                return labels, packed

            self._chunk_planner = jax.jit(chunk_planner,
                                          static_argnums=(1, 2))
        else:
            self._single_page_chain = None
            self._chunk_planner = None

        def line_stage(params, crop_stack, plan, out_h, out_w):
            iv, fv = unpack_line_plan(plan)
            w_valid = iv['w_valid']
            lines = zoomed_line_crops_matmul(
                crop_stack, iv['para_idx'], fv['ratio_y'], fv['ratio_x'],
                iv['w_out'], iv['a_yy'], iv['a_yx'], iv['b_y'],
                iv['a_xy'], iv['a_xx'], iv['b_x'], out_h, out_w,
                precision=precision)
            logits = char_forward_masked(params, lines, w_valid,
                                         precision=precision,
                                         head=fused_char_head)
            ids = jnp.argmax(logits, axis=-1)
            # one uint8 per column over the slow D2H link: 255 flags the
            # columns PredToText skips — explicitly the columns at or past
            # each sample's true width (char ids are < 162, so 255 is free)
            cols = jnp.arange(logits.shape[1], dtype=jnp.int32)[None, :]
            valid = cols < w_valid.reshape(-1, 1)
            return jnp.where(valid, ids, 255).astype(jnp.uint8)

        if mesh is not None:
            from ..parallel.serving import shard_cascade_stage
            self._line_stage = shard_cascade_stage(
                line_stage, mesh, n_replicated=2, static_argnums=(3, 4))
        else:
            self._line_stage = jax.jit(line_stage, static_argnums=(3, 4))
        #: per-batch pad programs (_pad_stack): tail chunks and the
        #: 1-page serving path canonicalize their stack batch to `chunk`
        self._pad_cache = {}
        self._pool = ThreadPoolExecutor(max_workers=workers)
        #: dedicated D2H pool: transfers are ~30ms round-trip each over
        #: the tunnel regardless of size, so ALL pulls of a chunk fly
        #: concurrently (device compute per program is <0.1ms)
        self._xfer = ThreadPoolExecutor(max_workers=32)
        #: optional StageTimers (utils/profiling.py); set to instrument
        #: the cascade's dispatch/sync points at ~zero cost when unset
        self.timers = None
        #: tables-mode planning counters: how often the exact-CCL
        #: escalation fires (each fire costs one band-mask D2H pull)
        self.escalation_stats = {'paragraphs': 0, 'suspect': 0,
                                 'cross_axis': 0}
        #: when timers are set, every D2H pull records
        #: (tag, start, end, nbytes) here for wire-utilization analysis
        self.timeline = []
        #: background thread loading the escalation-only line/Char menu
        #: after a fused-mode warmup (None until warmup, or when inline)
        self._warmup_tail = None

    def _track(self, name):
        if self.timers is None:
            import contextlib
            return contextlib.nullcontext()
        return self.timers.track(name)

    def _pull(self, arr, tag):
        """Submit a D2H transfer to the transfer pool; `arr` may be a
        pytree (the tables payload is a (tables, n_blobs) pair).  On the
        profiling path, record a wire-timeline entry."""
        tree = jax.tree_util.tree_map
        if self.timers is None:
            return self._xfer.submit(tree, np.asarray, arr)

        def job():
            import time
            t0 = time.perf_counter()
            out = tree(np.asarray, arr)
            self.timeline.append((
                tag, t0, time.perf_counter(),
                sum(x.nbytes for x in jax.tree_util.tree_leaves(out))))
            return out
        return self._xfer.submit(job)

    def _pull_rows(self, arr, tag, slices=4):
        """Pull a large row-major device array as `slices` CONCURRENT
        D2H transfers.  The tunnel charges ~an RTT per op but overlaps
        ops, so splitting the chunk's biggest single payload (the
        paragraph-mask bits, ~1.5 MB at chunk=32, measured 3.7 MB/s
        effective as ONE pull) multiplies effective bandwidth.  Returns
        a future resolving to the reassembled array."""
        n = arr.shape[0]
        if slices <= 1 or n < slices:
            return self._pull(arr, tag)
        bounds = [(i * n) // slices for i in range(slices + 1)]
        futs = [self._pull(arr[a:b], tag)
                for a, b in zip(bounds, bounds[1:])]
        return self._xfer.submit(
            lambda: np.concatenate([f.result() for f in futs]))

    # ------------------------------------------------------------------
    def _crop_page(self, mono_pred, para_mask):
        """Host: label the (pre-thresholded) paragraph mask, crop+deskew
        the monochrome prediction."""
        from .. import native as _native
        if _native.available():
            labels2d, cnt = _native.label(para_mask[0, :, :, 0] > 0)
            paragraphs = [
                (labels2d == l_id + 1)[None, :, :, None]
                for l_id in range(cnt)]
        else:
            labels, cnt = ndimage.label(para_mask > 0)
            paragraphs = [labels == l_id + 1 for l_id in range(cnt)]
        crops = []
        for mask in paragraphs:
            res = crop_and_rotate_single_paragraph(mask, [mono_pred])
            crops.append(make_divisible_by(res[0], 16, 16))
        return crops

    def _line_menu_shape(self, h, w, shear_margin=False):
        """Smallest menu bucket containing (h, w); shear_margin=True
        (rotated plans in tables mode) additionally reserves the
        residual-tilt shear span on both axes, so content shifted by the
        on-device de-tilt (device_cascade._shear_rows) stays in frame."""
        if not shear_margin:
            return pick_line_shape(self.line_shape_menu, h, w)
        from .device_cascade import _shear_span
        for hb, wb in self.line_shape_menu:
            if (h + 2 * _shear_span(wb) <= hb
                    and w + 2 * _shear_span(hb) <= wb):
                return hb, wb
        return self.line_shape_menu[-1]

    def _run_line_batched(self, crops):
        """All paragraph crops (flat list) -> line predictions (exact
        path) or pre-thresholded band masks (quantized path); canonical
        shape menu, fixed device batch, all launches dispatched before any
        result is pulled (XLA async)."""
        preds = [None] * len(crops)
        params = self.line_model.params
        B = self.DEVICE_BATCH

        groups = {}
        for i, c in enumerate(crops):
            groups.setdefault(
                self._line_menu_shape(c.shape[1], c.shape[2]), []).append(i)

        launches = []
        for (hb, wb), group in groups.items():
            for start in range(0, len(group), B):
                idxs = group[start:start + B]
                if self.quantized_transfers:
                    batch = np.zeros((B, hb, wb, 1), np.uint8)
                else:
                    batch = np.zeros((B, hb, wb, 1), np.float32)
                hs = np.full((B,), 4, np.int32)
                ws = np.full((B,), 4, np.int32)
                for bi, i in enumerate(idxs):
                    c = crops[i]
                    if self.quantized_transfers:
                        batch[bi, :c.shape[1], :c.shape[2], :] = np.round(
                            c[0] * 255.0).astype(np.uint8)
                    else:
                        batch[bi, :c.shape[1], :c.shape[2], :] = c[0]
                    hs[bi], ws[bi] = c.shape[1], c.shape[2]
                fn = (self._line_masks_fn if self.quantized_transfers
                      else self._line_fn)
                launches.append((idxs, fn(params, jnp.asarray(batch),
                                          jnp.asarray(hs), jnp.asarray(ws))))

        futs = [(idxs, self._xfer.submit(np.asarray, dev_out))
                for idxs, dev_out in launches]
        for idxs, fut in futs:
            out = fut.result()
            if self.quantized_transfers:
                out = np.unpackbits(out, axis=2)
            for bi, i in enumerate(idxs):
                h, w = crops[i].shape[1], crops[i].shape[2]
                preds[i] = out[bi:bi + 1, :h, :w, :]
        return preds

    def _menu_width(self, w):
        return pick_char_width(w)

    def _run_char_batched(self, lines):
        """All line crops (flat list) -> per-line argmax ids; widths pad
        to the fixed menu, fixed device batch."""
        preds = [None] * len(lines)
        groups = {}
        for i, line in enumerate(lines):
            groups.setdefault(self._menu_width(line.shape[2]), []).append(i)
        params = self.char_model.params
        B = self.DEVICE_BATCH
        launches = []
        for wb, idxs in groups.items():
            for start in range(0, len(idxs), B):
                chunk_idx = idxs[start:start + B]
                dtype = (np.uint8 if self.quantized_transfers
                         else np.float32)
                batch = np.zeros((B, CHAR_INPUT_HEIGHT, wb, 1), dtype)
                ws = np.full((B,), 4, np.int32)
                for bi, i in enumerate(chunk_idx):
                    line = lines[i]
                    data = line[0]
                    if self.quantized_transfers:
                        data = np.round(data * 255.0).astype(np.uint8)
                    batch[bi, :, :line.shape[2], :] = data
                    ws[bi] = line.shape[2]
                launches.append((chunk_idx,
                                 self._char_fn(params, jnp.asarray(batch),
                                               jnp.asarray(ws))))
        futs = [(chunk_idx, self._xfer.submit(np.asarray, ids_dev),
                 self._xfer.submit(np.asarray, valid_dev))
                for chunk_idx, (ids_dev, valid_dev) in launches]
        for chunk_idx, ids_fut, valid_fut in futs:
            ids = ids_fut.result()
            valid = valid_fut.result()
            for bi, i in enumerate(chunk_idx):
                w = lines[i].shape[2]
                preds[i] = (ids[bi, :w], valid[bi, :w])
        return preds

    # ------------------------------------------------------------------
    # Device-resident cascade (device_cascade=True): the monochrome map
    # and every paragraph/line crop live in HBM for the whole cascade;
    # the host only sees bit-packed masks and plans gather geometry.
    # ------------------------------------------------------------------

    def _page_paragraph_plans(self, page_idx, para2d):
        """Label one page's paragraph mask and plan each blob's crop
        for the affine-gather program: level paragraphs (angle None, the
        common case) carry the identity affine, deskewed ones the scipy
        rotate affine."""
        from .. import native as _native
        if _native.available():
            labels, count = _native.label(para2d > 0)
        else:
            labels, count = ndimage.label(para2d > 0)
        plans = []
        for label_id, sl in enumerate(ndimage.find_objects(labels), start=1):
            if sl is None:
                continue
            blob = labels[sl] == label_id
            h, w = blob.shape
            angle = find_rotation_angle(blob[None, :, :, None])
            if angle is None:
                (cos_a, sin_a), off = (1.0, 0.0), (0.0, 0.0)
                ry0 = rx0 = 0
                out_h, out_w = h, w
            elif self.sampler == 'twopass':
                # analytic rotated bbox: hull-projection extremes plus
                # the order-0 nearest-sampling margin, rounded OUTWARD —
                # replaces the scipy rotate of the blob mask, which was
                # half the measured host planning cost (96 of 190 ms per
                # 8 pages).  A <=1 px looser window only adds zero
                # rows/cols inside the in_domain-masked device crop.
                (rh, rw), (cos_a, sin_a), off = rotate_affine(angle, h, w)
                coords = _extremal_coords(blob)
                dy = coords[:, 0] - off[0]
                dx = coords[:, 1] - off[1]
                proj_y = cos_a * dy - sin_a * dx
                proj_x = sin_a * dy + cos_a * dx
                m = (abs(cos_a) + abs(sin_a)) / 2.0
                ry0 = max(int(np.floor(proj_y.min() - m)), 0)
                rx0 = max(int(np.floor(proj_x.min() - m)), 0)
                y1 = min(int(np.ceil(proj_y.max() + m)), rh - 1)
                x1 = min(int(np.ceil(proj_x.max() + m)), rw - 1)
                out_h, out_w = y1 - ry0 + 1, x1 - rx0 + 1
            else:
                _, (cos_a, sin_a), off = rotate_affine(angle, h, w)
                rot0 = rotate_array(blob[None, :, :, None], angle,
                                    good_rotation=False)
                _, ry, rx, _ = ndimage.find_objects(rot0)[0]
                ry0, rx0 = ry.start, rx.start
                out_h, out_w = ry.stop - ry.start, rx.stop - rx.start
            # make_divisible_by semantics (model.py:57-69): CENTER pad,
            # always adding at least one row/column — the Line model's
            # stride-2 convs are phase sensitive, so placement must match
            # the host path exactly
            pad_h, pad_w = 16 - out_h % 16, 16 - out_w % 16
            hv, wv = out_h + pad_h, out_w + pad_w
            py, px = pad_h // 2, pad_w // 2
            # the two-pass sampler folds near-90-degree rotations
            # through a rot90 of the SOURCE, so the bucket must also
            # hold the transposed source extent for those plans
            rot90_fold = (self.sampler == 'twopass'
                          and abs(sin_a) > abs(cos_a))
            need_h = max(h, hv, w if rot90_fold else 0)
            need_w = max(w, wv, h if rot90_fold else 0)
            hb, wb = self._line_menu_shape(
                need_h, need_w, shear_margin=self.band_tables)
            # pathological rotations can exceed the page-sized menu (bbox
            # of a rotated page-diagonal paragraph); clamp rather than
            # compile a diagonal-sized program for a case the generator
            # never produces
            out_h, hv = min(out_h, hb), min(hv, hb)
            out_w, wv = min(out_w, wb), min(wv, wb)
            rotated = angle is not None
            # when the bbox holds pixels of NO other component, the blob
            # equals para_mask ∩ bbox — the device already has the mask
            # resident, so the (B, HB, WB/8) per-launch H2D upload (the
            # single largest wire payload of the cascade) is skipped
            region = labels[sl]
            needs_blob = bool(((region > 0) & (region != label_id)).any())
            # gather path: blob in bbox-local coords at (0, 0).  Level
            # paragraphs ride the SAME affine-gather programs with the
            # identity affine (cos=1, sin=0) — integer coordinates make
            # the bilinear weights exact, so the crop is bit-equal to a
            # dynamic slice while the compile menu stays half the size
            # (one program family instead of level+rotated variants).
            buf = np.zeros((hb, wb), bool)
            buf[:min(h, hb), :min(w, wb)] = blob[:hb, :wb]
            packed_blob = np.packbits(buf, axis=1)
            plans.append({
                'page': page_idx, 'y0': sl[0].start, 'x0': sl[1].start,
                'h': h, 'w': w, 'cos': cos_a, 'sin': sin_a,
                'off_y': off[0], 'off_x': off[1], 'ry0': ry0, 'rx0': rx0,
                'out_h': out_h, 'out_w': out_w, 'py': py, 'px': px,
                'hv': hv, 'wv': wv, 'rotated': rotated,
                'needs_blob': needs_blob,
                'start_y': sl[0].start - py + self.STACK_PAD,
                'start_x': sl[1].start - px + self.STACK_PAD,
                'menu': (hb, wb), 'blob': packed_blob,
            })
        return plans

    def _dispatch_paragraph_stage(self, stacks, plans, labels_dev=None):
        """Launch the fused crop + Line programs for all plans, grouped
        by shape menu: one bilinear-gather program family serves level
        (identity affine) and deskewed paragraphs alike; single-component
        bboxes use the blob-free resident variant (no mask upload).
        Device-planned plans (carrying a 'root' component label; see
        _dispatch_chunk_device_planned) group separately and ride the
        label-exact stage with `labels_dev`.
        Returns [(plan_indices, crops_dev, payload_dev)] with crops
        left on device for the line stage."""
        mono_dev, para_dev = stacks
        groups = {}
        for i, plan in enumerate(plans):
            groups.setdefault((plan['menu'], 'root' in plan), []).append(i)
        B = self.DEVICE_BATCH
        params = self.line_model.params
        launches = []
        for ((hb, wb), labeled), idxs in groups.items():
            # cluster the (rare, ~9%: scripts) blob-needing plans into as
            # few batches as possible; a batch uses the upload program
            # only if one of its plans needs the true blob — launch count
            # stays ceil(n/B), identical to menu-only grouping
            idxs = sorted(idxs,
                          key=lambda i: not plans[i].get('needs_blob'))
            start = 0
            while start < len(idxs):
                r = len(idxs) - start
                # exact-bands mode: small tail batches ship 4 slots of
                # band bytes instead of 16 (that payload scales with the
                # batch, filled or not).  Tables mode ships ~5KB/slot, so
                # one batch size suffices — half the compile menu.  Under
                # a mesh the batch must divide the data axis.
                Bsub = (4 if (r <= 4 and self.mesh is None
                              and not self.band_tables) else B)
                sel = idxs[start:start + Bsub]
                start += Bsub
                needs_blob = any(plans[i].get('needs_blob')
                                 for i in sel)
                blob = (np.zeros((Bsub, hb, wb // 8), np.uint8)
                        if needs_blob else None)
                from .device_cascade import (PARAGRAPH_FLT_FIELDS,
                                             PARAGRAPH_INT_FIELDS)
                ni = len(PARAGRAPH_INT_FIELDS)
                # ONE f32 plan matrix per launch (integer fields are
                # < 2^24, f32-exact): each extra leaf in an upload is a
                # tunnel round trip
                mat = np.zeros((Bsub, ni + len(PARAGRAPH_FLT_FIELDS)),
                               np.float32)
                # filler rows: harmless 4x4 crop at the stack origin
                for ci, k in enumerate(PARAGRAPH_INT_FIELDS):
                    if k in ('h', 'w', 'out_h', 'out_w', 'hv', 'wv',
                             'y0', 'x0'):
                        mat[:, ci] = 4
                    elif k in ('start_y', 'start_x'):
                        mat[:, ci] = self.STACK_PAD
                mat[:, ni] = 1.0                         # cos
                for bi, i in enumerate(sel):
                    plan = plans[i]
                    if needs_blob:
                        blob[bi] = plan['blob']
                    for ci, k in enumerate(PARAGRAPH_INT_FIELDS):
                        mat[bi, ci] = plan[k]
                    for ci, k in enumerate(PARAGRAPH_FLT_FIELDS):
                        mat[bi, ni + ci] = plan[k]
                if labeled:
                    root_col = np.full((Bsub, 1), -1.0, np.float32)
                    for bi, i in enumerate(sel):
                        root_col[bi, 0] = plans[i]['root']
                    mat = np.concatenate([mat, root_col], axis=1)
                pv = jnp.asarray(mat)
                if self.fused_tail:
                    params2 = (params, self.char_model.params)
                    if labeled:
                        crops, small, packed = (
                            self._paragraph_stage_labeled_fused(
                                params2, mono_dev, labels_dev, pv,
                                hb, wb))
                    elif needs_blob:
                        crops, small, packed = self._paragraph_stage_fused(
                            params2, mono_dev, jnp.asarray(blob), pv)
                    else:
                        crops, small, packed = (
                            self._paragraph_stage_res_fused(
                                params2, mono_dev, para_dev, pv, hb, wb))
                    # the glyph payload joins the chunk's coalesced
                    # accumulation buffer (_dispatch_chunk_device); the
                    # tables payload stays in HBM unless a suspect flag
                    # fires (handle_launch pulls it on demand)
                    launches.append((sel, crops, small, packed))
                    continue
                if needs_blob:
                    crops, packed = self._paragraph_stage(
                        params, mono_dev, jnp.asarray(blob), pv)
                else:
                    crops, packed = self._paragraph_stage_rot_res(
                        params, mono_dev, para_dev, pv, hb, wb)
                # tables mode: the whole payload — tables + the bit-
                # packed column-group profile (~12 KB/paragraph) — comes
                # home in ONE pull per launch.  A device-resident
                # profile pulled per suspect paragraph was measured and
                # rejected: each tiny pull costs ~3-4 tunnel round trips
                # (slice dispatch + ready + transfer), and ~60 suspect
                # pulls serialized on the link erased the band-tables
                # win (14 -> 3 pages/s).
                for leaf in jax.tree_util.tree_leaves(packed):
                    leaf.copy_to_host_async()
                launches.append((sel, crops, None, packed))
        return launches

    @staticmethod
    def _band_blob_stats(mask2d):
        """label_layer semantics on one band channel, but WITHOUT
        materializing a full-size boolean mask per blob (that makes the
        geometry O(blobs * H * W)): one labels pass, then vectorized
        per-blob bboxes and centers of mass."""
        from .. import native as _native
        thresholded = mask2d > np.mean(mask2d)
        if _native.available():
            labels, cnt = _native.label(thresholded)
        else:
            labels, cnt = ndimage.label(thresholded)
        if cnt == 0:
            return [], np.zeros((0, 2))
        bboxes = ndimage.find_objects(labels, cnt)
        # centers must be BIT-IDENTICAL to the host path's per-mask
        # np.argwhere(mask).mean(axis=0) (_mask_centers): group one
        # raster-order argwhere by label and np.mean each slice — same
        # value sequence, same pairwise summation, so near-tie pairings
        # in rearrange can never diverge between the two paths
        coords = np.argwhere(thresholded)
        lab = labels[thresholded]
        order = np.argsort(lab, kind='stable')
        coords = coords[order].astype(float)
        ends = np.searchsorted(lab[order], np.arange(2, cnt + 2))
        starts = np.concatenate([[0], ends[:-1]])
        centers = np.stack([coords[a:b].mean(axis=0)
                            for a, b in zip(starts, ends)])
        return bboxes, centers

    def _plan_lines(self, bands, merge_fragments=False):
        """Line gather plans from one paragraph's thresholded band masks
        (the geometry half of crop_lines_of_paragraph).  Pairing /
        orientation / ordering replicate rearrange_lines
        (interpreter.py:211-233) on (bbox, center) tuples.

        merge_fragments=True (the tables-mode escalation path only —
        exact_bands mode stays bit-equal to the host CV pipeline)
        additionally regroups word-gap band fragments into one line:
        GT bands are solid bars over the whole line
        (image_generator/generate.py line_top/line_bottom rectangles;
        reference generate.py:273-282), so fragmentation is Line-model
        noise that CCL-faithful pairing over-splits."""
        top_boxes, cm_top = self._band_blob_stats(bands[:, :, 0])
        bottom_boxes, cm_bottom = self._band_blob_stats(bands[:, :, 1])
        bboxes, rotation = self._pair_lines(
            top_boxes, cm_top, bottom_boxes, cm_bottom, merge_fragments)
        return self._plans_from_bboxes(bboxes, rotation)

    def _pair_lines(self, top_boxes, cm_top, bottom_boxes, cm_bottom,
                    merge_fragments):
        """The pairing / orientation / ordering half of line planning,
        shared by the exact-mask, table and profile planners.  Takes
        per-blob (bbox slices, centers) for both channels in image
        coordinates; returns (line bboxes, rot90 code)."""
        if not len(top_boxes) or not len(bottom_boxes):
            return [], 0
        d = np.linalg.norm(cm_top[:, None, :] - cm_bottom[None, :, :],
                           axis=-1)
        pick = d.argmin(axis=1)
        bottom_boxes = [bottom_boxes[i] for i in pick]
        cm_bottom = cm_bottom[pick]

        from ..interpreter.interpreter import (_ORIENTATION_KEYS,
                                               _orientation_code)
        delta = cm_top[0] - cm_bottom[0]
        rotation = _orientation_code(delta[0], delta[1])
        axis, sign = _ORIENTATION_KEYS[rotation]
        order_top = np.argsort(sign * cm_top[:, axis - 1], kind='stable')
        order_bottom = np.argsort(sign * cm_bottom[:, axis - 1],
                                  kind='stable')
        bboxes, picks = [], []
        for ti, bi in zip(order_top, order_bottom):
            ty, tx = top_boxes[ti]
            by_, bx_ = bottom_boxes[bi]
            picks.append(int(pick[ti]))
            bboxes.append((
                slice(min(ty.start, by_.start), max(ty.stop, by_.stop)),
                slice(min(tx.start, bx_.start), max(tx.stop, bx_.stop))))
        if merge_fragments:
            bboxes = self._merge_line_bboxes(bboxes, picks, rotation)
        return bboxes, rotation

    def _plan_lines_from_profile(self, prof_bits, axis, hb, wb):
        """Escalation planner: line plans from one suspect paragraph's
        pulled column-group occupancy profile (the (L, G*C/8) bit-packed
        payload of _finish_paragraph_stage — ~8x fewer wire bytes than
        the full band masks).  2D CCL on the (rows, G) grid catches the
        staggered/wavy merges the 1D run decomposition provably missed
        (merge_suspect); group-axis coordinates are quantized by the
        group width gw (~8-12 px), exact along the stacking axis — the
        reading-direction slack decodes as edge whitespace and is
        stripped.

        axis: the device-chosen stacking axis; the profile view is the
        sheared bands (axis 0) or their transpose (axis 1), so view
        dims are (hb, wb) or (wb, hb) of the crop bucket.  Rows arrive
        OR-folded by PROFILE_ROW_DS (device_cascade) — CCL runs on the
        folded grid and coordinates scale back up."""
        from .device_cascade import PROFILE_ROW_DS, _group_centers
        view_h, view_w = (hb, wb) if axis == 0 else (wb, hb)
        ds = PROFILE_ROW_DS
        rows = -(-view_h // ds)
        G, gw, _ = _group_centers(view_w)
        bits = np.unpackbits(np.asarray(prof_bits), axis=1)
        prof = bits[:rows].reshape(rows, G, 2).astype(bool)

        eight = np.ones((3, 3), bool)   # diagonal staircases connect
        stats = []
        for c in range(2):
            labels, cnt = ndimage.label(prof[:, :, c], structure=eight)
            if cnt == 0:
                return []
            boxes, centers = [], []
            coords = np.argwhere(labels > 0)
            lab = labels[labels > 0]
            for blob in range(1, cnt + 1):
                pts = coords[lab == blob].astype(float)
                (y0, g0), (y1, g1) = pts.min(axis=0), pts.max(axis=0)
                box = (slice(int(y0) * ds,
                             min(int(y1 + 1) * ds, view_h)),
                       slice(int(g0) * gw, min(int(g1 + 1) * gw, view_w)))
                cy = pts[:, 0].mean() * ds + (ds - 1) / 2.0
                cx = pts[:, 1].mean() * gw + (gw - 1) / 2.0
                if axis == 1:           # view coords -> image coords
                    box = (box[1], box[0])
                    cy, cx = cx, cy
                boxes.append(box)
                centers.append((cy, cx))
            stats.append((boxes, np.asarray(centers)))
        (top_boxes, cm_top), (bottom_boxes, cm_bottom) = stats
        bboxes, rotation = self._pair_lines(
            top_boxes, cm_top, bottom_boxes, cm_bottom,
            merge_fragments=True)
        return self._plans_from_bboxes(bboxes, rotation)

    @staticmethod
    def _merge_line_bboxes(bboxes, picks, rotation):
        """Union line bboxes whose tops paired with the SAME bottom
        component: a fragmented top band over one solid bottom is the
        same line by construction (GT bands are solid bars —
        image_generator/generate.py line_top/line_bottom rectangles —
        so the fragmentation is Line-model noise).  Purely geometric
        merge rules (gap thresholds) were tried and rejected: gaps
        between neighbouring single-line paragraphs that the Paragraph
        CCL merged into one crop are word-gap-sized (eval page 3), so
        no gap scale separates the two cases."""
        del rotation
        if len(bboxes) < 2:
            return bboxes
        grouped = {}
        for box, pk in zip(bboxes, picks):
            if pk in grouped:
                prev = grouped[pk]
                grouped[pk] = tuple(
                    slice(min(prev[d].start, box[d].start),
                          max(prev[d].stop, box[d].stop))
                    for d in (0, 1))
            else:
                grouped[pk] = box
        return list(grouped.values())

    @staticmethod
    def _cross_axis_escalation(tbl, nb, axis):
        """True when the NON-chosen axis resolves more blobs than the
        chosen one AND those blobs are genuinely separate lines: far
        apart along the line direction (gap above ~a line height, i.e.
        a paragraph margin — side-by-side lines the paragraph CCL
        merged into one crop, invisible to the chosen axis's 1D runs).
        Word-gap fragmentation also inflates the other axis's count,
        but with sub-line-height gaps; the chosen axis's run closing
        already merges those correctly, so escalating them would
        re-introduce the reference's over-split (interpreter.py:421-523
        pairs CCL components with no fragment merge)."""
        other = 1 - axis
        cap = tbl.shape[1]
        # run-interval fields of `other` in image coords: along rows for
        # the row decomposition, along columns for the column one;
        # cross-extent fields are the opposite pair
        lo, hi = (1, 2) if other == 0 else (3, 4)
        clo, chi = (3, 4) if other == 0 else (1, 2)
        for ch in range(tbl.shape[3]):
            n_o = min(int(nb[other, ch]), cap)
            n_c = min(int(nb[axis, ch]), cap)
            if n_o <= max(n_c, 1):
                continue
            t = tbl[other, :n_o, :, ch]
            order = np.argsort(t[:, lo], kind='stable')
            ivs = t[order][:, [lo, hi]]
            gaps = ivs[1:, 0] - ivs[:-1, 1]
            heights = t[order][:, chi] - t[order][:, clo]
            hmin = np.minimum(heights[1:], heights[:-1])
            if (gaps > 0.8 * hmin).any():
                return True
        return False

    def _plan_lines_from_tables(self, tbl, nb, axis=None):
        """Line gather plans from one paragraph's on-device blob tables
        (band_blob_tables fields [count, y0, y1, x0, x1, cy, cx], in the
        per-axis SHEARED coordinates that also index the returned
        de-tilted crop stack).

        Same pairing / orientation / ordering as _plan_lines, but the
        per-blob geometry arrives precomputed: no mask bytes on the wire,
        no host CCL.  tbl: (2, M, 7, 2) f32 [axis, blob, field, channel];
        nb: (2, 2) int32 blob counts; axis: the stacking axis the device
        chose (choose_stacking_axis) — None recomputes it on host (the
        fallback path when planning from band_blob_tables_host)."""
        cap = tbl.shape[1]
        if nb.max() > cap:
            import sys
            print(f'WARNING: band blob table overflow ({int(nb.max())} > '
                  f'{cap} blobs); extra blobs dropped', file=sys.stderr)
        if axis is None:
            from .device_cascade import choose_stacking_axis_host
            axis = int(choose_stacking_axis_host(tbl[None], nb[None])[0])
        n_top = min(int(nb[axis, 0]), cap)
        n_bottom = min(int(nb[axis, 1]), cap)
        if n_top == 0 or n_bottom == 0:
            return []
        top = tbl[axis, :n_top, :, 0]                 # (n_top, 7)
        bottom = tbl[axis, :n_bottom, :, 1]
        cm_top, cm_bottom = top[:, 5:7], bottom[:, 5:7]
        d = np.linalg.norm(cm_top[:, None, :] - cm_bottom[None, :, :],
                           axis=-1)
        pick = d.argmin(axis=1)
        bottom = bottom[pick]
        cm_bottom = cm_bottom[pick]

        from ..interpreter.interpreter import (_ORIENTATION_KEYS,
                                               _orientation_code)
        delta = cm_top[0] - cm_bottom[0]
        rotation = _orientation_code(delta[0], delta[1])
        ax, sign = _ORIENTATION_KEYS[rotation]
        order_top = np.argsort(sign * cm_top[:, ax - 1], kind='stable')
        order_bottom = np.argsort(sign * cm_bottom[:, ax - 1],
                                  kind='stable')
        bboxes, picks = [], []
        for ti, bi in zip(order_top, order_bottom):
            t, b = top[ti], bottom[bi]
            picks.append(int(pick[ti]))
            bboxes.append((
                slice(int(min(t[1], b[1])), int(max(t[2], b[2]))),
                slice(int(min(t[3], b[3])), int(max(t[4], b[4])))))
        # top/bottom run counts can disagree (one channel's decomposition
        # merged what the other split); two tops picking the SAME bottom
        # are one line — without this, the zip pairing emits overlapping
        # near-duplicate bboxes and the page decodes the same text twice
        bboxes = self._merge_line_bboxes(bboxes, picks, rotation)
        return self._plans_from_bboxes(bboxes, rotation)

    def _plans_from_bboxes(self, bboxes, rotation):
        line_plans = []
        for y, x in bboxes:
            h_l, w_l = y.stop - y.start, x.stop - x.start
            (lh, lw), (a_yy, a_yx, b_y, a_xy, a_xx, b_x) = (
                rot90_inverse_affine(rotation, h_l, w_l))
            zf = CHAR_INPUT_HEIGHT / lh
            w_out = zoom_output_width(lw, zf)
            line_plans.append({
                'ratio_y': zoom_ratio(lh, CHAR_INPUT_HEIGHT),
                'ratio_x': zoom_ratio(lw, w_out),
                'w_out': w_out,
                'a_yy': a_yy, 'a_yx': a_yx, 'b_y': b_y + y.start,
                'a_xy': a_xy, 'a_xx': a_xx, 'b_x': b_x + x.start,
                'w_valid': max(w_out, CHAR_FIXED_WIDTH),
            })
        return line_plans

    def _dispatch_line_stage(self, crops_dev, line_plans):
        """Launch the fused zoom-gather + Char programs for all lines of
        one paragraph-stage launch.  line_plans: [(slot, plan)].
        Returns [(plan_refs, ids_dev)].

        All lines of the launch share ONE width bucket (the widest any
        of them needs): per-width grouping fragmented a chunk into ~50
        line launches whose uploads/pulls each cost a tunnel round trip,
        while the padded columns they saved cost <1ms of masked device
        compute."""
        from .device_cascade import LINE_FLT_FIELDS, LINE_INT_FIELDS
        if not line_plans:
            return []
        wc = max(self._menu_width(plan['w_valid'])
                 for _, plan in line_plans)
        refs = list(range(len(line_plans)))
        B = self.LINE_DEVICE_BATCH
        params = self.char_model.params
        launches = []
        ni = len(LINE_INT_FIELDS)
        for start in range(0, len(refs), B):
            sel = refs[start:start + B]
            mat = np.zeros((B, ni + len(LINE_FLT_FIELDS)), np.float32)
            mat[:, LINE_INT_FIELDS.index('w_valid')] = CHAR_FIXED_WIDTH
            for bi, ref in enumerate(sel):
                slot, plan = line_plans[ref]
                mat[bi, 0] = slot                        # para_idx
                for ci, k in enumerate(LINE_INT_FIELDS[1:], start=1):
                    mat[bi, ci] = plan[k]
                for ci, k in enumerate(LINE_FLT_FIELDS):
                    mat[bi, ni + ci] = plan[k]
            ids = self._line_stage(params, crops_dev, jnp.asarray(mat),
                                   CHAR_INPUT_HEIGHT, wc)
            launches.append((sel, ids))
        return launches

    def _pad_stack(self, arr):
        """Canonicalize the page-stack batch to `chunk`: every
        paragraph-stage program is traced against the STACK shape, so a
        tail chunk (or the 1-page latency path) would otherwise
        recompile the entire launch menu per distinct batch size — a
        ~30s remote compile each on this tunnel.  One tiny per-batch
        device pad (zeros concat; filler pages are never referenced by
        any plan) replaces a per-batch program universe."""
        b = arr.shape[0]
        if b >= self.chunk:
            return arr
        key = (b,) + tuple(arr.shape[1:]) + (str(arr.dtype),)
        fn = self._pad_cache.get(key)
        if fn is None:
            rows = self.chunk - b
            fn = jax.jit(lambda a: jnp.concatenate(
                [a, jnp.zeros((rows,) + a.shape[1:], a.dtype)]))
            self._pad_cache[key] = fn
        return fn(arr)

    def _dispatch_chunk_device(self, n_pages, mono_dev, para_bits):
        """Dispatch phase of one device-resident chunk: paragraph CCL +
        crop/Line launches with CONCURRENT band-mask pulls, then line/Char
        launches with concurrent char-id pulls.  Every device program here
        costs <0.1ms (scripts/bisect_stage_cost.py); the tunnel's ~30ms
        per-call round trip is the real cost, so every D2H runs as a
        transfer-pool future and this phase never blocks on a result the
        collect phase can wait for.  Returns state for
        `_collect_chunk_device`."""
        if para_bits.shape[0] < self.chunk:
            # host-side bit pad + device-side mono pad keep every
            # downstream program keyed to the canonical chunk batch
            para_bits = np.concatenate([
                para_bits,
                np.zeros((self.chunk - para_bits.shape[0],)
                         + para_bits.shape[1:], para_bits.dtype)])
        mono_dev = self._pad_stack(mono_dev)
        para_dev = self._prep_stacks(jnp.asarray(para_bits))
        if self.mesh is not None:
            # all-gather the page stacks ONCE per chunk: every later
            # gather program reads them as a replicated source (device_put
            # onto the already-replicated array is then a no-op per launch)
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            mono_dev = jax.device_put(mono_dev, rep)
            para_dev = jax.device_put(para_dev, rep)
        para = np.unpackbits(para_bits, axis=2)
        para = para[:, :, :self.page_shape[2], 0]

        with self._track('host_paragraph_plans'):
            # serial on purpose: scipy's nd_image calls hold the GIL, so
            # pool-mapping pages was measured slower (236 vs 190 ms)
            plans = [p
                     for page in range(n_pages)
                     for p in self._page_paragraph_plans(page, para[page])]

        return self._finish_dispatch(n_pages, mono_dev, para_dev, plans)

    def _dispatch_chunk_device_planned(self, n_pages, mono_dev, bits_dev):
        """Device-planned dispatch: the chunk planner (device_chunk_plans)
        replaces the bit-packed paragraph-mask pull (the classic
        dispatch's largest D2H payload, 1.46 MB / 16 sliced pulls per
        32-page chunk) and the host scipy-CCL plan loop with ONE compact
        plan-matrix pull.  Pages the planner flags (un-converged CCL or
        >k_max components) fall back to the host planner on their own
        pulled mask rows; every planned page's crops are label-exact
        (stage_labeled_fused), so the blob H2D upload disappears too."""
        from .device_cascade import (PARAGRAPH_FLT_FIELDS,
                                     PARAGRAPH_INT_FIELDS)
        K = self.CHUNK_PLAN_K
        menu_t = tuple(self.line_shape_menu)
        if bits_dev.shape[0] < self.chunk:
            pad = jnp.zeros((self.chunk - bits_dev.shape[0],)
                            + bits_dev.shape[1:], bits_dev.dtype)
            bits_dev = jnp.concatenate([bits_dev, pad])
        mono_dev = self._pad_stack(mono_dev)
        para_dev = self._prep_stacks(bits_dev)
        labels_dev, packed = self._chunk_planner(
            para_dev[:, :, :, 0], menu_t, K)
        with self._track('pull_plan_matrix'):
            flat = np.asarray(self._pull(packed, 'plan_matrix').result())
        B = self.chunk
        o = B * K * 20
        mats = flat[:o].reshape(B, K, 20)
        menu_idx = flat[o:o + B * K].reshape(B, K).astype(np.int32)
        n_comp = flat[o + B * K:o + B * K + B].astype(np.int32)
        converged = bool(flat[-1])

        ni = len(PARAGRAPH_INT_FIELDS)
        plans = []
        bits_host = None
        with self._track('host_paragraph_plans'):
            for page in range(n_pages):
                if converged and n_comp[page] <= K:
                    for k in range(int(n_comp[page])):
                        row = mats[page, k]
                        plan = {f: int(row[ci]) for ci, f in
                                enumerate(PARAGRAPH_INT_FIELDS)}
                        for ci, f in enumerate(PARAGRAPH_FLT_FIELDS):
                            plan[f] = float(row[ni + ci])
                        plan['page'] = page
                        plan['menu'] = menu_t[menu_idx[page, k]]
                        plan['root'] = int(row[19])
                        plan['needs_blob'] = False
                        plans.append(plan)
                    continue
                st = self.escalation_stats
                st['chain_fallback'] = st.get('chain_fallback', 0) + 1
                if bits_host is None:
                    with self._track('pull_para_bits'):
                        bits_host = np.asarray(
                            self._pull(bits_dev, 'para_bits').result())
                    para = np.unpackbits(bits_host, axis=2)
                    para = para[:, :, :self.page_shape[2], 0]
                plans.extend(self._page_paragraph_plans(page, para[page]))
        return self._finish_dispatch(n_pages, mono_dev, para_dev, plans,
                                     labels_dev=labels_dev)

    def _finish_dispatch(self, n_pages, mono_dev, para_dev, plans,
                         labels_dev=None):
        rep = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
        with self._track('dispatch_paragraph_stage'):
            launches = self._dispatch_paragraph_stage(
                (mono_dev, para_dev), plans, labels_dev=labels_dev)

        # all band-mask/glyph transfers in flight at once: total wait
        # collapses to wire time instead of launches x RTT.  (A per-row
        # run-summary encoding was tried and measured: 56% of nonempty
        # band rows have 2-15 runs (word gaps) — scripts/band_stats.py —
        # so compact row encodings lose; the 1-bit planes are exact.)
        if self.fused_tail:
            # coalesce the ~4 KB glyph payloads across launches: K tiny
            # device writes into one (SMALL_SLOTS, NB) buffer, ONE pull
            # per wave — each per-launch pull would cost a tunnel RTT
            band_futures = []
            for start in range(0, len(launches), self.SMALL_SLOTS):
                wave = launches[start:start + self.SMALL_SLOTS]
                acc = jnp.zeros((self.SMALL_SLOTS, self._fused_nb),
                                jnp.uint8)
                for wi, (_s, _c, small, _p) in enumerate(wave):
                    acc = self._write_small(acc, small, jnp.int32(wi))
                fut = self._pull(acc, 'fused_glyphs')
                band_futures.extend((fut, wi) for wi in range(len(wave)))
        else:
            band_futures = [self._pull(payload, 'bands')
                            for _, _, _small, payload in launches]

        texts = {}                      # plan index -> [line text]

        def handle_launch(item):
            """Payload wait -> (escalation) line geometry -> line/Char
            dispatch for ONE paragraph launch; launches process in
            parallel so transfer waits, host CCL and dispatches all
            overlap."""
            (sel, crops_dev, _small, _payload), fut = item
            if self.mesh is not None:
                # crop stack becomes the line stage's shared gather
                # source: all-gather once per paragraph launch
                crops_dev = jax.device_put(crops_dev, rep)
            if self.fused_tail:
                from .fused_tail import unpack_fused_payload
                wave_fut, row = fut
                with self._track('pull_fused_glyphs'):
                    direct_lines, suspects = unpack_fused_payload(
                        wave_fut.result()[row], len(sel),
                        n_shards=self._fused_shards)
                st = self.escalation_stats
                st['paragraphs'] += len(sel)
                st['cross_axis'] += int(((suspects >> 1) & 1).sum())
                st['capacity'] = (st.get('capacity', 0)
                                  + int((suspects >= 4).sum()))
                # per-component bits (fused_tail.suspect_mask order)
                for b, comp in enumerate(
                        ('merge', 'cross', 'table_of', 'lines_of',
                         'pool_of', 'trunc_of', 'glyph_of')):
                    st[comp] = (st.get(comp, 0)
                                + int(((suspects >> b) & 1).sum()))
                direct = {bi: direct_lines[bi] for bi in range(len(sel))
                          if not suspects[bi]}
                flat = []
                if suspects.any():
                    # the tables payload stayed in HBM; pull it now for
                    # the suspect paragraphs' profile re-plan
                    from .device_cascade import unpack_tables_payload
                    with self._track('pull_band_tables'):
                        (tables, n_blobs, _sh, axes, _sus,
                         profiles) = unpack_tables_payload(
                            self._pull(_payload, 'bands').result())
                    with self._track('host_line_plans'):
                        for bi in range(len(sel)):
                            if not suspects[bi]:
                                continue
                            st['suspect'] += 1
                            ax = int(axes[bi])
                            # geometry suspects (merged lines / cross-
                            # axis disagreement) and table overflow need
                            # the 2D-CCL profile re-plan; pure CAPACITY
                            # overflows (pool/width/glyph caps) have
                            # intact tables — re-planning from them
                            # reproduces the classic path's geometry
                            # exactly (tests/test_fused_tail.py overflow
                            # equality)
                            geometry = int(suspects[bi]) & 0b111
                            if self.escalation and geometry:
                                hb, wb = plans[sel[bi]]['menu']
                                lps = self._plan_lines_from_profile(
                                    profiles[bi], ax, hb, wb)
                                # escalation-VALUE telemetry: did the
                                # 2D-CCL re-plan actually change the
                                # geometry vs the run-decomposition
                                # tables?  (if most merge escalations
                                # are no-ops the suspect test is too
                                # loose — each fire costs a tables pull
                                # + line/Char launch on the wire)
                                tps = self._plan_lines_from_tables(
                                    tables[bi], n_blobs[bi], ax)
                                if lps != tps:
                                    st['merge_changed'] = st.get(
                                        'merge_changed', 0) + 1
                            else:
                                lps = self._plan_lines_from_tables(
                                    tables[bi], n_blobs[bi], ax)
                            flat.extend((bi, lp) for lp in lps)
                with self._track('dispatch_line_stage'):
                    refs = self._dispatch_line_stage(crops_dev, flat)
                id_futures = [(ref_sel, self._pull(ids_dev, 'char_ids'))
                              for ref_sel, ids_dev in refs]
                return sel, flat, id_futures, direct
            if self.band_tables:
                from .device_cascade import unpack_tables_payload
                with self._track('pull_band_tables'):
                    (tables, n_blobs, _shears, axes, suspects,
                     profiles) = unpack_tables_payload(fut.result())
                # Escalation: paragraphs whose run decomposition
                # provably merged lines (device merge_suspect: wavy /
                # staggered tilt no single shear levels) or whose non-
                # chosen axis found MORE blobs than the chosen one
                # (side-by-side lines sharing a row band) re-plan with
                # 2D CCL on their sheared column-group profile — part
                # of the same per-launch pull, so escalating costs no
                # extra wire round trip
                st = self.escalation_stats
                with self._track('host_line_plans'):
                    flat = []
                    for bi in range(len(sel)):
                        ax = int(axes[bi])
                        st['paragraphs'] += 1
                        escalate = False
                        if bool(suspects[bi]):
                            st['suspect'] += 1
                            escalate = True
                        elif self._cross_axis_escalation(
                                tables[bi], n_blobs[bi], ax):
                            st['cross_axis'] += 1
                            escalate = True
                        if escalate and self.escalation:
                            hb, wb = plans[sel[bi]]['menu']
                            lps = self._plan_lines_from_profile(
                                profiles[bi], ax, hb, wb)
                        else:
                            lps = self._plan_lines_from_tables(
                                tables[bi], n_blobs[bi], ax)
                        flat.extend((bi, lp) for lp in lps)
            else:
                with self._track('pull_band_masks'):
                    bands = np.unpackbits(fut.result(), axis=2)
                with self._track('host_line_plans'):
                    flat = []
                    for bi in range(len(sel)):
                        plan = plans[sel[bi]]
                        view = bands[bi, :plan['hv'], :plan['wv'], :] > 0
                        flat.extend((bi, lp)
                                    for lp in self._plan_lines(view))
            with self._track('dispatch_line_stage'):
                refs = self._dispatch_line_stage(crops_dev, flat)
            id_futures = [(ref_sel, self._pull(ids_dev, 'char_ids'))
                          for ref_sel, ids_dev in refs]
            return sel, flat, id_futures, None

        char_launches = list(self._pool.map(
            handle_launch, zip(launches, band_futures)))
        return n_pages, plans, texts, char_launches

    def _collect_chunk_device(self, state):
        """Collect phase: wait out the in-flight char-id transfers and
        decode text.  Runs while the NEXT chunk's device work and
        transfers proceed underneath."""
        n_pages, plans, texts, char_launches = state
        results = [[] for _ in range(n_pages)]
        for sel, flat, id_futures, direct in char_launches:
            line_texts = [None] * len(flat)
            for ref_sel, fut in id_futures:
                with self._track('pull_char_ids'):
                    ids = fut.result()
                for bi, ref in enumerate(ref_sel):
                    w = flat[ref][1]['w_valid']
                    row = ids[bi, :w]
                    # edge whitespace is crop-margin artifact (the
                    # line bucket pads past the glyphs), not content
                    line_texts[ref] = pred_ids_to_text(
                        row, row != 255, self.collapse_runs).strip()
            cursor = 0
            for bi, i in enumerate(sel):
                if direct is not None and bi in direct:
                    # fused tail decoded this paragraph on device
                    texts[i] = [t.strip() for t in direct[bi]]
                    continue
                n_lines = sum(1 for slot, _ in flat if slot == bi)
                texts[i] = line_texts[cursor:cursor + n_lines]
                cursor += n_lines

        for i, plan in enumerate(plans):
            results[plan['page']].append(texts.get(i, []))
        return results

    def _ocr_chunk_device(self, n_pages, mono_dev, para_bits):
        """One chunk, device-resident: host work is CCL + geometry over
        bit-packed masks; every pixel transform is a device slice/matmul."""
        return self._collect_chunk_device(
            self._dispatch_chunk_device(n_pages, mono_dev, para_bits))

    def _ocr_single_page_device(self, page):
        """1-page latency path: ONE dispatched program chain (front +
        device paragraph planner + blob-exact crops + fused tails) and
        ONE small pull — the classic path's para-bits pull, host plans
        and per-stage launches cost 3 extra serial wire round trips this
        path doesn't make.  Suspect escalation and the not-ok fallback
        (CCL sweep cap / >2*DEVICE_BATCH components) pull the resident
        tables / para bits on demand, exactly like the chunk path."""
        from .device_cascade import unpack_tables_payload
        from .fused_tail import fused_payload_nbytes, unpack_fused_payload
        K2 = 2 * self.DEVICE_BATCH
        hb, wb = self.line_shape_menu[-1]
        arr = np.asarray(page)
        batch = (np.asarray(arr * 255.0, np.uint8)
                 if arr.dtype != np.uint8 else arr)
        with self._track('dispatch_single_chain'):
            (small_all, crops0, tables0, crops1, tables1, mono_dev,
             para_packed) = self._single_page_chain(
                self.front_params,
                (self.line_model.params, self.char_model.params),
                jnp.asarray(batch), hb, wb, K2)
        with self._track('pull_fused_glyphs'):
            buf = np.asarray(self._pull(small_all, 'fused_glyphs').result())
        ok, n_comp = bool(buf[-2]), int(buf[-1])
        if not ok:
            # rare: un-converged page CCL or component overflow — the
            # classic chunk path replans on host from the resident bits
            st = self.escalation_stats
            st['chain_fallback'] = st.get('chain_fallback', 0) + 1
            with self._track('pull_para_bits'):
                para_bits = np.asarray(
                    self._pull(para_packed, 'para_bits').result())
            return self._ocr_chunk_device(1, mono_dev, para_bits)[0]

        nb = fused_payload_nbytes(self.DEVICE_BATCH)
        st = self.escalation_stats
        result = []
        for g, crops_dev, tables_dev in ((0, crops0, tables0),
                                         (1, crops1, tables1)):
            n_g = min(max(n_comp - g * self.DEVICE_BATCH, 0),
                      self.DEVICE_BATCH)
            if n_g == 0:
                break
            texts, suspects = unpack_fused_payload(
                buf[g * nb:(g + 1) * nb], n_g)
            st['paragraphs'] += n_g
            st['cross_axis'] += int(((suspects >> 1) & 1).sum())
            st['capacity'] = (st.get('capacity', 0)
                              + int((suspects >= 4).sum()))
            for b, comp in enumerate(
                    ('merge', 'cross', 'table_of', 'lines_of',
                     'pool_of', 'trunc_of', 'glyph_of')):
                st[comp] = st.get(comp, 0) + int(((suspects >> b) & 1).sum())
            if suspects.any():
                with self._track('pull_band_tables'):
                    (tables, n_blobs, _sh, axes, _sus,
                     profiles) = unpack_tables_payload(
                        self._pull(tables_dev, 'bands').result())
                flat = []
                with self._track('host_line_plans'):
                    for bi in range(n_g):
                        if not suspects[bi]:
                            continue
                        st['suspect'] += 1
                        ax = int(axes[bi])
                        geometry = int(suspects[bi]) & 0b111
                        if self.escalation and geometry:
                            lps = self._plan_lines_from_profile(
                                profiles[bi], ax, hb, wb)
                        else:
                            lps = self._plan_lines_from_tables(
                                tables[bi], n_blobs[bi], ax)
                        flat.extend((bi, lp) for lp in lps)
                with self._track('dispatch_line_stage'):
                    refs = self._dispatch_line_stage(crops_dev, flat)
                line_texts = [None] * len(flat)
                for ref_sel, ids_dev in refs:
                    with self._track('pull_char_ids'):
                        ids = np.asarray(
                            self._pull(ids_dev, 'char_ids').result())
                    for bi, ref in enumerate(ref_sel):
                        w = flat[ref][1]['w_valid']
                        row = ids[bi, :w]
                        line_texts[ref] = pred_ids_to_text(
                            row, row != 255, self.collapse_runs).strip()
                for bi in range(n_g):
                    if suspects[bi]:
                        texts[bi] = [line_texts[k]
                                     for k, (slot, _) in enumerate(flat)
                                     if slot == bi]
            result.extend([t.strip() for t in para] for para in texts)
        return result

    def warmup(self):
        """Compile the whole program menu with dummy data (cached
        persistently; later runs start hot)."""
        if self.device_cascade:
            return self._warmup_device()
        self.ocr_pages([np.zeros(self.page_shape, np.float32)])
        for hb, wb in self.line_shape_menu:
            self._run_line_batched([np.zeros((1, hb, wb, 1), np.float32)])
        for w in self.CHAR_WIDTH_MENU:
            self._run_char_batched(
                [np.zeros((1, CHAR_INPUT_HEIGHT, w, 1), np.float32)])

    def _warmup_device(self):
        """Compile the device-cascade program menu: the resident front
        at full chunk batch, the blob / resident affine-gather paragraph
        programs per crop-menu shape, and one line-stage program per
        (crop menu, char width) pair.

        Menu entries compile CONCURRENTLY (jit tracing and XLA
        compilation are thread-safe): on a cold cache every program is
        a minutes-long remote compile, and the compiles are independent,
        so fanning the menu over threads bounds cold warmup by the
        slowest program instead of the sum."""
        H, W = self.page_shape[1], self.page_shape[2]
        mono_dev = jnp.zeros((self.chunk, H, W, 1), jnp.float32)
        para_bits = np.zeros((self.chunk, H, (W + 7) // 8, 1), np.uint8)
        stacks = (mono_dev, self._prep_stacks(jnp.asarray(para_bits)))
        # the chunk path (front + planner at full chunk batch), the
        # 1-page chain, and every menu shape are INDEPENDENT program
        # sets — warm them concurrently (the pool fan below), not
        # serially: on a warm cache the cost is per-program trace+load,
        # so the fan bounds startup by the slowest member
        entry_jobs = [
            lambda: self.ocr_pages(
                [np.zeros(self.page_shape, np.float32)] * self.chunk),
            lambda: self.ocr_pages(
                [np.zeros(self.page_shape, np.float32)]),
        ]

        def one_shape(shape):
            hb, wb = shape
            h, w = min(hb, H) - 8, min(wb, W) - 8
            blob = np.zeros((hb, wb // 8), np.uint8)
            blob[:h, :w // 8] = 0xFF
            plan = {'page': 0, 'y0': 0, 'x0': 0, 'h': h, 'w': w,
                    'cos': 1.0, 'sin': 0.0, 'off_y': 0.0, 'off_x': 0.0,
                    'ry0': 0, 'rx0': 0, 'out_h': h, 'out_w': w,
                    'py': 0, 'px': 0,
                    'start_y': self.STACK_PAD, 'start_x': self.STACK_PAD,
                    'hv': round_up(h, 16), 'wv': round_up(w, 16),
                    'menu': (hb, wb), 'blob': blob, 'rotated': False}
            crops_by_batch = {}

            def para_variant(extra, n):
                p = dict(plan, **extra)
                labels = (lab0 if 'root' in extra else None)
                for _, crops_dev, small, payload in (
                        self._dispatch_paragraph_stage(
                            stacks, [p] * n, labels_dev=labels)):
                    for leaf in jax.tree_util.tree_leaves(
                            (small, payload)):
                        if leaf is not None:
                            leaf.block_until_ready()
                    crops_by_batch[crops_dev.shape[0]] = crops_dev

            # warm exactly the program variants THIS config can launch:
            # device-planned chunks (fused, no mesh) ride the label-exact
            # stage — the blob/resident programs only serve (rare)
            # planner-fallback pages and lazy-load from the persistent
            # cache; tables/fused mode is batch-canonical at
            # DEVICE_BATCH; only exact-bands mode has the B=4 tail.
            # Per-process program LOADS over the tunnel, not compiles,
            # dominate warm startup, so every unused variant cut here is
            # wall-clock at serving start.
            if self.band_tables or self.mesh is not None:
                batches = (self.DEVICE_BATCH,)
            else:
                batches = (4, self.DEVICE_BATCH)
            if self._chunk_planner is not None:
                lab0 = jnp.zeros((self.chunk, H, W), jnp.int32)
                variants = [({'root': 0}, n) for n in batches]
            else:
                lab0 = None
                variants = [({'needs_blob': nb}, n) for nb in (False, True)
                            for n in batches]
            list(pool.map(lambda a: para_variant(*a), variants))

            def line_variant(args):
                crops_dev, wc = args
                line_plan = {'ratio_y': 0.0, 'ratio_x': 0.0,
                             'w_out': wc,
                             'a_yy': 1, 'a_yx': 0, 'b_y': 0,
                             'a_xy': 0, 'a_xx': 1, 'b_x': 0,
                             'w_valid': wc}
                for _, ids in self._dispatch_line_stage(
                        crops_dev, [(0, line_plan)]):
                    ids.block_until_ready()

            # line-stage program per (crop-stack batch, char width) pair
            jobs = [(c, wc) for c in crops_by_batch.values()
                    for wc in self.CHAR_WIDTH_MENU]
            if self.fused_tail:
                # fused mode decodes lines + chars INSIDE the paragraph
                # program; the standalone line/Char programs only fire on
                # (rare) escalations, so their load moves off the
                # startup-critical path.  A first escalation racing the
                # background load just waits on the jit lock.
                return line_variant, jobs
            list(pool.map(line_variant, jobs))
            return None

        with ThreadPoolExecutor(max_workers=16) as pool:
            entry_futs = [pool.submit(j) for j in entry_jobs]
            tails = [t for t in pool.map(one_shape, self.line_shape_menu)
                     if t is not None]
            for f in entry_futs:
                f.result()

        if tails:
            def warm_tail():
                with ThreadPoolExecutor(max_workers=16) as tail_pool:
                    for line_variant, jobs in tails:
                        list(tail_pool.map(line_variant, jobs))

            t = Thread(target=warm_tail, daemon=True,
                       name='warmup-line-menu')
            t.start()
            self._warmup_tail = t

    def ocr_pages(self, pages):
        """pages: list of (1, H, W, 1) float arrays (all same shape).
        Returns per page: [paragraph][line] -> decoded text."""
        if len(pages) == 1 and self._single_page_chain is not None:
            return [self._ocr_single_page_device(pages[0])]
        front_fn = (self._front_resident if self.device_cascade
                    else self._front)
        front_params = self.front_params
        n_data = self.mesh.shape.get('data', 1) if self.mesh else 1
        chunks = [pages[start:start + self.chunk]
                  for start in range(0, len(pages), self.chunk)]

        def dispatch_front(chunk):
            batch = np.concatenate([
                np.asarray(np.asarray(p) * 255.0, np.uint8)
                if np.asarray(p).dtype != np.uint8 else np.asarray(p)
                for p in chunk])
            if batch.shape[0] % n_data:
                # a partial tail chunk must still divide over the data
                # shards; blank pages yield no paragraphs and the host
                # loops only read the first len(chunk) rows
                pad = n_data - batch.shape[0] % n_data
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], np.uint8)])
            return chunk, front_fn(front_params, jnp.asarray(batch))

        if self.device_cascade:
            # software-pipelined chunks: a dispatcher thread runs the
            # dispatch phase (front launch, paragraph plans, stage
            # launches, transfer kicks) while the main thread collects
            # the previous chunk's char ids — chunk i+1's device work and
            # D2H overlap chunk i's decode.  Fronts dispatch ONE chunk
            # ahead and the bounded queue caps live crop stacks, so HBM
            # holds at most ~3 chunks of full-resolution monochrome maps
            # however long the page list is.
            import queue as _queue
            states = _queue.Queue(maxsize=2)

            planned = self._chunk_planner is not None

            def stage_bits(bits_dev):
                # device-planned chunks keep the mask on device (the
                # planner replaces the pull); classic chunks start the
                # sliced D2H pull immediately
                if planned:
                    return bits_dev
                return self._pull_rows(bits_dev, 'para_bits')

            def dispatcher():
                try:
                    pending = None          # (chunk, mono_dev, bits)
                    for i, chunk in enumerate(chunks):
                        if pending is None:
                            _, (mono_dev, bits_dev) = dispatch_front(chunk)
                            pending = (chunk, mono_dev,
                                       stage_bits(bits_dev))
                        chunk, mono_dev, bits = pending
                        # kick chunk i+1's front before blocking on chunk
                        # i's paragraph-mask pull
                        if i + 1 < len(chunks):
                            nxt = chunks[i + 1]
                            _, (mono_nxt, bits_nxt) = dispatch_front(nxt)
                            pending = (nxt, mono_nxt,
                                       stage_bits(bits_nxt))
                        else:
                            pending = None
                        if planned:
                            states.put(
                                ('ok', self._dispatch_chunk_device_planned(
                                    len(chunk), mono_dev, bits)))
                            continue
                        with self._track('pull_para_bits'):
                            para_bits = bits.result()
                        states.put(('ok', self._dispatch_chunk_device(
                            len(chunk), mono_dev, para_bits)))
                except BaseException as exc:   # surface on main thread
                    states.put(('err', exc))

            t = Thread(target=dispatcher, daemon=True)
            t.start()
            results = []
            for _ in chunks:
                kind, state = states.get()
                if kind == 'err':
                    raise state
                results.extend(self._collect_chunk_device(state))
            t.join()
            return results

        fronts = [dispatch_front(chunk) for chunk in chunks]

        # Prefetch D2H on a side thread so chunk i+1's transfer overlaps
        # chunk i's host CV (the tunnel's D2H is the scarce resource).
        def pull(item):
            chunk, (mono_dev, para_dev) = item
            return chunk, np.asarray(mono_dev), np.asarray(para_dev)

        results = []
        pulled = self._pool.submit(pull, fronts[0]) if fronts else None
        for i in range(len(fronts)):
            chunk, mono, para = pulled.result()
            if i + 1 < len(fronts):
                pulled = self._pool.submit(pull, fronts[i + 1])
            results.extend(self._ocr_chunk(chunk, mono, para))
        return results

    def _ocr_chunk(self, pages, mono, para):
        n = len(pages)
        mono = np.asarray(mono)
        para = np.asarray(para)
        if self.quantized_transfers:
            mono = mono.astype(np.float32) / 255.0
            # packbits rounded W up to a multiple of 8 on device; slice the
            # unpacked mask back so it broadcasts against the monochrome map
            para = np.unpackbits(para, axis=2)[:, :, :mono.shape[2], :]

        # host: paragraph crops per page (threaded)
        crops_per_page = list(self._pool.map(
            lambda i: self._crop_page(mono[i:i + 1], para[i:i + 1]),
            range(n)))

        # device: Line over every crop of the chunk
        flat_crops = [c for crops in crops_per_page for c in crops]
        flat_line_preds = self._run_line_batched(flat_crops)

        # host: line crops per paragraph (threaded)
        def crop_lines(k):
            return crop_lines_of_paragraph(
                flat_line_preds[k], flat_crops[k],
                CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH,
                thresholded_input=self.quantized_transfers)

        lines_per_crop = list(self._pool.map(crop_lines,
                                             range(len(flat_crops))))

        # device: Char over every line of the chunk
        flat_lines = [l for lines in lines_per_crop for l in lines]
        flat_logits = (self._run_char_batched(flat_lines)
                       if flat_lines else [])

        # host: decode text, reassemble nesting
        texts = [pred_ids_to_text(ids, valid, self.collapse_runs).strip()
                 for ids, valid in flat_logits]

        results = []
        li = 0
        ci = 0
        for crops in crops_per_page:
            page_result = []
            for _ in crops:
                n_lines = len(lines_per_crop[ci])
                page_result.append(texts[li:li + n_lines])
                li += n_lines
                ci += 1
            results.append(page_result)
        return results
