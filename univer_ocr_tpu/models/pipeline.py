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

import numpy as np

import jax
import jax.numpy as jnp

from scipy import ndimage

from ..interpreter.interpreter import (crop_and_rotate_single_paragraph,
                                       label_layer, pred_ids_to_text,
                                       rearrange_lines, rotate_array)
from .bucketing import round_up
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
    #: Char-stage width menu: every line pads to the next entry, so the
    #: whole run compiles at most len(menu) char programs.
    CHAR_WIDTH_MENU = (256, 512, 1024, 2048)
    #: Fixed device batch for Line/Char launches (pow2 padding per launch
    #: would multiply the compile menu by the number of batch sizes).
    DEVICE_BATCH = 16

    def __init__(self, page_shape, weights=None, chunk=8, workers=8,
                 line_bucket=64, char_bucket=64, collapse_runs=False,
                 quantized_transfers=True, mesh=None, use_pallas=False):
        self.page_shape = page_shape
        self.chunk = chunk
        self.line_bucket = line_bucket
        self.char_bucket = char_bucket
        self.collapse_runs = collapse_runs
        self.quantized_transfers = quantized_transfers
        # paragraph crops pad to a tiny menu of canonical shapes: program
        # count is the scarce resource (a remote compile is minutes), but
        # most paragraphs are far smaller than a page, so a 3-entry menu
        # buys back most of the padded transfer/compute
        max_shape = (round_up(page_shape[1] + 16, 128),
                     round_up(page_shape[2] + 16, 128))
        self.line_shape_menu = [
            (128, 256), (256, 512), max_shape,
        ]

        mono = make_monochrome(page_shape)
        para = make_paragraph(page_shape)
        self.line_model = make_line(page_shape)
        self.char_model = make_char(page_shape)
        for model in (mono, para, self.line_model, self.char_model):
            if weights:
                model.set_weights(weights)

        self.front_params = {**mono.params, **para.params}
        para_forward = para.forward_fn
        quantized = quantized_transfers

        if use_pallas:
            from ..ops.pallas import fused_monochrome
            interp = jax.devices()[0].platform == 'cpu'
            H = page_shape[1]
            # largest strip height <= 128 dividing H (VMEM budget for the
            # 16-channel intermediate)
            strip = max(d for d in range(1, 129) if H % d == 0)

            def mono_fwd(params, x):
                # Pallas fused monochrome block, vmapped over the chunk
                w1 = params['Monochrome/conv_1']['w']
                b1 = params['Monochrome/conv_1']['b']
                w2 = params['Monochrome/conv_2']['w']
                b2 = params['Monochrome/conv_2']['b']
                return jax.vmap(
                    lambda xi: fused_monochrome(xi[None], w1, b1, w2, b2,
                                                strip_h=strip,
                                                interpret=interp)[0]
                )(x)
        else:
            mono_fwd = monochrome_forward

        def front(params, batch_u8):
            # pages upload as uint8 (4x less tunnel traffic); exact:
            # u8/255 reproduces the host encode_layers normalization.
            x = batch_u8.astype(jnp.float32) / 255.0
            m = mono_fwd(params, x)
            p = para_forward(params, [m])[0]
            # threshold the paragraph mask on device (mean per page, the
            # label_layer rule) and ship one byte per pixel instead of four
            mean = jnp.mean(p, axis=(1, 2, 3), keepdims=True)
            p_mask = (p > mean).astype(jnp.uint8)
            if quantized:
                p_mask = jnp.packbits(p_mask, axis=2)
                # the monochrome map ships quantized to uint8: D2H is the
                # scarce resource here, and 1/255 quantization of a sigmoid
                # map is far below the detection thresholds it feeds
                m = jnp.round(m * 255.0).astype(jnp.uint8)
            return m, p_mask

        if mesh is not None:
            # multi-chip serving: page batch sharded over the 'data' axis,
            # params replicated (parallel/serving.py)
            from ..parallel.serving import (replicate_params,
                                            shard_fn_over_batch)
            self.front_params = replicate_params(self.front_params, mesh)
            self._front = shard_fn_over_batch(front, mesh, n_batch_args=1)
        else:
            self._front = jax.jit(front)
        self.mesh = mesh
        self._line_fn = jax.jit(partial(line_forward_masked, prefix='Line'))

        def line_masks(params, x_u8, h_valid, w_valid):
            x = x_u8.astype(jnp.float32) / 255.0
            # threshold the band maps on device over each sample's valid
            # region (the reference rule: arr > 0.5*(mean+max),
            # interpreter.py:437-438) and bit-pack: the f32 band maps are
            # the biggest D2H payload of the cascade (24 MB/launch -> 0.75)
            pred = line_forward_masked(params, x, h_valid, w_valid,
                                       prefix='Line')
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
            mask = (pred > 0.5 * (mean + mx)) & valid
            return jnp.packbits(mask.astype(jnp.uint8), axis=2)

        self._line_masks_fn = jax.jit(line_masks)

        def char_ids(params, x, w_valid):
            # argmax on device: ship (N, W) ids + validity instead of the
            # (N, W, 162) float logits (650x less traffic per line)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            logits = char_forward_masked(params, x, w_valid)
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            valid = jnp.max(logits, axis=-1) != 0.0
            return ids, valid

        self._char_fn = jax.jit(char_ids)
        self._pool = ThreadPoolExecutor(max_workers=workers)

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

    def _line_menu_shape(self, h, w):
        for hb, wb in self.line_shape_menu:
            if h <= hb and w <= wb:
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

        for idxs, dev_out in launches:
            out = np.asarray(dev_out)
            if self.quantized_transfers:
                out = np.unpackbits(out, axis=2)
            for bi, i in enumerate(idxs):
                h, w = crops[i].shape[1], crops[i].shape[2]
                preds[i] = out[bi:bi + 1, :h, :w, :]
        return preds

    def _menu_width(self, w):
        for wb in self.CHAR_WIDTH_MENU:
            if w <= wb:
                return wb
        return round_up(w, self.CHAR_WIDTH_MENU[-1])

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
        for chunk_idx, (ids_dev, valid_dev) in launches:
            ids = np.asarray(ids_dev)
            valid = np.asarray(valid_dev)
            for bi, i in enumerate(chunk_idx):
                w = lines[i].shape[2]
                preds[i] = (ids[bi, :w], valid[bi, :w])
        return preds

    def warmup(self):
        """Compile the whole program menu with dummy data (cached
        persistently; later runs start hot)."""
        self.ocr_pages([np.zeros(self.page_shape, np.float32)])
        for hb, wb in self.line_shape_menu:
            self._run_line_batched([np.zeros((1, hb, wb, 1), np.float32)])
        for w in self.CHAR_WIDTH_MENU:
            self._run_char_batched(
                [np.zeros((1, CHAR_INPUT_HEIGHT, w, 1), np.float32)])

    def ocr_pages(self, pages):
        """pages: list of (1, H, W, 1) float arrays (all same shape).
        Returns per page: [paragraph][line] -> decoded text."""
        # Dispatch the front-end for every chunk up front: XLA execution is
        # async, so chunk i+1's device work overlaps chunk i's host CV.
        fronts = []
        for start in range(0, len(pages), self.chunk):
            chunk = pages[start:start + self.chunk]
            batch = np.concatenate([
                np.asarray(np.asarray(p) * 255.0, np.uint8)
                if np.asarray(p).dtype != np.uint8 else np.asarray(p)
                for p in chunk])
            fronts.append(
                (chunk, self._front(self.front_params, jnp.asarray(batch))))

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
        texts = [pred_ids_to_text(ids, valid, self.collapse_runs)
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
