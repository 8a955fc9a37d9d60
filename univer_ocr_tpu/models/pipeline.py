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

from ..interpreter.interpreter import (crop_and_rotate_single_paragraph,
                                       label_layer, pred_to_text_line,
                                       pred_ids_to_text, rearrange_lines,
                                       rotate_array)
from scipy import ndimage

from .bucketing import round_up
from .fastpath import char_forward_masked, line_forward_masked
from .model import (CHAR_FIXED_WIDTH, CHAR_INPUT_HEIGHT, make_char,
                    make_divisible_by, make_line, make_monochrome,
                    make_paragraph)
from .fastpath import monochrome_forward


def crop_lines_of_paragraph(line_pred, mono_crop, zoomed_height,
                            minimal_width):
    """Line bands of one paragraph -> list of zoomed line crops of the
    monochrome image (the logic of CropRotateAndZoomLines._func,
    interpreter.py:436-523, as a pure function)."""
    def thresholded(arr):
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
    def __init__(self, page_shape, weights=None, chunk=8, workers=8,
                 line_bucket=64, char_bucket=64, collapse_runs=False):
        self.page_shape = page_shape
        self.chunk = chunk
        self.line_bucket = line_bucket
        self.char_bucket = char_bucket
        self.collapse_runs = collapse_runs

        mono = make_monochrome(page_shape)
        para = make_paragraph(page_shape)
        self.line_model = make_line(page_shape)
        self.char_model = make_char(page_shape)
        for model in (mono, para, self.line_model, self.char_model):
            if weights:
                model.set_weights(weights)

        self.front_params = {**mono.params, **para.params}
        para_forward = para.forward_fn

        def front(params, batch_u8):
            # pages upload as uint8 (4x less PCIe/tunnel traffic); exact:
            # u8/255 reproduces the host encode_layers normalization.
            x = batch_u8.astype(jnp.float32) / 255.0
            m = monochrome_forward(params, x)
            p = para_forward(params, [m])[0]
            # threshold the paragraph mask on device (mean per page, the
            # label_layer rule) and ship one byte per pixel instead of four
            mean = jnp.mean(p, axis=(1, 2, 3), keepdims=True)
            p_mask = (p > mean).astype(jnp.uint8)
            return m, p_mask

        self._front = jax.jit(front)
        self._line_fn = jax.jit(partial(line_forward_masked, prefix='Line'))

        def char_ids(params, x, w_valid):
            # argmax on device: ship (N, W) ids + validity instead of the
            # (N, W, 162) float logits (650x less traffic per line)
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

    def _run_line_batched(self, crops):
        """All paragraph crops (flat list) -> line predictions, grouped by
        shape bucket, one program launch per bucket."""
        preds = [None] * len(crops)
        groups = {}
        for i, c in enumerate(crops):
            hb = round_up(c.shape[1], self.line_bucket)
            wb = round_up(c.shape[2], self.line_bucket)
            groups.setdefault((hb, wb), []).append(i)
        params = self.line_model.params
        for (hb, wb), idxs in groups.items():
            n = 1 << (len(idxs) - 1).bit_length()
            batch = np.zeros((n, hb, wb, 1), np.float32)
            hs = np.full((n,), 4, np.int32)
            ws = np.full((n,), 4, np.int32)
            for bi, i in enumerate(idxs):
                c = crops[i]
                batch[bi, :c.shape[1], :c.shape[2], :] = c[0]
                hs[bi], ws[bi] = c.shape[1], c.shape[2]
            out = np.asarray(self._line_fn(params, jnp.asarray(batch),
                                           jnp.asarray(hs), jnp.asarray(ws)))
            for bi, i in enumerate(idxs):
                h, w = crops[i].shape[1], crops[i].shape[2]
                preds[i] = out[bi:bi + 1, :h, :w, :]
        return preds

    def _run_char_batched(self, lines):
        """All line crops (flat list) -> per-line (W, n_chars) logits."""
        preds = [None] * len(lines)
        groups = {}
        for i, line in enumerate(lines):
            wb = round_up(line.shape[2], self.char_bucket)
            groups.setdefault(wb, []).append(i)
        params = self.char_model.params
        for wb, idxs in groups.items():
            n = 1 << (len(idxs) - 1).bit_length()
            batch = np.zeros((n, CHAR_INPUT_HEIGHT, wb, 1), np.float32)
            ws = np.full((n,), 4, np.int32)
            for bi, i in enumerate(idxs):
                line = lines[i]
                batch[bi, :, :line.shape[2], :] = line[0]
                ws[bi] = line.shape[2]
            ids, valid = self._char_fn(params, jnp.asarray(batch),
                                       jnp.asarray(ws))
            ids = np.asarray(ids)
            valid = np.asarray(valid)
            for bi, i in enumerate(idxs):
                w = lines[i].shape[2]
                preds[i] = (ids[bi, :w], valid[bi, :w])
        return preds

    # ------------------------------------------------------------------
    def ocr_pages(self, pages):
        """pages: list of (1, H, W, 1) float arrays (all same shape).
        Returns per page: [paragraph][line] -> decoded text."""
        results = []
        for start in range(0, len(pages), self.chunk):
            results.extend(self._ocr_chunk(pages[start:start + self.chunk]))
        return results

    def _ocr_chunk(self, pages):
        n = len(pages)
        batch = np.concatenate([
            np.asarray(np.asarray(p) * 255.0, np.uint8)
            if np.asarray(p).dtype != np.uint8 else np.asarray(p)
            for p in pages])
        mono, para = self._front(self.front_params, jnp.asarray(batch))
        mono = np.asarray(mono)
        para = np.asarray(para)

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
                CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH)

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
