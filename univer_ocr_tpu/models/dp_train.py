"""Batched / data-parallel curriculum training for the cascade models.

The reference trains batch-1, page at a time, re-running the host CV
(paragraph crop, line crop, bit-plane labeling) on every sample every
epoch (reference trainer.py:192-294, ~2-3 min per 50-page epoch on this
setup).  This driver restructures the four single-model stages around how
a TPU consumes work:

  * **materialize once** — each stage's training samples (pages for
    Monochrome/Paragraph; deskewed paragraph crops for Line; zoomed line
    crops + decoded bit-plane labels for Char) are built by the SAME host
    CV the reference runs, but once per stage instead of once per sample
    per epoch;
  * **bucket + weight-mask** — samples pad into a tiny menu of canonical
    shapes; every launch is a fixed (B, Hb, Wb, C) batch with a {0,1}
    per-sample weight vector, so partial batches cost no extra programs
    and contribute no gradient from filler slots;
  * **exact per-sample losses** — the loss is the weighted SUM of
    per-sample losses (vmapped), so one batched update applies exactly
    the accumulated gradients of the reference's per-sample steps (one
    Adam update per batch rather than per sample — standard gradient
    accumulation; tests/test_dp_train.py pins the gradient equality);
  * **mesh sharding** — with a `mesh`, the batch shards over the 'data'
    axis via shard_map and gradients psum over ICI (the reference has no
    distributed compute to port; SURVEY §2.5).

Epoch economics: after the one-time build, an epoch is a handful of
program launches — 50-page Line epochs drop from minutes to well under a
second of device time.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..interpreter.interpreter import (crop_and_rotate_single_paragraph,
                                       extract_line, label_char_line,
                                       label_layer, plan_paragraph_lines)
from ..nn.checkpoint import save_weights
from ..ops.losses import segmentation_dice_2d
from .bucketing import line_shape_menu, pick_char_width, pick_line_shape
from .fastpath import char_forward_masked, line_forward_masked, _mask_hw
from .fastpath import monochrome_forward
from .model import (CHAR_FIXED_WIDTH, CHAR_INPUT_HEIGHT, Modes, make_char,
                    make_line, make_monochrome, make_paragraph)



# ---------------------------------------------------------------------------
# Stage sample builders (host CV, run once per stage)
# ---------------------------------------------------------------------------


def _page_layers(dataset, idx, tags):
    return dataset.get(idx, layer_tags=tags)


def _jitter_bbox(bbox, shape, rng, amp=2):
    """Shift/grow a line bbox by a few pixels: the same geometric noise
    the serving cascade's PREDICTED line plans carry (bbox jitter,
    deskew residual, zoom variation) — but applied identically to the
    input crop and its GT bit planes, so the supervision stays exact
    (the predicted-crop builder's labels inherit plan misalignment as
    label noise; jittered GT crops do not)."""
    y, x = bbox
    H, W = shape
    dy, dx = rng.randint(-amp, amp + 1), rng.randint(-amp, amp + 1)
    gy = rng.randint(-amp, amp + 1)
    y2 = slice(max(0, y.start + dy), min(H, max(y.start + dy + 2,
                                                y.stop + dy + gy)))
    x2 = slice(max(0, x.start + dx), min(W, x.stop + dx))
    return (y2, x2)


def collect_stage_samples(mode, dataset, workers=8, char_augment=0,
                          seed=0):
    """All (X, y) sample pairs of one curriculum stage, as float32 NumPy
    arrays in their natural (unpadded) shapes.

    char_augment=N adds N jittered copies of every TRAIN_CHAR line
    (_jitter_bbox): exact labels under the serving geometry noise."""
    from concurrent.futures import ThreadPoolExecutor

    def page_samples(idx):
        if mode is Modes.TRAIN_MONOCHROME:
            layers = _page_layers(dataset, idx, ['image', 'monochrome'])
            return [(layers['image'], layers['monochrome'])]
        if mode is Modes.TRAIN_PARAGRAPH:
            layers = _page_layers(dataset, idx, ['monochrome', 'paragraph'])
            return [(layers['monochrome'], layers['paragraph'])]

        if mode is Modes.TRAIN_LINE:
            layers = _page_layers(dataset, idx,
                                  ['monochrome', 'paragraph', 'line'])
            out = []
            for mask in label_layer(layers['paragraph']):
                mono_c, line_c = crop_and_rotate_single_paragraph(
                    mask, [layers['monochrome'], layers['line']])
                out.append((mono_c, line_c))
            return out

        if mode is Modes.TRAIN_CHAR:
            layers = _page_layers(
                dataset, idx, ['monochrome', 'paragraph', 'line', 'char'])
            out = []
            for mask in label_layer(layers['paragraph']):
                mono_c, line_c, char_c = crop_and_rotate_single_paragraph(
                    mask, [layers['monochrome'], layers['line'],
                           layers['char']])
                bboxes, rotation = plan_paragraph_lines(line_c)
                rng = np.random.RandomState(seed * 10007 + idx)
                hw = mono_c.shape[1:3]
                for bbox in bboxes:
                    variants = [bbox] + [
                        _jitter_bbox(bbox, hw, rng)
                        for _ in range(char_augment)]
                    for bb in variants:
                        x = extract_line(mono_c, bb, rotation,
                                         CHAR_INPUT_HEIGHT,
                                         CHAR_FIXED_WIDTH)
                        bits = extract_line(char_c, bb, rotation,
                                            CHAR_INPUT_HEIGHT,
                                            CHAR_FIXED_WIDTH)
                        y = label_char_line(bits)
                        if y.any():
                            out.append((x, y))
            return out
        raise ValueError(f'batched training does not cover {mode}')

    with ThreadPoolExecutor(max_workers=workers) as pool:
        per_page = list(pool.map(page_samples, range(len(dataset))))
    return [(np.asarray(x, np.float32), np.asarray(y, np.float32))
            for page in per_page for x, y in page]


def collect_stage_samples_predicted(mode, dataset, weights, workers=8,
                                    input_shape=(1, 496, 736, 1),
                                    chunk=8, precision='bf16', log=print,
                                    pipeline=None):
    """Serving-distribution stage samples: predicted inputs, GT labels.

    Round 4 measured that GT-geometry crops REGRESS end-to-end accuracy
    (BASELINE.md round 4): serving feeds Line/Char crops made from the
    PREDICTED Monochrome/Paragraph masks, whose geometry (threshold
    bleed, bbox jitter, deskew residual) differs systematically from
    ground truth.  This builder runs the CURRENT checkpoint's upstream
    models over the corpus once (through the serving OCRPipeline's own
    front/Line programs and host planners), crops the PREDICTED
    monochrome map with the predicted plans, and labels from the GT
    layers re-cropped with the SAME plans — predicted inputs, exact
    targets (docs/ARCHITECTURE.md round-5 design note).

    Covers TRAIN_LINE (X = predicted-blob crop of the predicted mono
    map, y = GT line bands under the same crop) and TRAIN_CHAR (X =
    predicted-line extract of that crop, y = GT bit planes through the
    same line plan, majority-voted per column).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..interpreter.interpreter import label_layer as _label
    from .model import make_divisible_by
    from .pipeline import OCRPipeline

    if mode not in (Modes.TRAIN_LINE, Modes.TRAIN_CHAR):
        raise ValueError(f'predicted-crop sampling covers Line/Char, '
                         f'not {mode}')
    if pipeline is None:
        pipeline = OCRPipeline(input_shape, weights=weights, chunk=chunk,
                               workers=workers, precision=precision)
    gt_tag = 'line' if mode is Modes.TRAIN_LINE else 'char'

    # front (Monochrome + Paragraph) over the corpus, through the
    # serving program: uint8 upload, device-thresholded paragraph mask,
    # u8-quantized monochrome map — the exact serving distribution
    pages = [dataset.get(i, layer_tags=['image', gt_tag])
             for i in range(len(dataset))]
    mono_pred = []
    para_mask = []
    H, W = input_shape[1], input_shape[2]
    for start in range(0, len(pages), chunk):
        batch_pages = pages[start:start + chunk]
        batch = np.zeros((len(batch_pages), H, W, 1), np.uint8)
        for bi, page in enumerate(batch_pages):
            img = page['image']
            batch[bi, :img.shape[1], :img.shape[2], :] = np.round(
                img[0] * 255.0).astype(np.uint8)
        m, p = pipeline._front(pipeline.front_params, jnp.asarray(batch))
        m = np.asarray(m)
        p = np.asarray(p)
        if pipeline.quantized_transfers:
            m = m.astype(np.float32) / 255.0
            p = np.unpackbits(p, axis=2)[:, :, :m.shape[2], :]
        for bi, page in enumerate(batch_pages):
            h, w = page['image'].shape[1], page['image'].shape[2]
            mono_pred.append(m[bi:bi + 1, :h, :w, :])
            para_mask.append(p[bi:bi + 1, :h, :w, :])

    # predicted paragraph blobs -> deskewed crops of [pred mono, GT]
    skipped = [0]

    def page_crops(i):
        crops = []
        for blob in _label(para_mask[i].astype(np.float32)):
            try:
                mono_c, gt_c = crop_and_rotate_single_paragraph(
                    blob, [mono_pred[i], pages[i][gt_tag]])
            except (IndexError, ValueError, UnboundLocalError):
                skipped[0] += 1
                continue
            crops.append((mono_c, gt_c))
        return crops

    with ThreadPoolExecutor(max_workers=workers) as pool:
        crops_per_page = list(pool.map(page_crops, range(len(pages))))
    flat = [c for page in crops_per_page for c in page]

    if mode is Modes.TRAIN_LINE:
        if skipped[0]:
            log(f'    [predicted-crops] skipped {skipped[0]} degenerate '
                f'paragraph blobs')
        return [(np.asarray(x, np.float32), np.asarray(y, np.float32))
                for x, y in flat]

    # TRAIN_CHAR: the line geometry comes from the CURRENT Line model's
    # prediction over each predicted crop (serving feeds Char through
    # the predicted line plans).  /16 pad both the input and the GT
    # planes so the planned bboxes index the same frame (_crop_page).
    padded = [(make_divisible_by(x, 16, 16), make_divisible_by(y, 16, 16))
              for x, y in flat]
    line_preds = pipeline._run_line_batched([x for x, _ in padded])

    def crop_samples(k):
        mono_c, char_c = padded[k]
        out = []
        try:
            bboxes, rotation = plan_paragraph_lines(
                line_preds[k],
                thresholded_input=pipeline.quantized_transfers)
        except (IndexError, ValueError, UnboundLocalError):
            skipped[0] += 1
            return out
        for bbox in bboxes:
            x = extract_line(mono_c, bbox, rotation,
                             CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH)
            bits = extract_line(char_c, bbox, rotation,
                                CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH)
            y = label_char_line(bits)
            if not y.any():
                skipped[0] += 1      # hallucinated line: no GT chars
                continue
            out.append((np.asarray(x, np.float32),
                        np.asarray(y, np.float32)))
        return out

    with ThreadPoolExecutor(max_workers=workers) as pool:
        per_crop = list(pool.map(crop_samples, range(len(padded))))
    if skipped[0]:
        log(f'    [predicted-crops] skipped {skipped[0]} degenerate '
            f'blobs/label-empty lines')
    return [s for crop in per_crop for s in crop]


# ---------------------------------------------------------------------------
# Batched steps
# ---------------------------------------------------------------------------


def _seg_forward(prefix):
    if prefix == 'Monochrome':
        return lambda p, x, hv, wv: monochrome_forward(p, x)

    def forward(p, x, hv, wv):
        pred = line_forward_masked(p, x, hv, wv, prefix=prefix)
        return _mask_hw(pred, hv, wv)
    return forward


def make_batched_seg_step(model, prefix, mesh=None, donate=True):
    """Weighted batched train/eval steps for a segmentation model
    (Monochrome / Paragraph / Line share the Dice-loss contract).

    step(params, opt_state, lr, X, y, hv, wv, weight) ->
    (params, opt_state, per_sample_dice); eval drops the update.  X is
    (B, Hb, Wb, C) zero-padded, hv/wv (B,) true extents, weight (B,)
    {0,1} filler mask.  Loss = sum(weight * dice_i) + reg.
    """
    opt = model._optimizer()
    reg_fn = model.regularization_fn
    forward = _seg_forward(prefix)
    n_data = mesh.shape['data'] if mesh is not None else 1

    def per_sample(params, X, y, hv, wv):
        def one(x, yy, h, w):
            pred = forward(params, x[None], h, w)
            return segmentation_dice_2d(pred, yy[None])
        return jax.vmap(one)(X, y, hv, wv)

    def local_train(params, opt_state, lr, X, y, hv, wv, weight):
        def loss_fn(p):
            per = per_sample(p, X, y, hv, wv)
            total = jnp.sum(weight)
            if mesh is not None:
                total = lax.psum(total, 'data')
            # weighted MEAN, not sum: one batched step then matches the
            # per-sample trainer's gradient scale, so the reference
            # curriculum's lr table transfers (sum semantics diverged the
            # Line stage to NaN within two epochs at lr=0.0015); reg is
            # added once per step, as the per-sample trainer does
            return (jnp.sum(per * weight) / jnp.maximum(total, 1.0)
                    + reg_fn(p) / n_data), per

        (_, per), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if mesh is not None:
            grads = jax.tree_util.tree_map(
                lambda g: lax.psum(g, 'data'), grads)
        new_params, new_opt = opt.update(params, grads, opt_state, lr)
        return new_params, new_opt, per * weight

    def local_eval(params, X, y, hv, wv, weight):
        return per_sample(params, X, y, hv, wv) * weight

    return _wrap_steps(local_train, local_eval, mesh, donate,
                       n_batch_args=5)


def make_batched_char_step(model, mesh=None, donate=True):
    """Weighted batched steps for the Char model: X (B, 32, Wb, 1),
    y (B, Wb, n_chars), wv (B,) true widths, weight (B,).  Per-sample
    loss is the reference's column-mean softmax CE (fastpath
    masked_char_loss)."""
    opt = model._optimizer()
    reg_fn = model.regularization_fn
    n_data = mesh.shape['data'] if mesh is not None else 1

    def per_sample(params, X, y, wv):
        def one(x, yy, w):
            logits = char_forward_masked(params, x[None], w[None])[0]
            shifted = logits - jnp.max(logits, axis=1, keepdims=True)
            log_probs = shifted - jnp.log(
                jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
            return -jnp.sum(yy * log_probs) / w
        return jax.vmap(one)(X, y, wv)

    def local_train(params, opt_state, lr, X, y, wv, weight):
        def loss_fn(p):
            per = per_sample(p, X, y, wv)
            total = jnp.sum(weight)
            if mesh is not None:
                total = lax.psum(total, 'data')
            # weighted MEAN (see make_batched_seg_step): per-sample
            # gradient scale so the curriculum lr table transfers
            return (jnp.sum(per * weight) / jnp.maximum(total, 1.0)
                    + reg_fn(p) / n_data), per

        (_, per), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if mesh is not None:
            grads = jax.tree_util.tree_map(
                lambda g: lax.psum(g, 'data'), grads)
        new_params, new_opt = opt.update(params, grads, opt_state, lr)
        return new_params, new_opt, per * weight

    def local_eval(params, X, y, wv, weight):
        return per_sample(params, X, y, wv) * weight

    return _wrap_steps(local_train, local_eval, mesh, donate,
                       n_batch_args=4)


def _wrap_steps(local_train, local_eval, mesh, donate, n_batch_args):
    """jit (and under a mesh, shard_map over 'data') the step pair.
    Params/opt state replicate; batch args shard on dim 0."""
    if mesh is None:
        train = jax.jit(local_train,
                        donate_argnums=(0, 1) if donate else ())
        return train, jax.jit(local_eval)

    from jax import shard_map
    batch = tuple(P('data') for _ in range(n_batch_args))
    train = shard_map(
        local_train, mesh=mesh,
        in_specs=(P(), P(), P()) + batch,
        out_specs=(P(), P(), P('data')), check_vma=False)
    evl = shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(),) + batch, out_specs=P('data'), check_vma=False)

    rep = NamedSharding(mesh, P())

    def place(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep), tree)

    train_jit = jax.jit(train, donate_argnums=(0, 1) if donate else ())
    return (lambda p, s, lr, *b: train_jit(place(p), place(s),
                                           jnp.float32(lr), *b),
            jax.jit(evl))


# ---------------------------------------------------------------------------
# Bucketed batch assembly
# ---------------------------------------------------------------------------


def _bucket_shape(sample_x, mode, menu):
    if mode is Modes.TRAIN_CHAR:
        return (CHAR_INPUT_HEIGHT, pick_char_width(sample_x.shape[2]))
    if mode is Modes.TRAIN_MONOCHROME or mode is Modes.TRAIN_PARAGRAPH:
        return sample_x.shape[1], sample_x.shape[2]
    return pick_line_shape(menu, sample_x.shape[1], sample_x.shape[2])


def make_batches(samples, mode, batch, rng=None,
                 input_shape=(1, 496, 736, 1)):
    """Group samples by bucket shape and emit fixed-size weighted
    batches: (X, y, hv, wv, weight) arrays, filler slots repeating the
    first sample with weight 0 (no extra compiled programs for tails).

    Crop shapes pad into the same canonical menu the serving pipeline
    uses (bucketing.line_shape_menu / CHAR_WIDTH_MENU): a remote compile
    costs minutes, so the program count per stage is capped at the menu
    size rather than growing with the shape population."""
    menu = line_shape_menu(input_shape)
    order = np.arange(len(samples))
    if rng is not None:
        rng.shuffle(order)
    buckets = {}
    for i in order:
        buckets.setdefault(_bucket_shape(samples[i][0], mode, menu),
                           []).append(i)

    out = []
    for (hb, wb), idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), batch):
            sel = idxs[start:start + batch]
            if mode is Modes.TRAIN_CHAR:
                n_classes = samples[sel[0]][1].shape[1]
                X = np.zeros((batch, hb, wb, 1), np.float32)
                y = np.zeros((batch, wb, n_classes), np.float32)
                wv = np.full((batch,), CHAR_FIXED_WIDTH, np.int32)
                weight = np.zeros((batch,), np.float32)
                for bi in range(batch):
                    x_s, y_s = samples[sel[bi % len(sel)]]
                    w = x_s.shape[2]
                    X[bi, :, :w, :] = x_s[0]
                    y[bi, :y_s.shape[0], :] = y_s
                    wv[bi] = w
                    weight[bi] = 1.0 if bi < len(sel) else 0.0
                out.append((X, y, wv, weight))
            else:
                c_y = samples[sel[0]][1].shape[3]
                X = np.zeros((batch, hb, wb, 1), np.float32)
                y = np.zeros((batch, hb, wb, c_y), np.float32)
                hv = np.full((batch,), 4, np.int32)
                wv = np.full((batch,), 4, np.int32)
                weight = np.zeros((batch,), np.float32)
                for bi in range(batch):
                    x_s, y_s = samples[sel[bi % len(sel)]]
                    h, w = x_s.shape[1], x_s.shape[2]
                    X[bi, :h, :w, :] = x_s[0]
                    y[bi, :h, :w, :] = y_s[0]
                    hv[bi], wv[bi] = h, w
                    weight[bi] = 1.0 if bi < len(sel) else 0.0
                out.append((X, y, hv, wv, weight))
    return out


# ---------------------------------------------------------------------------
# Stage driver
# ---------------------------------------------------------------------------

_STAGE_MODEL = {
    Modes.TRAIN_MONOCHROME: ('Monochrome', make_monochrome),
    Modes.TRAIN_PARAGRAPH: ('Paragraph', make_paragraph),
    Modes.TRAIN_LINE: ('Line', make_line),
    Modes.TRAIN_CHAR: ('Char', make_char),
}


def train_stage_batched(mode, train_samples, val_samples, weights,
                        epochs, lr, lr_step, batch=16, mesh=None,
                        input_shape=(1, 496, 736, 1), checkpoint_path=None,
                        log=print, seed=0, eval_gate=None):
    """Train one curriculum stage on materialized samples.

    Keeps the reference trainer's protections: per-epoch NaN detection
    with weight rollback + lr decay (reference trainer.py:258-272) and
    save-best-on-validation via the merge-saving checkpoint writer.

    With `eval_gate` (evaluation.make_eval_gate), per-epoch checkpoint
    writes are withheld; the stage's best-by-val params are offered to
    the gate once at stage end and the checkpoint is only overwritten on
    approval — stage-local val loss is proven non-predictive of
    end-to-end quality (BASELINE.md rounds 3-4), so a regressing stage
    must not be able to replace the committed checkpoint.
    Returns (model, best_val_loss).
    """
    from ..nn.optimizers import Adam

    name, factory = _STAGE_MODEL[mode]
    model = factory(input_shape, optimizer=Adam(lr=lr))
    if weights:
        model.set_weights(weights)

    if mesh is not None:
        assert batch % mesh.shape['data'] == 0
    if mode is Modes.TRAIN_CHAR:
        train_step, eval_step = make_batched_char_step(model, mesh)
    else:
        train_step, eval_step = make_batched_seg_step(model, name, mesh)

    rng = np.random.RandomState(seed)
    val_batches = make_batches(val_samples, mode, batch,
                               input_shape=input_shape)

    def validate(params):
        total = 0.0
        for args in val_batches:
            per = np.asarray(eval_step(
                params, *(jnp.asarray(a) for a in args)))
            total += float(per.sum())
        return total / max(len(val_samples), 1)

    params = model.params
    opt = model._optimizer()
    opt_state = opt.init_state(params)
    best_val = validate(params)
    best_params = params
    log(f'[{name}] {len(train_samples)} train / {len(val_samples)} val '
        f'samples; initial val loss {best_val:.6f}')

    snapshot = jax.tree_util.tree_map(np.asarray, params)
    reload_attempts = 0
    epoch = 0
    while epoch < epochs:
        t0 = time.time()
        train_loss = 0.0
        for args in make_batches(train_samples, mode, batch, rng,
                                 input_shape=input_shape):
            params, opt_state, per = train_step(
                params, opt_state, jnp.float32(lr), *(jnp.asarray(a)
                                                      for a in args))
            train_loss += float(np.asarray(per).sum())
        train_loss /= max(len(train_samples), 1)

        if any(np.isnan(np.asarray(leaf)).any()
               for leaf in jax.tree_util.tree_leaves(params)):
            reload_attempts += 1
            if reload_attempts >= 10:
                params = jax.tree_util.tree_map(jnp.asarray, best_params)
                reload_attempts = 0
            else:
                params = jax.tree_util.tree_map(jnp.asarray, snapshot)
            lr *= lr_step ** reload_attempts
            opt_state = opt.init_state(params)
            log(f'[{name}] NaN epoch, rolled back; lr -> {lr:.6g}')
            continue

        snapshot = jax.tree_util.tree_map(np.asarray, params)
        val_loss = validate(params)
        dt_s = time.time() - t0
        log(f'[{name}] epoch {epoch + 1}/{epochs}: train {train_loss:.6f} '
            f'val {val_loss:.6f} lr {lr:.6g} ({dt_s:.2f}s)')
        if val_loss < best_val:
            best_val = val_loss
            best_params = snapshot
            if checkpoint_path is not None and eval_gate is None:
                model.params = jax.tree_util.tree_map(jnp.asarray,
                                                      best_params)
                save_weights({name: model}, checkpoint_path)
        lr *= lr_step
        epoch += 1

    model.params = jax.tree_util.tree_map(jnp.asarray, best_params)
    if eval_gate is not None and checkpoint_path is not None:
        ok, score, incumbent = eval_gate({name: model})
        if ok:
            save_weights({name: model}, checkpoint_path)
            log(f'[{name}] gate approved ({score:.4f} >= '
                f'{incumbent:.4f}); checkpoint updated')
        else:
            log(f'[{name}] gate REJECTED ({score:.4f} < '
                f'{incumbent:.4f}); checkpoint kept')
    return model, best_val


def train_model_batched(curriculum, use_gpu=True, batch=16, mesh=None,
                        train_size=50, val_size=5, seed=0, log=print,
                        checkpoint_path=None, predicted=False,
                        eval_gate=None):
    """Run the batched stages of a curriculum (Monochrome / Paragraph /
    Line / Char; TRAIN_ALL joint adaptation stays on the per-sample
    ModelSystem path — its inputs depend on the evolving upstream models,
    so there is nothing to materialize once).

    `predicted=True` materializes Line/Char samples from the serving
    crop distribution (collect_stage_samples_predicted), re-running the
    upstream forward at every stage start so stages compose (the Char
    stage sees the just-trained Line model's plans); `predicted='mix'`
    additionally concatenates the GT-geometry samples into the train set
    (validation stays predicted-only).  `eval_gate` gates checkpoint
    overwrites on end-to-end accuracy (make_eval_gate)."""
    import json

    from ..nn.backend import DB
    from ..utils.cache import enable_persistent_cache
    from .constants import MODEL_WEIGHTS_FILE_PATH
    from .datasets import (RandomSelectDataset, train_dataset,
                           validation_dataset)

    enable_persistent_cache()
    if use_gpu:
        DB.use_tpu()
    else:
        DB.use_cpu()
    if checkpoint_path is None:
        checkpoint_path = MODEL_WEIGHTS_FILE_PATH

    for mode, lr, lr_step, epochs in curriculum:
        if mode not in _STAGE_MODEL:
            raise ValueError(f'{mode} is not a batched stage; train it '
                             f'with models.train.train_model')
        try:
            weights = json.load(open(checkpoint_path))
        except OSError:
            weights = {}
        train_ds = RandomSelectDataset(train_size, train_dataset())
        val_ds = RandomSelectDataset(val_size, validation_dataset())
        use_predicted = (predicted
                         and mode in (Modes.TRAIN_LINE, Modes.TRAIN_CHAR)
                         and weights)
        log(f'=== batched stage {mode.name}'
            f'{" (predicted crops)" if use_predicted else ""}: '
            f'materializing samples...')
        t0 = time.time()
        if use_predicted:
            train_samples = collect_stage_samples_predicted(
                mode, train_ds, weights, log=log)
            if predicted == 'mix':
                # mixed curriculum: clean GT-geometry crops anchor the
                # easy-alignment gradient signal while predicted crops
                # keep the serving distribution dominant; validation
                # stays predicted-only (the distribution that ships).
                # Char GT crops additionally jitter (_jitter_bbox):
                # serving geometry noise with EXACT labels.
                aug = 2 if mode is Modes.TRAIN_CHAR else 0
                train_samples = train_samples + collect_stage_samples(
                    mode, train_ds, char_augment=aug)
            val_samples = collect_stage_samples_predicted(
                mode, val_ds, weights, log=log)
        else:
            train_samples = collect_stage_samples(mode, train_ds)
            val_samples = collect_stage_samples(mode, val_ds)
        log(f'    built {len(train_samples)}+{len(val_samples)} samples '
            f'in {time.time() - t0:.1f}s')
        train_stage_batched(mode, train_samples, val_samples, weights,
                            epochs, lr, lr_step, batch=batch, mesh=mesh,
                            checkpoint_path=checkpoint_path, log=log,
                            seed=seed, eval_gate=eval_gate)
