"""End-to-end cascade tests: model zoo shapes, full PREDICT pipeline,
training modes, checkpoint roundtrip, bucketing exactness."""

import json
import random

import numpy as np
import pytest

import jax.numpy as jnp

from univer_ocr_tpu.models import (Modes, make_char, make_context_maker,
                                   make_divisible_by, make_line,
                                   make_model_system, make_monochrome,
                                   make_paragraph)
from univer_ocr_tpu.models.bucketing import pad_to_bucket, trim_nhwc, trim_rows  # noqa: F401
from univer_ocr_tpu.models.datasets import GeneratorDataset
from univer_ocr_tpu.nn.optimizers import Adam
from univer_ocr_tpu.primitives import CHARS

PAGE_SHAPE = (1, 496, 736, 1)   # 720x480 page after /16 padding


@pytest.fixture(scope='module')
def page_layers():
    random.seed(42)
    np.random.seed(42)
    dataset = GeneratorDataset(1, 720, 480)
    return dataset.get(0)


def test_model_zoo_shapes():
    mono = make_monochrome(PAGE_SHAPE)
    assert mono.get_output_shapes([PAGE_SHAPE]) == [PAGE_SHAPE]

    para = make_paragraph(PAGE_SHAPE)
    assert para.get_output_shapes([PAGE_SHAPE]) == [PAGE_SHAPE]

    line = make_line(PAGE_SHAPE)
    assert line.get_output_shapes([PAGE_SHAPE]) == [(1, 496, 736, 2)]

    char = make_char(PAGE_SHAPE)
    out = char.get_output_shapes([(1, 32, 736, 1)])
    assert out == [(736, len(CHARS))]


def test_checkpoint_namespace():
    """Leaf names must match the reference's model_weights.json keys
    (e.g. Paragraph/down_1/conv_1, Char/dense_block/dense_1)."""
    para = make_paragraph(PAGE_SHAPE)
    keys = set(para.get_weights().keys())
    assert 'Paragraph/down_1/conv_1' in keys
    assert 'Paragraph/up_1/conv_block/conv_1' in keys
    assert 'Paragraph/end/conv_1' in keys

    char = make_char(PAGE_SHAPE)
    keys = set(char.get_weights().keys())
    assert 'Char/conv_block/conv_1' in keys
    assert 'Char/dense_block/dense_1' in keys
    assert 'Char/dense_block/dense_3' in keys


def test_monochrome_train_step(page_layers):
    opt = Adam(lr=1e-3)
    model = make_monochrome(PAGE_SHAPE, opt)
    X = page_layers['image']
    y = page_layers['monochrome']
    losses = model.train(X, y)
    assert 'output_losses' in losses and len(losses['output_losses']) == 1
    assert np.isfinite(losses['output_losses'][0])
    assert np.isfinite(losses['regularization_loss'])


def test_context_makers(page_layers):
    def fake_get(*args, layer_tags=None, **kwargs):
        return {tag: page_layers[tag] for tag in layer_tags}

    ctx = make_context_maker(Modes.TRAIN_MONOCHROME)(fake_get)
    assert set(ctx) == {'monochrome_X', 'monochrome_y'}
    ctx = make_context_maker(Modes.TRAIN_PARAGRAPH)(fake_get)
    assert set(ctx) == {'paragraph_X', 'paragraph_y'}
    ctx = make_context_maker(Modes.TRAIN_LINE)(fake_get)
    assert set(ctx) == {'monochrome_pred_cpu', 'paragraph_pred_cpu', 'line_cpu'}
    ctx = make_context_maker(Modes.PREDICT)(fake_get)
    assert set(ctx) == {'monochrome_X'}


def test_train_monochrome_mode_system(page_layers):
    system, models, names = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), mode=Modes.TRAIN_MONOCHROME)
    assert names == ['Monochrome']
    context = make_context_maker(Modes.TRAIN_MONOCHROME)(
        lambda *a, layer_tags=None, **k: {
            t: page_layers[t] for t in layer_tags})
    system.train(context)
    assert 'Monochrome' in context['losses']
    assert context['monochrome_pred'].shape == PAGE_SHAPE


def test_full_predict_pipeline(page_layers):
    """The whole cascade on one generated page with random weights: must
    run through every stage and produce nested text output (possibly empty
    — untrained models may detect no paragraphs/lines)."""
    system, models, names = make_model_system(PAGE_SHAPE, mode=Modes.PREDICT)
    assert names == ['Monochrome', 'Paragraph', 'ParagraphCrop', 'Line',
                     'LineCrop', 'Char', 'PredToText']
    context = {'monochrome_X': page_layers['image']}
    system.predict(context)
    assert 'text' in context
    assert isinstance(context['text'], list)          # [paragraph][line] -> str
    for para in context['text']:
        for line in para:
            assert isinstance(line, str)


def test_train_char_mode_full_host_chain(page_layers):
    """TRAIN_CHAR drives ParagraphCrop -> LineCrop -> CharLabel -> Char on
    ground-truth masks — the full host-CV chain with real geometry."""
    system, models, names = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), mode=Modes.TRAIN_CHAR)
    assert names == ['ParagraphCrop', 'LineCrop', 'CharLabel', 'Char']
    context = make_context_maker(Modes.TRAIN_CHAR)(
        lambda *a, layer_tags=None, **k: {
            t: page_layers[t] for t in layer_tags})
    system.train(context)
    assert 'Char' in context['losses']
    assert np.isfinite(context['losses']['Char']['output_losses'][0])
    # predictions exist for every line of every paragraph
    n_lines = sum(len(p) for p in context['char_pred'])
    assert n_lines >= 1
    for para in context['char_pred']:
        for line_pred in para:
            assert np.asarray(line_pred).shape[1] == len(CHARS)


def test_train_line_mode_system(page_layers):
    """TRAIN_LINE: ParagraphCrop on ground truth then Line model training."""
    system, models, names = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), mode=Modes.TRAIN_LINE)
    assert names == ['ParagraphCrop', 'Line']
    context = make_context_maker(Modes.TRAIN_LINE)(
        lambda *a, layer_tags=None, **k: {
            t: page_layers[t] for t in layer_tags})
    system.train(context)
    assert 'Line' in context['losses']
    assert len(context['line_pred']) >= 1


def test_weights_json_roundtrip_through_system(tmp_path, page_layers):
    system, models, _ = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), mode=Modes.TRAIN_MONOCHROME)
    weights = {name: w for m in models.values()
               for name, w in m.get_weights().items()}
    blob = json.dumps(weights, separators=(',', ':'))

    system2, models2, _ = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), weights=json.loads(blob),
        mode=Modes.TRAIN_MONOCHROME)
    w1 = models['Monochrome'].get_weights()
    w2 = models2['Monochrome'].get_weights()
    for layer in w1:
        for p in w1[layer]:
            np.testing.assert_allclose(w1[layer][p], w2[layer][p], rtol=1e-6)


def test_masked_line_fastpath_is_exact():
    """Masked bucketed Line forward == per-shape generic path, including
    at the right/bottom boundary (the naive pad-and-trim fails there —
    see fastpath.py)."""
    from univer_ocr_tpu.models.fastpath import line_forward_masked
    model = make_line(PAGE_SHAPE)
    rs = np.random.RandomState(0)
    for (h, w) in [(96, 112), (64, 64), (80, 208)]:
        crop = rs.rand(1, h, w, 1).astype(np.float32)
        direct = np.asarray(model.predict(crop)[0])
        padded = np.zeros((2, 128, 256, 1), np.float32)   # batch of 2, one dummy
        padded[0, :h, :w, :] = crop[0]
        out = np.asarray(line_forward_masked(
            model.params, jnp.asarray(padded),
            jnp.asarray([h, 4]), jnp.asarray([w, 4])))
        np.testing.assert_allclose(out[0:1, :h, :w, :], direct,
                                   rtol=1e-5, atol=1e-6)


def test_masked_char_fastpath_is_exact():
    """Masked batched Char forward == per-line generic path."""
    from univer_ocr_tpu.models.fastpath import char_forward_masked
    model = make_char(PAGE_SHAPE)
    rs = np.random.RandomState(1)
    widths = [50, 64, 23]
    lines = [rs.rand(1, 32, w, 1).astype(np.float32) for w in widths]
    directs = [np.asarray(model.predict(line)[0]) for line in lines]

    wb = 64
    batch = np.zeros((4, 32, wb, 1), np.float32)   # bucket of 4, one dummy
    ws = np.full((4,), 4, np.int32)
    for i, line in enumerate(lines):
        batch[i, :, :line.shape[2], :] = line[0]
        ws[i] = line.shape[2]
    out = np.asarray(char_forward_masked(model.params, jnp.asarray(batch),
                                         jnp.asarray(ws)))
    for i, w in enumerate(widths):
        np.testing.assert_allclose(out[i, :w, :], directs[i],
                                   rtol=2e-5, atol=1e-4)


def test_make_divisible_by():
    arr = np.ones((1, 30, 40, 2))
    out = make_divisible_by(arr, 16, 16)
    assert out.shape == (1, 32, 48, 2)
    assert out.sum() == arr.sum()
    # reference always adds at least one unit
    out = make_divisible_by(np.ones((1, 32, 32, 1)), 16, 16)
    assert out.shape == (1, 48, 48, 1)


def test_train_all_mode_system(page_layers):
    """TRAIN_ALL: all four models + crops driven by *predicted* masks
    (empty detections from untrained models must flow through)."""
    system, models, names = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-3), mode=Modes.TRAIN_ALL)
    assert names == ['Monochrome', 'Paragraph', 'ParagraphCrop', 'Line',
                     'LineCrop', 'CharLabel', 'Char']
    context = make_context_maker(Modes.TRAIN_ALL)(
        lambda *a, layer_tags=None, **k: {
            t: page_layers[t] for t in layer_tags})
    system.train(context)
    assert 'Monochrome' in context['losses']
    assert 'Paragraph' in context['losses']
    # Line/Char only run if the Paragraph model detected something;
    # either way the pipeline completes without error
    assert isinstance(context.get('line_pred', []), list)


def test_crop_and_rotate_benchmark_chain(page_layers, tmp_path, monkeypatch):
    """The interpreter-chain benchmark harness runs end to end
    (reference crop_and_rotate_benchmark.py as integration test)."""
    from univer_ocr_tpu.models import crop_and_rotate_benchmark as crb

    class OnePage:
        def __len__(self):
            return 1

        def get(self, idx, layer_tags=None):
            return {t: page_layers[t] for t in layer_tags}

    monkeypatch.setattr(crb, 'OUTPUT_PATH', tmp_path)
    timers = crb.run_chain(OnePage(), workers_count=2, save_text=True)
    assert set(timers) == {'ParagraphCrop', 'LineCrop', 'CharLabel',
                           'PredToText'}
    decoded = (tmp_path / 'decoded.txt').read_text()
    assert '=== page 0 ===' in decoded
    assert '[0][0]' in decoded


def test_make_up_skip_connection_block():
    """make_up (upsample + concat skip + conv block) — in the zoo surface
    though unused by the cascade (reference model.py:62-73)."""
    from univer_ocr_tpu.models.model import make_up
    from univer_ocr_tpu.nn.models import Model
    block = make_up([4], kernel_size=(3, 3), padding=1)
    model = Model(layers={'up': block},
                  relations={'up': [0, 1], 0: 'up'})
    # input 0: skip at full res; input 1: features at half res
    model.initialize([(1, 8, 8, 2), (1, 4, 4, 3)])
    skip = np.random.RandomState(0).rand(1, 8, 8, 2).astype(np.float32)
    feats = np.random.RandomState(1).rand(1, 4, 4, 3).astype(np.float32)
    out = model.predict([skip, feats])
    assert np.asarray(out[0]).shape == (1, 8, 8, 4)


def test_make_edge_detection():
    from univer_ocr_tpu.models.model import make_edge_detection
    func = make_edge_detection((1, 8, 8, 1))
    X = np.ones((1, 8, 8, 1), np.float32)
    out = np.asarray(func(X))
    assert out.shape == (1, 8, 8, 1)
    # sharpen kernel on a constant image: interior stays 1
    np.testing.assert_allclose(out[0, 2:-2, 2:-2, 0], 1.0, rtol=1e-6)


def test_resident_blob_crops_match_uploaded_blob():
    """Single-component bboxes: the blob-free resident paragraph programs
    must produce exactly the crops of the uploaded-blob programs."""
    import numpy as np
    import jax.numpy as jnp
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    shape = (1, 64, 64, 1)
    pipe = OCRPipeline(shape, weights=None, chunk=2, workers=1,
                       device_cascade=True, precision='highest')
    rs = np.random.RandomState(9)
    pages = [np.ones(shape, np.float32) for _ in range(2)]
    # paint one solid dark paragraph per page at different spots
    pages[0][0, 8:30, 6:50, 0] = 0.0
    pages[1][0, 20:44, 12:60, 0] = 0.0

    texts_res = pipe.ocr_pages(pages)

    # force the uploaded-blob path by monkeypatching needs_blob True
    orig = pipe._page_paragraph_plans

    def force_blob(page_idx, para2d):
        plans = orig(page_idx, para2d)
        from scipy import ndimage as ndi
        labels, _ = ndi.label(para2d > 0)
        for p in plans:
            if not p['needs_blob']:
                sl = (slice(p['y0'], p['y0'] + p['h']),
                      slice(p['x0'], p['x0'] + p['w']))
                region = labels[sl]
                lab = region[region > 0]
                label_id = int(lab[0]) if len(lab) else 1
                buf = np.zeros(p['menu'], bool)
                blob = labels[sl] == label_id
                # bbox-local at (0, 0): every plan rides the affine-
                # gather program family (identity affine when level)
                buf[:p['h'], :p['w']] = blob[:p['menu'][0], :p['menu'][1]]
                p['needs_blob'] = True
                p['blob'] = np.packbits(buf, axis=1)
        return plans

    pipe._page_paragraph_plans = force_blob
    texts_blob = pipe.ocr_pages(pages)
    assert texts_res == texts_blob


def test_plan_lines_matches_rearrange_lines_path():
    """The vectorized blob-stats line planner must reproduce the
    label_layer + rearrange_lines reference path exactly, including on
    fragmented bands and rotated orientations."""
    import numpy as np
    from scipy import ndimage
    from univer_ocr_tpu.interpreter.interpreter import (label_layer,
                                                        rearrange_lines)
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    pipe = OCRPipeline((1, 64, 64, 1), weights=None, chunk=1, workers=1)

    def reference_plan_lines(bands):
        tops, bottoms, rotation = rearrange_lines(
            label_layer(bands[None, :, :, 0:1]),
            label_layer(bands[None, :, :, 1:2]))
        bboxes = []
        for tm, bm in zip(tops, bottoms):
            _, ty, tx, _ = ndimage.find_objects(tm)[0]
            _, by_, bx_, _ = ndimage.find_objects(bm)[0]
            bboxes.append(
                (slice(min(ty.start, by_.start), max(ty.stop, by_.stop)),
                 slice(min(tx.start, bx_.start), max(tx.stop, bx_.stop))))
        return pipe._plans_from_bboxes(bboxes, rotation)

    rs = np.random.RandomState(2)
    for trial in range(20):
        hv, wv = rs.randint(48, 200), rs.randint(48, 320)
        mask = np.zeros((hv, wv, 2), bool)
        for li in range(rs.randint(0, 5)):
            y = 4 + li * 34
            if y + 30 >= hv:
                break
            a, b = sorted(rs.randint(0, wv, 2).tolist())
            # fragmented stripes (word gaps): the realistic case
            mask[y:y + 3, a:b + 1, 0] = rs.rand(3, b + 1 - a) > 0.25
            mask[y + 22:y + 25, a:b + 1, 1] = rs.rand(3, b + 1 - a) > 0.25
        if trial % 4 == 3:
            mask = mask.transpose(1, 0, 2)[:, ::-1, :].copy()  # rotated
        assert pipe._plan_lines(mask) == reference_plan_lines(mask), trial
