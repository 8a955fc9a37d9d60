"""Multi-device sharding tests on the virtual 8-device CPU mesh: DP
equivalence with single-device training, TP char step, dryrun contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univer_ocr_tpu.models import make_line, make_monochrome
from univer_ocr_tpu.nn.optimizers import Adam
from univer_ocr_tpu.parallel import (make_dp_train_step,
                                     make_tp_char_train_step, shard_batch)
from univer_ocr_tpu.parallel.data_parallel import replicate
from univer_ocr_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 virtual devices')


def test_mesh_shape():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {'data': 4, 'model': 2}


def test_dp_step_matches_single_device():
    """DP over 4 devices must produce the same update as one device
    computing the full batch (grads are summed either way)."""
    rs = np.random.RandomState(0)
    batch = 8
    X = rs.rand(batch, 32, 32, 1).astype(np.float32)
    y = (rs.rand(batch, 32, 32, 1) > 0.5).astype(np.float32)

    # single-device full-batch step
    model_a = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    # host copy — model_a.train() donates its param buffers
    params0 = jax.tree_util.tree_map(
        lambda p: np.array(p), model_a.params)
    losses_a = model_a.train(X, y)

    # DP step from identical initial params
    model_b = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    model_b.params = {ln: dict(lp) for ln, lp in params0.items()}
    mesh = make_mesh(4, model_parallel=1)
    step = make_dp_train_step(model_b, mesh)
    opt = model_b._optimizer()
    params = replicate(model_b.params, mesh)
    opt_state = replicate(opt.init_state(model_b.params), mesh)
    with mesh:
        new_params, _, out_losses, reg = step(
            params, opt_state, jnp.float32(1e-3),
            shard_batch(X, mesh), shard_batch(y, mesh))

    np.testing.assert_allclose(float(out_losses[0]),
                               losses_a['output_losses'][0], rtol=1e-5)
    for ln in new_params:
        for pn in new_params[ln]:
            np.testing.assert_allclose(
                np.asarray(new_params[ln][pn]),
                np.asarray(model_a.params[ln][pn]), rtol=1e-4, atol=1e-6)


def test_dp_line_model_runs():
    model = make_line((1, 32, 32, 1), Adam(lr=1e-3))
    mesh = make_mesh(8, model_parallel=1)
    step = make_dp_train_step(model, mesh)
    opt = model._optimizer()
    rs = np.random.RandomState(1)
    X = rs.rand(8, 32, 32, 1).astype(np.float32)
    y = (rs.rand(8, 32, 32, 2) > 0.5).astype(np.float32)
    with mesh:
        _, _, out_losses, reg = step(
            replicate(model.params, mesh),
            replicate(opt.init_state(model.params), mesh),
            jnp.float32(1e-3), shard_batch(X, mesh), shard_batch(y, mesh))
    assert np.isfinite(float(out_losses[0]))


def test_tp_char_step_runs_and_shards():
    from univer_ocr_tpu.models import make_char
    from univer_ocr_tpu.primitives import CHARS
    mesh = make_mesh(8, model_parallel=2)
    char = make_char((1, 496, 32, 1), Adam(lr=1e-3))
    step, place_params, place_opt_state = make_tp_char_train_step(char, mesh)
    params = place_params(char.params)
    # dense_1 weight is actually sharded over 'model'
    d1 = params['Char/dense_block/dense_1']['w']
    assert len(d1.sharding.device_set) == 8
    opt = char._optimizer()
    opt_state = place_opt_state(char.params, opt.init_state(char.params))
    rs = np.random.RandomState(2)
    X = rs.rand(8, 32, 32, 1).astype(np.float32)
    y = np.eye(len(CHARS), dtype=np.float32)[
        rs.randint(0, len(CHARS), 8 * 32)]
    new_params, _, out_losses, reg = step(params, opt_state, 1e-3, X, y)
    assert np.isfinite(float(out_losses[0]))


def test_dryrun_multichip_contract():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry', '__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (1, 256, 256, 1)
    assert out[1].shape == (1, 256, 256, 1)
    mod.dryrun_multichip(8)


def test_sharded_front_matches_single_device():
    """OCRPipeline with a mesh shards the page batch over 'data' and must
    produce the same front-end outputs as single-device."""
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    rs = np.random.RandomState(7)
    pages = [rs.rand(1, 64, 64, 1).astype(np.float32) for _ in range(8)]

    pipe_a = OCRPipeline((1, 64, 64, 1), weights=None, chunk=8, workers=2)
    weights = {**{n: {p: np.asarray(v).tolist()
                      for p, v in lp.items()}
                  for n, lp in pipe_a.front_params.items()}}
    mesh = make_mesh(4, model_parallel=1)
    pipe_b = OCRPipeline((1, 64, 64, 1), weights=weights, chunk=8,
                         workers=2, mesh=mesh)

    batch = np.concatenate([(p * 255).astype(np.uint8) for p in pages])
    m_a, p_a = pipe_a._front(pipe_a.front_params, jnp.asarray(batch))
    m_b, p_b = pipe_b._front(pipe_b.front_params, batch)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))


@pytest.fixture(scope='module')
def _trained_pages():
    import json
    import random
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.datasets import GeneratorDataset
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')
    random.seed(23)
    np.random.seed(23)
    dataset = GeneratorDataset(2, 416, 272)
    pages = [dataset.get(i, layer_tags=['image'])['image']
             .astype(np.float32) for i in range(2)]
    return weights, pages


def test_sharded_pipeline_text_matches_single_device(_trained_pages):
    """FULL OCRPipeline over the virtual mesh (front + Line + Char all
    sharded over 'data') must decode exactly the single-device text."""
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    weights, pages = _trained_pages
    shape = (1, 288, 432, 1)
    single = OCRPipeline(shape, weights=weights, chunk=2, workers=2)
    expected = single.ocr_pages(pages)
    assert any(any(para) for page in expected for para in page), \
        'trained checkpoint decoded nothing — test would be vacuous'

    mesh = make_mesh(4, model_parallel=1)
    sharded = OCRPipeline(shape, weights=weights, chunk=2, workers=2,
                          mesh=mesh)
    assert sharded.ocr_pages(pages) == expected
    # partial tail chunk: 1 page must still divide over 4 data shards
    assert sharded.ocr_pages(pages[:1]) == expected[:1]


def test_sharded_device_cascade_text_matches_single_device(_trained_pages):
    """device_cascade=True over the mesh: paragraph/line gather stages
    shard over 'data' with the page/crop stacks as replicated sources."""
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    weights, pages = _trained_pages
    shape = (1, 288, 432, 1)
    single = OCRPipeline(shape, weights=weights, chunk=2, workers=2,
                         device_cascade=True)
    expected = single.ocr_pages(pages)

    mesh = make_mesh(4, model_parallel=1)
    sharded = OCRPipeline(shape, weights=weights, chunk=2, workers=2,
                          device_cascade=True, mesh=mesh)
    assert sharded.ocr_pages(pages) == expected


def test_sharded_fused_tail_text_matches_single_device(_trained_pages):
    """Fused tail under a mesh (the default serving config, VERDICT r3
    item 6): the stage runs as a shard_map with shard-LOCAL line pools
    and the host merges the per-shard payload segments — text must equal
    the single-device fused decode exactly."""
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    weights, pages = _trained_pages
    shape = (1, 288, 432, 1)
    single = OCRPipeline(shape, weights=weights, chunk=2, workers=2,
                         device_cascade=True, collapse_runs=4)
    assert single.fused_tail, 'collapse_runs=4 must default the fused tail on'
    expected = single.ocr_pages(pages)
    assert any(any(para) for page in expected for para in page)

    mesh = make_mesh(4, model_parallel=1)
    sharded = OCRPipeline(shape, weights=weights, chunk=2, workers=2,
                          device_cascade=True, collapse_runs=4, mesh=mesh)
    assert sharded.fused_tail, 'fused tail must stay on under a mesh'
    assert sharded.ocr_pages(pages) == expected
