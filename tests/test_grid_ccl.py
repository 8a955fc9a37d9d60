"""On-device grid CCL (device_cascade.grid_ccl_labels/_tables): the
merge-suspect escalation resolved inside the paragraph-stage program.
Labels must reproduce scipy.ndimage 8-connectivity components, tables
the host escalation planner's quantized geometry, and the suspect flag
must clear only when the result is trustworthy (converged, in
capacity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy import ndimage

from univer_ocr_tpu.models.device_cascade import (_CCL_BIG,
                                                  grid_ccl_labels,
                                                  grid_ccl_tables,
                                                  grid_ccl_tables_host)

EIGHT = np.ones((3, 3), bool)


def _blocky(rs, B, L, G, C, p=0.72, k=4):
    prof = np.zeros((B, L, G, C), bool)
    for b in range(B):
        for c in range(C):
            up = np.kron(rs.rand(-(-L // k), -(-G // k)) > p,
                         np.ones((k, k), bool))
            prof[b, :, :, c] = up[:L, :G]
    return prof


def test_grid_ccl_labels_match_scipy():
    rs = np.random.RandomState(3)
    prof = _blocky(rs, 4, 48, 64, 2)
    labels, lin, converged = jax.jit(grid_ccl_labels)(jnp.asarray(prof))
    labels = np.asarray(labels)
    assert bool(converged)
    for b in range(prof.shape[0]):
        for c in range(2):
            ref, cnt = ndimage.label(prof[b, :, :, c], structure=EIGHT)
            for blob in range(1, cnt + 1):
                cells = np.argwhere(ref == blob)
                # device label = the component's raster-first (min
                # linear) cell index -> scipy's component order
                want = (cells[:, 0] * 64 + cells[:, 1]).min()
                assert (labels[b, cells[:, 0], cells[:, 1], c]
                        == want).all()
            assert (labels[b, :, :, c][~prof[b, :, :, c]]
                    == _CCL_BIG).all()


def test_grid_ccl_tables_match_host_planner_math():
    rs = np.random.RandomState(7)
    B, L, G, C = 5, 40, 64, 2
    prof = _blocky(rs, B, L, G, C, p=0.8, k=3)
    vh = np.array([80, 61, 40, 80, 33], np.int32)   # odd: row clipping
    vw = np.full((B,), 640, np.int32)
    gw = np.array([10, 10, 12, 8, 10], np.int32)
    t2, n2, converged = jax.jit(grid_ccl_tables)(
        jnp.asarray(prof), jnp.asarray(vh), jnp.asarray(vw),
        jnp.asarray(gw))
    t2, n2 = np.asarray(t2), np.asarray(n2)
    assert bool(converged)
    for b in range(B):
        th, nh = grid_ccl_tables_host(prof[b], int(vh[b]), int(vw[b]),
                                      int(gw[b]))
        assert (nh == n2[b]).all()
        for c in range(C):
            np.testing.assert_allclose(t2[b, :nh[c], :, c],
                                       th[:nh[c], :, c], atol=1e-4)


def test_grid_ccl_unconverged_reports_false():
    """A serpentine labyrinth needs more sweeps than the cap — the
    labels must NOT be silently trusted."""
    import univer_ocr_tpu.models.device_cascade as dc
    L, G = 64, 64
    occ = np.zeros((1, L, G, 1), bool)
    # boustrophedon corridor: one component, path length ~ L*G/2
    for y in range(L):
        occ[0, y, :, 0] = True if y % 2 == 0 else False
    for y in range(0, L - 1, 2):
        occ[0, y + 1, (G - 1) if (y // 2) % 2 == 0 else 0, 0] = True
    _, _, converged = jax.jit(
        lambda o: dc.grid_ccl_labels(o, max_iters=4))(jnp.asarray(occ))
    assert not bool(converged)
    # full cap converges and matches scipy
    labels, _, converged = jax.jit(grid_ccl_labels)(jnp.asarray(occ))
    assert bool(converged)
    ref, cnt = ndimage.label(occ[0, :, :, 0], structure=EIGHT)
    assert cnt == 1
    cells = np.argwhere(ref == 1)
    want = (cells[:, 0] * G + cells[:, 1]).min()
    assert (np.asarray(labels)[0, cells[:, 0], cells[:, 1], 0]
            == want).all()


def test_tables_state_resolves_suspects_to_host_escalation_geometry():
    """For merge-suspect band masks, the device-resolved tables must
    yield the SAME line plans the host escalation planner derives from
    the pulled profile payload."""
    from univer_ocr_tpu.models.device_cascade import (
        tables_state, unpack_tables_payload, pack_tables_payload)
    from univer_ocr_tpu.models.pipeline import OCRPipeline

    rs = np.random.RandomState(1)
    B, H, W, C = 2, 96, 160, 2
    bands = np.zeros((B, H, W, C), bool)
    # the measured merge failure class: two lines whose rows chain into
    # ONE global row-run through staggered middle content, while the
    # left column groups still see two separated tall runs
    bands[0, 4:11, 5:60, 0] = True       # line 1 top, left block
    bands[0, 20:27, 5:60, 0] = True      # line 2 top, left block
    bands[0, 8:23, 80:140, 0] = True     # staggered bridge
    bands[0, 12:19, 5:60, 1] = True      # bottoms, same pattern
    bands[0, 28:35, 5:60, 1] = True
    bands[0, 16:31, 80:140, 1] = True
    # plus a plain level paragraph (not suspect)
    bands[1, 10:16, 10:150, 0] = True
    bands[1, 20:26, 10:150, 1] = True
    crops = rs.rand(B, H, W, 1).astype(np.float32)

    def run(resolve):
        return jax.jit(lambda b, c: tables_state(
            b, c, resolve_suspects=resolve))(jnp.asarray(bands),
                                             jnp.asarray(crops))

    (_, tbl_r, nb_r, _, axis_r, sus_r, _) = run(True)
    (_, tbl_0, nb_0, _, axis_0, sus_0, prof_0) = run(False)

    sus_0 = np.asarray(sus_0)
    sus_r = np.asarray(sus_r)
    assert sus_0[0] and not sus_0[1], 'fixture must trip merge_suspect'
    assert not sus_r.any(), 'device resolve must clear the flag'

    pipe = OCRPipeline.__new__(OCRPipeline)   # planners only
    payload = pack_tables_payload(jnp.asarray(tbl_0), jnp.asarray(nb_0),
                                  jnp.zeros((B, 2), jnp.float32),
                                  jnp.asarray(axis_0),
                                  jnp.asarray(sus_0), prof_0)
    (tables0, nb0, _, axes0, _, profiles0) = unpack_tables_payload(
        np.asarray(payload))
    want = pipe._plan_lines_from_profile(profiles0[0], int(axes0[0]),
                                         H, W)
    got = pipe._plan_lines_from_tables(np.asarray(tbl_r)[0],
                                       np.asarray(nb_r)[0],
                                       int(np.asarray(axis_r)[0]))
    assert got == want
    # the non-suspect paragraph's tables are untouched
    np.testing.assert_array_equal(np.asarray(tbl_r)[1],
                                  np.asarray(tbl_0)[1])
