"""Dashboard integration: a real (micro) training session driven through
the /train-ws plumbing must deliver every event type the train dashboard
consumes (train.js), with the payload shapes the UI reads.

No browser binary ships in the test image, so the "browser" is a raw
WSClient collecting the rebroadcast stream; a companion static check pins
train.js's handler vocabulary to what actually flows.
"""

import json
import re
import struct
import threading
import time
from pathlib import Path

import pytest

from univer_ocr_tpu.web import create_app
from univer_ocr_tpu.web.ws_client import WSClient, connect_train_ws

PORT = 8907
TRAIN_JS = Path('univer_ocr_tpu/web/static/train.js').read_text()


@pytest.fixture(scope='module')
def server():
    app = create_app()
    srv = app.start_background(port=PORT)
    time.sleep(0.2)
    yield app
    srv.shutdown()


class FrameReader:
    """Continuously parse server->client WS frames into a list."""

    def __init__(self, sock):
        self.events = []
        self.sock = sock
        self._buf = b''
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        self.sock.settimeout(1.0)
        while True:
            try:
                chunk = self.sock.recv(65536)
            except TimeoutError:
                continue
            except OSError:
                return
            if not chunk:
                return
            self._buf += chunk
            self._drain()

    def _drain(self):
        while True:
            if len(self._buf) < 2:
                return
            ln = self._buf[1] & 0x7F
            off = 2
            if ln == 126:
                if len(self._buf) < 4:
                    return
                ln = struct.unpack('>H', self._buf[2:4])[0]
                off = 4
            elif ln == 127:
                if len(self._buf) < 10:
                    return
                ln = struct.unpack('>Q', self._buf[2:10])[0]
                off = 10
            if len(self._buf) < off + ln:
                return
            payload, self._buf = (self._buf[off:off + ln],
                                  self._buf[off + ln:])
            try:
                self.events.append(json.loads(payload))
            except ValueError:
                pass


def test_dashboard_receives_full_event_vocabulary(server, tmp_path,
                                                  monkeypatch):
    """Micro training run (1 epoch Monochrome, 2 train / 1 val pages) ->
    the browser-side socket sees message, info and every
    progress_tracker type the dashboard renders."""
    import univer_ocr_tpu.models.train as train_mod
    from univer_ocr_tpu.models.model import Modes

    browser = WSClient('127.0.0.1', PORT, '/train-ws')
    reader = FrameReader(browser.sock)

    trainer_client = connect_train_ws(port=PORT)
    monkeypatch.setattr(train_mod, 'MODEL_WEIGHTS_FILE_PATH',
                        tmp_path / 'weights.json')
    train_mod.init_emitter(trainer_client)
    try:
        train_mod.train_model(
            use_gpu=False,
            curriculum=[(Modes.TRAIN_MONOCHROME, 1e-3, 0.995, 1)],
            train_size=2, val_size=1)
    finally:
        train_mod.init_emitter(None)
        trainer_client.close()

    deadline = time.time() + 10
    needed_types = {'reset', 'generating_data', 'training', 'validating',
                    'epoch', 'train_iteration', 'val_iteration',
                    'forward_backward'}
    while time.time() < deadline:
        got = {e['data'].get('type') for e in list(reader.events)
               if e.get('event') == 'progress_tracker'}
        if needed_types <= got:
            break
        time.sleep(0.25)
    events = list(reader.events)
    browser.close()

    kinds = {e.get('event') for e in events}
    assert 'message' in kinds and 'info' in kinds, kinds
    tracker = [e['data'] for e in events
               if e.get('event') == 'progress_tracker']
    got_types = {t.get('type') for t in tracker}
    assert needed_types <= got_types, got_types

    # payload shapes the UI reads
    info = next(e['data'] for e in events if e.get('event') == 'info')
    assert info.get('layer_names'), 'info.layer_names feeds the table rows'

    epoch = next(t for t in tracker if t['type'] == 'epoch')
    assert {'current', 'total'} <= set(epoch['data'])

    fb = [t for t in tracker if t['type'] == 'forward_backward']
    done_cells = [ev for t in fb for events_ in t['data'].values()
                  for name, ev in events_.items()
                  if name in ('forward', 'backward') and ev.get('done')]
    assert done_cells, 'at least one layer must reach the green done state'
    assert {'counter', 'done', 'time'} <= set(done_cells[0])

    # the checkpoint was written to the sandboxed path, not the repo one
    assert (tmp_path / 'weights.json').exists()


def test_train_js_handles_everything_the_trainer_emits():
    """Static pin: every progress_tracker type the server side can emit
    has a handler branch in train.js, and the UI hooks it reads exist in
    the template."""
    for t in ('reset', 'generating_data', 'training', 'validating',
              'epoch', 'train_iteration', 'val_iteration',
              'disable_status_update', 'enable_status_update',
              'forward_backward'):
        assert re.search(rf"'{t}'", TRAIN_JS), f'train.js misses {t}'
    html = Path('univer_ocr_tpu/web/templates/train.html').read_text()
    for el_id in ('start', 'stop', 'clear', 'use_gpu', 'step', 'log',
                  'train-bar', 'val-bar', 'epoch-bar', 'layer-table',
                  'progressbars'):
        assert f'id="{el_id}"' in html, f'train.html misses #{el_id}'
