"""Web app tests: HTTP routes, PNG streaming, WebSocket event rebroadcast
(reference surface: views/main.py routes + /train-ws namespace)."""

import json
import socket
import struct
import time
import urllib.request

import pytest

from univer_ocr_tpu.web import create_app
from univer_ocr_tpu.web.ws_client import WSClient


@pytest.fixture(scope='module')
def server():
    app = create_app()
    # pre-seed small demo data so routes are fast
    from univer_ocr_tpu.image_generator import generate_demo
    app.state['demo'] = generate_demo(640, 480)
    srv = app.start_background(port=8901)
    time.sleep(0.2)
    yield 'http://127.0.0.1:8901'
    srv.shutdown()


def get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get('Content-Type', ''), r.read()


def test_index(server):
    status, ctype, body = get(server + '/')
    assert status == 200 and b'univer-ocr-tpu' in body


@pytest.mark.parametrize('path', [
    '/view_layers/raw', '/view_layers/demo', '/chars', '/fonts',
    '/train', '/test-nn', '/interpret_data'])
def test_routes(server, path):
    status, ctype, body = get(server + path)
    assert status == 200
    assert 'text/html' in ctype


def test_image_stream(server):
    status, ctype, body = get(server + '/image/raw/image')
    assert status == 200
    assert ctype == 'image/png'
    assert body[:8] == b'\x89PNG\r\n\x1a\n'


def test_404(server):
    try:
        urllib.request.urlopen(server + '/nope', timeout=10)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_static(server):
    status, ctype, body = get(server + '/static/style.css')
    assert status == 200 and 'text/css' in ctype


def _read_server_frame(sock):
    data = b''
    sock.settimeout(10)
    while len(data) < 2:
        data += sock.recv(4096)
    ln = data[1] & 0x7F
    off = 2
    if ln == 126:
        ln = struct.unpack('>H', data[2:4])[0]
        off = 4
    while len(data) < off + ln:
        data += sock.recv(4096)
    return json.loads(data[off:off + ln])


def test_train_ws_rebroadcast(server):
    """Trainer-client events are rebroadcast to other namespace members
    (reference views/train_ws.py:37-49)."""
    browser = WSClient('127.0.0.1', 8901, '/train-ws')
    trainer = WSClient('127.0.0.1', 8901, '/train-ws')
    time.sleep(0.1)
    trainer.emit('progress_tracker', {'type': 'epoch',
                                      'data': {'current': 1, 'total': 5}})
    msg = _read_server_frame(browser.sock)
    assert msg['event'] == 'progress_tracker'
    assert msg['data']['data']['current'] == 1
    browser.close()
    trainer.close()


def test_ocr_endpoint_rejects_garbage(server):
    import urllib.request
    req = urllib.request.Request(server + '/ocr', data=b'not an image',
                                 method='POST')
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert b'error' in e.read()


def test_ocr_endpoint_accepts_image(server):
    import io
    import urllib.request
    from PIL import Image
    img = Image.new('L', (160, 96), 255)
    buf = io.BytesIO()
    img.save(buf, 'PNG')
    req = urllib.request.Request(server + '/ocr', data=buf.getvalue(),
                                 method='POST')
    with urllib.request.urlopen(req, timeout=300) as r:
        data = json.loads(r.read())
    assert 'text' in data
    assert isinstance(data['text'], list)
