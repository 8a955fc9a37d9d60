"""Routes and websocket namespaces (reference web_app/views/main.py:27-99,
train_ws.py, test_nn_ws.py) on the stdlib server."""

import html
import json
import subprocess
import sys
import threading
from pathlib import Path

from ..image_generator import generate_demo, to_bytesio
from ..interpreter import interpret
from ..primitives import CHARS, FONTS_LIST, encode_char
from .httpd import App, render_template

REPO_ROOT = Path(__file__).resolve().parents[2]

#: Page-shape buckets for /ocr uploads: every distinct page shape compiles
#: its own program menu (minutes over the remote-compile tunnel), so
#: arbitrary upload sizes must collapse onto a small fixed menu.  Dims
#: snap UP to the canonical serving page then 256-steps (all /16); beyond
#: the cap the image downscales to fit (keeping aspect) — glyphs stay
#: >= the trained 12 px floor for any page up to ~2x the cap.  Zero
#: padding is the make_divisible_by convention the models train with.
OCR_H_MENU = (496, 752, 1008, 1264, 1520)
OCR_W_MENU = (736, 992, 1248, 1504, 1760, 2016)


def bucket_page(image):
    """PIL L image -> (1, Hb, Wb, 1) float32 on the shape menu."""
    import numpy as np

    from ..models.datasets import encode_X
    w, h = image.size
    cap_h, cap_w = OCR_H_MENU[-1] - 2, OCR_W_MENU[-1] - 2
    if h > cap_h or w > cap_w:
        scale = min(cap_h / h, cap_w / w)
        image = image.resize((max(1, int(w * scale)),
                              max(1, int(h * scale))))
        w, h = image.size
    bh = next(s for s in OCR_H_MENU if s >= h + 2)
    bw = next(s for s in OCR_W_MENU if s >= w + 2)
    X = encode_X(image)
    out = np.zeros((1, bh, bw, 1), np.float32)
    py, px = (bh - h) // 2, (bw - w) // 2
    out[:, py:py + h, px:px + w, :] = X
    return out


def create_app():
    app = App()

    def get_demo_data(regenerate=False):
        if regenerate or 'demo' not in app.state:
            app.state['demo'] = generate_demo(1920, 1080)
        return app.state['demo']

    # ------------------------------------------------------------------
    # HTTP routes (reference views/main.py)
    # ------------------------------------------------------------------
    @app.route('/')
    def index(query=None):
        return render_template('index.html')

    @app.route('/generate_new')
    def generate_new(query=None):
        get_demo_data(regenerate=True)
        return ('<!DOCTYPE html><meta http-equiv="refresh" content="0; url=/">'
                'Regenerated, redirecting…')

    @app.route('/view_layers/<mode>')
    def view_layers(mode, query=None):
        assert mode in ('raw', 'demo')
        raw, demo = get_demo_data()
        layers = raw if mode == 'raw' else demo
        checkboxes = '\n'.join(
            f'<label class="layer-toggle"><input type="checkbox" '
            f'data-layer="{name}" {"checked" if name == "image" else ""}>'
            f'{name}</label>'
            for name in layers.keys())
        images = '\n'.join(
            f'<img class="layer" id="layer-{name}" '
            f'src="/image/{mode}/{name}" '
            f'style="display:{"block" if name == "image" else "none"}">'
            for name in layers.keys())
        return render_template('view_layers.html', mode=mode,
                               checkboxes=checkboxes, images=images)

    @app.route('/image/<mode>/<type>')
    def image(mode, type, query=None):
        assert mode in ('raw', 'demo')
        raw, demo = get_demo_data()
        layers = raw if mode == 'raw' else demo
        img = layers[type]
        return (200, 'image/png', to_bytesio(img).read())

    @app.route('/chars')
    def chars(query=None):
        rows = '\n'.join(
            f'<tr><td>{i}</td><td>{html.escape(repr(c))}</td>'
            f'<td><code>{encode_char(c)}</code></td></tr>'
            for i, c in enumerate(CHARS))
        return render_template('chars.html', rows=rows)

    @app.route('/fonts')
    def fonts(query=None):
        rows = '\n'.join(
            f'<tr><td>{f.name}</td>'
            f'<td>{f.normal_path or "—"}</td>'
            f'<td>{f.bold_path or "—"}</td>'
            f'<td>{f.italic_path or "—"}</td>'
            f'<td>{f.bold_italic_path or "—"}</td></tr>'
            for f in FONTS_LIST)
        return render_template('fonts.html', rows=rows)

    @app.route('/train')
    def train(query=None):
        return render_template('train.html')

    @app.route('/test-nn')
    def test_nn(query=None):
        return render_template('test-nn.html')

    @app.route('/interpret_data')
    def interpret_data(query=None):
        raw, demo = get_demo_data()
        result = interpret(raw)
        rows = '\n'.join(
            f'<tr><td>{p}</td><td>{l}</td>'
            f'<td>{html.escape(text)}</td></tr>'
            for (p, l), text in sorted(result.items()))
        return render_template('interpret_data.html', rows=rows)

    # ------------------------------------------------------------------
    # Online OCR endpoint (the BASELINE "web_app online OCR endpoint"
    # serving surface; the reference only had CLI predict)
    # ------------------------------------------------------------------
    def get_pipeline(page_shape):
        """Lazily build one OCRPipeline per page shape, with the current
        checkpoint."""
        pipelines = app.state.setdefault('ocr_pipelines', {})
        if page_shape not in pipelines:
            from ..models.constants import MODEL_WEIGHTS_FILE_PATH
            from ..models.pipeline import OCRPipeline
            try:
                weights = json.loads(
                    (REPO_ROOT / MODEL_WEIGHTS_FILE_PATH).read_text())
            except OSError:
                weights = None
            # serving config: bf16 MXU fast path (explicit — the
            # constructor default is the f32 parity mode)
            pipelines[page_shape] = OCRPipeline(page_shape, weights=weights,
                                                chunk=4, workers=4,
                                                precision='bf16')
        return pipelines[page_shape]

    @app.route('/ocr')
    def ocr_form(query=None):
        return render_template('ocr.html')

    @app.route('/ocr', methods=('POST',))
    def ocr(body=None, query=None):
        import io

        from PIL import Image
        try:
            image = Image.open(io.BytesIO(body)).convert('L')
        except Exception:
            return (400, 'application/json',
                    json.dumps({'error': 'body must be an image'}))
        X = bucket_page(image)
        pipeline = get_pipeline(tuple(X.shape))
        text = pipeline.ocr_pages([X])[0]
        return (200, 'application/json',
                json.dumps({'text': text}, ensure_ascii=False))

    # ------------------------------------------------------------------
    # WS /train-ws (reference views/train_ws.py:13-61)
    # ------------------------------------------------------------------
    def pipe_output(proc, namespace):
        for line in iter(proc.stdout.readline, b''):
            app.hub.broadcast(namespace, 'message',
                              line.decode('utf-8', 'replace'))
        proc.wait()
        app.hub.broadcast(namespace, 'message',
                          f'[process exited with code {proc.returncode}]\n')

    def start_subprocess(namespace, argv, state_key):
        if app.state.get(state_key) is not None \
                and app.state[state_key].poll() is None:
            app.hub.broadcast(namespace, 'message', 'already running\n')
            return
        proc = subprocess.Popen(
            argv, cwd=str(REPO_ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        app.state[state_key] = proc
        threading.Thread(target=pipe_output, args=(proc, namespace),
                         daemon=True).start()

    @app.ws_route('/train-ws')
    def train_ws(conn, app_):
        while True:
            msg = conn.recv_event()
            if msg is None:
                return
            event, data = msg.get('event'), msg.get('data')
            if event == 'start':
                data = data or {}
                use_gpu = str(data.get('use_gpu', True))
                start_subprocess(
                    '/train-ws',
                    [sys.executable, '-u', 'train.py', use_gpu, 'False'],
                    'train_proc')
            elif event == 'stop':
                proc = app.state.get('train_proc')
                if proc is not None and proc.poll() is None:
                    proc.terminate()
                app.hub.broadcast('/train-ws', 'stopped', None)
            elif event in ('message', 'info', 'progress_tracker'):
                # trainer client -> rebroadcast to browsers
                app.hub.broadcast('/train-ws', event, data, exclude=conn)

    # ------------------------------------------------------------------
    # WS /test-nn-ws (reference views/test_nn_ws.py:10-50)
    # ------------------------------------------------------------------
    @app.ws_route('/test-nn-ws')
    def test_nn_ws(conn, app_):
        while True:
            msg = conn.recv_event()
            if msg is None:
                return
            event, data = msg.get('event'), msg.get('data')
            if event == 'start':
                data = data or {}
                test_name = data.get('test_name', 'test_gradients')
                if test_name not in ('test_gradients', 'test_identity'):
                    conn.send_event('message', f'unknown test {test_name}\n')
                    continue
                use_gpu = str(data.get('use_gpu', False))
                start_subprocess(
                    '/test-nn-ws',
                    [sys.executable, '-u', 'test_nn.py', test_name, use_gpu],
                    'test_proc')
            elif event == 'stop':
                proc = app.state.get('test_proc')
                if proc is not None and proc.poll() is None:
                    proc.terminate()

    return app
