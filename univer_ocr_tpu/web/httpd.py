"""Tiny routing HTTP server on http.server with WebSocket upgrade support.

Route handlers return (status, content_type, body) or use the helpers;
`@app.route('/image/<mode>/<type>')`-style path params are supported.
WebSocket routes receive a WebSocketConnection after the handshake.
"""

import re
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from .websocket import Hub, WebSocketConnection, accept_key

TEMPLATES_DIR = Path(__file__).parent / 'templates'
STATIC_DIR = Path(__file__).parent / 'static'

MIME = {
    '.html': 'text/html; charset=utf-8',
    '.css': 'text/css',
    '.js': 'application/javascript',
    '.png': 'image/png',
    '.ico': 'image/x-icon',
}


def render_template(name, **context):
    """Very small templating: `{{> partial.html }}` includes and
    `{{ name }}` substitutions over templates/<name>."""
    text = (TEMPLATES_DIR / name).read_text()
    for partial in re.findall(r'\{\{>\s*([\w.]+)\s*\}\}', text):
        text = text.replace('{{> %s }}' % partial,
                            (TEMPLATES_DIR / partial).read_text())
    for key, value in context.items():
        text = text.replace('{{ %s }}' % key, str(value))
    return text


class App:
    def __init__(self):
        self._routes = []          # (regex, param_names, handler)
        self._ws_routes = {}       # path -> handler(conn, app)
        self.hub = Hub()
        self.state = {}

    def route(self, pattern, methods=('GET',)):
        param_names = re.findall(r'<(\w+)>', pattern)
        regex = re.compile(
            '^' + re.sub(r'<\w+>', r'([^/]+)', pattern) + '$')

        def decorator(func):
            self._routes.append((regex, param_names, func, tuple(methods)))
            return func
        return decorator

    def ws_route(self, path):
        def decorator(func):
            self._ws_routes[path] = func
            return func
        return decorator

    def dispatch(self, path, query, method='GET', body=None):
        for regex, names, func, methods in self._routes:
            m = regex.match(path)
            if m and method in methods:
                kwargs = dict(zip(names, m.groups()))
                if method != 'GET':
                    kwargs['body'] = body
                return func(query=query, **kwargs)
        return None

    def make_handler(self):
        app = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = 'HTTP/1.1'

            def log_message(self, fmt, *args):   # quiet
                pass

            def _send(self, status, ctype, body, extra_headers=()):
                if isinstance(body, str):
                    body = body.encode('utf-8')
                self.send_response(status)
                self.send_header('Content-Type', ctype)
                self.send_header('Content-Length', str(len(body)))
                for k, v in extra_headers:
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parsed = urlparse(self.path)
                path = parsed.path
                query = {k: v[0] for k, v in parse_qs(parsed.query).items()}

                # WebSocket upgrade?
                if (path in app._ws_routes
                        and 'websocket' in
                        self.headers.get('Upgrade', '').lower()):
                    self._handle_ws(path)
                    return

                if path.startswith('/static/'):
                    self._serve_static(path[len('/static/'):])
                    return

                self._finish(path, query, 'GET', None)

            def do_POST(self):
                parsed = urlparse(self.path)
                query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                length = int(self.headers.get('Content-Length', 0))
                body = self.rfile.read(length) if length else b''
                self._finish(parsed.path, query, 'POST', body)

            def _finish(self, path, query, method, body):
                try:
                    result = app.dispatch(path, query, method, body)
                except Exception:
                    self._send(500, 'text/plain', traceback.format_exc())
                    return
                if result is None:
                    self._send(404, 'text/plain', 'Not Found')
                    return
                if isinstance(result, tuple):
                    status, ctype, rbody = result
                else:
                    status, ctype, rbody = 200, MIME['.html'], result
                self._send(status, ctype, rbody)

            def _serve_static(self, rel):
                target = (STATIC_DIR / rel).resolve()
                if (not str(target).startswith(str(STATIC_DIR.resolve()))
                        or not target.is_file()):
                    self._send(404, 'text/plain', 'Not Found')
                    return
                ctype = MIME.get(target.suffix, 'application/octet-stream')
                self._send(200, ctype, target.read_bytes())

            def _handle_ws(self, path):
                key = self.headers.get('Sec-WebSocket-Key', '')
                self.send_response(101, 'Switching Protocols')
                self.send_header('Upgrade', 'websocket')
                self.send_header('Connection', 'Upgrade')
                self.send_header('Sec-WebSocket-Accept', accept_key(key))
                self.end_headers()
                conn = WebSocketConnection(self)
                app.hub.join(path, conn)
                try:
                    app._ws_routes[path](conn, app)
                finally:
                    app.hub.leave(path, conn)
                    conn.close()
                self.close_connection = True

        return Handler

    def run(self, host='127.0.0.1', port=8000):
        server = ThreadingHTTPServer((host, port), self.make_handler())
        server.daemon_threads = True
        print(f'Serving on http://{host}:{port}')
        server.serve_forever()

    def start_background(self, host='127.0.0.1', port=8000):
        server = ThreadingHTTPServer((host, port), self.make_handler())
        server.daemon_threads = True
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        return server
