"""Web app: demo-data visualization, live training dashboard, test runner.

The reference serves this with Flask + Socket.IO (web_app/__init__.py:6-19,
views/).  This environment ships neither, so the server is built on the
stdlib: `httpd.py` (routing + templates over http.server) and
`websocket.py` (RFC 6455 frames over the same listener).  The browser-side
protocol is plain WebSocket JSON `{"event": ..., "data": ...}` carrying the
reference's event vocabulary (`message` / `info` / `progress_tracker` /
`start` / `stop`) on the same namespaces (`/train-ws`, `/test-nn-ws`).
"""

from .app import create_app
