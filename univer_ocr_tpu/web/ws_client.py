"""Minimal WebSocket *client* for the trainer subprocess.

The reference trainer connects back to the web server as a Socket.IO
client and emits message/info/progress_tracker events (reference
train.py:20-23, my_model/train.py:17-64).  This client speaks the plain-
WebSocket JSON protocol of univer_ocr_tpu.web instead.
"""

import base64
import json
import os
import socket
import struct


class WSClient:
    def __init__(self, host, port, path):
        self.sock = socket.create_connection((host, port), timeout=5)
        key = base64.b64encode(os.urandom(16)).decode()
        request = (
            f'GET {path} HTTP/1.1\r\n'
            f'Host: {host}:{port}\r\n'
            f'Upgrade: websocket\r\n'
            f'Connection: Upgrade\r\n'
            f'Sec-WebSocket-Key: {key}\r\n'
            f'Sec-WebSocket-Version: 13\r\n\r\n')
        self.sock.sendall(request.encode())
        response = b''
        while b'\r\n\r\n' not in response:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError('handshake failed')
            response += chunk
        if b'101' not in response.split(b'\r\n', 1)[0]:
            raise ConnectionError(f'unexpected handshake: {response[:200]!r}')

    def emit(self, event, data=None):
        payload = json.dumps({'event': event, 'data': data},
                             default=str).encode('utf-8')
        mask = os.urandom(4)
        header = bytes([0x81])
        n = len(payload)
        if n < 126:
            header += bytes([0x80 | n])
        elif n < (1 << 16):
            header += bytes([0x80 | 126]) + struct.pack('>H', n)
        else:
            header += bytes([0x80 | 127]) + struct.pack('>Q', n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        try:
            self.sock.sendall(header + mask + masked)
        except OSError:
            pass

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


def connect_train_ws(host='127.0.0.1', port=8000, path='/train-ws'):
    return WSClient(host, port, path)
