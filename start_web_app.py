"""Serve the web app (reference start_web_app.py:7).

    python start_web_app.py [port]
"""

import sys

from univer_ocr_tpu.web import create_app

if __name__ == '__main__':
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    create_app().run(host='127.0.0.1', port=port)
