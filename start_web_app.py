"""Serve the web app (reference start_web_app.py:7).

    python start_web_app.py [port] [--cpu]

--cpu pins the host CPU backend (the env-var route is overridden by the
axon sitecustomize, so serving without the accelerator needs the config
flag set before jax initializes).
"""

import sys

if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    if '--cpu' in sys.argv[1:]:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from univer_ocr_tpu.web import create_app
    port = int(args[0]) if args else 8000
    create_app().run(host='127.0.0.1', port=port)
