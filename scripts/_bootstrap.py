"""Make `univer_ocr_tpu` importable when a script runs from a source
checkout (`python scripts/foo.py`) without an installed package.

Scripts do `import _bootstrap  # noqa: F401` as their first import:
Python puts `scripts/` itself on sys.path for a direct invocation, so
this module resolves, and it prepends the repo root exactly once.  An
installed `univer-ocr-tpu` (pyproject.toml) wins if present.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
