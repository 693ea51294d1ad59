"""Make `python tools/<tool>.py` work from the repo root (adds the repo to
sys.path so `configs.*` and `regda_tpu.*` resolve, like the reference's
`python tools/...` invocation pattern)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
