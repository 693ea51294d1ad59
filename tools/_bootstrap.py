"""Make `python tools/<tool>.py` work from the repo root (adds the repo to
sys.path so `configs.*` and `regda_tpu.*` resolve, like the reference's
`python tools/...` invocation pattern)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat tool invocations skip the
    (minutes-long on the tunneled TPU backend) recompiles. Opt out with
    REGDA_NO_COMPILE_CACHE=1."""
    if os.environ.get('REGDA_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(_ROOT, '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


_enable_compilation_cache()
