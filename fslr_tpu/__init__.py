"""fslr-tpu: TPU-native split-read fusion-calling engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
fslr pipeline (see SURVEY.md for the reference structural analysis).
"""

import os as _os

__version__ = '0.1.0'

# Persistent XLA compilation cache: the banded/SW Pallas kernels take tens
# of seconds to compile (remote compile service on this image); caching
# makes repeat pipeline runs start in seconds.
try:
    import jax as _jax

    _cache = _os.environ.get(
        'FSLR_TPU_XLA_CACHE',
        _os.path.join(_os.path.expanduser('~'), '.cache', 'fslr_tpu_xla'))
    _jax.config.update('jax_compilation_cache_dir', _cache)
    # cache EVERY program: the remote compile service costs ~0.4 s even for
    # trivial programs, so dozens of sub-second compiles dominate cold starts
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
