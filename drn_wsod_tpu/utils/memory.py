"""OOM retry helper (reference: detectron2/utils/memory.py
retry_if_cuda_oom): retry a function at half scale when XLA reports a
resource-exhausted allocation."""

from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)


def retry_if_oom(fn, fallback=None):
    """Run fn(); on XLA RESOURCE_EXHAUSTED, clear caches and run
    ``fallback`` (or re-raise without one)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                raise
            logger.warning(f"OOM in {fn.__name__}; "
                           f"{'retrying fallback' if fallback else 'no fallback'}")
            import jax

            jax.clear_caches()
            if fallback is None:
                raise
            return fallback(*args, **kwargs)

    return wrapped
