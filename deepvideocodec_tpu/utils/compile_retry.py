"""Retry wrapper for flaky remote-compile failures.

The axon dev environment compiles TPU programs through a remote helper
subprocess that is killed nondeterministically under host memory pressure
(observed: the same ~2-minute training-graph compile SIGKILLs or succeeds
run to run). A failed compile is not cached, so simply re-invoking the
jitted function retries the compile from scratch. This wrapper automates
that for long unattended runs (training campaigns): it retries only on
the remote-compile signature and re-raises everything else unchanged.

On production TPU VMs compiles are in-process and this wrapper is inert.
"""

from __future__ import annotations

import functools
import logging
import time

_RETRYABLE = ("remote_compile", "tpu_compile_helper")


def retry_flaky_compile(fn, retries: int = 4, base_sleep: float = 15.0):
    """Wrap a jitted callable; retry calls that die in the remote compiler.

    Only the compile is flaky, so a retried call is safe: the step has not
    executed when the helper dies (the error surfaces before dispatch).
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        for attempt in range(retries):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # jaxlib XlaRuntimeError hierarchy varies
                msg = str(e)
                if not any(tok in msg for tok in _RETRYABLE):
                    raise
                if attempt == retries - 1:
                    raise
                sleep = base_sleep * (attempt + 1)
                logging.warning(
                    "remote compile helper died (attempt %d/%d); "
                    "retrying in %.0fs", attempt + 1, retries, sleep)
                time.sleep(sleep)
        raise AssertionError("unreachable")

    return wrapped
