"""Opt-in profiler window around the compute sections.

The reference gates ``cudaProfilerStart/Stop`` brackets behind a
``PROFILE`` compile flag so an nvprof window covers exactly the
init+iterate+average-distance span (reference src/kmcuda.cc:12-14,
478-480, 502-504; src/CMakeLists.txt:31-33).  The TPU-native analog is a
runtime knob: set ``KMTPU_PROFILE=<dir>`` and the same span is bracketed
with ``jax.profiler.start_trace/stop_trace``, producing a TensorBoard- /
xprof-readable trace of every XLA op dispatched in the window.  Unset, the
hook is a no-op — like the reference's un-flagged build.
"""

import contextlib
import os

_ENV = "KMTPU_PROFILE"
_active = False  # jax.profiler supports one trace at a time


@contextlib.contextmanager
def profile_window(logger):
    """Bracket a compute span with a profiler trace when KMTPU_PROFILE is
    set to a directory path.  Reentrant calls (e.g. a knn_tpu invoked while
    a kmeans window is somehow open) degrade to no-ops rather than erroring,
    mirroring the reference's per-device start/stop being idempotent."""
    global _active
    log_dir = os.environ.get(_ENV, "").strip()
    if not log_dir or _active:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    _active = True
    logger.debug("profiler trace started (%s=%s)" % (_ENV, log_dir))
    try:
        yield
    finally:
        _active = False
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s" % log_dir)
