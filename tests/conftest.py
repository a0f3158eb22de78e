"""Test session setup: run the suite on a virtual 8-device CPU mesh.

The reference can only run its multi-GPU tests on a real multi-GPU box; we
do strictly better (SURVEY.md §4): JAX's host-platform device count gives
single-process multi-device coverage on CPU.  Set KMTPU_TEST_TPU=1 to run
against the real attached TPU instead (single device).
"""

import os

if os.environ.get("KMTPU_TEST_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # async dispatch runs each virtual device's program on its own thread;
    # on low-core boxes the 8 spinning threads livelock the first
    # cross-device collective for minutes (measured 277 s .. >580 s for one
    # all-reduce on a 1-core host; 0.7 s synchronous)
    jax.config.update("jax_cpu_enable_async_dispatch", False)

# The Yinyang wall-clock controller makes *timing*-based scheduling
# decisions (sparse-branch revocation, budget gate).  They never change
# results (test-locked), but on a noisy shared-CPU test box they would
# make WHICH code path a test exercises nondeterministic.  Pin the
# controller to "always allow, never gate" for the suite; the dedicated
# controller tests monkeypatch these back.
from kmcuda_tpu import config as _config  # noqa: E402

_config.YY_MIN_REMAINING = 0
_config.YY_BAILOUT_MARGIN = float("inf")
