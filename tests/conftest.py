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
