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
