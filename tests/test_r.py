"""R binding tests.

Two layers, mirroring how the reference splits them:

1. The real testthat suite (r/kmtpu/tests/test-kmtpu.R, the analog of
   reference src/test.R) run via Rscript — skipped cleanly when R or its
   packages are absent (the reference's CI never ran its R tests either,
   .travis.yml:15-21; ours at least runs them wherever R exists).
2. A Python-side contract test of the exact marshalling the R layer
   performs (1-based indices, rbind flattening, named-list fields), so
   the binding's data contract is exercised even without an R
   interpreter.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

R_TEST = os.path.join(os.path.dirname(__file__), os.pardir, "r", "kmtpu",
                      "tests", "test-kmtpu.R")


def _r_available():
    rscript = shutil.which("Rscript")
    if rscript is None:
        return None
    probe = subprocess.run(
        [rscript, "-e",
         "library(testthat); library(reticulate); "
         "stopifnot(reticulate::py_module_available('kmcuda_tpu'))"],
        capture_output=True, timeout=120)
    return rscript if probe.returncode == 0 else None


def test_r_testthat_suite():
    rscript = _r_available()
    if rscript is None:
        pytest.skip("Rscript with testthat+reticulate+kmcuda_tpu "
                    "not available")
    env = dict(os.environ)
    res = subprocess.run([rscript, os.path.abspath(R_TEST)], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stdout + res.stderr


def test_r_contract_from_python():
    """The marshalling the R wrapper performs around the Python API
    (r/kmtpu/R/kmtpu.R), checked from the Python side: rbind-equivalent
    row stacking, float32 down-conversion of doubles, and the 0-based ->
    1-based index shift both ways (r.cc:303-316, 383-393)."""
    from kmcuda_tpu import kmeans_tpu, knn_tpu

    rng = np.random.RandomState(42)
    parts = [rng.rand(8000, 4), rng.rand(8000, 4)]   # doubles, like R
    stacked = np.vstack(parts).astype(np.float32)    # .flatten_samples
    c, a = kmeans_tpu(stacked, 50, tolerance=0.01, init="random",
                      seed=777, yinyang_t=0)
    a_r = np.asarray(a).astype(np.int64) + 1         # 1-based out
    assert a_r.min() >= 1 and a_r.max() <= 50
    assert len(a_r) == 16000

    # knn round-trip: R hands back 1-based assignments, the wrapper
    # subtracts 1 before calling knn_tpu and adds 1 to the neighbors
    nb = knn_tpu(5, stacked, np.asarray(c),
                 (a_r - 1).astype(np.uint32))
    nb_r = np.asarray(nb).astype(np.int64) + 1
    assert nb_r.shape == (16000, 5)
    assert nb_r.min() >= 1 and nb_r.max() <= 16000
    own = np.arange(1, 16001)[:, None]
    assert not (nb_r == own).any()
