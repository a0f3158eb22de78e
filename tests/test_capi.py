"""C ABI integration: build libkmtpu.so + the C smoke binary with CMake and
run it against the CPU backend (the embedded-interpreter path end to end)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("cmake") is None or
                    shutil.which("ninja") is None,
                    reason="cmake/ninja not available")
def test_c_abi_smoke(tmp_path_factory):
    build = str(tmp_path_factory.mktemp("kmtpu_native"))
    subprocess.run(
        ["cmake", "-S", os.path.join(REPO, "native"), "-B", build,
         "-G", "Ninja"],
        check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    env = dict(os.environ)
    env["KMTPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [os.path.join(build, "kmtpu_smoke")], env=env, timeout=600,
        capture_output=True, text=True)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "KMTPU_SMOKE_OK" in out.stdout
    # device-handle protocol (kmtpu_upload/kmeans_device/knn_device/fetch)
    assert "KMTPU_DEVICE_PIPELINE_OK" in out.stdout
    # the reference logs this progress metric (knn.cu:521-530)
    assert "calculated " in out.stdout


def test_device_handle_registry_python_level():
    """The handle protocol's Python half (kmcuda_tpu.capi) without the
    native build: upload -> kmeans -> knn on handles, fetch, shape,
    release, stale-handle and short-buffer rejection.  Mirrors what the
    C smoke binary asserts so the protocol stays covered where cmake is
    unavailable."""
    import ctypes

    import numpy as np

    from kmcuda_tpu import capi, kmeans_tpu, knn_tpu
    from kmcuda_tpu.utils.errors import KMTPUResult

    rng = np.random.RandomState(11)
    n, f, k, kn = 4096, 8, 16, 5
    # build in float32 from the start: the pointer below is typed float32,
    # so any float64 promotion here would feed reinterpreted garbage bytes
    x = np.ascontiguousarray(
        rng.rand(n, f).astype(np.float32)
        + np.repeat(np.arange(4, dtype=np.float32) * 8.0,
                    n // 4)[:, None].astype(np.float32))
    assert x.dtype == np.float32

    code, hs = capi.upload_from_pointer(
        x.ctypes.data_as(ctypes.c_void_p).value, n, f, 0)
    assert code == int(KMTPUResult.SUCCESS) and hs > 0

    code, hc, ha, avg = capi.kmeans_from_handles(
        1, 0, 0.01, 0.0, 0, k, 77, 0, 0, hs, 0, 1)  # ++ init, L2, avg
    assert code == int(KMTPUResult.SUCCESS) and hc > 0 and ha > 0
    assert avg > 0.0

    code, rows, cols, isz = capi.handle_shape(ha)
    assert (code, rows, isz) == (int(KMTPUResult.SUCCESS), n, 4)

    code, hn = capi.knn_from_handles(kn, 0, 0, 0, hs, hc, ha)
    assert code == int(KMTPUResult.SUCCESS) and hn > 0
    code, rows, cols, isz = capi.handle_shape(hn)
    assert (code, rows, cols, isz) == (int(KMTPUResult.SUCCESS), n, kn, 4)

    nbr = np.zeros((n, kn), np.uint32)
    ptr = nbr.ctypes.data_as(ctypes.c_void_p).value
    # short buffer rejected without writing
    assert capi.fetch_to_pointer(hn, ptr, nbr.nbytes - 1) == \
        int(KMTPUResult.INVALID_ARGUMENTS)
    assert capi.fetch_to_pointer(hn, ptr, nbr.nbytes) == \
        int(KMTPUResult.SUCCESS)

    # the handle pipeline must agree with the direct Python API
    c_ref, a_ref = kmeans_tpu(x, k, init="k-means++", seed=77,
                              tolerance=0.01, yinyang_t=0)
    nbr_ref = np.asarray(knn_tpu(kn, x, c_ref, a_ref))
    np.testing.assert_array_equal(nbr, nbr_ref)

    for h in (hs, hc, ha, hn):
        assert capi.release_handle(h) == int(KMTPUResult.SUCCESS)
    assert capi.release_handle(hn) == int(KMTPUResult.INVALID_ARGUMENTS)
    code, _hn2 = capi.knn_from_handles(kn, 0, 0, 0, hs, hc, ha)
    assert code == int(KMTPUResult.INVALID_ARGUMENTS)


def test_upload_owns_its_copy():
    """kmtpu_upload must deep-copy the caller's buffer, never borrow it —
    the caller is entitled to free/reuse its memory right after upload
    (the reference always cudaMemcpy's on this path, kmcuda.cc:146-168;
    adoption is a separate deliberate non-owning flag, wrappers.h:16-21).
    jax's CPU backend zero-copy borrows 64-byte-aligned host buffers, so
    allocate an aligned buffer on purpose and prove the handle does not
    see mutations through the caller's pointer."""
    import ctypes

    import numpy as np

    from kmcuda_tpu import capi
    from kmcuda_tpu.utils.errors import KMTPUResult

    n, f = 256, 32
    nbytes = n * f * 4
    # 64-byte-aligned allocation: over-allocate and slice to the boundary
    raw = np.zeros(nbytes + 64, np.uint8)
    addr = raw.ctypes.data_as(ctypes.c_void_p).value
    off = (-addr) % 64
    buf = raw[off:off + nbytes].view(np.float32).reshape(n, f)
    assert buf.ctypes.data_as(ctypes.c_void_p).value % 64 == 0
    rng = np.random.RandomState(3)
    buf[...] = rng.rand(n, f).astype(np.float32)
    snapshot = buf.copy()

    code, h = capi.upload_from_pointer(
        buf.ctypes.data_as(ctypes.c_void_p).value, n, f, 0)
    assert code == int(KMTPUResult.SUCCESS) and h > 0

    # caller scribbles over (and conceptually frees) its buffer
    buf[...] = -1.0

    got = np.zeros_like(snapshot)
    assert capi.fetch_to_pointer(
        h, got.ctypes.data_as(ctypes.c_void_p).value, got.nbytes) == \
        int(KMTPUResult.SUCCESS)
    np.testing.assert_array_equal(got, snapshot)
    assert capi.release_handle(h) == int(KMTPUResult.SUCCESS)
