"""Pointer-marshaling bridge for the C ABI (native/kmtpu.cc).

The native shim embeds CPython and calls these two functions with raw host
addresses; they wrap the memory zero-copy with numpy, run the regular
Python API, and copy results back into the caller's buffers — the same
contract as the reference's C API host path (kmcuda.cc:402-531).

Error handling: exceptions are mapped to KMTPUResult codes here (so the C
side only moves an int), mirroring python.cc:365-409 in reverse.
"""

import ctypes
import os

import numpy as np

from kmcuda_tpu.utils.errors import KMTPUError, KMTPUResult


def _platform_setup():
    """Honor KMTPU_PLATFORM before the first jax use (the embedded
    interpreter has no other way to pick the backend)."""
    plat = os.environ.get("KMTPU_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized


def _as_array(ptr: int, shape, dtype):
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    buf = (ctypes.c_char * size).from_address(ptr)
    return np.frombuffer(buf, dtype=dtype).reshape(shape)


def _result_of(exc: Exception) -> int:
    if isinstance(exc, KMTPUError):
        return int(exc.result)
    if isinstance(exc, (ValueError, TypeError)):
        return int(KMTPUResult.INVALID_ARGUMENTS)
    if isinstance(exc, MemoryError):
        return int(KMTPUResult.MEMORY_ALLOCATION_FAILURE)
    return int(KMTPUResult.RUNTIME_ERROR)


def kmeans_from_pointers(init, afkmc2_m, tolerance, yinyang_t, metric,
                         samples_size, features_size, clusters_size, seed,
                         device, fp16x2, verbosity, samples_ptr,
                         centroids_ptr, assignments_ptr, want_average):
    """Returns (KMTPUResult int, average_distance float)."""
    try:
        _platform_setup()
        from kmcuda_tpu import kmeans_tpu
        from kmcuda_tpu.models.initialization import InitMethod

        dtype = np.float16 if fp16x2 else np.float32
        # fp16x2 packs two halves per lane: features_size is half the real
        # feature count (kmcuda.h:107-109)
        f_real = features_size * 2 if fp16x2 else features_size
        samples = _as_array(samples_ptr, (samples_size, f_real), dtype)
        out_c = _as_array(centroids_ptr, (clusters_size, f_real), dtype)
        out_a = _as_array(assignments_ptr, (samples_size,), np.uint32)

        method = InitMethod(init)
        if method == InitMethod.IMPORT:
            # import reads the initial centroids from the output buffer,
            # like the reference (kmcuda.cc:224-244)
            init_arg = out_c.copy()
        elif method == InitMethod.AFKMC2:
            init_arg = ("afkmc2", int(afkmc2_m))
        elif method == InitMethod.PLUS_PLUS:
            init_arg = "k-means++"
        else:
            init_arg = "random"

        res = kmeans_tpu(
            samples, int(clusters_size), tolerance=float(tolerance),
            init=init_arg, yinyang_t=float(yinyang_t), metric=int(metric),
            average_distance=bool(want_average), seed=int(seed),
            device=int(device), verbosity=int(verbosity))
        centroids, assignments = res[0], res[1]
        out_c[...] = centroids.astype(dtype)
        out_a[...] = assignments
        avg = float(res[2]) if want_average else 0.0
        return int(KMTPUResult.SUCCESS), avg
    except Exception as exc:  # noqa: BLE001 — everything maps to a code
        if int(os.environ.get("KMTPU_CAPI_DEBUG", "0")):
            import traceback

            traceback.print_exc()
        return _result_of(exc), 0.0


def knn_from_pointers(k, metric, samples_size, features_size, clusters_size,
                      device, fp16x2, verbosity, samples_ptr, centroids_ptr,
                      assignments_ptr, neighbors_ptr):
    """Returns KMTPUResult int."""
    try:
        _platform_setup()
        from kmcuda_tpu import knn_tpu

        dtype = np.float16 if fp16x2 else np.float32
        f_real = features_size * 2 if fp16x2 else features_size
        samples = _as_array(samples_ptr, (samples_size, f_real), dtype)
        centroids = _as_array(centroids_ptr, (clusters_size, f_real), dtype)
        assignments = _as_array(assignments_ptr, (samples_size,), np.uint32)
        out_n = _as_array(neighbors_ptr, (samples_size, k), np.uint32)

        nbr = knn_tpu(int(k), samples, centroids.astype(np.float32),
                      assignments, metric=int(metric), device=int(device),
                      verbosity=int(verbosity))
        out_n[...] = nbr
        return int(KMTPUResult.SUCCESS)
    except Exception as exc:  # noqa: BLE001
        if int(os.environ.get("KMTPU_CAPI_DEBUG", "0")):
            import traceback

            traceback.print_exc()
        return _result_of(exc)
