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


# ---------------------------------------------------------------------------
# Device-handle protocol — the TPU-native analog of the reference's raw
# device-pointer protocol (python.cc:232-313, kmcuda.cc:96-102).  TPU HBM
# is not client-addressable, so device residency crosses the C ABI as
# opaque int64 handles into this process-wide registry of jax.Arrays.
# A C caller uploads samples once, runs kmeans_device -> knn_device on the
# handles, and fetches only the final result: nothing round-trips through
# host memory between stages, which is exactly what kmcuda's
# device_ptrs >= 0 path buys its GPU callers.

_handles: dict = {}
_next_handle = 1  # 0 is the invalid handle


def _register(arr) -> int:
    global _next_handle
    h = _next_handle
    _next_handle += 1
    _handles[h] = arr
    return h


def upload_from_pointer(ptr, rows, cols, fp16x2):
    """Copy a host float matrix to the device.  Returns (code, handle).

    Ownership contract (matches the reference's explicit-copy semantics,
    kmcuda.cc:146-168 / wrappers.h:16-21): the handle NEVER aliases the
    caller's memory — the caller may free or reuse its buffer immediately
    after this returns.  jnp.asarray alone is not enough: on the CPU
    backend it zero-copy borrows suitably aligned host buffers, so we
    snapshot into an owned ndarray first and hand jax a buffer whose only
    reference jax itself holds."""
    try:
        _platform_setup()
        import jax.numpy as jnp

        dtype = np.float16 if fp16x2 else np.float32
        f_real = int(cols) * 2 if fp16x2 else int(cols)
        host = _as_array(ptr, (int(rows), f_real), dtype)
        owned = np.array(host, copy=True)
        del host
        return int(KMTPUResult.SUCCESS), _register(jnp.asarray(owned))
    except Exception as exc:  # noqa: BLE001
        if int(os.environ.get("KMTPU_CAPI_DEBUG", "0")):
            import traceback

            traceback.print_exc()
        return _result_of(exc), 0


def handle_shape(handle):
    """Returns (code, rows, cols, itemsize) of a device handle."""
    arr = _handles.get(int(handle))
    if arr is None:
        return int(KMTPUResult.INVALID_ARGUMENTS), 0, 0, 0
    rows = int(arr.shape[0]) if arr.ndim >= 1 else 1
    cols = int(arr.shape[1]) if arr.ndim >= 2 else 1
    return (int(KMTPUResult.SUCCESS), rows, cols,
            int(np.dtype(arr.dtype).itemsize))


def fetch_to_pointer(handle, ptr, dst_size):
    """Device -> host copy of a handle's array.  Returns code."""
    try:
        arr = _handles.get(int(handle))
        if arr is None:
            return int(KMTPUResult.INVALID_ARGUMENTS)
        host = np.asarray(arr)  # the one D2H of the pipeline
        if host.nbytes > int(dst_size):
            return int(KMTPUResult.INVALID_ARGUMENTS)
        dst = (ctypes.c_char * host.nbytes).from_address(int(ptr))
        np.frombuffer(dst, dtype=host.dtype).reshape(host.shape)[...] = host
        return int(KMTPUResult.SUCCESS)
    except Exception as exc:  # noqa: BLE001
        return _result_of(exc)


def release_handle(handle):
    """Drop a handle; the device buffer frees when jax drops it. Returns
    code (INVALID_ARGUMENTS for an unknown/already-released handle)."""
    return (int(KMTPUResult.SUCCESS)
            if _handles.pop(int(handle), None) is not None
            else int(KMTPUResult.INVALID_ARGUMENTS))


def kmeans_from_handles(init, afkmc2_m, tolerance, yinyang_t, metric,
                        clusters_size, seed, device, verbosity,
                        samples_handle, import_handle, want_average):
    """Device-resident k-means.  Returns (code, centroids_handle,
    assignments_handle, average_distance)."""
    try:
        _platform_setup()
        from kmcuda_tpu import kmeans_tpu
        from kmcuda_tpu.models.initialization import InitMethod

        samples = _handles.get(int(samples_handle))
        if samples is None:
            return int(KMTPUResult.INVALID_ARGUMENTS), 0, 0, 0.0

        method = InitMethod(init)
        if method == InitMethod.IMPORT:
            init_arg = _handles.get(int(import_handle))
            if init_arg is None:
                return int(KMTPUResult.INVALID_ARGUMENTS), 0, 0, 0.0
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
        avg = float(res[2]) if want_average else 0.0
        return (int(KMTPUResult.SUCCESS), _register(res[0]),
                _register(res[1]), avg)
    except Exception as exc:  # noqa: BLE001
        if int(os.environ.get("KMTPU_CAPI_DEBUG", "0")):
            import traceback

            traceback.print_exc()
        return _result_of(exc), 0, 0, 0.0


def knn_from_handles(k, metric, device, verbosity, samples_handle,
                     centroids_handle, assignments_handle):
    """Device-resident k-nn.  Returns (code, neighbors_handle)."""
    try:
        _platform_setup()
        from kmcuda_tpu import knn_tpu

        samples = _handles.get(int(samples_handle))
        centroids = _handles.get(int(centroids_handle))
        assignments = _handles.get(int(assignments_handle))
        if samples is None or centroids is None or assignments is None:
            return int(KMTPUResult.INVALID_ARGUMENTS), 0

        nbr = knn_tpu(int(k), samples, centroids, assignments,
                      metric=int(metric), device=int(device),
                      verbosity=int(verbosity))
        return int(KMTPUResult.SUCCESS), _register(nbr)
    except Exception as exc:  # noqa: BLE001
        if int(os.environ.get("KMTPU_CAPI_DEBUG", "0")):
            import traceback

            traceback.print_exc()
        return _result_of(exc), 0
