/*
 * libKMTPU C ABI implementation.
 *
 * The reference implements its C API as host orchestration over CUDA
 * (src/kmcuda.cc); the TPU equivalent drives the XLA runtime, whose
 * supported process entry point is Python/JAX.  This shim embeds one
 * CPython interpreter per process, imports kmcuda_tpu.capi, and forwards
 * raw host pointers — the Python side wraps them zero-copy with numpy.
 * Marshaling cost is O(1) per call; the heavy lifting (upload, compile,
 * iterate) happens exactly once inside the library, same as the Python
 * path.
 */

#include <Python.h>

#include <cstdio>

#include "include/kmtpu.h"

namespace {

PyObject *g_capi = nullptr;  // kmcuda_tpu.capi module, owned

bool ensure_python() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
  if (g_capi == nullptr) {
    g_capi = PyImport_ImportModule("kmcuda_tpu.capi");
    if (g_capi == nullptr) {
      PyErr_Print();
      std::fprintf(stderr,
                   "kmtpu: cannot import kmcuda_tpu.capi — is the package "
                   "on PYTHONPATH?\n");
      return false;
    }
  }
  return true;
}

class GilGuard {
 public:
  GilGuard() : state_(PyGILState_Ensure()) {}
  ~GilGuard() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

}  // namespace

extern "C" {

KMTPUResult kmtpu_kmeans(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t seed,
    uint32_t device, int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, float *centroids, uint32_t *assignments,
    float *average_distance) {
  if (device_ptrs >= 0) {
    std::fprintf(stderr,
                 "kmtpu: device_ptrs >= 0 is not supported on TPU; pass "
                 "host pointers (use the Python jax.Array API for "
                 "device-resident data)\n");
    return kmtpuInvalidArguments;
  }
  if (samples == nullptr || centroids == nullptr || assignments == nullptr) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  uint32_t m = 0;
  if (init == kmtpuInitMethodAFKMC2 && init_params != nullptr) {
    m = *reinterpret_cast<const uint32_t *>(init_params);
  }
  PyObject *res = PyObject_CallMethod(
      g_capi, "kmeans_from_pointers", "IIffIIIIIIiiKKKi",
      static_cast<unsigned int>(init), static_cast<unsigned int>(m),
      static_cast<double>(tolerance), static_cast<double>(yinyang_t),
      static_cast<unsigned int>(metric), samples_size,
      static_cast<unsigned int>(features_size), clusters_size, seed, device,
      static_cast<int>(fp16x2), static_cast<int>(verbosity),
      reinterpret_cast<unsigned long long>(samples),
      reinterpret_cast<unsigned long long>(centroids),
      reinterpret_cast<unsigned long long>(assignments),
      average_distance != nullptr ? 1 : 0);
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  int code = 0;
  double avg = 0.0;
  if (!PyArg_ParseTuple(res, "id", &code, &avg)) {
    Py_DECREF(res);
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  Py_DECREF(res);
  if (average_distance != nullptr && code == 0) {
    *average_distance = static_cast<float>(avg);
  }
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_knn(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t device,
    int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, const float *centroids,
    const uint32_t *assignments, uint32_t *neighbors) {
  if (device_ptrs >= 0) {
    std::fprintf(stderr,
                 "kmtpu: device_ptrs >= 0 is not supported on TPU\n");
    return kmtpuInvalidArguments;
  }
  if (samples == nullptr || centroids == nullptr || assignments == nullptr ||
      neighbors == nullptr) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(
      g_capi, "knn_from_pointers", "IIIIIIiiKKKK",
      static_cast<unsigned int>(k), static_cast<unsigned int>(metric),
      samples_size, static_cast<unsigned int>(features_size), clusters_size,
      device, static_cast<int>(fp16x2), static_cast<int>(verbosity),
      reinterpret_cast<unsigned long long>(samples),
      reinterpret_cast<unsigned long long>(centroids),
      reinterpret_cast<unsigned long long>(assignments),
      reinterpret_cast<unsigned long long>(neighbors));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  long code = PyLong_AsLong(res);
  Py_DECREF(res);
  if (code < 0 && PyErr_Occurred()) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  return static_cast<KMTPUResult>(code);
}

/* ---- device-handle protocol (see kmtpu.h) ------------------------- */

KMTPUResult kmtpu_upload(const void *data, uint32_t rows, uint32_t cols,
                         int32_t fp16x2, KMTPUHandle *handle) {
  if (data == nullptr || handle == nullptr || rows == 0 || cols == 0) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(
      g_capi, "upload_from_pointer", "KIIi",
      reinterpret_cast<unsigned long long>(data), rows, cols,
      static_cast<int>(fp16x2));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  int code = 0;
  long long h = 0;
  if (!PyArg_ParseTuple(res, "iL", &code, &h)) {
    Py_DECREF(res);
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  Py_DECREF(res);
  if (code == 0) {
    *handle = static_cast<KMTPUHandle>(h);
  }
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_handle_shape(KMTPUHandle handle, uint32_t *rows,
                               uint32_t *cols, uint32_t *itemsize) {
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(g_capi, "handle_shape", "L",
                                      static_cast<long long>(handle));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  int code = 0;
  unsigned int r = 0, c = 0, isz = 0;
  if (!PyArg_ParseTuple(res, "iIII", &code, &r, &c, &isz)) {
    Py_DECREF(res);
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  Py_DECREF(res);
  if (code == 0) {
    if (rows != nullptr) *rows = r;
    if (cols != nullptr) *cols = c;
    if (itemsize != nullptr) *itemsize = isz;
  }
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_fetch(KMTPUHandle handle, void *dst, uint64_t dst_size) {
  if (dst == nullptr) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(
      g_capi, "fetch_to_pointer", "LKK", static_cast<long long>(handle),
      reinterpret_cast<unsigned long long>(dst),
      static_cast<unsigned long long>(dst_size));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  long code = PyLong_AsLong(res);
  Py_DECREF(res);
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_release(KMTPUHandle handle) {
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(g_capi, "release_handle", "L",
                                      static_cast<long long>(handle));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  long code = PyLong_AsLong(res);
  Py_DECREF(res);
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_kmeans_device(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t clusters_size,
    uint32_t seed, uint32_t device, int32_t verbosity,
    KMTPUHandle samples, KMTPUHandle import_centroids,
    KMTPUHandle *centroids, KMTPUHandle *assignments,
    float *average_distance) {
  if (centroids == nullptr || assignments == nullptr || samples == 0) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  uint32_t m = 0;
  if (init == kmtpuInitMethodAFKMC2 && init_params != nullptr) {
    m = *reinterpret_cast<const uint32_t *>(init_params);
  }
  PyObject *res = PyObject_CallMethod(
      g_capi, "kmeans_from_handles", "IIffIIIIiLLi",
      static_cast<unsigned int>(init), static_cast<unsigned int>(m),
      static_cast<double>(tolerance), static_cast<double>(yinyang_t),
      static_cast<unsigned int>(metric), clusters_size, seed, device,
      static_cast<int>(verbosity), static_cast<long long>(samples),
      static_cast<long long>(import_centroids),
      average_distance != nullptr ? 1 : 0);
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  int code = 0;
  long long hc = 0, ha = 0;
  double avg = 0.0;
  if (!PyArg_ParseTuple(res, "iLLd", &code, &hc, &ha, &avg)) {
    Py_DECREF(res);
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  Py_DECREF(res);
  if (code == 0) {
    *centroids = static_cast<KMTPUHandle>(hc);
    *assignments = static_cast<KMTPUHandle>(ha);
    if (average_distance != nullptr) {
      *average_distance = static_cast<float>(avg);
    }
  }
  return static_cast<KMTPUResult>(code);
}

KMTPUResult kmtpu_knn_device(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t device,
    int32_t verbosity, KMTPUHandle samples, KMTPUHandle centroids,
    KMTPUHandle assignments, KMTPUHandle *neighbors) {
  if (neighbors == nullptr) {
    return kmtpuInvalidArguments;
  }
  if (!ensure_python()) {
    return kmtpuRuntimeError;
  }
  GilGuard gil;
  PyObject *res = PyObject_CallMethod(
      g_capi, "knn_from_handles", "IIIiLLL",
      static_cast<unsigned int>(k), static_cast<unsigned int>(metric),
      device, static_cast<int>(verbosity), static_cast<long long>(samples),
      static_cast<long long>(centroids),
      static_cast<long long>(assignments));
  if (res == nullptr) {
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  int code = 0;
  long long hn = 0;
  if (!PyArg_ParseTuple(res, "iL", &code, &hn)) {
    Py_DECREF(res);
    PyErr_Print();
    return kmtpuRuntimeError;
  }
  Py_DECREF(res);
  if (code == 0) {
    *neighbors = static_cast<KMTPUHandle>(hn);
  }
  return static_cast<KMTPUResult>(code);
}

/* kmcuda-compatible aliases */
KMTPUResult kmeans_cuda(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t seed,
    uint32_t device, int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, float *centroids, uint32_t *assignments,
    float *average_distance) {
  return kmtpu_kmeans(init, init_params, tolerance, yinyang_t, metric,
                      samples_size, features_size, clusters_size, seed,
                      device, device_ptrs, fp16x2, verbosity, samples,
                      centroids, assignments, average_distance);
}

KMTPUResult knn_cuda(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t device,
    int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, const float *centroids,
    const uint32_t *assignments, uint32_t *neighbors) {
  return kmtpu_knn(k, metric, samples_size, features_size, clusters_size,
                   device, device_ptrs, fp16x2, verbosity, samples,
                   centroids, assignments, neighbors);
}

}  // extern "C"
