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
