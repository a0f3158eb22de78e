/*
 * libKMTPU public C API — source-compatible with kmcuda's two entry points
 * (reference src/kmcuda.h:118-155): a C caller of kmeans_cuda/knn_cuda can
 * relink against libkmtpu and keep its call sites (the kmeans_cuda/knn_cuda
 * names are exported as aliases).
 *
 * The implementation drives the TPU through an embedded CPython interpreter
 * running the kmcuda_tpu package; the interpreter is initialized lazily on
 * the first call and shared by all subsequent calls.  Calls are NOT thread
 * safe (neither is the reference, kmcuda.h:25-27).
 *
 * Differences from kmcuda, by design:
 *  - device_ptrs must be negative (host pointers) in the kmcuda-shaped
 *    entry points.  TPU device buffers are not addressable by raw
 *    pointers; device-resident I/O (the reference's device_ptrs >= 0
 *    protocol, python.cc:232-313) is instead expressed with the opaque
 *    KMTPUHandle API below: upload once, chain kmtpu_kmeans_device ->
 *    kmtpu_knn_device on handles with no host round-trip, fetch results.
 *  - fp16x2 selects bfloat16 storage with fp32 accumulation; the memory
 *    layout contract is unchanged (features_size is half the real value and
 *    the buffer holds 2*features_size IEEE half floats per sample).
 */

#ifndef KMTPU_H_
#define KMTPU_H_

#include <stdint.h>

/* Value-compatible with KMCUDAResult (kmcuda.h:41-54). */
typedef enum {
  kmtpuSuccess = 0,
  kmtpuInvalidArguments,
  kmtpuNoSuchDevice,
  kmtpuMemoryAllocationFailure,
  kmtpuRuntimeError,
  kmtpuMemoryCopyError
} KMTPUResult;

/* Value-compatible with KMCUDAInitMethod (kmcuda.h:57-72). */
typedef enum {
  kmtpuInitMethodRandom = 0,
  kmtpuInitMethodPlusPlus,
  kmtpuInitMethodAFKMC2,
  kmtpuInitMethodImport
} KMTPUInitMethod;

/* Value-compatible with KMCUDADistanceMetric (kmcuda.h:75-81). */
typedef enum {
  kmtpuDistanceMetricL2 = 0,
  kmtpuDistanceMetricCosine
} KMTPUDistanceMetric;

#ifdef __cplusplus
extern "C" {
#endif

/* K-means clustering on TPU.  Argument-for-argument the reference's
 * kmeans_cuda (kmcuda.h:118-123); see the file header for deviations. */
KMTPUResult kmtpu_kmeans(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t seed,
    uint32_t device, int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, float *centroids, uint32_t *assignments,
    float *average_distance);

/* Exact k-nn over precomputed clusters.  Argument-for-argument the
 * reference's knn_cuda (kmcuda.h:150-155). */
KMTPUResult kmtpu_knn(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t device,
    int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, const float *centroids,
    const uint32_t *assignments, uint32_t *neighbors);

/* ------------------------------------------------------------------ *
 * Device-handle protocol: the TPU-native analog of kmcuda's raw
 * device-pointer protocol (reference python.cc:232-313).  A handle is an
 * opaque id for a device-resident array owned by the library; 0 is never
 * a valid handle.  Arrays stay in HBM between calls, so the k-means ->
 * k-nn pipeline pays exactly one upload and one fetch.
 * ------------------------------------------------------------------ */
typedef int64_t KMTPUHandle;

/* Copy a host float matrix (rows x cols, row-major) to the device.  With
 * fp16x2 != 0 the buffer holds 2*cols IEEE half floats per row, like the
 * kmeans/knn entry points (kmcuda.h:107-109). */
KMTPUResult kmtpu_upload(const void *data, uint32_t rows, uint32_t cols,
                         int32_t fp16x2, KMTPUHandle *handle);

/* Shape and element size of a handle's array (cols = 1 for vectors). */
KMTPUResult kmtpu_handle_shape(KMTPUHandle handle, uint32_t *rows,
                               uint32_t *cols, uint32_t *itemsize);

/* Copy a handle's array to host memory.  dst_size (bytes) must be at
 * least rows*cols*itemsize; returns InvalidArguments otherwise. */
KMTPUResult kmtpu_fetch(KMTPUHandle handle, void *dst, uint64_t dst_size);

/* Release a handle.  The device buffer is freed once the library drops
 * its last internal reference. */
KMTPUResult kmtpu_release(KMTPUHandle handle);

/* K-means over a device-resident samples handle.  Sample count, feature
 * count and dtype come from the handle; centroids + assignments are
 * returned as device handles (fetch or chain them).  import_centroids is
 * read only for kmtpuInitMethodImport (pass 0 otherwise). */
KMTPUResult kmtpu_kmeans_device(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t clusters_size,
    uint32_t seed, uint32_t device, int32_t verbosity,
    KMTPUHandle samples, KMTPUHandle import_centroids,
    KMTPUHandle *centroids, KMTPUHandle *assignments,
    float *average_distance);

/* Exact k-nn over device-resident handles (typically the outputs of
 * kmtpu_kmeans_device); neighbors is returned as a device handle to a
 * (samples x k) uint32 matrix. */
KMTPUResult kmtpu_knn_device(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t device,
    int32_t verbosity, KMTPUHandle samples, KMTPUHandle centroids,
    KMTPUHandle assignments, KMTPUHandle *neighbors);

/* Drop-in aliases for kmcuda call sites. */
KMTPUResult kmeans_cuda(
    KMTPUInitMethod init, const void *init_params, float tolerance,
    float yinyang_t, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t seed,
    uint32_t device, int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, float *centroids, uint32_t *assignments,
    float *average_distance);

KMTPUResult knn_cuda(
    uint16_t k, KMTPUDistanceMetric metric, uint32_t samples_size,
    uint16_t features_size, uint32_t clusters_size, uint32_t device,
    int32_t device_ptrs, int32_t fp16x2, int32_t verbosity,
    const float *samples, const float *centroids,
    const uint32_t *assignments, uint32_t *neighbors);

#ifdef __cplusplus
}
#endif

#endif  /* KMTPU_H_ */
