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
 *  - device_ptrs must be negative (host pointers).  TPU device buffers are
 *    not addressable by raw pointers; the jax.Array path of the Python API
 *    is the device-resident analog.
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
