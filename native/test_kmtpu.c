/* C ABI smoke test: cluster 4 well-separated 2-D blobs through the
 * kmcuda-compatible entry points and verify the structure of the result.
 * Prints "KMTPU_SMOKE_OK" on success (the Python test asserts on it). */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "include/kmtpu.h"

#define N 4096u
#define F 2u
#define K 4u
#define NN 5u

static float frand(void) { return (float)rand() / (float)RAND_MAX; }

int main(void) {
  static float samples[N * F];
  static float centroids[K * F];
  static uint32_t assignments[N];
  static uint32_t neighbors[N * NN];
  float average_distance = -1.0f;
  const float offs[K][2] = {{0, 0}, {8, 0}, {0, 8}, {8, 8}};

  srand(7);
  for (uint32_t i = 0; i < N; i++) {
    const float *o = offs[i % K];
    samples[i * F] = o[0] + frand();
    samples[i * F + 1] = o[1] + frand();
  }

  KMTPUResult r = kmeans_cuda(
      kmtpuInitMethodPlusPlus, NULL, 0.01f, 0.0f, kmtpuDistanceMetricL2,
      N, F, K, 77, 0, -1, 0, 1, samples, centroids, assignments,
      &average_distance);
  if (r != kmtpuSuccess) {
    fprintf(stderr, "kmeans_cuda failed: %d\n", (int)r);
    return 1;
  }
  for (uint32_t i = 0; i < N; i++) {
    if (assignments[i] >= K) {
      fprintf(stderr, "bad assignment %u at %u\n", assignments[i], i);
      return 1;
    }
  }
  /* every centroid must sit inside one blob (within its unit square) */
  for (uint32_t c = 0; c < K; c++) {
    float cx = centroids[c * F], cy = centroids[c * F + 1];
    int ok = 0;
    for (uint32_t b = 0; b < K; b++) {
      if (cx > offs[b][0] - 0.5f && cx < offs[b][0] + 1.5f &&
          cy > offs[b][1] - 0.5f && cy < offs[b][1] + 1.5f) {
        ok = 1;
      }
    }
    if (!ok) {
      fprintf(stderr, "centroid %u off-blob: (%f, %f)\n", c, cx, cy);
      return 1;
    }
  }
  if (!(average_distance > 0.0f && average_distance < 2.0f)) {
    fprintf(stderr, "bad average_distance %f\n", average_distance);
    return 1;
  }

  /* invalid arguments must report, not crash */
  r = kmeans_cuda(kmtpuInitMethodRandom, NULL, 100.0f, 0.0f,
                  kmtpuDistanceMetricL2, N, F, K, 77, 0, -1, 0, 0, samples,
                  centroids, assignments, NULL);
  if (r != kmtpuInvalidArguments) {
    fprintf(stderr, "expected InvalidArguments, got %d\n", (int)r);
    return 1;
  }

  r = knn_cuda(NN, kmtpuDistanceMetricL2, N, F, K, 0, -1, 0, 1, samples,
               centroids, assignments, neighbors);
  if (r != kmtpuSuccess) {
    fprintf(stderr, "knn_cuda failed: %d\n", (int)r);
    return 1;
  }
  /* neighbors must be same-cluster-dominant and never self */
  for (uint32_t i = 0; i < N; i++) {
    for (uint32_t j = 0; j < NN; j++) {
      uint32_t nb = neighbors[i * NN + j];
      if (nb == i || nb >= N) {
        fprintf(stderr, "bad neighbor %u of %u\n", nb, i);
        return 1;
      }
      float dx = samples[i * F] - samples[nb * F];
      float dy = samples[i * F + 1] - samples[nb * F + 1];
      if (sqrtf(dx * dx + dy * dy) > 2.0f) {
        fprintf(stderr, "far neighbor %u of %u\n", nb, i);
        return 1;
      }
    }
  }

  /* device-handle pipeline: upload once, kmeans -> knn on handles with
   * no host round-trip, fetch, and require bit-identical results to the
   * host-pointer path above (same data, same seed, same code). */
  {
    static uint32_t assignments2[N];
    static uint32_t neighbors2[N * NN];
    KMTPUHandle hs = 0, hc = 0, ha = 0, hn = 0;
    uint32_t rows = 0, cols = 0, isz = 0;
    float avg2 = -1.0f;

    r = kmtpu_upload(samples, N, F, 0, &hs);
    if (r != kmtpuSuccess || hs == 0) {
      fprintf(stderr, "kmtpu_upload failed: %d\n", (int)r);
      return 1;
    }
    r = kmtpu_kmeans_device(kmtpuInitMethodPlusPlus, NULL, 0.01f, 0.0f,
                            kmtpuDistanceMetricL2, K, 77, 0, 0, hs, 0,
                            &hc, &ha, &avg2);
    if (r != kmtpuSuccess || hc == 0 || ha == 0) {
      fprintf(stderr, "kmtpu_kmeans_device failed: %d\n", (int)r);
      return 1;
    }
    if (fabsf(avg2 - average_distance) > 1e-6f) {
      fprintf(stderr, "device avg %f != host avg %f\n", avg2,
              average_distance);
      return 1;
    }
    r = kmtpu_knn_device(NN, kmtpuDistanceMetricL2, 0, 0, hs, hc, ha, &hn);
    if (r != kmtpuSuccess || hn == 0) {
      fprintf(stderr, "kmtpu_knn_device failed: %d\n", (int)r);
      return 1;
    }
    r = kmtpu_handle_shape(hn, &rows, &cols, &isz);
    if (r != kmtpuSuccess || rows != N || cols != NN || isz != 4) {
      fprintf(stderr, "bad neighbors shape %u x %u x %u\n", rows, cols,
              isz);
      return 1;
    }
    /* a short fetch buffer must be rejected, not overrun */
    r = kmtpu_fetch(hn, neighbors2, (uint64_t)N * NN * 4 - 1);
    if (r != kmtpuInvalidArguments) {
      fprintf(stderr, "short fetch not rejected: %d\n", (int)r);
      return 1;
    }
    r = kmtpu_fetch(ha, assignments2, (uint64_t)N * 4);
    if (r != kmtpuSuccess) {
      fprintf(stderr, "fetch(assignments) failed: %d\n", (int)r);
      return 1;
    }
    r = kmtpu_fetch(hn, neighbors2, (uint64_t)N * NN * 4);
    if (r != kmtpuSuccess) {
      fprintf(stderr, "fetch(neighbors) failed: %d\n", (int)r);
      return 1;
    }
    for (uint32_t i = 0; i < N; i++) {
      if (assignments2[i] != assignments[i]) {
        fprintf(stderr, "device assignment mismatch at %u\n", i);
        return 1;
      }
    }
    for (uint32_t i = 0; i < N * NN; i++) {
      if (neighbors2[i] != neighbors[i]) {
        fprintf(stderr, "device neighbor mismatch at %u\n", i);
        return 1;
      }
    }
    if (kmtpu_release(hs) != kmtpuSuccess ||
        kmtpu_release(hc) != kmtpuSuccess ||
        kmtpu_release(ha) != kmtpuSuccess ||
        kmtpu_release(hn) != kmtpuSuccess) {
      fprintf(stderr, "kmtpu_release failed\n");
      return 1;
    }
    /* double release and stale use must report, not crash */
    if (kmtpu_release(hn) != kmtpuInvalidArguments) {
      fprintf(stderr, "double release not rejected\n");
      return 1;
    }
    r = kmtpu_knn_device(NN, kmtpuDistanceMetricL2, 0, 0, hs, hc, ha, &hn);
    if (r != kmtpuInvalidArguments) {
      fprintf(stderr, "stale handle use not rejected: %d\n", (int)r);
      return 1;
    }
    printf("KMTPU_DEVICE_PIPELINE_OK\n");
  }

  printf("KMTPU_SMOKE_OK\n");
  return 0;
}
