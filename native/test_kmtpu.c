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

  printf("KMTPU_SMOKE_OK\n");
  return 0;
}
