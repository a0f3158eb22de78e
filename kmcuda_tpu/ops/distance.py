"""Metric abstraction — the TPU rebuild of the reference's METRIC<M, F> family.

The reference implements distances as per-thread Kahan-compensated dot loops
templated over metric and dtype (reference src/metric_abstraction.h:12-303).
On TPU the same quantities are MXU matmuls with fp32 accumulation:

- L2:      d^2(x, c) = |x|^2 + |c|^2 - 2 <x, c>   (one X @ C^T per tile)
- angular: d(x, c)   = acos(clip(<x, c>, -1, 1))  (unit-norm inputs assumed,
           exactly like the reference, metric_abstraction.h:147-177)

For *assignment* (argmin over clusters) the per-sample constant |x|^2 is
irrelevant, so the kernels rank clusters by a cheaper monotone "score":

- L2:      score = |c|^2 - 2 <x, c>        (= d^2 - |x|^2)
- angular: score = -<x, c>                 (= -cos d, monotone in d)

:func:`finalize_distance` converts scores back to true distances when a
distance value is actually needed (bounds, average_distance, k-nn).

Everything accumulates in fp32 regardless of storage dtype
(``preferred_element_type``), which replaces both the reference's Kahan
summation and its fp16x2 accumulation shims (fp_abstraction.h:100-182).
"""

import enum

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kmcuda_tpu import config


class DistanceMetric(enum.IntEnum):
    """Value-compatible with KMCUDADistanceMetric (kmcuda.h:75-81)."""

    L2 = 0
    COSINE = 1


#: string -> enum map for wrappers, like the reference's ``metrics`` dict
#: (kmcuda.h:177-183).
metrics = {
    "euclidean": DistanceMetric.L2,
    "L2": DistanceMetric.L2,
    "l2": DistanceMetric.L2,
    "cos": DistanceMetric.COSINE,
    "cosine": DistanceMetric.COSINE,
    "angular": DistanceMetric.COSINE,
}


def mm_precision(dtype):
    """Matmul precision policy: fp32 storage gets fp32-grade matmuls
    (lax.Precision.HIGHEST — the reference computes fp32 throughout);
    bf16 storage keeps the fast MXU path (DEFAULT), with filter margins
    widened to match (see rounding_eps)."""
    if jnp.dtype(dtype) == jnp.float32:
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


def rounding_eps(dtype) -> float:
    """Relative error bound for comparisons between *differently computed*
    versions of the same score (rowwise dot vs matmul, natural vs padded
    panel).  Yinyang's filter margins scale with this so bounds stay sound
    under either precision policy."""
    if jnp.dtype(dtype) == jnp.float32:
        return 4e-6
    return 2.0 ** -6


def row_sq_norms(x: jax.Array) -> jax.Array:
    """|x_i|^2 per row, fp32 accumulation regardless of storage dtype."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def scores(x_block: jax.Array, c_t: jax.Array, c_sq: jax.Array,
           penalty: jax.Array, metric: DistanceMetric) -> jax.Array:
    """Monotone distance scores of a sample block against all centroids.

    Args:
      x_block: (B, F) samples (fp32 or bf16).
      c_t:     (F, K_pad) centroids, transposed, same dtype as x_block.
      c_sq:    (K_pad,) centroid squared norms, fp32 (ignored for cosine).
      penalty: (K_pad,) additive fp32 penalty; 0 for real clusters and
               ``config.PAD_PENALTY`` for padded slots, so padding never wins
               the argmin.  This replaces the reference's "skip insane
               centroid" branches (kmeans.cu:466-470).
    Returns:
      (B, K_pad) fp32 scores; NaN scores (NaN centroid == empty cluster,
      kmeans.cu:425-427) are replaced by the penalty so they never win —
      matching the reference where NaN comparisons simply never beat the
      running minimum.
    """
    prod = jnp.dot(x_block, c_t, preferred_element_type=jnp.float32,
                   precision=mm_precision(x_block.dtype))
    if metric == DistanceMetric.L2:
        s = c_sq[None, :] - 2.0 * prod
    else:
        s = -prod
    s = jnp.where(jnp.isfinite(s), s, config.PAD_PENALTY)
    return s + penalty[None, :]


def finalize_distance(score: jax.Array, x_sq: jax.Array,
                      metric: DistanceMetric) -> jax.Array:
    """Convert a score back to the true distance.

    L2 returns the Euclidean distance (with sqrt — the reference's
    METRIC<L2>::distance also takes the sqrt, metric_abstraction.h:55-57,70);
    angular returns acos(cos) like metric_abstraction.h:171-177.
    ``x_sq`` broadcasts against ``score`` (pass (B, 1) against (B, K)).
    """
    if metric == DistanceMetric.L2:
        return jnp.sqrt(jnp.maximum(score + x_sq, 0.0))
    return jnp.arccos(jnp.clip(-score, -1.0, 1.0))


def argmin_lowest_index(score: jax.Array, orig_ids: jax.Array,
                        fill: int) -> tuple[jax.Array, jax.Array]:
    """Argmin over the cluster axis with ties broken by lowest *original*
    centroid id.

    Both the Lloyd path (clusters in natural order) and the Yinyang local
    filter (clusters permuted into padded groups) must pick the same winner
    on exact ties for the reference's Lloyd==Yinyang bit-parity guarantee
    (README.md:74-75).  ``orig_ids`` carries each column's original centroid
    index; ``fill`` is returned when every column is worse than the penalty
    floor (cannot happen for valid inputs, but keeps the op total).

    Returns (best_score (B,), best_id (B,)).
    """
    best = jnp.min(score, axis=1, keepdims=True)
    ids = jnp.where(score <= best, orig_ids[None, :], fill)
    return best[:, 0], jnp.min(ids, axis=1).astype(jnp.uint32)


def argmin_rescored(score, orig_ids, k, xb, c_ext):
    """Batch-layout-independent assignment: exact top-2 rescore.

    The score matmul's per-element rounding depends on how XLA tiles the
    gemm, which depends on the BATCH layout — a gathered (compacted
    Yinyang candidates) operand and a scan-sliced (Lloyd chunk) operand
    can disagree by one ulp per score.  On a knife-edge sample whose two
    nearest centroids sit within that ulp, the raw matmul argmin then
    flips between the two paths, breaking the reference's Lloyd==Yinyang
    bit-parity guarantee (README.md:74-75; its CUDA kernels are immune
    because every path runs the same per-thread Kahan loop,
    kmeans.cu:260-269).  Fix: take the matmul's two best candidates and
    rescore them with the cancellation-free subtract-square form —
    elementwise fp32 ops whose rounding is row-local, hence identical
    under any batching.  A flip would now need THREE centroids inside one
    ulp of the winner (so the true winner misses the matmul top-2), which
    the margin of the second rescore rules out in practice; the knife-edge
    fixture in tests/test_yy_invariants.py locks the observed case.

    Args:
      score:    (B, Kp) fp32 from :func:`scores` (pads/dead penalized).
      orig_ids: (Kp,) int32 column -> original centroid id.
      k:        cluster count (also the fill id).
      xb:       (B, F) sample rows (storage dtype; cast exactly to fp32).
      c_ext:    (k+1, F) fp32 natural-order centroids, NaN (dead) rows
                zeroed, row k zeros — dead/pad candidates are masked by
                their penalized score, never by the table.
    Returns (best (B,) fp32 — the chosen centroid's *matmul* score (the
    units every caller already exposes), aid (B,) uint32, d2 (B,) fp32 —
    the exact squared L2 distance / squared chord of the winner, +inf
    when no eligible centroid exists).
    """
    big = np.float32(config.PAD_PENALTY * 0.5)
    s1, a1 = argmin_lowest_index(score, orig_ids, k)
    smask = jnp.where(orig_ids[None, :] == a1[:, None].astype(jnp.int32),
                      np.float32(np.inf), score)
    s2, a2 = argmin_lowest_index(smask, orig_ids, k)
    xf = xb.astype(jnp.float32)

    def d2_of(aid, s_raw):
        rows = c_ext[jnp.minimum(aid, k).astype(jnp.int32)]
        diff = xf - rows
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.where((aid >= k) | (s_raw >= big), np.float32(np.inf),
                         d2)

    d2a = d2_of(a1, s1)
    d2b = d2_of(a2, s2)
    take_b = (d2b < d2a) | ((d2b == d2a) & (a2 < a1))
    aid = jnp.where(take_b, a2, a1)
    best = jnp.where(take_b, s2, s1)
    d2 = jnp.minimum(d2a, d2b)
    return best, aid, d2


def normalize_centroids(sums: jax.Array, counts: jax.Array,
                        metric: DistanceMetric) -> jax.Array:
    """The reference's METRIC::normalize (metric_abstraction.h:138-144,
    266-302): mean for L2, L2-renormalization for angular.

    Empty clusters yield NaN centroids by design, documented as a feature
    in the reference (kmeans.cu:425-427).  The emptiness test is explicit:
    with incremental delta updates a dying cluster's sums keep fp32
    residue, and residue/0 would be +-inf rather than NaN.
    """
    empty = counts <= 0
    if metric == DistanceMetric.L2:
        out = sums / jnp.where(empty, 1.0, counts)[:, None]
    else:
        norms = jnp.sqrt(jnp.sum(sums * sums, axis=1, keepdims=True))
        out = sums / jnp.where(empty[:, None], 1.0, norms)
    return jnp.where(empty[:, None], jnp.nan, out)


def point_distances(x: jax.Array, x_sq: jax.Array, c: jax.Array,
                    metric: DistanceMetric) -> jax.Array:
    """True distance of every sample to a single point ``c`` (F,) — the
    building block of the k-means++ / AFK-MC2 init loops (the reference's
    ``kmeans_plus_plus`` kernel, kmeans.cu:43-67).  Returns (N,) fp32."""
    prod = jnp.dot(x, c.astype(x.dtype), preferred_element_type=jnp.float32,
                   precision=mm_precision(x.dtype))
    if metric == DistanceMetric.L2:
        cf = c.astype(jnp.float32)
        c_sq = jnp.sum(cf * cf)
        return jnp.sqrt(jnp.maximum(x_sq - 2.0 * prod + c_sq, 0.0))
    return jnp.arccos(jnp.clip(prod, -1.0, 1.0))


def pairwise_distance(a: jax.Array, b: jax.Array,
                      metric: DistanceMetric) -> jax.Array:
    """Dense true-distance matrix between two small row sets (fp32).

    Used for centroid drift (kmeans.cu:488-499) and the k-nn centroid
    distance matrix (knn.cu:62-131) — on TPU both are a single matmul,
    replacing the reference's triangular-block decomposition.
    """
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    prod = jnp.dot(af, bf.T, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    if metric == DistanceMetric.L2:
        sq = (row_sq_norms(af)[:, None] + row_sq_norms(bf)[None, :]
              - 2.0 * prod)
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    return jnp.arccos(jnp.clip(prod, -1.0, 1.0))
