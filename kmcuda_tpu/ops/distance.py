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
