"""Fused Lloyd step: assignment + reassignment count + centroid update.

This is the TPU-native replacement for the reference's three-kernel Lloyd
iteration — ``kmeans_assign_lloyd*`` (reference src/kmeans.cu:215-364),
``check_changed`` (kmeans.cu:697-717) and ``kmeans_adjust``
(kmeans.cu:367-429) plus the P2P broadcasts between them
(kmeans.cu:980-1024).  Design:

- One ``lax.scan`` over sample chunks streams the data set through VMEM once
  per iteration.  Per chunk: an MXU matmul produces distance scores against
  all centroids (the analog of the reference tiling centroids through shared
  memory in ``cstep`` chunks, kmeans.cu:243-258), argmin assigns, and a
  one-hot matmul accumulates the centroid segment-sum — so assignment and
  update read the samples exactly once, where the reference runs two
  separate passes.
- The reference's *incremental* centroid update (±moved samples,
  kmeans.cu:386-423) is a GPU-atomics workaround; a full segment-sum on the
  MXU is the idiomatic TPU form and is bitwise independent of the previous
  iteration, which also makes it deterministic.
- Reassignment counting replaces ``atomicAggInc(&d_changed_number)`` +
  ``cudaMemcpyFromSymbol`` (kmeans.cu:285-290, 697-717) with a ``sum`` that
  is ``psum``-reduced across the mesh.
- Multi-device: the caller wraps the step in ``shard_map`` with the sample
  axis sharded; the trailing ``psum``s replace the reference's full-mesh
  ``cudaMemcpyPeerAsync`` broadcasts (private.h:177-183).

Semantics preserved from the reference:
- invalid (non-finite) samples are assigned cluster id == n_clusters and
  never contribute to any centroid (kmeans.cu:276-284);
- empty clusters produce NaN centroids (kmeans.cu:425-427);
- NaN centroids never win an assignment (their score is replaced by the
  padding penalty, mirroring how NaN comparisons never beat the running
  minimum in the CUDA kernels).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D


def pad_clusters(centroids: jax.Array, storage_dtype) -> tuple:
    """Pad the cluster axis to a lane multiple.

    Returns (c_t (F, Kp) in storage dtype, c_sq (Kp,) fp32,
    penalty (Kp,) fp32, orig_ids (Kp,) int32).
    """
    k, f = centroids.shape
    kp = -(-k // config.LANE) * config.LANE
    c = jnp.zeros((kp, f), jnp.float32).at[:k].set(
        centroids.astype(jnp.float32))
    c_sq = D.row_sq_norms(c)
    ids = lax.broadcasted_iota(jnp.int32, (kp, 1), 0)[:, 0]
    penalty = jnp.where(ids < k, 0.0, config.PAD_PENALTY).astype(jnp.float32)
    return c.T.astype(storage_dtype), c_sq, penalty, ids


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "chunk", "axis_name"))
def lloyd_step(x, x_sq, valid, prev_assign, centroids, *,
               n_clusters: int, metric: D.DistanceMetric, chunk: int,
               axis_name=None):
    """One Lloyd iteration over the local shard.

    Args:
      x:           (Nl, F) samples, NaN rows pre-zeroed (storage dtype).
      x_sq:        (Nl,) fp32 squared norms of the *original* rows.
      valid:       (Nl,) bool — finite, non-padding rows.
      prev_assign: (Nl,) uint32, previous assignments (n_clusters for
                   invalid/never-assigned).
      centroids:   (K, F) fp32, replicated.

    Returns:
      new_centroids (K, F) fp32  — the adjusted centroids (full segment mean),
      assign        (Nl,) uint32 — assignment against the *input* centroids,
      best_score    (Nl,) fp32   — winning monotone score (see ops.distance),
      changed       ()    int32  — number of reassigned samples (global if
                                   axis_name is set).
    """
    nl, f = x.shape
    k = n_clusters
    c_t, c_sq, penalty, orig_ids = pad_clusters(centroids, x.dtype)
    cluster_ids = lax.broadcasted_iota(jnp.uint32, (1, k), 1)

    nchunks = nl // chunk
    xs = x.reshape(nchunks, chunk, f)
    xsqs = x_sq.reshape(nchunks, chunk)
    vs = valid.reshape(nchunks, chunk)
    pas = prev_assign.reshape(nchunks, chunk)

    def body(carry, inp):
        sums, counts, changed = carry
        xb, _xsqb, vb, pab = inp
        s = D.scores(xb, c_t, c_sq, penalty, metric)
        best, aid = D.argmin_lowest_index(s, orig_ids, k)
        aid = jnp.where(vb, aid, jnp.uint32(k))
        onehot = (aid[:, None] == cluster_ids)
        sums = sums + jnp.dot(onehot.astype(x.dtype).T,
                              xb, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.int32)
        changed = changed + jnp.sum(aid != pab, dtype=jnp.int32)
        return (sums, counts, changed), (aid, best)

    init = (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32),
            jnp.int32(0))
    if axis_name is not None:
        # under shard_map the carry becomes device-varying after the first
        # chunk touches sharded data; mark it as such upfront
        init = jax.tree.map(
            lambda a: lax.pcast(a, (axis_name,), to="varying"), init)
    (sums, counts, changed), (assign, best) = lax.scan(
        body, init, (xs, xsqs, vs, pas))

    if axis_name is not None:
        sums = lax.psum(sums, axis_name)
        counts = lax.psum(counts, axis_name)
        changed = lax.psum(changed, axis_name)

    new_centroids = D.normalize_centroids(
        sums, counts.astype(jnp.float32), metric)
    return (new_centroids, assign.reshape(nl), best.reshape(nl), changed)
