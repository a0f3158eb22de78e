"""Stable compaction + incremental centroid updates.

Two primitives shared by the Lloyd and Yinyang paths:

- :func:`stable_partition` — the TPU replacement for the reference's
  warp-aggregated passed-list compaction (``atomicAggInc(&d_passed_number)``
  scatter, kmeans.cu:541-582): a cumsum-based stable partition permutation,
  fully deterministic and O(n).
- :func:`delta_sums` — the reference's *incremental* centroid update
  (``kmeans_adjust`` scans all samples but only adds/subtracts the moved
  ones, kmeans.cu:367-429).  Here the moved samples are first compacted, so
  each iteration pays one small gather + one small one-hot matmul
  proportional to the number of reassignments; chunks past the moved count
  are skipped at runtime with ``lax.cond``.

Because both paths compact the *same* changed set in the same stable order
and accumulate deltas with the same chunking, Lloyd and Yinyang produce
bitwise-identical centroid sums — the foundation of the reference's
"Yinyang and Lloyd give identical results" guarantee (README.md:74-75).
"""

import jax.numpy as jnp
from jax import lax

from kmcuda_tpu.ops.assign import _mark_varying
from kmcuda_tpu.ops.distance import mm_precision as _mm_precision

#: above this fraction of locally-moved rows the delta is accumulated by a
#: dense natural-order pass instead of gather chunks (same result: the
#: decision is a deterministic function of the data, and zero-diff rows
#: add exact zeros)
DELTA_DENSE_FRACTION = 0.35


def stable_partition(mask):
    """Permutation that moves ``mask`` rows to the front, preserving order.

    Returns (order (n,) int32, n_true ()), where ``order[j]`` is the
    original index of the row at compacted position j.
    """
    order, _pos, n_true = stable_partition_with_pos(mask)
    return order, n_true


def stable_partition_with_pos(mask):
    """Like :func:`stable_partition`, also returning ``pos`` (n,) int32 —
    each row's slot in the compacted layout (``pos[i] < n_true`` iff
    ``mask[i]``).  ``pos`` enables gather-based merges of compacted results
    (``where(mask, out[pos], old)``): TPU dynamic-index *scatters* lower to
    near-serial code, while row gathers from large tables are fast, so
    results are merged by gathering, never by scattering."""
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    cs = jnp.cumsum(m)
    n_true = cs[-1]
    pos = jnp.where(mask, cs - 1, n_true + jnp.cumsum(1 - m) - 1)
    # order = inverse permutation of pos.  Built with a key-value sort:
    # measured 2.7x faster than the equivalent full-size scatter
    # (.at[pos].set(iota)) on TPU, and bitwise the same permutation.
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    _, order = lax.sort_key_val(pos, iota)
    return order, pos, n_true


def delta_sums(x, assign_new, assign_old, order, n_changed, *,
               n_clusters: int, chunk: int, axis_name=None):
    """Centroid-sum/count deltas from the reassigned samples only.

    ``order``/``n_changed`` come from ``stable_partition(assign_new !=
    assign_old)``.  Below ``DELTA_DENSE_FRACTION`` of moved rows the moved
    set is walked compacted (a while_loop of exactly
    ceil(n_changed / chunk) gather chunks; rows past the boundary inside
    the last chunk contribute exactly zero, new == old == k).  Above it, a
    dense natural-order pass over all rows is cheaper than gathering most
    of them.

    Returns (d_sums (K, F) fp32, d_counts (K,) int32) — the *local* deltas;
    the caller psums across the mesh and adds to the running sums.
    """
    n, f = x.shape
    k = n_clusters
    cluster_ids = lax.broadcasted_iota(jnp.uint32, (1, k), 1)
    offs = lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]

    def chunk_delta(xb, anew, aold, d_sums, d_counts):
        oh_new = (anew[:, None] == cluster_ids)
        oh_old = (aold[:, None] == cluster_ids)
        d_oh = oh_new.astype(x.dtype) - oh_old.astype(x.dtype)
        d_sums = d_sums + jnp.dot(
            d_oh.T, xb, preferred_element_type=jnp.float32,
            precision=_mm_precision(x.dtype))
        d_counts = d_counts + (
            jnp.sum(oh_new, axis=0, dtype=jnp.int32)
            - jnp.sum(oh_old, axis=0, dtype=jnp.int32))
        return d_sums, d_counts

    zeros = (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32))

    def compacted(order, n_changed):
        # dynamic trip count: a lax.scan over all chunks pays ~20us of
        # step scaffolding each even for skipped chunks; a while_loop runs
        # exactly ceil(n_changed / chunk) iterations
        n_active = (n_changed + chunk - 1) // chunk

        def cond(carry):
            return carry[0] < n_active

        def body(carry):
            i, d_sums, d_counts = carry
            base = i * chunk
            idx = lax.dynamic_slice(order, (base,), (chunk,))
            row_ok = (base + offs) < n_changed
            anew = jnp.where(row_ok, assign_new[idx], jnp.uint32(k))
            aold = jnp.where(row_ok, assign_old[idx], jnp.uint32(k))
            d_sums, d_counts = chunk_delta(
                x[idx], anew, aold, carry[1], carry[2])
            return i + 1, d_sums, d_counts

        init = _mark_varying((jnp.int32(0),) + zeros, axis_name)
        _, d_sums, d_counts = lax.while_loop(cond, body, init)
        return d_sums, d_counts

    def dense(order, n_changed):
        # high churn: one natural-order pass over ALL rows beats gathering
        # most of them (unchanged rows have a zero one-hot diff and add
        # exact zeros).  The compacted/dense decision is a pure function
        # of the local n_changed, so any two runs over the same data make
        # the same choices and accumulate bitwise-identically.
        def body(carry, inp):
            xb, anew, aold = inp
            return chunk_delta(xb, anew, aold, *carry), None

        init = _mark_varying(zeros, axis_name)
        nchunks = n // chunk
        (d_sums, d_counts), _ = lax.scan(
            body, init,
            (x.reshape(nchunks, chunk, f),
             assign_new.reshape(nchunks, chunk),
             assign_old.reshape(nchunks, chunk)))
        return d_sums, d_counts

    return lax.cond(
        n_changed.astype(jnp.float32) > DELTA_DENSE_FRACTION * n,
        dense, compacted, order, n_changed)
