"""Stable compaction + incremental centroid updates.

Two primitives shared by the Lloyd and Yinyang paths:

- :func:`stable_partition` — the TPU replacement for the reference's
  warp-aggregated passed-list compaction (``atomicAggInc(&d_passed_number)``
  scatter, kmeans.cu:541-582): a cumsum-based stable partition permutation,
  fully deterministic and O(n).
- :func:`delta_compacted` / :func:`delta_dense` — the reference's
  *incremental* centroid update (``kmeans_adjust`` scans all samples but
  only adds/subtracts the moved ones, kmeans.cu:367-429).  At low churn the
  moved samples are first compacted, so each iteration pays one small
  gather + one small one-hot matmul proportional to the number of
  reassignments; at high churn a dense natural-order pass over all rows is
  cheaper than gathering most of them (zero-diff rows add exact zeros).

The compacted/dense choice is made by the CALLER from the *previous*
iteration's reassignment count (``prev_changed > DELTA_DENSE_FRACTION *
n``) — a pure function of the trajectory, so the Lloyd and Yinyang
drivers walking the same trajectory make the same choices and accumulate
deltas in the same order.  That shared decision rule plus the shared
per-chunk arithmetic (:func:`chunk_delta`) is what makes Lloyd and
Yinyang centroid sums bitwise identical — the foundation of the
reference's "Yinyang and Lloyd give identical results" guarantee
(README.md:74-75).  (Predicting from the previous count rather than the
current one lets the high-churn case fuse the delta into the assignment
scan itself — ops.assign._assign_delta_pass — so no iteration ever pays
a second full streamed pass; a wrong prediction after a churn regime
shift costs one suboptimal branch choice, never a different result.)
"""

import jax.numpy as jnp
from jax import lax

from kmcuda_tpu.ops.assign import _mark_varying
from kmcuda_tpu.ops.distance import mm_precision as _mm_precision

#: above this fraction of previously-moved rows the delta is accumulated by
#: a dense natural-order pass fused into the assignment scan instead of
#: gather chunks (same result: the decision is a deterministic function of
#: the trajectory, and zero-diff rows add exact zeros)
DELTA_DENSE_FRACTION = 0.35


def predict_dense(prev_changed, n_total):
    """The shared compacted/dense decision rule: dense when the PREVIOUS
    iteration's (mesh-global) reassignment count exceeded
    ``DELTA_DENSE_FRACTION`` of all samples.  Fresh starts pass int32 max
    (everything moves on iteration 0).  Every driver on the same
    trajectory computes the same predictions, which keeps their delta
    accumulation streams bitwise identical."""
    return (prev_changed.astype(jnp.float32)
            > DELTA_DENSE_FRACTION * jnp.float32(n_total))


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


def chunk_delta(xb, anew, aold, d_sums, d_counts, dtype=None):
    """Accumulate one chunk's one-hot-diff centroid delta.

    THE shared per-chunk arithmetic of every incremental update path
    (compacted walk, dense pass, and the fused assignment+delta scan in
    ops.assign) — identical inputs in identical order produce bitwise
    identical sums, which is what the Lloyd==Yinyang parity rests on."""
    k = d_counts.shape[0]
    if dtype is None:
        dtype = xb.dtype
    cluster_ids = lax.broadcasted_iota(jnp.uint32, (1, k), 1)
    oh_new = (anew[:, None] == cluster_ids)
    oh_old = (aold[:, None] == cluster_ids)
    d_oh = oh_new.astype(dtype) - oh_old.astype(dtype)
    d_sums = d_sums + jnp.dot(
        d_oh.T, xb, preferred_element_type=jnp.float32,
        precision=_mm_precision(dtype))
    d_counts = d_counts + (
        jnp.sum(oh_new, axis=0, dtype=jnp.int32)
        - jnp.sum(oh_old, axis=0, dtype=jnp.int32))
    return d_sums, d_counts


def delta_compacted(x, assign_new, assign_old, order, n_changed, *,
                    n_clusters: int, chunk: int, axis_name=None):
    """Centroid-sum/count deltas from the reassigned samples only.

    ``order``/``n_changed`` come from ``stable_partition(assign_new !=
    assign_old)``.  The moved set is walked compacted: a while_loop of
    exactly ceil(n_changed / chunk) gather chunks; rows past the boundary
    inside the last chunk contribute exactly zero (new == old == k).

    Returns (d_sums (K, F) fp32, d_counts (K,) int32) — the *local* deltas;
    the caller psums across the mesh and adds to the running sums.
    """
    n, f = x.shape
    k = n_clusters
    offs = lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
    zeros = (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32))

    # dynamic trip count: a lax.scan over all chunks pays ~20us of step
    # scaffolding each even for skipped chunks; a while_loop runs exactly
    # ceil(n_changed / chunk) iterations
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
            x[idx], anew, aold, carry[1], carry[2], dtype=x.dtype)
        return i + 1, d_sums, d_counts

    init = _mark_varying((jnp.int32(0),) + zeros, axis_name)
    _, d_sums, d_counts = lax.while_loop(cond, body, init)
    return d_sums, d_counts


def delta_dense(x, assign_new, assign_old, *,
                n_clusters: int, chunk: int, axis_name=None):
    """High-churn delta: one natural-order pass over ALL rows beats
    gathering most of them (unchanged rows have a zero one-hot diff and
    add exact zeros).  Same contract as :func:`delta_compacted`; bitwise
    identical to the fused assignment+delta scan's accumulation
    (ops.assign._assign_delta_pass) for the same inputs."""
    n, f = x.shape
    k = n_clusters
    zeros = (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32))

    def body(carry, inp):
        xb, anew, aold = inp
        return chunk_delta(xb, anew, aold, *carry, dtype=x.dtype), None

    init = _mark_varying(zeros, axis_name)
    nchunks = n // chunk
    (d_sums, d_counts), _ = lax.scan(
        body, init,
        (x.reshape(nchunks, chunk, f),
         assign_new.reshape(nchunks, chunk),
         assign_old.reshape(nchunks, chunk)))
    return d_sums, d_counts
