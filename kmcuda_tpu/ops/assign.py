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

#: fixed size of the per-run iteration log buffer; max_iterations is a
#: traced argument (no recompile per cap) bounded by this
LOG_CAPACITY = config.DEFAULT_MAX_ITERATIONS


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


def _rescore_table(centroids, f):
    """NaN-sanitized zero-extended fp32 centroid table for the exact top-2
    rescore (D.argmin_rescored).  Every assignment path MUST build this
    identically (elementwise sanitize, row k = zeros) — the rescore's
    bitwise batch-independence is what carries the Lloyd==Yinyang parity
    guarantee (ops/yinyang.exact_assign_bounds builds the same table)."""
    cf = centroids.astype(jnp.float32)
    cf = jnp.concatenate([cf, jnp.zeros((1, f), jnp.float32)])
    return jnp.where(jnp.isfinite(cf), cf, 0.0)


def _mark_varying(tree, axis_name):
    """Under shard_map a scan/while carry touched by sharded data becomes
    device-varying; mark it as such upfront (no-op if already varying)."""
    if axis_name is None:
        return tree

    def cast(a):
        if axis_name in getattr(jax.typeof(a), "vma", ()):
            return a
        return lax.pcast(a, (axis_name,), to="varying")

    return jax.tree.map(cast, tree)


def _assign_update_pass(x, x_sq, valid, prev_assign, centroids, *,
                        n_clusters, metric, chunk, axis_name,
                        use_pallas=False, interpret=False):
    """The fused single-pass body shared by lloyd_step and lloyd_run."""
    # interpret-mode (non-TPU) pallas under shard_map trips vma checks on
    # kernel-internal literals; the kernel is exercised directly by
    # tests/test_pallas.py and engages compiled on TPU
    if use_pallas and not interpret:
        from kmcuda_tpu.ops import assign_pallas as AP

        aid, best, sums, counts, changed = AP.fused_lloyd_pass(
            x, valid, prev_assign, centroids, n_clusters=n_clusters,
            metric=metric, tile=1024 if x.shape[0] % 1024 == 0 else chunk,
            interpret=interpret, axis_name=axis_name)
        if axis_name is not None:
            sums = lax.psum(sums, axis_name)
            counts = lax.psum(counts, axis_name)
            changed = lax.psum(changed, axis_name)
        new_centroids = D.normalize_centroids(
            sums, counts.astype(jnp.float32), metric)
        return new_centroids, aid, best, changed
    nl, f = x.shape
    k = n_clusters
    c_t, c_sq, penalty, orig_ids = pad_clusters(centroids, x.dtype)
    c_ext = _rescore_table(centroids, f)
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
        best, aid, _d2 = D.argmin_rescored(s, orig_ids, k, xb, c_ext)
        aid = jnp.where(vb, aid, jnp.uint32(k))
        onehot = (aid[:, None] == cluster_ids)
        sums = sums + jnp.dot(onehot.astype(x.dtype).T, xb,
                              preferred_element_type=jnp.float32,
                              precision=D.mm_precision(x.dtype))
        counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.int32)
        changed = changed + jnp.sum(aid != pab, dtype=jnp.int32)
        return (sums, counts, changed), (aid, best)

    init = _mark_varying(
        (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32),
         jnp.int32(0)), axis_name)
    (sums, counts, changed), (assign, best) = lax.scan(
        body, init, (xs, xsqs, vs, pas))

    if axis_name is not None:
        sums = lax.psum(sums, axis_name)
        counts = lax.psum(counts, axis_name)
        changed = lax.psum(changed, axis_name)

    new_centroids = D.normalize_centroids(
        sums, counts.astype(jnp.float32), metric)
    return (new_centroids, assign.reshape(nl), best.reshape(nl), changed)


def _assign_delta_pass(x, valid, prev_assign, centroids, *, n_clusters,
                       metric, chunk, axis_name=None):
    """Fused assignment + incremental-delta scan: ONE streamed pass
    computing the new assignments AND the (onehot_new − onehot_old)
    centroid delta per chunk — the high-churn arm of the incremental
    driver.  Before round 4 high-churn iterations paid the assignment
    scan PLUS a separate dense delta pass (two streams of the data set
    per iteration); fusing the delta into the same ``lax.scan`` body
    makes the incremental driver cost one streamed pass at any churn.

    The per-chunk delta arithmetic is ops.compact.chunk_delta applied to
    the same chunks in the same natural order as compact.delta_dense, so
    the accumulated (d_sums, d_counts) are bitwise identical to the
    unfused form for the same assignment stream — fusing changes wall
    time only, never the sums (the Lloyd==Yinyang parity foundation).

    Returns (assign, best, d_sums, d_counts, changed_local) — deltas and
    count are LOCAL; the caller psums across the mesh."""
    from kmcuda_tpu.ops import compact as C

    nl, f = x.shape
    k = n_clusters
    c_t, c_sq, penalty, orig_ids = pad_clusters(centroids, x.dtype)
    c_ext = _rescore_table(centroids, f)
    nchunks = nl // chunk
    xs = x.reshape(nchunks, chunk, f)
    vs = valid.reshape(nchunks, chunk)
    pas = prev_assign.reshape(nchunks, chunk)

    def body(carry, inp):
        d_sums, d_counts, changed = carry
        xb, vb, pab = inp
        s = D.scores(xb, c_t, c_sq, penalty, metric)
        best, aid, _d2 = D.argmin_rescored(s, orig_ids, k, xb, c_ext)
        aid = jnp.where(vb, aid, jnp.uint32(k))
        d_sums, d_counts = C.chunk_delta(
            xb, aid, pab, d_sums, d_counts, dtype=x.dtype)
        changed = changed + jnp.sum(aid != pab, dtype=jnp.int32)
        return (d_sums, d_counts, changed), (aid, best)

    init = _mark_varying(
        (jnp.zeros((k, f), jnp.float32), jnp.zeros((k,), jnp.int32),
         jnp.int32(0)), axis_name)
    (d_sums, d_counts, changed), (assign, best) = lax.scan(
        body, init, (xs, vs, pas))
    return (assign.reshape(nl), best.reshape(nl), d_sums, d_counts,
            changed)


def assign_pass(x, valid, centroids, *, n_clusters, metric, chunk):
    """Assignment only (no centroid update): scan of fused score-matmul +
    argmin chunks.  Shared by the incremental Lloyd path and (with the same
    column layout, hence bitwise-identical scores) the Yinyang local
    filter."""
    nl, f = x.shape
    k = n_clusters
    c_t, c_sq, penalty, orig_ids = pad_clusters(centroids, x.dtype)
    c_ext = _rescore_table(centroids, f)
    nchunks = nl // chunk
    xs = x.reshape(nchunks, chunk, f)
    vs = valid.reshape(nchunks, chunk)

    def body(_, inp):
        xb, vb = inp
        s = D.scores(xb, c_t, c_sq, penalty, metric)
        best, aid, _d2 = D.argmin_rescored(s, orig_ids, k, xb, c_ext)
        aid = jnp.where(vb, aid, jnp.uint32(k))
        return None, (aid, best)

    _, (assign, best) = lax.scan(body, None, (xs, vs))
    return assign.reshape(nl), best.reshape(nl)



def _stagnation_update(changed2, mark, stale):
    """Stagnation tracking: a new best only resets the stale counter when
    it beats the mark by at least mark/64 (~1.6%).  A reduced-precision
    churn floor can CREEP downward a fraction of a percent per iteration
    indefinitely; creep slower than 1.6% per patience window is
    stagnation, while genuine convergence tails improve far faster.

    The (mark, stale) pair is part of the loop's resume state: segmented
    drivers round-trip it through ``limits[3:5]`` so the stopping
    iteration is independent of the segment length."""
    improved = changed2 < mark - (mark >> 6)
    return (jnp.where(improved, changed2, mark),
            jnp.where(improved, jnp.int32(0), stale + 1))


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "chunk", "axis_name"))
def lloyd_run_incremental(x, x_sq, valid, prev_assign, centroids, sums,
                          counts, limits, *,
                          n_clusters: int, metric: D.DistanceMetric,
                          chunk: int, axis_name=None):
    """On-device Lloyd loop with *incremental* centroid updates.

    This is the faithful port of the reference's update strategy: assign,
    then add/subtract only the moved samples into the running centroid sums
    (kmeans_adjust, kmeans.cu:367-429).  Each iteration picks its arm from
    the PREVIOUS iteration's reassignment count (compact.predict_dense):
    high churn runs the fused assignment+delta scan (one streamed pass,
    _assign_delta_pass); low churn runs the assignment scan plus a
    compacted delta walk proportional to the moved count.  Yinyang
    continues from the returned (sums, counts) with the same delta
    accumulation and the same prediction rule, which is what makes Lloyd
    and Yinyang results bitwise identical.

    Pass sums=counts=0 and prev_assign=k-filled for a fresh start (the
    first iteration's delta then equals the full segment-sum).

    Returns (centroids_used, centroids_next, assign, best, sums, counts,
    iterations, changed_log, stag); ``centroids_next`` and ``stag`` (the
    int32[2] (mark, stale) stagnation counters) resume a segmented run
    exactly where this one stopped.
    """
    from kmcuda_tpu.ops import compact as C

    k = n_clusters

    centroids = centroids.astype(jnp.float32)
    # limits: int32[6] = (tol_count, max_iterations, patience, mark0,
    # stale0, prev_changed0) packed in ONE array — each separate scalar
    # argument costs a host->device transfer round trip per call, which
    # dominates short runs over a slow link.  (mark0, stale0) are the
    # stagnation counters carried over from the previous segment
    # (int32 max / 0 fresh); prev_changed0 seeds the fused/compacted
    # prediction (int32 max fresh = "everything moves", else the previous
    # segment's last count — so the accumulation stream is bitwise
    # independent of the segment length).
    tol_count, max_iterations, patience = limits[0], limits[1], limits[2]
    nl = x.shape[0]
    n_total = jnp.int32(nl)
    if axis_name is not None:
        n_total = lax.psum(n_total, axis_name)

    def cond(carry):
        it, changed, (_bestch, stale) = carry[6], carry[7], carry[9]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations)
                            & (stale < patience))

    def body(carry):
        (_c_used, c_cur, assign, _best, sums, counts, it, prev_changed,
         log, (bestch, stale)) = carry

        def fused(assign):
            return _assign_delta_pass(
                x, valid, assign, c_cur, n_clusters=k, metric=metric,
                chunk=chunk, axis_name=axis_name)

        def split(assign):
            assign2, best2 = assign_pass(
                x, valid, c_cur, n_clusters=k, metric=metric, chunk=chunk)
            order, n_moved = C.stable_partition(assign2 != assign)
            d_sums, d_counts = C.delta_compacted(
                x, assign2, assign, order, n_moved, n_clusters=k,
                chunk=chunk, axis_name=axis_name)
            return assign2, best2, d_sums, d_counts, n_moved

        assign2, best2, d_sums, d_counts, changed2 = lax.cond(
            C.predict_dense(prev_changed, n_total), fused, split, assign)
        if axis_name is not None:
            d_sums = lax.psum(d_sums, axis_name)
            d_counts = lax.psum(d_counts, axis_name)
            changed2 = lax.psum(changed2, axis_name)
        sums2 = sums + d_sums
        counts2 = counts + d_counts
        c_next = D.normalize_centroids(
            sums2, counts2.astype(jnp.float32), metric)
        log = log.at[it].set(changed2)
        mark2, stale2 = _stagnation_update(changed2, bestch, stale)
        return (c_cur, c_next, assign2, best2, sums2, counts2, it + 1,
                changed2, log, (mark2, stale2))

    nl = x.shape[0]
    assign0, best0 = _mark_varying(
        (prev_assign, jnp.zeros((nl,), jnp.float32)), axis_name)
    init = (centroids, centroids, assign0, best0, sums, counts,
            jnp.int32(0), limits[5],
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            (limits[3], limits[4]))
    (c_used, c_next, assign, best, sums, counts, it, _changed,
     log, bs) = lax.while_loop(cond, body, init)
    return (c_used, c_next, assign, best, sums, counts, it, log,
            jnp.stack(bs))


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "tile", "chunk", "axis_name"))
def lloyd_run_pallas(x, x_sq, valid, prev_assign, centroids, sums, counts,
                     limits, *,
                     n_clusters: int, metric: D.DistanceMetric, tile: int,
                     chunk: int, axis_name=None):
    """On-device Lloyd loop on the Mosaic kernels, churn-adaptive.

    High-churn iterations run the fused kernel (score + one-hot update in
    one VMEM-resident pass, ops.assign_pallas._kernel); low-churn
    iterations run the assignment-only kernel plus the compacted O(moved)
    delta walk — skipping the one-hot update matmul, which is half a
    dense iteration's MXU work (the same dense/compacted economics as
    lloyd_run_incremental, with the same predict-from-previous-count rule
    so the arm choice is a pure function of the trajectory).  Assignments
    are bitwise identical between the arms (same score matmul, same
    argmin sequence); the centroid sums differ from a pure fused loop
    only by the documented delta-accumulation rounding, exactly like the
    incremental XLA driver differs from the fused XLA loop.

    (sums, counts) are the running accumulators, round-tripped across
    segments exactly like lloyd_run_incremental's (a sparse segment-start
    iteration adds its delta to them; zeros are only correct for a fresh
    start, where the first iteration is always dense and REPLACES them).
    Same limits/return contract as lloyd_run_incremental.
    """
    from kmcuda_tpu.ops import compact as C
    from kmcuda_tpu.ops import assign_pallas as AP

    k = n_clusters
    centroids = centroids.astype(jnp.float32)
    tol_count, max_iterations, patience = limits[0], limits[1], limits[2]
    nl = x.shape[0]
    n_total = jnp.int32(nl)
    if axis_name is not None:
        n_total = lax.psum(n_total, axis_name)

    def cond(carry):
        it, changed, (_mark, stale) = carry[6], carry[7], carry[9]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations)
                            & (stale < patience))

    def body(carry):
        (_c_used, c_cur, assign, _best, sums, counts, it, prev_changed,
         log, (mark, stale)) = carry
        dense_p = C.predict_dense(prev_changed, n_total)

        def dense(assign):
            return AP.fused_lloyd_pass(
                x, valid, assign, c_cur, n_clusters=k, metric=metric,
                tile=tile, interpret=False, axis_name=axis_name)

        def sparse(assign):
            aid, best2, ch = AP.assign_only_pass(
                x, valid, assign, c_cur, n_clusters=k, metric=metric,
                tile=tile, interpret=False, axis_name=axis_name)
            order, n_moved = C.stable_partition(aid != assign)
            d_sums, d_counts = C.delta_compacted(
                x, aid, assign, order, n_moved, n_clusters=k, chunk=chunk,
                axis_name=axis_name)
            return aid, best2, d_sums, d_counts, ch

        aid, best2, dval, dcnt, ch = lax.cond(
            dense_p, dense, sparse, assign)
        if axis_name is not None:
            dval = lax.psum(dval, axis_name)
            dcnt = lax.psum(dcnt, axis_name)
            ch = lax.psum(ch, axis_name)
        # dense arm: the kernel's full segment sum REPLACES the carry (a
        # fresh sum also resets delta-accumulation residue); sparse arm
        # adds the compacted delta
        sums2 = jnp.where(dense_p, dval, sums + dval)
        counts2 = jnp.where(dense_p, dcnt, counts + dcnt)
        c_next = D.normalize_centroids(
            sums2, counts2.astype(jnp.float32), metric)
        log = log.at[it].set(ch)
        mark2, stale2 = _stagnation_update(ch, mark, stale)
        return (c_cur, c_next, aid, best2, sums2, counts2, it + 1, ch,
                log, (mark2, stale2))

    assign0, best0 = _mark_varying(
        (prev_assign, jnp.zeros((nl,), jnp.float32)), axis_name)
    init = (centroids, centroids, assign0, best0, sums, counts,
            jnp.int32(0), limits[5],
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            (limits[3], limits[4]))
    (c_used, c_next, assign, best, sums, counts, it, _changed,
     log, bs) = lax.while_loop(cond, body, init)
    return (c_used, c_next, assign, best, sums, counts, it, log,
            jnp.stack(bs))


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
    return _assign_update_pass(
        x, x_sq, valid, prev_assign, centroids, n_clusters=n_clusters,
        metric=metric, chunk=chunk, axis_name=axis_name)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "chunk", "axis_name",
                     "use_pallas", "interpret"))
def lloyd_run(x, x_sq, valid, prev_assign, centroids, limits, *,
              n_clusters: int,
              metric: D.DistanceMetric, chunk: int, axis_name=None,
              use_pallas=False, interpret=False):
    """Run Lloyd to convergence entirely on device.

    The reference pays one device->host sync per iteration to read the
    reassignment counter (check_changed, kmeans.cu:697-717); that is cheap
    over PCIe but dominates wall time over a remote TPU link.  A
    ``lax.while_loop`` keeps the convergence decision on device and returns
    the per-iteration reassignment counts as an array, so the driver prints
    the same ``iteration N: M reassignments`` lines after the fact — one
    readback per *run* instead of per iteration.

    Returns (centroids_used, centroids_next, assign, best, iterations,
    changed_log, stag): ``centroids_used`` are the centroids the final
    assignment was computed against (the reference also stops before
    re-adjusting); ``centroids_next`` and ``stag`` (the int32[2]
    (mark, stale) stagnation counters) resume a segmented run exactly.
    """
    centroids = centroids.astype(jnp.float32)
    # limits: int32[5] = (tol_count, max_iterations, patience, mark0,
    # stale0) packed in ONE array — each separate scalar argument costs a
    # host->device transfer round trip per call, which dominates short
    # runs over a slow link.  (mark0, stale0) resume the stagnation
    # counters across segments (int32 max / 0 fresh).
    tol_count, max_iterations, patience = limits[0], limits[1], limits[2]

    def cond(carry):
        (_c_used, _c_next, _assign, _best, it, changed, _log,
         (_bestch, stale)) = carry
        return (it == 0) | ((changed > tol_count) & (it < max_iterations)
                            & (stale < patience))

    def body(carry):
        _c_used, c_cur, assign, _best, it, _changed, log, bs = carry
        bestch, stale = bs
        c_adj, assign2, best2, changed2 = _assign_update_pass(
            x, x_sq, valid, assign, c_cur, n_clusters=n_clusters,
            metric=metric, chunk=chunk, axis_name=axis_name,
            use_pallas=use_pallas, interpret=interpret)
        log = log.at[it].set(changed2)
        mark2, stale2 = _stagnation_update(changed2, bestch, stale)
        return (c_cur, c_adj, assign2, best2, it + 1, changed2, log,
                (mark2, stale2))

    nl = x.shape[0]
    # only the per-shard components (assign, best) are device-varying; the
    # psum'd centroids / counters stay replicated through the loop
    assign0, best0 = _mark_varying(
        (prev_assign, jnp.zeros((nl,), jnp.float32)), axis_name)
    init = (centroids, centroids, assign0, best0, jnp.int32(0),
            jnp.int32(jnp.iinfo(jnp.int32).max),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            (limits[3], limits[4]))
    c_used, c_next, assign, best, it, _changed, log, bs = lax.while_loop(
        cond, body, init)
    return c_used, c_next, assign, best, it, log, jnp.stack(bs)
