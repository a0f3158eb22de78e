"""Triangle-inequality-pruned exact k-NN search.

The reference (src/knn.cu:178-318) gives every sample a thread that scans
its own cluster, then every other cluster c unless
``CD(own, c) - d_own - R(c) > kth`` (knn.cu:218-224), maintaining a binary
max-heap of k candidates (knn.cu:133-175), and counts how many distances it
actually computed (knn.cu:16,521-530).

TPU-native redesign — the unit of pruning is a *member tile*, not a single
cluster, and the unit of search is a *query chunk*, not a thread:

- samples are sorted by cluster (the device-side analog of the host CSR
  build, kmcuda.cc:648-691), so a member tile spans few clusters;
- ``T[a, j] = min over members m of tile j of (CD[a, cluster(m)] -
  R(cluster(m)))`` pre-aggregates the reference's per-cluster cutoff to
  tile granularity: tile j can hold a neighbor of a query in cluster a
  only if ``T[a, j] - d_own <= kth``;
- each query chunk visits tiles most-promising-first (ascending chunk-min
  bound) in a dynamic-trip-count while loop that stops as soon as the next
  tile's bound exceeds every query's running kth distance — the running
  top-k replaces the heap;
- computed-tile counts give the reference's ``calculated %f of all the
  distances`` pruning metric.

Exactness: all bounds live in true-distance space with a downward slack on
the tile bound and an upward margin on kth, so dot-form rounding can only
weaken pruning, never drop a true neighbor; the surviving candidates get
the same exact subtract-square rescore as the brute-force path.

Candidates are tracked as *sorted positions* during the search and mapped
back to original sample indices only at the end, so the member matrix is
kept on device once (sorted layout), not twice.
"""

import jax
import jax.numpy as jnp
from jax import lax

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D

import numpy as np

#: +inf as a weak-typed scalar; a numpy constant so importing this module
#: never initializes a jax backend (the C ABI's embedded interpreter picks
#: its platform *after* import, capi._platform_setup)
INF = np.float32(np.inf)

#: relative slack absorbing dot-form rounding in the pruning inequalities
SLACK = 1e-5


def select_k(d, idx, kk):
    """Ascending (distance, id)-lexicographic k-smallest selection.

    min/compare/where only — ``kk`` masked passes over the candidate row.
    Chosen over ``lax.top_k``/``lax.sort`` because the (distance, id)
    lexicographic tie-break is exact by construction (top_k breaks ties
    by column position), and because at ``kk`` ~ tens the pass count is
    competitive.  NOTE the bandwidth profile: a merge costs ~kk row
    passes, which dwarfs the tile matmul that produced the candidates —
    callers gate merges behind a one-pass "does this tile improve any
    buffer" test.  (Historical: TPU faults once blamed on sort ops in
    this loop were actually a runtime watchdog killing monolithic
    multi-minute dispatches; fixed by host-level query batching,
    config.KNN_QUERY_BATCH.)

    d:   (n, m) candidate distances.
    idx: (n, m) candidate ids (unique per row among finite-distance
         entries; duplicates may exist among INF sentinels and are
         consumed in one step, which is harmless).
    Returns (dists (n, kk), ids (n, kk)) ascending by (distance, id).
    """
    big_i = jnp.int32(2**31 - 1)
    out_d, out_i = [], []
    for _ in range(kk):
        dm = jnp.min(d, axis=1)
        ismin = d == dm[:, None]
        sel = jnp.min(jnp.where(ismin, idx, big_i), axis=1)
        d = jnp.where(ismin & (idx == sel[:, None]), INF, d)
        out_d.append(dm)
        out_i.append(sel)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def tile_bounds(cd, radii, a_sorted, m_valid, n_tiles, tile_m):
    """T (k+1, n_tiles): per (query-cluster, member-tile) pruning bound.

    cd:       (k, k) true cluster-center distance matrix.
    radii:    (k,) cluster radiuses (max member distance to center).
    a_sorted: (n_pad,) member cluster ids in sorted order (k for invalid).
    """
    # large-finite, never INF: the bound rows are selected with a one-hot
    # matmul downstream, and 0 * inf = NaN would poison every test
    big = jnp.float32(config.PAD_PENALTY)
    k = cd.shape[0]
    cd_ext = jnp.concatenate([cd, jnp.full((k, 1), big)], axis=1)
    cd_ext = jnp.nan_to_num(cd_ext, nan=config.PAD_PENALTY,
                            posinf=config.PAD_PENALTY)
    r_ext = jnp.concatenate(
        [jnp.nan_to_num(radii), jnp.zeros((1,), jnp.float32)])
    at = a_sorted.astype(jnp.int32).reshape(n_tiles, tile_m)
    vt = m_valid.reshape(n_tiles, tile_m)

    def per_tile(_, inp):
        ab, vb = inp
        cols = jnp.take(cd_ext, ab, axis=1) - r_ext[ab][None, :]   # (k, M)
        cols = jnp.where(vb[None, :], cols, big)
        return None, jnp.min(cols, axis=1)

    _, t = lax.scan(per_tile, None, (at, vt))
    t = t.T                                                 # (k, n_tiles)
    return jnp.concatenate([t, jnp.full((1, n_tiles), big)])


def search(xq, xq_sq, q_own, q_assign, xm, m_valid, t_mat, chunk_base, *,
           k_neighbors, n_clusters, metric, chunk, tile_m, n_batch_chunks,
           axis_name=None):
    """Pruned search over one batch of the local query shard
    (cluster-sorted layout).

    xq/xq_sq/q_own/q_assign: local shard of the sorted queries — rows,
      squared norms, exact own-centroid distance, cluster id (k invalid).
    xm/m_valid: replicated sorted members + validity.
    t_mat: (k+1, n_tiles) tile bounds.
    chunk_base: first local chunk of this batch (traced scalar); the call
      processes local rows [chunk_base*chunk, (chunk_base +
      n_batch_chunks)*chunk).  The driver loops over batches so no single
      device dispatch runs unboundedly long (see config.KNN_QUERY_BATCH).

    Returns (neighbors (n_batch_chunks*chunk, k) int32 — *sorted
    positions*, distances (..., k) f32 ascending, tiles_computed ()
    int32 — number of (chunk, tile) score matmuls executed, psum'd
    across the mesh).
    """
    nl, f = xq.shape
    nm = xm.shape[0]
    nt = nm // tile_m
    k = n_clusters
    kk = min(k_neighbors + max(16, k_neighbors // 2), nm)

    xm_sq = D.row_sq_norms(xm)
    m_pen = jnp.where(m_valid, 0.0, config.PAD_PENALTY)

    nchunks = n_batch_chunks
    nb = nchunks * chunk
    row_base = chunk_base * chunk
    xq = lax.dynamic_slice(xq, (row_base, 0), (nb, f))
    xq_sq = lax.dynamic_slice(xq_sq, (row_base,), (nb,))
    q_own = lax.dynamic_slice(q_own, (row_base,), (nb,))
    q_assign = lax.dynamic_slice(q_assign, (row_base,), (nb,))
    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)
    iota_m = lax.broadcasted_iota(jnp.int32, (1, tile_m), 1)
    # global sorted position of each query row in this batch
    if axis_name is not None:
        shard_off = lax.axis_index(axis_name) * nl
    else:
        shard_off = 0
    q_pos = (shard_off + row_base
             + lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0])

    # ---- pass 1: per-chunk tile bounds, ONE batched sort ----------------
    # Visit order must be most-promising-first (ascending chunk-min
    # bound).  The sort runs OUTSIDE the search scan, batched over all
    # chunks: a lax.sort inside a large scanned search faults the TPU
    # runtime (empirical, same class as the select_k note above), and one
    # (nchunks, nt) sort is cheaper than nchunks small ones anyway.
    def chunk_bounds(_, inp):
        qb_a, qb_own = inp
        oh = (qb_a[:, None] == iota_k1).astype(jnp.float32)
        tb = jnp.dot(oh, t_mat,
                     precision=lax.Precision.HIGHEST) - qb_own[:, None]
        tb = tb - SLACK * (1.0 + jnp.abs(tb))
        return None, jnp.min(tb, axis=0)                     # (nt,)

    _, tb_min_all = lax.scan(
        chunk_bounds, None,
        (q_assign.astype(jnp.uint32).reshape(nchunks, chunk),
         q_own.reshape(nchunks, chunk)))                     # (nchunks, nt)
    iota_nt = jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (1, nt), 1), tb_min_all.shape)
    sorted_min_all, tile_order_all = lax.sort(
        (tb_min_all, iota_nt), dimension=1, num_keys=1)

    # ---- pass 2: the pruned search, tile order precomputed --------------
    def per_chunk(count, inp):
        qb, qsqb, ownb, ab, qposb, sorted_min, tile_order = inp
        # stop once the next tile's chunk-min bound exceeds every query's
        # running kth distance: all later tiles bound even higher, so the
        # visited prefix is provably sufficient.  A dynamic-trip while
        # beats a cond-per-tile scan (skipped tail costs nothing, and the
        # nested cond-in-scan-in-scan construct faulted the TPU at scale).

        def vcond(carry):
            r, best_d, _best_i, _count = carry
            tau_max = jnp.max(best_d[:, k_neighbors - 1])
            return (r < nt) & (sorted_min[r] <= tau_max)

        def vbody(carry):
            r, best_d, best_i, count = carry
            j = tile_order[r]
            mt = lax.dynamic_slice(xm, (j * tile_m, 0), (tile_m, f))
            msq = lax.dynamic_slice(xm_sq, (j * tile_m,), (tile_m,))
            mpen = lax.dynamic_slice(m_pen, (j * tile_m,), (tile_m,))
            s = D.scores(qb, mt.T.astype(qb.dtype), msq, mpen, metric)
            d = D.finalize_distance(s, qsqb[:, None], metric)
            d = d * (1.0 + SLACK)  # upward kth margin
            mpos = j * tile_m + iota_m[0]
            d = jnp.where(qposb[:, None] == mpos[None, :], INF, d)
            d = jnp.where(mpen[None, :] > 0, INF, d)
            # the select_k merge costs ~kk passes over the tile row —
            # far more than the tile matmul itself — but the cluster-loose
            # tile bound means most visited tiles improve nobody's buffer.
            # One cheap min-pass decides; '<=' (not '<') so a knife-edge
            # tie still merges and id-tie-breaking stays exact.
            improves = jnp.any(
                jnp.min(d, axis=1) <= best_d[:, kk - 1])

            def merge(_):
                cat_d = jnp.concatenate([best_d, d], axis=1)
                cat_i = jnp.concatenate(
                    [best_i, jnp.broadcast_to(mpos[None, :], d.shape)],
                    axis=1)
                return select_k(cat_d, cat_i, kk)

            def keep(_):
                return best_d, best_i

            nbd, nbi = lax.cond(improves, merge, keep, None)
            return (r + 1, nbd, nbi, count + 1)

        init = (jnp.int32(0), jnp.full((chunk, kk), INF),
                jnp.full((chunk, kk), jnp.int32(-1)), count)
        if axis_name is not None:
            from kmcuda_tpu.ops.assign import _mark_varying
            init = _mark_varying(init, axis_name)
        (_r, bd, bi, count) = lax.while_loop(vcond, vbody, init)

        # exact cancellation-free rescore of the kk candidates
        cand = jnp.maximum(bi, 0)
        diff = (qb[:, None, :].astype(jnp.float32)
                - xm[cand].astype(jnp.float32))
        chord = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        if metric == D.DistanceMetric.L2:
            d_exact = chord
        else:
            d_exact = 2.0 * jnp.arcsin(jnp.clip(chord * 0.5, 0.0, 1.0))
        d_exact = jnp.where(bi < 0, INF, d_exact)
        d_sorted, i_sorted = select_k(d_exact, cand, k_neighbors)
        return count, (i_sorted, d_sorted)

    count0 = jnp.int32(0)
    if axis_name is not None:
        from kmcuda_tpu.ops.assign import _mark_varying
        count0 = _mark_varying(count0, axis_name)
    count, (nbr, dist) = lax.scan(
        per_chunk, count0,
        (xq.reshape(nchunks, chunk, f), xq_sq.reshape(nchunks, chunk),
         q_own.reshape(nchunks, chunk),
         q_assign.astype(jnp.uint32).reshape(nchunks, chunk),
         q_pos.reshape(nchunks, chunk),
         sorted_min_all, tile_order_all))
    if axis_name is not None:
        count = lax.psum(count, axis_name)
    return nbr.reshape(nb, k_neighbors), dist.reshape(nb, k_neighbors), count
