"""Exact k-nearest-neighbors over a clustered data set.

The reference pipeline (src/knn.cu:381-532): cluster radiuses -> cluster
pairwise-distance matrix -> per-sample search over clusters that survive the
triangle-inequality cutoff, with a fixed-k binary max-heap per sample
(knn.cu:133-175).

TPU rebuild, phase 1 (this file): a tiled brute-force search — distance
tiles on the MXU with a running top-k merge, queries sharded across the
mesh, members replicated (the reference replicates samples to every GPU
too, kmcuda.cc:593-598).  Results are exact and sorted ascending like the
reference's shmem heap drain (knn.cu:239-242).

Phase 2 (ops/knn_prune.py, later milestone) adds the cluster-level
triangle-inequality pruning (knn.cu:218-224) on top of the same top-k
merge, with the examined-fraction counter the reference reports
(knn.cu:521-530).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.ops import knn_prune as KP
from kmcuda_tpu.parallel.mesh import AXIS

# numpy, not jnp: module import must not initialize a jax backend (the C
# ABI's embedded interpreter selects its platform after import)
INF = np.float32(np.inf)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "tile_m", "axis_name"))
def _search(xq, xq_sq, q_ids, xm, m_valid, *, k, metric, chunk, tile_m,
            axis_name=None):
    """Brute-force exact top-k.

    xq:      (Nl, F) local query shard.
    q_ids:   (Nl,) global indices of the queries (for self-exclusion).
    xm:      (Nm, F) replicated member set (padded).
    m_valid: (Nm,) replicated member validity.
    Returns (neighbors (Nl, k) int32, distances (Nl, k) f32) sorted
    ascending by distance.
    """
    def mark_varying(tree):
        # queries are sharded, so the running top-k carry is device-varying
        if axis_name is None:
            return tree
        return jax.tree.map(
            lambda a: lax.pcast(a, (axis_name,), to="varying"), tree)
    nl, f = xq.shape
    nm = xm.shape[0]
    ntiles = nm // tile_m
    xm_sq = D.row_sq_norms(xm)
    m_ids = lax.broadcasted_iota(jnp.int32, (nm, 1), 0)[:, 0]
    m_pen = jnp.where(m_valid, 0.0, config.PAD_PENALTY)

    xmt = xm.reshape(ntiles, tile_m, f)
    sqt = xm_sq.reshape(ntiles, tile_m)
    pent = m_pen.reshape(ntiles, tile_m)
    idt = m_ids.reshape(ntiles, tile_m)

    nchunks = nl // chunk
    xqs = xq.reshape(nchunks, chunk, f)
    xqsqs = xq_sq.reshape(nchunks, chunk)
    qids = q_ids.reshape(nchunks, chunk)

    # run the MXU dot-form search for a few extra candidates, then rescore
    # them with the cancellation-free subtract-square form — the TPU analog
    # of the reference computing knn distances as Kahan-summed (v1-v2)^2
    # (metric_abstraction.h:59-70) rather than the dot-product form its
    # k-means kernels use.  The dot form's absolute error (~eps * |x|^2)
    # reorders near-ties; the exact rescore restores them.
    kk = min(k + max(16, k // 2), nm)

    def per_chunk(_, inp):
        qb, qsqb, qidb = inp

        def per_tile(carry, tile):
            best_d, best_i = carry
            mt, msqt, mpent, midt = tile
            s = D.scores(qb, mt.T.astype(qb.dtype), msqt, mpent, metric)
            d = D.finalize_distance(s, qsqb[:, None], metric)
            # exclude self (sklearn kneighbors() semantics, which the
            # reference is validated against, test.py:598-603)
            d = jnp.where(qidb[:, None] == midt[None, :], INF, d)
            d = jnp.where(mpent[None, :] > 0, INF, d)
            # skip the (expensive) select_k merge when the tile improves
            # no query's candidate buffer — one min-pass decides, '<=' so
            # knife-edge ties still merge (see ops/knn_prune.search)
            improves = jnp.any(jnp.min(d, axis=1) <= best_d[:, kk - 1])

            def merge(_):
                cat_d = jnp.concatenate([best_d, d], axis=1)
                cat_i = jnp.concatenate([best_i, jnp.broadcast_to(
                    midt[None, :], d.shape)], axis=1)
                # argmin-extraction selection (ties -> lowest member id)
                return KP.select_k(cat_d, cat_i, kk)

            return lax.cond(improves, merge,
                            lambda _: (best_d, best_i), None), None

        init = mark_varying((jnp.full((chunk, kk), INF),
                             jnp.full((chunk, kk), jnp.int32(-1))))
        (bd, bi), _ = lax.scan(per_tile, init, (xmt, sqt, pent, idt))

        # exact rescore of the kk candidates
        cand = jnp.maximum(bi, 0)
        diff = (qb[:, None, :] - xm[cand]).astype(jnp.float32)
        if metric == D.DistanceMetric.L2:
            d_exact = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        else:
            # for unit vectors angle = 2 asin(|x - y| / 2): precise near 0,
            # unlike acos(dot)
            chord = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            d_exact = 2.0 * jnp.arcsin(jnp.clip(chord * 0.5, 0.0, 1.0))
        d_exact = jnp.where(bi < 0, INF, d_exact)
        d_sorted, i_sorted = KP.select_k(d_exact, cand, k)
        return None, (i_sorted, d_sorted)

    _, (nbr, dist) = lax.scan(
        per_chunk, None, (xqs, xqsqs, qids))
    return nbr.reshape(nl, k), dist.reshape(nl, k)


@functools.lru_cache(maxsize=64)
def _build_search(mesh, k, metric, chunk, tile_m):
    fn = functools.partial(_search, k=k, metric=metric, chunk=chunk,
                           tile_m=tile_m, axis_name=AXIS)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(None, None), P(None)),
        out_specs=(P(AXIS, None), P(AXIS, None))))


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "metric", "chunk"))
def _cluster_structure(x, x_sq, valid, assign, centroids, *, n_clusters,
                       metric, chunk):
    """Exact own-centroid distances, cluster radiuses (knn.cu:20-58),
    cluster distance matrix (knn.cu:62-131, here one matmul) and the
    cluster-sort permutation (the CSR build of kmcuda.cc:648-691)."""
    nl, f = x.shape
    k = n_clusters
    a = jnp.where(valid & (assign < k), assign, jnp.uint32(k))
    # NaN-free lookup tables (0 * NaN = NaN would poison the one-hot
    # matmul below; dead centroids are NaN rows)
    c_raw = jnp.concatenate(
        [centroids.astype(jnp.float32), jnp.zeros((1, f), jnp.float32)])
    c_ext = jnp.where(jnp.isfinite(c_raw), c_raw, 0.0)
    c_sq_raw = jnp.sum(c_raw * c_raw, axis=1)
    c_sq_ext = jnp.where(jnp.isfinite(c_sq_raw), c_sq_raw,
                         config.PAD_PENALTY)
    nchunks = nl // chunk
    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)

    def body(_, inp):
        xb, xsqb, ab = inp
        oh = (ab[:, None] == iota_k1).astype(jnp.float32)
        # value lookups at HIGHEST: DEFAULT would bf16-round the table
        cb = jnp.dot(oh, c_ext, precision=lax.Precision.HIGHEST)
        prod = jnp.sum(xb.astype(jnp.float32) * cb, axis=1)
        if metric == D.DistanceMetric.L2:
            score = jnp.dot(oh, c_sq_ext,
                            precision=lax.Precision.HIGHEST) - 2.0 * prod
        else:
            score = -prod
        score = jnp.where(jnp.isfinite(score), score, config.PAD_PENALTY)
        return None, D.finalize_distance(score, xsqb, metric)

    _, d_own = lax.scan(
        body, None,
        (x.reshape(nchunks, chunk, f), x_sq.reshape(nchunks, chunk),
         a.reshape(nchunks, chunk)))
    d_own = d_own.reshape(nl)
    radii = jnp.zeros((k,), jnp.float32).at[a].max(
        jnp.where(a < k, d_own, 0.0), mode="drop")
    cd = D.pairwise_distance(c_raw[:-1], c_raw[:-1], metric)
    sorder = jnp.argsort(a, stable=True).astype(jnp.int32)
    return a, d_own, radii, cd, sorder


@functools.lru_cache(maxsize=64)
def _build_pruned_search(mesh, k_neighbors, n_clusters, metric, chunk,
                         tile_m, n_batch_chunks):
    from kmcuda_tpu.ops import knn_prune as KP

    fn = functools.partial(
        KP.search, k_neighbors=k_neighbors, n_clusters=n_clusters,
        metric=metric, chunk=chunk, tile_m=tile_m,
        n_batch_chunks=n_batch_chunks, axis_name=AXIS)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(None, None),
                  P(None), P(None, None), P()),
        out_specs=(P(AXIS, None), P(AXIS, None), P())))


def run(problem, centroids, assignments, k_neighbors: int):
    """k-NN of every sample, pruned via the k-means structure
    (knn_cuda_calc, knn.cu:381-532).  Falls back to plain brute force when
    the cluster structure cannot pay for itself."""
    from kmcuda_tpu.ops import knn_prune as KP

    p = problem
    # pruning granularity: aim for ~128 member tiles so a tile spans a
    # fraction of a cluster (the reference prunes per cluster per sample;
    # we prune per tile per query chunk)
    tile_m = min(config.KNN_TILE_M, max(256, p.n_pad // 128))
    while p.n_pad % tile_m:
        tile_m //= 2
    n_tiles = p.n_pad // tile_m

    if centroids is None or n_tiles < 2 or p.k < 2:
        q_ids = p.topo.put_sharded(jnp.arange(p.n_pad, dtype=jnp.int32))
        xm = p.topo.put_replicated(p.x)
        m_valid = p.topo.put_replicated(p.valid)
        search = _build_search(p.topo.mesh, k_neighbors, p.metric, p.chunk,
                               tile_m)
        nbr, dist = search(p.x, p.x_sq, q_ids, xm, m_valid)
        p.logger.info("calculated 1.000000 of all the distances")
        return nbr, dist

    # finer query chunks than the k-means scan: the tile-skip test is
    # per-chunk ("any query still needs this tile"), so smaller chunks
    # prune more
    q_chunk = config.KNN_TILE_Q if p.chunk % config.KNN_TILE_Q == 0 \
        else p.chunk

    cents = jnp.asarray(centroids, jnp.float32)
    a, d_own, radii, cd, sorder = _cluster_structure(
        p.x, p.x_sq, p.valid, assignments, cents, n_clusters=p.k,
        metric=p.metric, chunk=p.chunk)
    t_mat = KP.tile_bounds(
        cd, radii, a[sorder], p.valid[sorder], n_tiles, tile_m)

    # sorted layout: queries sharded, members replicated
    xq = p.topo.put_sharded(p.x[sorder])
    xq_sq = p.topo.put_sharded(p.x_sq[sorder])
    q_own = p.topo.put_sharded(d_own[sorder])
    q_assign = p.topo.put_sharded(a[sorder])
    xm = p.topo.put_replicated(p.x[sorder])
    m_valid = p.topo.put_replicated(p.valid[sorder])
    t_mat = p.topo.put_replicated(t_mat)

    # host-level batching: no single device dispatch runs unboundedly
    # long (weakly-prunable data makes an exact 1M+ search take tens of
    # minutes — one monolithic dispatch gets killed by runtime watchdogs
    # and reports no progress).  Results are batch-size independent.
    nl_local = p.n_pad // p.topo.n
    nchunks_local = nl_local // q_chunk
    k_batch = min(nchunks_local,
                  max(1, config.KNN_QUERY_BATCH // q_chunk))
    n_full = nchunks_local // k_batch
    rem = nchunks_local - n_full * k_batch
    search = _build_pruned_search(
        p.topo.mesh, k_neighbors, p.k, p.metric, q_chunk, tile_m, k_batch)
    parts, tiles = [], 0
    for b in range(n_full):
        nbp, dsb, tb = search(xq, xq_sq, q_own, q_assign, xm, m_valid,
                              t_mat, jnp.int32(b * k_batch))
        parts.append((nbp, dsb))
        tiles += int(tb)
        if n_full + (1 if rem else 0) > 1:
            p.logger.debug("knn: batch %d/%d (%d tile visits)"
                           % (b + 1, n_full + (1 if rem else 0), int(tb)))
    if rem:
        search_r = _build_pruned_search(
            p.topo.mesh, k_neighbors, p.k, p.metric, q_chunk, tile_m, rem)
        nbp, dsb, tb = search_r(xq, xq_sq, q_own, q_assign, xm, m_valid,
                                t_mat, jnp.int32(n_full * k_batch))
        parts.append((nbp, dsb))
        tiles += int(tb)

    def reassemble(ps):
        # each part is shard-major ((n_dev * rows_b, k)); concatenate the
        # per-device row blocks in batch order
        nd = p.topo.n
        blocks = [q.reshape(nd, -1, q.shape[-1]) for q in ps]
        return jnp.concatenate(blocks, axis=1).reshape(-1, ps[0].shape[-1])

    nbr_pos = reassemble([q for q, _ in parts])
    dist = reassemble([d for _, d in parts])

    frac = float(tiles) * q_chunk * tile_m / (float(p.n) ** 2)
    # same progress line as the reference (knn.cu:521-530)
    p.logger.info("calculated %f of all the distances" % min(frac, 1.0))

    # map candidate sorted-positions back to original sample ids, and
    # un-sort the query rows
    nbr_orig = jnp.where(nbr_pos >= 0, sorder[jnp.maximum(nbr_pos, 0)],
                         -1)
    n_pad, kk = p.n_pad, k_neighbors
    out_n = jnp.zeros((n_pad, kk), jnp.int32).at[sorder].set(nbr_orig)
    out_d = jnp.zeros((n_pad, kk), jnp.float32).at[sorder].set(dist)
    return out_n, out_d
