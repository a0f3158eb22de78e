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
from jax import lax
from jax.sharding import PartitionSpec as P

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.parallel.mesh import AXIS

INF = jnp.float32(jnp.inf)


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
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, jnp.broadcast_to(
                midt[None, :], d.shape)], axis=1)
            # top_k is stable (prefers lower positions), so earlier members
            # win ties — matching ascending-id tie order.
            neg_top, arg = lax.top_k(-cat_d, kk)
            return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

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
        d_sorted, i_sorted = lax.sort((d_exact, cand), num_keys=2)
        return None, (i_sorted[:, :k], d_sorted[:, :k])

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


def run(problem, k_neighbors: int):
    """Search the problem's own samples for each sample's k nearest others."""
    p = problem
    tile_m = min(config.KNN_TILE_M, p.n_pad)
    # member tiling must divide the padded size
    while p.n_pad % tile_m:
        tile_m //= 2
    q_ids = p.topo.put_sharded(jnp.arange(p.n_pad, dtype=jnp.int32))
    xm = p.topo.put_replicated(p.x)
    m_valid = p.topo.put_replicated(p.valid)
    search = _build_search(p.topo.mesh, k_neighbors, p.metric, p.chunk,
                           tile_m)
    nbr, dist = search(p.x, p.x_sq, q_ids, xm, m_valid)
    return nbr, dist
