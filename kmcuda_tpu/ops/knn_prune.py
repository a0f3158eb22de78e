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

    ``lax.top_k`` / ``lax.sort`` inside this search's while-loop fault the
    TPU runtime at scale (isolated empirically: the identical loop with the
    merge removed runs clean at 1M+ samples, adding either sort op faults
    the device).  This selection uses only min / compare / where — the ops
    the proven-clean variant used — at ``kk`` passes over the candidate
    row, ~5-15%% of the tile matmul's work for typical (k, features).

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


def search(xq, xq_sq, q_own, q_assign, xm, m_valid, t_mat, *,
           k_neighbors, n_clusters, metric, chunk, tile_m, axis_name=None):
    """Pruned search over the local query shard (cluster-sorted layout).

    xq/xq_sq/q_own/q_assign: local shard of the sorted queries — rows,
      squared norms, exact own-centroid distance, cluster id (k invalid).
    xm/m_valid: replicated sorted members + validity.
    t_mat: (k+1, n_tiles) tile bounds.

    Returns (neighbors (Nl, k) int32 — *sorted positions*, distances
    (Nl, k) f32 ascending, tiles_computed () int32 — number of
    (chunk, tile) score matmuls executed, psum'd across the mesh).
    """
    nl, f = xq.shape
    nm = xm.shape[0]
    nt = nm // tile_m
    k = n_clusters
    kk = min(k_neighbors + max(16, k_neighbors // 2), nm)

    xm_sq = D.row_sq_norms(xm)
    m_pen = jnp.where(m_valid, 0.0, config.PAD_PENALTY)

    nchunks = nl // chunk
    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)
    iota_m = lax.broadcasted_iota(jnp.int32, (1, tile_m), 1)
    # global sorted position of each local query row
    if axis_name is not None:
        shard_off = lax.axis_index(axis_name) * nl
    else:
        shard_off = 0
    q_pos = shard_off + lax.broadcasted_iota(jnp.int32, (nl, 1), 0)[:, 0]

    def per_chunk(count, inp):
        qb, qsqb, ownb, ab, qposb = inp
        oh = (ab[:, None] == iota_k1).astype(jnp.float32)
        tb = jnp.dot(oh, t_mat,
                     precision=lax.Precision.HIGHEST) - ownb[:, None]
        tb = tb - SLACK * (1.0 + jnp.abs(tb))
        tb_min = jnp.min(tb, axis=0)                         # (nt,)
        # visit tiles most-promising-first and STOP once the next tile's
        # chunk-min bound exceeds every query's running kth distance: all
        # later tiles bound even higher, so the visited prefix is provably
        # sufficient.  A dynamic-trip while beats a cond-per-tile scan
        # (skipped tail costs nothing, and the nested cond-in-scan-in-scan
        # construct faulted the TPU at scale).
        sorted_min, tile_order = lax.sort(
            (tb_min, jnp.arange(nt, dtype=jnp.int32)), num_keys=1)

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
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(mpos[None, :], d.shape)],
                axis=1)
            nbd, nbi = select_k(cat_d, cat_i, kk)
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
         q_pos.reshape(nchunks, chunk)))
    if axis_name is not None:
        count = lax.psum(count, axis_name)
    return nbr.reshape(nl, k_neighbors), dist.reshape(nl, k_neighbors), count
