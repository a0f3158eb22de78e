"""Triangle-inequality-pruned exact k-NN search.

The reference (src/knn.cu:178-318) gives every sample a thread that scans
its own cluster, then every other cluster c unless
``CD(own, c) - d_own - R(c) > kth`` (knn.cu:218-224), maintaining a binary
max-heap of k candidates (knn.cu:133-175), and counts how many distances it
actually computed (knn.cu:16,521-530).

TPU-native redesign — the unit of search is a *query chunk* and a *member
tile*, not a thread and a candidate:

- members are laid out **cluster-sorted and packed** (:func:`packed_layout`
  — no per-cluster padding; tiles are fixed windows that may span cluster
  boundaries, each carrying its (cluster, tile) incidences), and the tile
  pruning bound is ``min over the tile's clusters of
  (min over the chunk's queries of d(q, center_c)) - R(c)`` — the DIRECT
  form of the reference's cutoff (one triangle inequality instead of its
  two, strictly tighter than ``CD(own, c) - d_own - R(c)``);
- each query chunk visits tiles most-promising-first (ascending chunk-min
  bound) in a dynamic-trip-count while loop that stops as soon as the next
  tile's bound exceeds every query's running kth distance;
- the running top-k buffer replaces the heap; merges are **logarithmic
  depth** (:func:`merge_block`: ``lax.top_k`` over the tile then one
  bitonic ``lax.sort`` over 2*kk columns) instead of the reference's
  O(log k)-per-candidate sift — and instead of this module's former
  k-sequential min-passes, which unrolled O(k^2) work and could not
  compile at large k;
- visited-tile member counts give the reference's ``calculated %f of all
  the distances`` pruning metric.

Exactness: all bounds live in true-distance space with a downward slack on
the tile bound and an upward margin on kth, so dot-form rounding can only
weaken pruning, never drop a true neighbor; the surviving candidates get
the same exact subtract-square rescore as the brute-force path.

Candidates are tracked as *padded-layout positions* during the search
(the merge tie-break is lexicographic in packed id space) and relabeled
to original sample indices inside the exact rescore, whose candidate-row
gather already pays the HBM traffic.
"""

import functools

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

#: bound value marking tiles that must never be visited (unused padding
#: tiles, all-invalid chunks); any bound >= STOP_BOUND ends the tile walk
#: regardless of the running kth distance.  Kept well below PAD_PENALTY so
#: arithmetic on it stays finite.
BIG_BOUND = np.float32(1e29)
STOP_BOUND = np.float32(1e28)


def select_k(d, idx, kk):
    """Ascending (distance, id)-lexicographic k-smallest selection.

    One bitonic ``lax.sort`` with ``num_keys=2`` — exactly the
    (distance, id) lexicographic order, log^2-depth, compile size
    independent of ``kk`` (the former implementation unrolled kk
    sequential min-passes and could not compile at large k).

    d:   (n, m) candidate distances (no NaNs).
    idx: (n, m) candidate ids (unique per row among finite-distance
         entries).
    Returns (dists (n, kk), ids (n, kk)) ascending by (distance, id).
    """
    sd, si = lax.sort((d, idx), dimension=1, num_keys=2)
    return sd[:, :kk], si[:, :kk]


def candidate_kk(k_neighbors: int, n_members: int) -> int:
    """Running candidate-buffer width: k plus slack so near-boundary
    candidates survive the dot-form ranking until the exact rescore.
    Single source of truth — the Pallas engagement gate sizes itself
    from the same number (models/knn.run)."""
    return min(k_neighbors + max(16, k_neighbors // 2), n_members)


def exact_rescore(qb, bi, xm, metric, k_neighbors, orig_pos=None):
    """Cancellation-free exact rescore of kk candidate ids + final
    top-k_neighbors selection — shared by the XLA and Pallas walks.

    The search ranks by dot-form distances (fast, slack-padded); the
    survivors get the subtract-square form the reference's knn kernels
    use throughout (metric_abstraction.h:59-70) so near-ties come back
    in exact order.  bi < 0 marks empty buffer slots.

    orig_pos (optional, (M,) int32): packed position -> original sample
    id.  When given, the returned ids are relabeled to original ids HERE
    — the candidate rows are being gathered from HBM for the rescore
    anyway, so the extra int lookup rides the same index stream; doing
    it afterwards as a standalone (n, k) elementwise gather cost 143 ms
    at the 1M benchmark (it was the 3rd-largest program in the trace).
    The (distance, id) tie-break still happens in PACKED id space
    (select_k runs before the relabel), which is what the bit-parity
    locks between the XLA and Pallas walks assume."""
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
    if orig_pos is not None:
        i_sorted = jnp.where(jnp.isfinite(d_sorted),
                             orig_pos[i_sorted], -1)
    else:
        i_sorted = jnp.where(jnp.isfinite(d_sorted), i_sorted, -1)
    return i_sorted, d_sorted


def merge_block(best_d, best_i, d, id_base, kk):
    """Merge a (distance, id)-sorted running top-kk buffer with a fresh
    scored block whose ids are ``id_base + column``.

    The reference's heap does O(log k) per *candidate*
    (push_sample, knn.cu:133-175); on TPU the block arrives as one matmul
    tile, so the merge is per *tile*: ``lax.top_k`` reduces the block to
    its kk lexicographically-smallest pairs (top_k keeps the lower column
    on ties, and columns are ascending ids, so the selection is exactly
    lexicographic), then one small sort merges 2*kk columns.  Cost is
    O(m log kk + kk log^2 kk) per merge — independent of how the caller
    gates merges.
    """
    kc = min(kk, d.shape[1])
    neg_d, col = lax.top_k(-d, kc)
    cat_d = jnp.concatenate([best_d, -neg_d], axis=1)
    cat_i = jnp.concatenate([best_i, id_base + col], axis=1)
    return select_k(cat_d, cat_i, kk)


@functools.partial(jax.jit, static_argnames=("k", "tile_m", "n_tiles"))
def packed_layout(a_sorted, *, k, tile_m, n_tiles):
    """Packed (no-padding) member layout plan.

    The reference builds a host CSR (cluster -> member list,
    kmcuda.cc:648-691) so its search kernel can scan whole clusters and
    apply one cutoff per cluster.  Here the cluster-sorted members ARE
    the layout — no per-cluster padding at all — and tiles are fixed
    tile_m-row windows that may span cluster boundaries.  (The previous
    design padded every cluster to a tile boundary, which kept tiles
    single-cluster but inflated the member/query array by up to
    k * tile_m rows: 57% at the 1M x 1024 benchmark shape and 65x at
    k = 16,384 with 2-member clusters.  Multi-cluster tiles cost only a
    min over each tile's cluster *range* in the bound pass.)

    a_sorted: (n_pad,) cluster ids in ascending sorted order (k = invalid,
              sorts to the end — so valid members occupy a contiguous
              prefix).  ``n_tiles`` is static; rows beyond n_pad are
              filler (the caller guarantees at least one whole filler
              tile at the end for the grouped walk's tail padding).
    Returns:
      inc_c: (n_tiles + k,) int32 — cluster of each (cluster, tile)
             incidence, k = unused slot.
      inc_t: (n_tiles + k,) int32 — tile of that incidence (unused slots
             point at the guaranteed-filler tile n_tiles - 1).
      tile_nvalid: (n_tiles,) real members in each tile.
    """
    i32 = jnp.int32
    a = a_sorted.astype(i32)
    szk = jnp.zeros((k,), i32).at[a].add(1, mode="drop")
    end_m = jnp.cumsum(szk)                       # member end per cluster
    off_m = end_m - szk
    t0 = off_m // tile_m                          # first tile touched
    t1 = jnp.maximum(end_m - 1, 0) // tile_m      # last tile touched
    span = jnp.where(szk > 0, t1 - t0 + 1, 0)
    slot_end = jnp.cumsum(span)
    L = n_tiles + k                               # sum(span) <= L always
    iota_l = lax.broadcasted_iota(i32, (L, 1), 0)[:, 0]
    cidx = jnp.searchsorted(slot_end, iota_l, side="right").astype(i32)
    ok = iota_l < slot_end[k - 1]
    cc = jnp.minimum(cidx, k - 1)
    slot_start = slot_end[cc] - span[cc]
    inc_t = jnp.where(ok, t0[cc] + (iota_l - slot_start),
                      i32(n_tiles - 1))
    inc_c = jnp.where(ok, cc, i32(k))

    # valid members occupy packed positions [0, n_valid): invalid rows
    # carry cluster id k and sort to the end
    n_valid = jnp.sum((a_sorted < jnp.uint32(k)).astype(i32))
    tile_ids = lax.broadcasted_iota(i32, (n_tiles, 1), 0)[:, 0]
    tile_nvalid = jnp.clip(n_valid - tile_ids * tile_m, 0, tile_m)
    return inc_c, inc_t, tile_nvalid


def search(xq, xq_sq, q_assign, xm, xm_sq, m_spos, orig_pos, c_rank, r_ext,
           inc_c, inc_t, tile_nvalid, xm_walk, chunk_base, *,
           k_neighbors, n_clusters, metric, chunk, tile_m, group,
           n_batch_chunks, use_pallas=False, pallas_interpret=False,
           axis_name=None):
    """Pruned search over one batch of the local query shard
    (cluster-sorted packed layout; tiles may span cluster boundaries).

    xq/xq_sq/q_assign: local shard of the sorted queries — rows,
      squared norms, cluster id (k invalid).
    xm:     (M, F) replicated packed members (= the sorted queries plus
      filler rows; one array serves both sides).
    xm_sq:  (M,) replicated member squared norms, computed ONCE by the
      driver (recomputing inside cost a full 1 GB member-array read per
      host batch at the 1M benchmark).
    m_spos: (M,) global *sorted position* of each packed row (-1 for
      invalid/filler); doubles as validity and as the self-exclusion key.
    orig_pos: (M,) packed position -> original sample id (-1 invalid);
      neighbor ids are relabeled inside the rescore (see exact_rescore).
    c_rank: (k, F) fp32 rank-space centroids (NaN rows = dead clusters;
      dead clusters have no members hence no incidences, so their zeroed
      rows never produce a visited tile).
    r_ext:  (k,) cluster radiuses, NaN (empty) -> 0.
    inc_c/inc_t/tile_nvalid: the :func:`packed_layout` plan.
    xm_walk: the member array as fed to the fused Pallas walk — normally
      ``xm`` itself, or a once-padded (M, f_pad) copy when f is not a
      lane multiple (ADVICE r3: padding inside the walk re-materialized
      the copy per host batch dispatch).  Ignored by the XLA walk.
    group: tiles processed per walk step.  One tile per step spends more
      time on loop dispatch than on the (tiny) tile matmul; grouping
      makes the matmul (chunk, group*tile_m) MXU-sized at the cost of
      over-visiting at most group-1 tiles per chunk walk.  Requires the
      caller to guarantee tile nt-1 is an unused filler (the walk's tail
      padding duplicates it; a duplicated REAL tile would double its
      members' (distance, id) pairs and crowd true neighbors out of the
      merge buffer).
    chunk_base: first local chunk of this batch (traced scalar); the call
      processes local rows [chunk_base*chunk, (chunk_base +
      n_batch_chunks)*chunk).  The driver loops over batches so no single
      device dispatch runs unboundedly long (see config.KNN_QUERY_BATCH).

    Returns (neighbors (n_batch_chunks*chunk, k) int32 — *original
    sample ids*, distances (..., k) f32 ascending, examined () f32 —
    number of (query, member) distances examined, psum'd across the
    mesh).
    """
    nl, f = xq.shape
    nm = xm.shape[0]
    nt = nm // tile_m
    k = n_clusters
    kk = candidate_kk(k_neighbors, nm)

    m_pen = jnp.where(m_spos >= 0, 0.0, config.PAD_PENALTY)
    # absolute dot-form error envelope coefficient (0 = fp32 storage,
    # whose HIGHEST-precision scores the relative SLACK already covers)
    eps_env = 0.0 if jnp.dtype(xq.dtype) == jnp.float32 else 2.0 ** -8

    nchunks = n_batch_chunks
    nb = nchunks * chunk
    row_base = chunk_base * chunk
    xq = lax.dynamic_slice(xq, (row_base, 0), (nb, f))
    xq_sq = lax.dynamic_slice(xq_sq, (row_base,), (nb,))
    q_assign = lax.dynamic_slice(q_assign, (row_base,), (nb,))
    iota_m = lax.broadcasted_iota(jnp.int32, (1, tile_m), 1)
    # global sorted position of each query row in this batch
    if axis_name is not None:
        shard_off = lax.axis_index(axis_name) * nl
    else:
        shard_off = 0
    q_pos = (shard_off + row_base
             + lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0])

    # ---- pass 1: per-chunk tile bounds, ONE batched sort ----------------
    # A tile of the packed layout spans a contiguous cluster RANGE, so
    # the bound generalizes the reference's per-cluster cutoff
    # (knn.cu:218-224) over the tile's (cluster, tile) incidences:
    #   b[chunk, tile] = min over clusters c in the tile of
    #                      (min over queries q of d(q, center_c)) - R[c]
    # using the DIRECT query-to-centroid distance — one triangle
    # inequality instead of the reference's two (CD[a_q,c] - d_own - R),
    # strictly tighter, and no k x k matrix exists anywhere (the
    # reference's own O(k^2) ceiling, knn.cu:425-488).  The distance
    # block is one assignment-shaped matmul per batch, always computed
    # in fp32-HIGHEST so the bound's error envelope stays at fp32 scale
    # even for bf16 member storage.
    # Visit order is most-promising-first (ascending bound); the sort runs
    # OUTSIDE the search scan, batched over all chunks (one (nchunks, nt)
    # sort is cheaper than nchunks small ones, and a lax.sort inside a
    # large scanned search once faulted the TPU runtime).
    c_safe = jnp.where(jnp.isfinite(c_rank), c_rank, 0.0)
    c_safe_sq = jnp.sum(c_safe * c_safe, axis=1)
    qv = q_assign < k

    # slab = as many chunks as fit a bounded (rows, k) fp32 intermediate:
    # a per-chunk scan made this matmul (chunk x f x k) too small for the
    # MXU — 77 us/chunk, 295 ms/run at the 1M benchmark vs ~1 ms/slab for
    # the same FLOPs batched.  Power-of-2 divisor of nchunks so the scan
    # reshape is exact; cap at 2^25 elements (128 MB) of scratch.
    slab_chunks = 1
    while (slab_chunks * 2 * chunk * max(k, 1) <= (1 << 25)
           and nchunks % (slab_chunks * 2) == 0):
        slab_chunks *= 2
    nslabs = nchunks // slab_chunks
    slab_rows = slab_chunks * chunk

    def slab_umin(_, inp):
        qb, qsqb, vb = inp
        prod = jnp.dot(qb.astype(jnp.float32), c_safe.T,
                       precision=lax.Precision.HIGHEST)
        if metric == D.DistanceMetric.L2:
            dd = jnp.sqrt(jnp.maximum(
                c_safe_sq[None, :] - 2.0 * prod + qsqb[:, None], 0.0))
        else:
            dd = jnp.arccos(jnp.clip(prod, -1.0, 1.0))
        dd = jnp.where(vb[:, None], dd, INF)
        return None, jnp.min(dd.reshape(slab_chunks, chunk, k), axis=1)

    _, u_all = lax.scan(
        slab_umin, None,
        (xq.reshape(nslabs, slab_rows, f),
         xq_sq.reshape(nslabs, slab_rows),
         qv.reshape(nslabs, slab_rows)))
    u_all = u_all.reshape(nchunks, k)                       # (nchunks, k)
    inc_cc = jnp.minimum(inc_c, k - 1)
    vals = u_all[:, inc_cc] - r_ext[inc_cc][None, :]        # (nchunks, L)
    vals = vals - SLACK * (1.0 + jnp.abs(vals))
    vals = jnp.where(jnp.isfinite(vals) & (inc_c < k)[None, :],
                     vals, BIG_BOUND)
    tb_all = jnp.full((nchunks, nt), BIG_BOUND).at[:, inc_t].min(vals)
    iota_nt = jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (1, nt), 1), tb_all.shape)
    sorted_min_all, tile_order_all = lax.sort(
        (tb_all, iota_nt), dimension=1, num_keys=1)
    if group > 1:
        # tail padding for the grouped walk: tile nt-1 is an unused
        # filler by the caller's contract, safe to visit repeatedly
        sorted_min_all = jnp.concatenate(
            [sorted_min_all,
             jnp.full((nchunks, group - 1), BIG_BOUND)], axis=1)
        tile_order_all = jnp.concatenate(
            [tile_order_all,
             jnp.full((nchunks, group - 1), nt - 1, jnp.int32)], axis=1)

    # ---- pass 2 (Pallas): the whole walk as one Mosaic kernel -----------
    if use_pallas:
        from kmcuda_tpu.ops import knn_pallas as KNP

        q_valid = q_assign < k
        n_qvalid_c = jnp.sum(q_valid.reshape(nchunks, chunk),
                             axis=1).astype(jnp.int32)
        # sorted bounds ascend, so the step bound is the finite prefix;
        # the tau-based early stop inside the kernel cuts further
        count_lt = jnp.sum((sorted_min_all < STOP_BOUND).astype(jnp.int32),
                           axis=1)
        n_steps = -(-count_lt // group)
        bi, count = KNP.walk(
            xq, xq_sq, q_pos, q_valid, n_qvalid_c, n_steps,
            tile_order_all, sorted_min_all, tile_nvalid, xm_walk, xm_sq,
            m_spos, k_neighbors=k_neighbors, kk=kk, chunk=chunk,
            tile_m=tile_m, group=group, metric=metric, eps_env=eps_env,
            interpret=pallas_interpret, axis_name=axis_name)

        def resc(_, inp):
            qb, bib = inp
            return None, exact_rescore(qb, bib, xm, metric, k_neighbors,
                                       orig_pos)

        _, (nbr, dist) = lax.scan(
            resc, None,
            (xq.reshape(nchunks, chunk, f),
             bi[:, :kk].reshape(nchunks, chunk, kk)))
        if axis_name is not None:
            count = lax.psum(count, axis_name)
        return (nbr.reshape(nb, k_neighbors),
                dist.reshape(nb, k_neighbors), count)

    # ---- pass 2 (XLA): the pruned search, tile order precomputed --------
    def per_chunk(count, inp):
        qb, qsqb, ab, qposb, sorted_min, tile_order = inp
        q_valid = ab < k
        n_qvalid = jnp.sum(q_valid.astype(jnp.float32))
        # stop once the next tile's chunk-min bound exceeds every query's
        # running kth distance: all later tiles bound even higher, so the
        # visited prefix is provably sufficient.  A dynamic-trip while
        # beats a cond-per-tile scan (skipped tail costs nothing, and the
        # nested cond-in-scan-in-scan construct faulted the TPU at scale).

        def vcond(carry):
            r, best_d, _best_i, _ex = carry
            tau_max = jnp.max(best_d[:, k_neighbors - 1])
            return ((r < nt) & (sorted_min[r] <= tau_max)
                    & (sorted_min[r] < STOP_BOUND))

        def vbody(carry):
            r, best_d, best_i, ex = carry
            js = lax.dynamic_slice(tile_order, (r,), (group,))
            mt = jnp.concatenate(
                [lax.dynamic_slice(xm, (js[g] * tile_m, 0), (tile_m, f))
                 for g in range(group)], axis=0)
            msq = jnp.concatenate(
                [lax.dynamic_slice(xm_sq, (js[g] * tile_m,), (tile_m,))
                 for g in range(group)])
            mpen = jnp.concatenate(
                [lax.dynamic_slice(m_pen, (js[g] * tile_m,), (tile_m,))
                 for g in range(group)])
            s = D.scores(qb, mt.T.astype(qb.dtype), msq, mpen, metric)
            d = D.finalize_distance(s, qsqb[:, None], metric)
            d = d * (1.0 + SLACK)  # upward kth margin
            if eps_env > 0.0:
                # bf16 storage: the dot-form score's ABSOLUTE error scales
                # with the operand magnitudes (~2^-8 * (|q|^2 + |m|^2)),
                # which a relative margin on d cannot cover when d << |q|
                # (ADVICE r2).  Inflating every candidate distance by the
                # sqrt-envelope keeps tau (the early-stop threshold) a
                # true upper bound of the kth distance: pruning weakens,
                # exactness holds; the final rescore restores exact order.
                if metric == D.DistanceMetric.L2:
                    d = d + jnp.sqrt(
                        eps_env * (qsqb[:, None] + msq[None, :]))
                else:
                    d = d + np.float32(np.sqrt(2.0 * eps_env))
            # queries ARE padded rows, so self-exclusion compares padded
            # positions directly (member tile j covers positions
            # [j*tile_m, (j+1)*tile_m))
            mpos = (js[:, None] * tile_m + iota_m).reshape(group * tile_m)
            d = jnp.where(qposb[:, None] == mpos[None, :], INF, d)
            d = jnp.where(mpen[None, :] > 0, INF, d)
            # one cheap min-pass decides whether the merge runs at all —
            # most visited tiles improve nobody's buffer.  '<=' (not '<')
            # so a knife-edge tie still merges and id-tie-breaking stays
            # exact.
            improves = jnp.any(
                jnp.min(d, axis=1) <= best_d[:, kk - 1])

            def merge(_):
                # top_k PER TILE, not over the whole group block: top_k
                # resolves distance ties by lower column, which is the
                # lower id only when columns ascend in id — true within
                # one tile, not across the group's bound-ordered tiles.
                # The per-tile kc survivors then meet in one (distance,
                # id)-lexicographic sort, so the exact tie-break contract
                # holds for any group size.
                kc = min(kk, tile_m)
                dg = d.reshape(d.shape[0], group, tile_m)
                neg_d, col = lax.top_k(-dg, kc)          # (nbq, group, kc)
                cand_i = js[None, :, None] * tile_m + col
                cat_d = jnp.concatenate(
                    [best_d, (-neg_d).reshape(d.shape[0], group * kc)],
                    axis=1)
                cat_i = jnp.concatenate(
                    [best_i, cand_i.reshape(d.shape[0], group * kc)],
                    axis=1)
                return select_k(cat_d, cat_i, kk)

            def keep(_):
                return best_d, best_i

            nbd, nbi = lax.cond(improves, merge, keep, None)
            return (r + group, nbd, nbi,
                    ex + jnp.sum(tile_nvalid[js]).astype(jnp.float32)
                    * n_qvalid)

        # invalid (padding / NaN) queries start at -inf so they never
        # inflate tau_max into a full scan; their rows come out as
        # (-inf, -1) and are discarded by the caller
        best_d0 = jnp.where(q_valid[:, None], INF, -INF)
        best_d0 = jnp.broadcast_to(best_d0, (chunk, kk))
        init = (jnp.int32(0), best_d0,
                jnp.full((chunk, kk), jnp.int32(-1)), count)
        if axis_name is not None:
            from kmcuda_tpu.ops.assign import _mark_varying
            init = _mark_varying(init, axis_name)
        (_r, bd, bi, count) = lax.while_loop(vcond, vbody, init)

        i_sorted, d_sorted = exact_rescore(qb, bi, xm, metric, k_neighbors,
                                           orig_pos)
        return count, (i_sorted, d_sorted)

    count0 = jnp.float32(0)
    if axis_name is not None:
        from kmcuda_tpu.ops.assign import _mark_varying
        count0 = _mark_varying(count0, axis_name)
    count, (nbr, dist) = lax.scan(
        per_chunk, count0,
        (xq.reshape(nchunks, chunk, f), xq_sq.reshape(nchunks, chunk),
         q_assign.astype(jnp.uint32).reshape(nchunks, chunk),
         q_pos.reshape(nchunks, chunk),
         sorted_min_all, tile_order_all))
    if axis_name is not None:
        count = lax.psum(count, axis_name)
    return nbr.reshape(nb, k_neighbors), dist.reshape(nb, k_neighbors), count
