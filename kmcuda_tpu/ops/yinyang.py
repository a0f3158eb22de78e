"""Yinyang k-means iteration (reference: src/kmeans.cu:432-672, 1028-1263).

State per sample: upper bound ``u`` on the distance to its assigned
centroid and per-group lower bounds ``l[g]`` on the distance to any *other*
centroid of group g (kmeans_yy_init, kmeans.cu:432-485).  Per iteration:

1. adjust centroids from the running sums; per-centroid drift
   (kmeans_yy_calc_drifts, kmeans.cu:488-499) and per-group max drift
   (kmeans_yy_find_group_max_drifts, kmeans.cu:501-538);
2. *global filter*: u += drift[assigned], l[g] -= group_drift[g]; samples
   with u < min_g l[g] provably keep their assignment
   (kmeans_yy_global_filter, kmeans.cu:541-582).  The per-sample drift
   lookup is a one-hot matvec (a gather from a small table lowers to
   element-serial code on TPU); exact per-centroid drift keeps the filter
   as tight as the reference's — a group-level bound was measured to leave
   ~half the data candidate forever;
3. candidates are compacted and walked by a dynamic-trip-count loop that
   first tightens u to the exact own-centroid distance (per-candidate F
   work) and, only when some candidate in the chunk still passes, runs the
   full *local filter* assignment matmul (kmeans_yy_local_filter,
   kmeans.cu:585-672), which also yields fresh exact bounds.

TPU-native design decisions:

- The local filter's score matmul uses the SAME centroid column layout as
  the Lloyd pass — groups are NOT materialized as a permuted centroid
  matrix.  Group minima come from a cheap lane-gather of the score row into
  a capacity-balanced padded (G, P) layout.  Identical matmuls mean
  bitwise-identical assignments between Lloyd and Yinyang by construction
  (the reference's parity guarantee, README.md:74-75).
- Compaction is a cumsum stable partition (no atomics — the analog of the
  reference's ``d_passed_number`` scatter); the candidate loop is a
  ``lax.while_loop`` with trip count ceil(candidates / chunk), so skipped
  work costs nothing (a full scan would pay per-chunk scaffolding).
- Per-cluster value lookups on compacted chunks go through one-hot
  matmuls: TPU gathers from small tables lower to element-serial code.
- No explicit "bounds refresh" pass is needed (the reference re-runs
  yy_init when almost everything passes, kmeans.cu:1117-1158): every passed
  sample gets exact bounds from the local filter, so a nearly-all-passed
  iteration IS the refresh.
- Centroid updates are delta-updates over the compacted changed set
  (ops.compact.delta_sums), exactly like the reference's incremental
  kmeans_adjust — and bitwise identical to the incremental Lloyd path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from kmcuda_tpu import config
from kmcuda_tpu.ops import compact as C
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.ops.assign import LOG_CAPACITY, _mark_varying, pad_clusters


def exact_drift(c_new, c_old, metric):
    """Per-centroid movement distance, NaN-sanitized (the reference skips
    'insane' centroids, kmeans.cu:466-470; a NaN centroid is permanently
    empty so zero drift is exact)."""
    diff = c_new - c_old
    chord = jnp.sqrt(jnp.sum(diff * diff, axis=1))
    if metric == D.DistanceMetric.L2:
        drift = chord
    else:
        # geodesic upper bound via the chord: 2 asin(|a-b|/2), precise near
        # 0 unlike acos(<a,b>)
        drift = 2.0 * jnp.arcsin(jnp.clip(chord * 0.5, 0.0, 1.0))
    return jnp.where(jnp.isnan(drift), 0.0, drift)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "groups", "group_cap", "metric", "chunk",
                     "axis_name"))
def yy_run(x, x_sq, valid, assign0, centroids0, sums0, counts0,
           pad_src, pad_pen, tol_count, max_iterations, *,
           n_clusters: int, groups: int, group_cap: int,
           metric: D.DistanceMetric, chunk: int, axis_name=None):
    """Run the Yinyang main loop on device.

    pad_src:  (G, P) int32 — centroid id per padded group slot (0 for pads).
    pad_pen:  (G, P) fp32 — 0 for real slots, +PAD_PENALTY for pads.

    Returns (centroids_used, assign, iterations, changed_log, passed_log).
    """
    k, g, p = n_clusters, groups, group_cap
    nl, f = x.shape
    nchunks = nl // chunk
    iota_g = lax.broadcasted_iota(jnp.int32, (1, g), 1)
    iota_p = lax.broadcasted_iota(jnp.int32, (1, p), 1)
    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)
    pad_src_flat = pad_src.reshape(-1)
    pad_pen_flat = pad_pen.reshape(-1)

    # the bounds pass touches every sample anyway; wider chunks amortize
    # the per-scan-step scaffolding
    cheap_mult = 1
    for m in (8, 4, 2):
        if nchunks % m == 0:
            cheap_mult = m
            break
    cheap_chunk = chunk * cheap_mult
    ncheap = nl // cheap_chunk
    vc = valid.reshape(ncheap, cheap_chunk)
    offs = lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]

    def cond(carry):
        it, changed = carry[5], carry[6]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations))

    def body(carry):
        (c_cur, assign, u, l, sc, it, _changed, log_ch,
         log_pa) = carry
        sums, counts = sc
        first = it == 0
        c_new = D.normalize_centroids(
            sums, counts.astype(jnp.float32), metric)
        drift = exact_drift(c_new, c_cur, metric)
        gdrift = jnp.max(
            jnp.where(pad_pen > 0, 0.0, drift[pad_src]), axis=1)
        drift_ext = jnp.concatenate(
            [drift, jnp.zeros((1,), jnp.float32)])
        c_new_ext = jnp.concatenate(
            [c_new, jnp.zeros((1, f), jnp.float32)])
        c_sq_ext = jnp.concatenate(
            [D.row_sq_norms(c_new), jnp.zeros((1,), jnp.float32)])
        c_t, c_sq_pad, penalty, orig_ids = pad_clusters(c_new, x.dtype)

        # ---- phase 1: drift the bounds, global filter ------------------
        # exact per-centroid drift for u (as tight as the reference's
        # filter), looked up through a one-hot matvec on the MXU
        def cheap(_, inp):
            vb, ab, ub, lb = inp
            oh = (ab[:, None] == iota_k1).astype(x.dtype)
            u2 = ub + jnp.dot(oh, drift_ext.astype(x.dtype),
                              preferred_element_type=jnp.float32)
            l2 = lb - gdrift[None, :]
            lmin = jnp.min(l2, axis=1)
            # '>=', not '>': a knife-edge tie must reach the local filter
            # so its score-space argmin matches Lloyd's exactly
            cand = vb & (first | (u2 >= lmin))
            return None, (u2, l2, lmin, cand)

        _, (u2, l2, lmin_all, cand) = lax.scan(
            cheap, None,
            (vc, assign.reshape(ncheap, cheap_chunk),
             u.reshape(ncheap, cheap_chunk),
             l.reshape(ncheap, cheap_chunk, g)))
        u2 = u2.reshape(nl)
        l2 = l2.reshape(nl, g)
        lmin_all = lmin_all.reshape(nl)
        cand = cand.reshape(nl)

        # ---- phase 2: tighten + local filter over compacted candidates --
        order, n_cand = C.stable_partition(cand)
        n_active = (n_cand + chunk - 1) // chunk

        def lcond(carry):
            return carry[0] < n_active

        def lbody(carry):
            (i, aid_all, u_all, l_all, n_passed) = carry
            base = i * chunk
            idx = lax.dynamic_slice(order, (base,), (chunk,))
            row_ok = (base + offs) < n_cand
            xb = x[idx]
            xsqb = x_sq[idx]
            ab = jnp.where(row_ok, assign[idx], jnp.uint32(k))
            lminb = lmin_all[idx]
            # exact distance to the (adjusted) own centroid — the
            # reference's global-filter tightening (kmeans.cu:541-582)
            oh1 = (ab[:, None] == iota_k1)
            cb = jnp.dot(oh1.astype(x.dtype), c_new_ext.astype(x.dtype),
                         preferred_element_type=jnp.float32)
            prod = jnp.sum(xb.astype(jnp.float32) * cb, axis=1)
            if metric == D.DistanceMetric.L2:
                score = (oh1.astype(jnp.float32) @ c_sq_ext) - 2.0 * prod
                # margin: this rowwise dot rounds differently than the
                # filter matmul; never skip on ulp noise
                score = score + 4e-6 * (xsqb + jnp.abs(score))
            else:
                score = -prod + 4e-6
            score = jnp.where(jnp.isnan(score), config.PAD_PENALTY, score)
            u_ex = D.finalize_distance(score, xsqb, metric)
            passed_b = row_ok & (u_ex >= lminb)
            n_passed = n_passed + jnp.sum(passed_b, dtype=jnp.int32)

            def full(_):
                s = D.scores(xb, c_t, c_sq_pad, penalty, metric)
                best, aid = D.argmin_lowest_index(s, orig_ids, k)
                u_new = D.finalize_distance(best, xsqb, metric)
                # group minima via lane-gather into the padded layout
                sp = (jnp.take(s, pad_src_flat, axis=1) + pad_pen_flat
                      ).reshape(chunk, g, p)
                m1 = jnp.min(sp, axis=2)
                g_min = jnp.argmin(m1, axis=1)
                ohg = (iota_g == g_min[:, None])
                spw = jnp.einsum("bg,bgp->bp", ohg.astype(jnp.float32), sp)
                j1 = jnp.argmin(spw, axis=1)
                m2w = jnp.min(
                    jnp.where(iota_p == j1[:, None],
                              config.PAD_PENALTY, spw), axis=1)
                l_sc = jnp.where(ohg, m2w[:, None], m1)
                l_new = D.finalize_distance(l_sc, xsqb[:, None], metric)
                return aid, u_new, l_new

            def tightened_only(_):
                # l placeholder: the merge below only reads it where
                # passed_b, which is all-false in this branch
                zl = _mark_varying(
                    jnp.zeros((chunk, g), jnp.float32), axis_name)
                return ab, u_ex, zl

            aid_n, u_n, l_n = lax.cond(
                jnp.any(passed_b), full, tightened_only, None)
            # candidates that failed the tightened test keep everything
            # but the (tighter, exact) upper bound
            aid_m = jnp.where(passed_b, aid_n, ab)
            u_m = jnp.where(passed_b, u_n, u_ex)
            l_m = jnp.where(passed_b[:, None], l_n, l2[idx])
            return (i + 1,
                    lax.dynamic_update_slice(aid_all, aid_m, (base,)),
                    lax.dynamic_update_slice(u_all, u_m, (base,)),
                    lax.dynamic_update_slice(l_all, l_m, (base, 0)),
                    n_passed)

        linit = _mark_varying(
            (jnp.int32(0), jnp.zeros((nl,), jnp.uint32),
             jnp.zeros((nl,), jnp.float32), jnp.zeros((nl, g), jnp.float32),
             jnp.int32(0)), axis_name)
        (_i, aid_all, u_all, l_all, passed_n) = lax.while_loop(
            lcond, lbody, linit)

        # scatter candidate results back; rows past n_cand dropped
        pos = jnp.arange(nl, dtype=jnp.int32)
        tgt = jnp.where(pos < n_cand, order, nl)
        assign2 = assign.at[tgt].set(aid_all, mode="drop")
        u4 = u2.at[tgt].set(u_all, mode="drop")
        l4 = l2.at[tgt].set(l_all, mode="drop")

        # ---- phase 3: incremental centroid update from the moved set ----
        morder, n_moved = C.stable_partition(assign2 != assign)
        d_sums, d_counts = C.delta_sums(
            x, assign2, assign, morder, n_moved, n_clusters=k, chunk=chunk,
            axis_name=axis_name)
        changed2 = n_moved
        if axis_name is not None:
            d_sums = lax.psum(d_sums, axis_name)
            d_counts = lax.psum(d_counts, axis_name)
            changed2 = lax.psum(changed2, axis_name)
            passed_n = lax.psum(passed_n, axis_name)
        log_ch = log_ch.at[it].set(changed2)
        log_pa = log_pa.at[it].set(passed_n)
        return (c_new, assign2, u4, l4,
                (sums + d_sums, counts + d_counts), it + 1, changed2,
                log_ch, log_pa)

    assign0, u0, l0 = _mark_varying(
        (assign0, jnp.zeros((nl,), jnp.float32),
         jnp.zeros((nl, g), jnp.float32)), axis_name)
    init = (centroids0, assign0, u0, l0, (sums0, counts0),
            jnp.int32(0), jnp.int32(jnp.iinfo(jnp.int32).max),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            jnp.zeros((LOG_CAPACITY,), jnp.int32))
    (c_cur, assign, _u, _l, _sc, it, _changed, log_ch, log_pa) = \
        lax.while_loop(cond, body, init)
    return c_cur, assign, it, log_ch, log_pa
