"""Yinyang k-means iteration (reference: src/kmeans.cu:432-672, 1028-1263).

State per sample: upper bound ``u`` on the distance to its assigned
centroid and per-group lower bounds ``l[g]`` on the distance to any *other*
centroid of group g (kmeans_yy_init, kmeans.cu:432-485).  Per iteration:

1. adjust centroids from the running sums; per-centroid drift
   (kmeans_yy_calc_drifts, kmeans.cu:488-499) and per-group max drift
   (kmeans_yy_find_group_max_drifts, kmeans.cu:501-538);
2. *global filter*: u += drift(own), l[g] -= group_drift[g]; samples with
   u <= min_g l[g] provably keep their assignment.  Candidates tighten u to
   the exact own-centroid distance and re-test (kmeans_yy_global_filter,
   kmeans.cu:541-582);
3. *local filter*: survivors get a full assignment pass that also yields
   fresh exact bounds (kmeans_yy_local_filter, kmeans.cu:585-672).

TPU-native design decisions:

- The local filter's score matmul uses the SAME centroid column layout as
  the Lloyd pass (``assign_pass``) — groups are NOT materialized as a
  permuted centroid matrix.  Group minima come from a cheap lane-gather of
  the score row into a padded (G, P) layout.  Identical matmuls mean
  bitwise-identical assignments between Lloyd and Yinyang by construction
  (the reference's parity guarantee, README.md:74-75).
- The passed set is compacted with a stable partition and processed in
  chunk-sized gathers; chunks past the passed count are skipped with
  ``lax.cond`` — the analog of the reference's ``d_passed_number``
  compaction (kmeans.cu:541-582), with no atomics.
- Lower-bound bookkeeping per group uses min1/min2: the winning group's
  bound is the second-smallest distance inside it (excluding the winner),
  other groups use their minimum — same semantics as yy_init/local_filter.
- No explicit "bounds refresh" pass is needed (the reference re-runs
  yy_init when almost everything passes, kmeans.cu:1117-1158): here every
  passed sample gets exact bounds from the local filter, so a
  nearly-all-passed iteration IS the refresh.
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
from kmcuda_tpu.ops.assign import _mark_varying, pad_clusters


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
                     "max_iterations", "axis_name"))
def yy_run(x, x_sq, valid, assign0, centroids0, sums0, counts0,
           pad_src, pad_pen, tol_count, *,
           n_clusters: int, groups: int, group_cap: int,
           metric: D.DistanceMetric, chunk: int, max_iterations: int,
           axis_name=None):
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
    pad_src_flat = pad_src.reshape(-1)
    pad_pen_flat = pad_pen.reshape(-1)

    # the cheap bounds pass touches every sample anyway; wider chunks
    # amortize the per-scan-step scaffolding
    cheap_mult = 1
    for m in (8, 4, 2):
        if nchunks % m == 0:
            cheap_mult = m
            break
    cheap_chunk = chunk * cheap_mult
    ncheap = nl // cheap_chunk
    xc = x.reshape(ncheap, cheap_chunk, f)
    xsqc = x_sq.reshape(ncheap, cheap_chunk)
    vc = valid.reshape(ncheap, cheap_chunk)

    def cond(carry):
        it, changed = carry[5], carry[6]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations))

    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)

    def body(carry):
        (c_cur, assign, u, l, sc, it, _changed, log_ch, log_pa) = carry
        sums, counts = sc
        first = it == 0
        c_new = D.normalize_centroids(
            sums, counts.astype(jnp.float32), metric)
        drift = exact_drift(c_new, c_cur, metric)
        drift_ext = jnp.concatenate([drift, jnp.zeros((1,), jnp.float32)])
        gdrift = jnp.max(
            jnp.where(pad_pen > 0, 0.0, drift[pad_src]), axis=1)
        c_new_ext = jnp.concatenate(
            [c_new, jnp.zeros((1, f), jnp.float32)])
        c_sq_ext = jnp.concatenate(
            [D.row_sq_norms(c_new), jnp.zeros((1,), jnp.float32)])
        c_t, c_sq_pad, penalty, orig_ids = pad_clusters(c_new, x.dtype)

        # ---- phase 1: drift the bounds, global filter, tighten u --------
        # all per-cluster lookups go through a one-hot matmul: TPU gathers
        # from small tables lower to element-serial code (~1 ms per lookup
        # at 100K samples), while the MXU does the same lookup in ~us.
        def cheap(_, inp):
            xb, xsqb, vb, ab, ub, lb = inp
            oh = (ab[:, None] == iota_k1)
            ohf = oh.astype(jnp.float32)
            drift_b = ohf @ drift_ext
            u2 = ub + drift_b
            l2 = lb - gdrift[None, :]
            lmin = jnp.min(l2, axis=1)
            # '>=', not '>': when sqrt collapses a knife-edge score tie to
            # equal distances, the sample must still reach the local filter
            # so its score-space argmin matches Lloyd's exactly
            cand = vb & (u2 >= lmin)
            cb = jnp.dot(oh.astype(x.dtype), c_new_ext.astype(x.dtype),
                         preferred_element_type=jnp.float32)
            prod = jnp.sum(xb.astype(jnp.float32) * cb, axis=1)
            if metric == D.DistanceMetric.L2:
                score = (ohf @ c_sq_ext) - 2.0 * prod
            else:
                score = -prod
            score = jnp.where(jnp.isnan(score), config.PAD_PENALTY, score)
            # safety margin: this rowwise dot rounds differently than the
            # local filter's matmul; pad the upper bound so a sample is
            # never skipped on ulp noise (false passes are recomputed
            # exactly, so they cost time, never correctness)
            if metric == D.DistanceMetric.L2:
                score = score + 4e-6 * (xsqb + jnp.abs(score))
            else:
                score = score + 4e-6
            u_ex = D.finalize_distance(score, xsqb, metric)
            u3 = jnp.where(cand, u_ex, u2)
            passed = vb & (first | (cand & (u3 >= lmin)))
            return None, (u3, l2, passed)

        _, (u3, l2, passed) = lax.scan(
            cheap, None,
            (xc, xsqc, vc, assign.reshape(ncheap, cheap_chunk),
             u.reshape(ncheap, cheap_chunk),
             l.reshape(ncheap, cheap_chunk, g)))
        u3 = u3.reshape(nl)
        l2 = l2.reshape(nl, g)
        passed = passed.reshape(nl)

        # ---- phase 2: local filter over the compacted passed set --------
        # dynamic-trip-count while_loop: only ceil(passed/chunk) iterations
        # execute (a full scan pays ~20us scaffolding per chunk even when
        # every chunk is cond-skipped)
        order, n_passed = C.stable_partition(passed)
        n_active = (n_passed + chunk - 1) // chunk

        def lcond(carry):
            return carry[0] < n_active

        def lbody(carry):
            i, aid_all, u_all, l_all = carry
            base = i * chunk
            idx = lax.dynamic_slice(order, (base,), (chunk,))
            xb = x[idx]
            xsqb = x_sq[idx]
            s = D.scores(xb, c_t, c_sq_pad, penalty, metric)
            best, aid = D.argmin_lowest_index(s, orig_ids, k)
            u_new = D.finalize_distance(best, xsqb, metric)
            # group minima via lane-gather into the padded layout
            sp = (jnp.take(s, pad_src_flat, axis=1) + pad_pen_flat
                  ).reshape(chunk, g, p)
            m1 = jnp.min(sp, axis=2)                      # (B, G)
            # winner group: argmin of the group minima.  On an exact
            # cross-group tie this may name the tied group instead of
            # the assigned one; its lower bound then equals u, which
            # forces a (safe) re-pass next iteration.  No gather: TPU
            # small-table gathers are element-serial.
            g_star = jnp.argmin(m1, axis=1)               # (B,)
            ohg = (iota_g == g_star[:, None])             # (B, G)
            spw = jnp.einsum("bg,bgp->bp", ohg.astype(jnp.float32),
                             sp)                          # (B, P)
            j1 = jnp.argmin(spw, axis=1)
            m2w = jnp.min(
                jnp.where(iota_p == j1[:, None],
                          config.PAD_PENALTY, spw), axis=1)
            l_sc = jnp.where(ohg, m2w[:, None], m1)
            l_new = D.finalize_distance(l_sc, xsqb[:, None], metric)
            return (i + 1,
                    lax.dynamic_update_slice(aid_all, aid, (base,)),
                    lax.dynamic_update_slice(u_all, u_new, (base,)),
                    lax.dynamic_update_slice(l_all, l_new, (base, 0)))

        linit = _mark_varying(
            (jnp.int32(0), jnp.zeros((nl,), jnp.uint32),
             jnp.zeros((nl,), jnp.float32),
             jnp.zeros((nl, g), jnp.float32)), axis_name)
        _, aid_all, u_all, l_all = lax.while_loop(lcond, lbody, linit)

        # scatter local-filter results back; rows past n_passed dropped
        pos = jnp.arange(nl, dtype=jnp.int32)
        tgt = jnp.where(pos < n_passed, order, nl)
        assign2 = assign.at[tgt].set(aid_all, mode="drop")
        u4 = u3.at[tgt].set(u_all, mode="drop")
        l4 = l2.at[tgt].set(l_all, mode="drop")

        # ---- phase 3: incremental centroid update from the moved set ----
        morder, n_moved = C.stable_partition(assign2 != assign)
        d_sums, d_counts = C.delta_sums(
            x, assign2, assign, morder, n_moved, n_clusters=k, chunk=chunk,
            axis_name=axis_name)
        changed2 = n_moved
        passed_n = jnp.sum(passed, dtype=jnp.int32)
        if axis_name is not None:
            d_sums = lax.psum(d_sums, axis_name)
            d_counts = lax.psum(d_counts, axis_name)
            changed2 = lax.psum(changed2, axis_name)
            passed_n = lax.psum(passed_n, axis_name)
        log_ch = log_ch.at[it].set(changed2)
        log_pa = log_pa.at[it].set(passed_n)
        return (c_new, assign2, u4, l4, (sums + d_sums, counts + d_counts),
                it + 1, changed2, log_ch, log_pa)

    assign0, u0, l0 = _mark_varying(
        (assign0, jnp.zeros((nl,), jnp.float32),
         jnp.zeros((nl, g), jnp.float32)), axis_name)
    init = (centroids0, assign0, u0, l0, (sums0, counts0), jnp.int32(0),
            jnp.int32(jnp.iinfo(jnp.int32).max),
            jnp.zeros((max_iterations,), jnp.int32),
            jnp.zeros((max_iterations,), jnp.int32))
    (c_cur, assign, _u, _l, _sc, it, _changed, log_ch, log_pa) = \
        lax.while_loop(cond, body, init)
    return c_cur, assign, it, log_ch, log_pa
