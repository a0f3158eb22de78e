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
   kmeans.cu:585-672), which also yields fresh exact bounds.  When the
   global filter passes more than ``config.YY_DENSE_FRACTION`` of all
   samples, the iteration instead runs one dense natural-order pass over
   everything (no compaction, no gathers/scatters, refreshes every bound)
   — never materially slower than a Lloyd iteration, where the compacted
   machinery at ~100% candidacy would be several times slower.

TPU-native design decisions:

- The local filter's score matmul uses the SAME centroid column layout as
  the Lloyd pass — groups are NOT materialized as a permuted centroid
  matrix (XLA gemms reassociate the contraction differently per output
  width, so a permuted layout would break the bitwise Lloyd==Yinyang
  parity guarantee, README.md:74-75).  Group minima come from a second,
  smaller matmul against a capacity-balanced padded (G, P) centroid panel.
- On filter-hostile data (high-dimensional/uniform: concentration of
  measure keeps u ~ l for every sample) the dense path *adaptively stops
  refreshing the lower bounds*: u refreshes come free with the assignment
  matmul, l goes vacuous (zeros — a sound lower bound), and the panel
  matmul runs only on an exponential-backoff schedule (period doubles up
  to ``config.YY_REFRESH_BACKOFF_MAX`` while each refresh fails to engage
  the filter, resets when one succeeds).  Worst-case overhead over plain
  Lloyd drops from the panel matmul every iteration (~1.3x) to ~1/period
  of it, while still detecting when converging drifts finally make the
  filter bite.  Bounds only affect which samples are *proven* unmoved —
  never the argmin itself — so the refresh schedule cannot change
  results, only wall time.
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
- Centroid updates are delta-updates over the changed set
  (ops.compact.delta_compacted / delta_dense, branch predicted from the
  previous iteration's count by the same rule as the incremental Lloyd
  driver), exactly like the reference's incremental kmeans_adjust — and
  bitwise identical to the incremental Lloyd path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from kmcuda_tpu import config
from kmcuda_tpu.ops import compact as C
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.ops.assign import (LOG_CAPACITY, _mark_varying,
                                   _stagnation_update, pad_clusters)


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
    return jnp.where(jnp.isfinite(drift), drift, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "groups", "group_cap", "metric", "chunk",
                     "axis_name", "debug_mode", "bounds_dtype"))
def yy_run(x, x_sq, valid, assign0, centroids0, sums0, counts0,
           pad_src, pad_pen, flat_slot, u0, l0, lminA0, limits, *,
           n_clusters: int, groups: int, group_cap: int,
           metric: D.DistanceMetric, chunk: int, axis_name=None,
           debug_mode: int = 0, bounds_dtype=jnp.float32):
    """Run the Yinyang main loop on device.

    pad_src:   (G, P) int32 — centroid id per padded group slot (0 for pads).
    pad_pen:   (G, P) fp32 — 0 for real slots, +PAD_PENALTY for pads.
    flat_slot: (K+1,) int32 — flat panel slot (g * P + j) of each centroid;
               entry K (the invalid marker) may be any slot, it is never
               read for a row whose bounds matter.
    u0/l0:     per-sample bounds.  Fresh start: zeros + resume=0 (the
               first iteration force-refreshes every bound).  Segment
               resume: the previous segment's returned (u, l) +
               resume=1 — bitwise-exact continuation (the host driver
               bounds each device dispatch, models/lloyd._SegmentDriver).
    lminA0:    (n,) fp32 — per-sample cached min-over-groups lower bound,
               the LEVEL-0 filter state (round 4): the per-iteration
               global filter is a pure elementwise pass over
               (u, lminA, valid) with scalar max-drift erosion — no
               (n, G) traffic, no per-centroid drift lookup — and the
               stored (n, G) bounds are only read for the rows it
               admits.  Fresh start: zeros (vacuous); resume: the
               previous segment's returned value.
    limits:    int32[8] = (tol_count, max_iterations, patience, mark0,
               stale0, resume, sparse_ok, prev_changed0) packed in one
               array (single transfer per segment call); (mark0, stale0)
               resume the stagnation counters across segments (int32 max
               / 0 fresh); sparse_ok is the wall-clock controller's
               permission for the compacted branch (wall time only,
               never results); prev_changed0 seeds the delta-update
               fused/compacted prediction (compact.predict_dense) with
               the previous segment's — or the Lloyd draft's — last
               reassignment count, keeping the accumulation stream in
               bitwise lockstep with the incremental Lloyd driver.

    Returns (centroids_used, assign, iterations, changed_log, passed_log,
    cand_log, u, l, lminA, sums, counts, stag) — ``stag`` is the int32[2]
    (mark, stale) stagnation state to feed the next segment.
    """
    tol_count, max_iterations = limits[0], limits[1]
    patience, resume = limits[2], limits[5] != 0
    # host-revocable permission to take the compacted (sparse) branch:
    # the wall-clock controller (models/yinyang.run) grants/revokes it
    # per segment by measurement; a dynamic scalar, so toggling never
    # recompiles.  Affects wall time only — both branches produce
    # bitwise-identical assignments (see dense_iter docstring).
    sparse_ok = limits[6] != 0
    k, g, p = n_clusters, groups, group_cap
    centroids0 = centroids0.astype(jnp.float32)
    sums0 = sums0.astype(jnp.float32)
    nl, f = x.shape
    nchunks = nl // chunk
    iota_gp = lax.broadcasted_iota(jnp.int32, (1, g * p), 1)
    iota_k1 = lax.broadcasted_iota(jnp.uint32, (1, k + 1), 1)
    pad_src_flat = pad_src.reshape(-1)
    pad_pen_flat = pad_pen.reshape(-1)
    # flat slot ids < G*P <= 2^24, exact in fp32 for the one-hot matvec
    flat_slot_f = flat_slot.astype(jnp.float32)

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
    # compacted-loop (tighten / local-filter) chunk: each while-loop step
    # pays fixed scaffolding (gather/scatter setup, loop bookkeeping), so
    # wider chunks cut the dominant per-step cost of a sparse iteration.
    # Per-row results are row-independent, so the width never changes
    # values; the compacted order arrays are padded with ``nl`` sentinels
    # so the final partial chunk needs no divisibility (sentinel rows
    # clamp-gather garbage that row_ok masks and mode="drop" discards).
    schunk = max(chunk, min(16384, nl))
    offs = lax.broadcasted_iota(jnp.int32, (schunk, 1), 0)[:, 0]

    def pad_order(order):
        return jnp.concatenate(
            [order, jnp.full((schunk,), nl, jnp.int32)])
    n_valid_local = jnp.sum(valid, dtype=jnp.int32)

    def lower_cast(v):
        """Store a lower bound in ``bounds_dtype``.  The (n, G) l array is
        the dominant Yinyang state (3 GB at n=8M, G=102 in fp32 — it
        decides whether a near-HBM-sized run fits one chip); bf16 storage
        halves it.  Rounding must never raise a lower bound, so shift down
        by one bf16 ulp before the round-to-nearest cast; the filter gets
        ~2^-9 relatively looser per refresh, never unsound."""
        if bounds_dtype == jnp.float32:
            return v
        return (v - jnp.abs(v) * jnp.float32(2.0 ** -8)).astype(bounds_dtype)

    def cond(carry):
        it, changed = carry[6], carry[7]
        _bestch, stale = carry[11][8], carry[11][9]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations)
                            & (stale < patience))

    def body(carry):
        (c_cur, assign, u, l, lminA, sc, it, prev_changed, log_ch,
         log_pa, log_ca, (refresh_in, period, tskip_in, tperiod,
                          cand_mark, ref_any_prev, accC, accMG, bestch,
                          stale)) = carry
        sums, counts = sc
        first = (it == 0) & jnp.logical_not(resume)
        c_new = D.normalize_centroids(
            sums, counts.astype(jnp.float32), metric)
        drift = exact_drift(c_new, c_cur, metric)
        gdrift = jnp.max(
            jnp.where(pad_pen > 0, 0.0, drift[pad_src]), axis=1)
        # drift accumulators for the absolute-coordinate bounds: C2[g]
        # accumulates (at least) each group's max drift since the segment
        # started, MG2 the global max — both rounded UP so the read-side
        # subtractions (l - C2, lminA - MG2) can only under-estimate,
        # never overshoot, the true drifted bounds
        C2 = (accC + gdrift) * (1.0 + 2.0 ** -20)
        MG2 = (accMG + jnp.max(gdrift)) * (1.0 + 2.0 ** -20)
        # lookup tables for one-hot matmuls MUST be NaN-free: the zero
        # entries of a one-hot row multiply every table row, and
        # 0 * NaN = NaN would poison the whole product (dead centroids
        # are NaN rows).  Dead rows become 0 with a penalty bias, so
        # their slots never win anything.
        c_new_raw = jnp.concatenate(
            [c_new, jnp.zeros((1, f), jnp.float32)])
        c_new_ext = jnp.where(jnp.isfinite(c_new_raw), c_new_raw, 0.0)
        c_sq_raw = jnp.concatenate(
            [D.row_sq_norms(c_new), jnp.zeros((1,), jnp.float32)])
        c_sq_ext = jnp.where(jnp.isfinite(c_sq_raw), c_sq_raw,
                             config.PAD_PENALTY)
        eps = D.rounding_eps(x.dtype)
        # relative upward margin on the rescored exact d2: fp32 sum of f
        # squares rounds by <= ~f * 2^-24; 4x slack keeps u a true upper
        # bound at any feature count
        u_eps = float(f) * 2.0 ** -22
        c_t, c_sq_pad, penalty, orig_ids = pad_clusters(c_new, x.dtype)
        # padded-group centroid panel for the local filter's group minima:
        # a second, smaller matmul replaces the (B, k)->(B, G*P) lane
        # gather, which runs ~20x below HBM speed
        ohp = (pad_src_flat[:, None].astype(jnp.uint32) == iota_k1
               ).astype(jnp.float32)                       # (G*P, K+1)
        # one-hot VALUE lookups always run at HIGHEST precision: DEFAULT
        # would bf16-round the table before selecting, corrupting the
        # looked-up values by ~0.4%
        c_pad_rows = jnp.dot(ohp, c_new_ext,
                             precision=lax.Precision.HIGHEST)
        if metric == D.DistanceMetric.L2:
            pad_panel = (c_pad_rows * -2.0).astype(x.dtype).T
            pad_bias = jnp.dot(ohp, c_sq_ext,
                               precision=lax.Precision.HIGHEST
                               ) + pad_pen_flat             # (G*P,)
        else:
            pad_panel = (-c_pad_rows).astype(x.dtype).T
            pad_bias = pad_pen_flat

        # ---- phase 1: the LEVEL-0 global filter (round 4) ---------------
        # A pure-elementwise pass over three (n,) arrays — no one-hot
        # drift matvec, no (n, G) touch.  u erodes by the SCALAR max
        # centroid drift (a Hamerly-style level-0 bound: looser than the
        # per-centroid lookup, but the level-1 re-test below restores
        # exactness for anything it admits), and the cached per-row lower
        # bound lminA lives in MG-absolute coordinates (current value =
        # lminA - MG2), so maintaining it costs nothing per iteration.
        # The old per-iteration drift pass streamed and REWROTE the whole
        # (n, G) l array plus an O(n*k) one-hot matvec — measured ~5 ms
        # of a 31 ms Lloyd-pass budget at 1M x 256 @ 1024 on v5e; this
        # pass is ~0.3 ms.  The l array itself is likewise stored in
        # C-absolute coordinates (current value = l - C2 per group) and
        # is only ever READ for level-1 candidates and WRITTEN on
        # refresh, never drift-updated in place.
        maxd = jnp.max(drift) * (1.0 + 2.0 ** -20)

        def level0():
            def cbody(acc, inp):
                vb, ub, lab = inp
                # (1 + 1e-7) absorbs the addition rounding so u stays an
                # upper bound across many accumulations; the read-side
                # margin keeps (lminA - MG2) a true lower bound under
                # fp32 subtraction of two accumulated quantities
                u2 = (ub + maxd) * (1.0 + 1e-7)
                r = (lab - MG2) - 2.4e-7 * (jnp.abs(lab) + MG2)
                # '>=', not '>': a knife-edge tie must reach the local
                # filter so its argmin matches Lloyd's exactly
                cand = vb & (first | (u2 >= r))
                if debug_mode == 1:   # triage: distrust the level-0 test
                    cand = vb
                return acc + jnp.sum(cand, dtype=jnp.int32), (u2, cand)

            n_cand, (u2, cand) = lax.scan(
                cbody, _mark_varying(jnp.int32(0), axis_name),
                (vc, u.reshape(ncheap, cheap_chunk),
                 lminA.reshape(ncheap, cheap_chunk)))
            return n_cand, u2.reshape(nl), cand.reshape(nl)

        n_cand, u2, cand = level0()
        n_cand_all = n_cand
        if axis_name is not None:
            n_cand_all = lax.psum(n_cand_all, axis_name)

        def exact_assign_bounds(xb, xsqb, with_l=True):
            """Exact assignment + fresh (u, l) bounds for one sample block
            — the local-filter math (kmeans_yy_local_filter,
            kmeans.cu:585-672), shared by the compacted and dense paths
            so both produce bitwise-identical values per row.

            The assignment comes from the same natural-column-layout
            score matmul as the Lloyd pass PLUS the exact top-2 rescore
            (D.argmin_rescored) — that combination is the Lloyd==Yinyang
            parity guarantee (README.md:74-75).  Neither alone suffices:
            XLA's gemm reassociates the f-contraction differently for
            different output widths AND for gathered vs scan-sliced
            batches, so per-element scores are NOT bitwise stable across
            layouts (measured on the CPU backend; one-ulp argmin flips on
            knife-edge samples).  The rescore resolves any such tie with
            row-local elementwise arithmetic.

            ``with_l=False`` skips the group-minima panel matmul and
            returns vacuous zero lower bounds (sound: l only ever
            *under*-estimates competitor distances).  The adaptive paths
            use it to drop to plain-Lloyd cost on filter-hostile data.

            Returns (aid, u_new, l_new) with l_new in PLAIN fp32 drift
            -current coordinates; callers store
            ``lower_cast(l_new + C2)`` / ``min_g l_new + MG2`` to convert
            into the absolute coordinates the arrays carry."""
            s = D.scores(xb, c_t, c_sq_pad, penalty, metric)
            # exact top-2 rescore: the argmin is bitwise batch-layout
            # independent, which is what lets the compacted (gathered)
            # path match the Lloyd chunk scan per row (the table is built
            # identically to ops/assign._rescore_table)
            _best, aid, d2 = D.argmin_rescored(s, orig_ids, k, xb,
                                               c_new_ext)
            # the stored upper bound gets an upward margin: the rescored
            # d2 is elementwise fp32 (error <= ~f * 2^-24 relative, no
            # cancellation), and a too-small u lets the drift test
            # wrongly skip a knife-edge sample later
            d2m = d2 * (1.0 + u_eps)
            if metric == D.DistanceMetric.L2:
                u_new = jnp.sqrt(d2m)
            else:
                # exact angle for unit vectors: 2 asin(chord / 2)
                u_new = 2.0 * jnp.arcsin(
                    jnp.clip(jnp.sqrt(d2m) * 0.5, 0.0, 1.0))
            if not with_l:
                return aid, u_new, _mark_varying(
                    jnp.zeros((xb.shape[0], g), jnp.float32), axis_name)
            # group minima from the padded-panel matmul (same dot
            # products up to matmul rounding; the stored lower bound gets
            # a downward margin below so an ulp can never inflate it).
            # l[g] must exclude exactly the ASSIGNED centroid from its own
            # group (kmeans_yy_init semantics, kmeans.cu:432-485): penalize
            # the assigned centroid's own panel slot — whose flat index is
            # precomputed host-side — and one reshape-min yields every
            # group's bound.  The slot lookup goes through an exact
            # one-hot matvec, NEVER a default-precision value matmul
            # (bf16 rounding of integer ids would penalize a neighboring
            # slot and let a legitimate competitor inflate the bound).
            sp = (jnp.dot(xb, pad_panel,
                          preferred_element_type=jnp.float32,
                          precision=D.mm_precision(x.dtype))
                  + pad_bias[None, :])                          # (B, G*P)
            sp = jnp.where(jnp.isfinite(sp), sp, config.PAD_PENALTY)
            oha = (aid[:, None] == iota_k1).astype(jnp.float32)
            own_flat = jnp.dot(oha, flat_slot_f,
                               precision=lax.Precision.HIGHEST
                               ).astype(jnp.int32)               # (B,)
            sp = jnp.where(iota_gp == own_flat[:, None],
                           config.PAD_PENALTY, sp)
            l_sc = jnp.min(sp.reshape(xb.shape[0], g, p), axis=2)
            l_new = D.finalize_distance(l_sc, xsqb[:, None], metric)
            # downward safety margin: the padded-panel matmul rounds
            # differently than the natural-layout one the assignments
            # (and u) come from; a lower bound must never exceed truth
            l_new = l_new - eps * (1.0 + l_new)
            return aid, u_new, l_new

        def sparse_iter(assign, u2, l, lminA, flags):
            """Compacted path: evaluate the stored level-1 group bounds
            (+ exact own-centroid tighten) over the level-0
            pre-candidates, then run the local filter only over the
            samples that still pass.  Gathers / scatters cost
            O(candidates), worth it only when the filters actually
            filter.

            The level-1 phase is adaptive (``flags[1]``, ``do_tighten``):
            its row costs ~1/3 of a local-filter row (gathers +
            elementwise, no k-matmul), so it pays only when it prunes
            more than ~1/3 of the pre-candidates.  When skipped, every
            pre-candidate goes straight to the local filter — results
            are identical by construction, only the work distribution
            changes (backoff schedule at the decision site).

            The lower-bound refresh (``flags[2]``, ``l_refresh``) is on
            the growth-triggered schedule (round 4): the panel matmul
            that recomputes a passed row's G lower bounds costs ~1.2x
            the assignment matmul itself, and on filter-hostile rows
            (boundary/background samples that stay candidates forever)
            refreshing every iteration buys nothing.  When skipped,
            passed rows keep their stored l (absolute coordinates stay
            sound forever; only u and the assignment are rewritten) and
            the local filter costs one assignment-width matmul per
            passed row.  Results are bitwise identical either way
            (bounds never feed the argmin); the schedule only moves wall
            time."""
            do_tighten, l_refresh = flags[1], flags[2]

            # ---- phase 2a: LEVEL-1 over the compacted pre-candidates ----
            # (the reference's global filter + tightening,
            # kmeans.cu:541-582): gather the row's stored group bounds,
            # convert from C-absolute coordinates, take the exact
            # own-centroid distance, re-test.  Results are written back
            # with per-chunk scatters (cost proportional to the candidate
            # count) — full-size dynamic-index gathers/scatters run ~20x
            # below HBM speed on TPU, so nothing O(n) goes through them.
            order, n_c = C.stable_partition(cand)
            order = pad_order(order)
            n_active = (n_c + schunk - 1) // schunk

            def tcond(carry):
                return carry[0] < n_active

            def tbody(carry):
                i, u3_full, lminA_full, passed_full = carry
                base = i * schunk
                idx = lax.dynamic_slice(order, (base,), (schunk,))
                row_ok = (base + offs) < n_c
                xb = x[idx]
                xsqb = x_sq[idx]
                ab = jnp.where(row_ok, assign[idx], jnp.uint32(k))
                la = l[idx].astype(jnp.float32)
                l_now = ((la - C2[None, :])
                         - 2.4e-7 * (jnp.abs(la) + C2[None, :]))
                lminb = jnp.min(l_now, axis=1)
                oh1 = (ab[:, None] == iota_k1)
                cb = jnp.dot(oh1.astype(x.dtype), c_new_ext.astype(x.dtype),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
                prod = jnp.sum(xb.astype(jnp.float32) * cb, axis=1)
                if metric == D.DistanceMetric.L2:
                    score = jnp.dot(oh1.astype(jnp.float32), c_sq_ext,
                                    precision=lax.Precision.HIGHEST
                                    ) - 2.0 * prod
                    # margin: this rowwise dot rounds differently than the
                    # filter matmul; never skip on rounding noise
                    score = score + eps * (xsqb + jnp.abs(score))
                else:
                    score = -prod + eps
                score = jnp.where(jnp.isfinite(score), score,
                                  config.PAD_PENALTY)
                u_ex = D.finalize_distance(score, xsqb, metric)
                passed_b = row_ok & (u_ex >= lminb)
                if debug_mode == 2:  # soundness triage: distrust level-1
                    passed_b = row_ok
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        u3_full.at[idx_ok].set(u_ex, mode="drop"),
                        lminA_full.at[idx_ok].set(lminb + MG2,
                                                  mode="drop"),
                        passed_full.at[idx_ok].set(passed_b, mode="drop"))

            def with_tighten():
                tinit = _mark_varying(
                    (jnp.int32(0), u2, lminA, jnp.zeros((nl,), bool)),
                    axis_name)
                _i, u3, lminA2, passed = lax.while_loop(
                    tcond, tbody, tinit)
                order2, n_passed = C.stable_partition(passed)
                return u3, lminA2, pad_order(order2), n_passed

            def without_tighten():
                # every pre-candidate goes to the local filter; the
                # level-0 partition is reused (one sort + one gather walk
                # saved — pays when level-1 barely prunes)
                return u2, lminA, order, n_c

            u3, lminA2, order2, n_passed = lax.cond(
                do_tighten, with_tighten, without_tighten)
            passed_n = n_passed

            # ---- phase 2b: local filter over the compacted passed set ---
            # (the second compaction keys the expensive matmul loop to the
            # passed set; passed samples scattered among candidate chunks
            # would otherwise trigger the matmul on nearly every chunk)
            n_active2 = (n_passed + schunk - 1) // schunk

            def lcond(carry):
                return carry[0] < n_active2

            def lbody_refresh(carry):
                (i, assign_full, u_full, l_full, lminA_full) = carry
                base = i * schunk
                idx = lax.dynamic_slice(order2, (base,), (schunk,))
                row_ok = (base + offs) < n_passed
                aid, u_new, l_new = exact_assign_bounds(x[idx], x_sq[idx])
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        assign_full.at[idx_ok].set(aid, mode="drop"),
                        u_full.at[idx_ok].set(u_new, mode="drop"),
                        l_full.at[idx_ok].set(
                            lower_cast(l_new + C2[None, :]), mode="drop"),
                        lminA_full.at[idx_ok].set(
                            jnp.min(l_new, axis=1) + MG2, mode="drop"))

            def lbody_keep_l(carry):
                # assignment-width work only: passed rows keep their
                # stored lower bounds (sound — absolute coordinates stay
                # valid forever), u and the assignment are rewritten
                # exactly
                (i, assign_full, u_full) = carry
                base = i * schunk
                idx = lax.dynamic_slice(order2, (base,), (schunk,))
                row_ok = (base + offs) < n_passed
                aid, u_new, _lv = exact_assign_bounds(
                    x[idx], x_sq[idx], with_l=False)
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        assign_full.at[idx_ok].set(aid, mode="drop"),
                        u_full.at[idx_ok].set(u_new, mode="drop"))

            def lf_refresh():
                linit = _mark_varying(
                    (jnp.int32(0), assign, u3, l, lminA2), axis_name)
                _i2, a2, u4, l4, lminA3 = lax.while_loop(
                    lcond, lbody_refresh, linit)
                return a2, u4, l4, lminA3

            def lf_keep():
                linit = _mark_varying(
                    (jnp.int32(0), assign, u3), axis_name)
                _i2, a2, u4 = lax.while_loop(lcond, lbody_keep_l, linit)
                return a2, u4, l, lminA2

            assign2, u4, l4, lminA3 = lax.cond(
                l_refresh, lf_refresh, lf_keep)
            return assign2, u4, l4, lminA3, passed_n

        def dense_iter(assign, u2, l, lminA, flags):
            """Dense path: when the level-0 filter passes (almost)
            everything, one natural-order pass over ALL samples is
            strictly cheaper than compaction — no gathers, no scatters.
            Two bound-maintenance modes, scheduled at the decision site:

            - refresh: recompute every bound exactly (panel matmul) — the
              TPU form of the reference's bounds refresh (kmeans_yy_init
              re-run, YINYANG_REFRESH_EPSILON, kmeans.cu:1117-1158);
              rewrites l/lminA in the current absolute coordinates;
            - plain: keep the stored bounds untouched (absolute
              coordinates stay valid with no per-iteration write — the
              old 'preserve' mode's (n, G) copy is now free); costs
              exactly one Lloyd assignment pass.

            u refreshes exactly in both modes (free with the assignment
            matmul).  Per-row assignments are bitwise identical to the
            compacted path in either mode (matmul elements are
            row-independent and the argmin never reads a bound), so mode
            choice never changes the output, only the wall time."""
            mode_refresh = flags[0]

            def dpass_refresh():
                def dbody(_, inp):
                    xb, xsqb, vb, ab, ub = inp
                    aid, u_new, l_new = exact_assign_bounds(xb, xsqb)
                    aid = jnp.where(vb, aid, jnp.uint32(k))
                    return None, (jnp.where(vb, aid, ab),
                                  jnp.where(vb, u_new, ub),
                                  lower_cast(l_new + C2[None, :]),
                                  jnp.min(l_new, axis=1) + MG2)

                _, outs = lax.scan(
                    dbody, None,
                    (x.reshape(nchunks, chunk, f),
                     x_sq.reshape(nchunks, chunk),
                     valid.reshape(nchunks, chunk),
                     assign.reshape(nchunks, chunk),
                     u2.reshape(nchunks, chunk)))
                return (outs[0].reshape(nl), outs[1].reshape(nl),
                        outs[2].reshape(nl, g), outs[3].reshape(nl))

            def dpass_plain():
                def dbody(_, inp):
                    xb, xsqb, vb, ab, ub = inp
                    aid, u_new, _lv = exact_assign_bounds(
                        xb, xsqb, with_l=False)
                    aid = jnp.where(vb, aid, jnp.uint32(k))
                    return None, (jnp.where(vb, aid, ab),
                                  jnp.where(vb, u_new, ub))

                _, outs = lax.scan(
                    dbody, None,
                    (x.reshape(nchunks, chunk, f),
                     x_sq.reshape(nchunks, chunk),
                     valid.reshape(nchunks, chunk),
                     assign.reshape(nchunks, chunk),
                     u2.reshape(nchunks, chunk)))
                return (outs[0].reshape(nl), outs[1].reshape(nl),
                        l, lminA)

            a2, u4, l4, lminA3 = lax.cond(
                mode_refresh, dpass_refresh, dpass_plain)
            return a2, u4, l4, lminA3, n_valid_local

        # global (replicated) dense/compacted decision so every shard
        # compiles and takes the same branch.  The level-0 count is
        # computed before the branch (it is a cheap (n,)-elementwise
        # pass), so the decision uses the CURRENT iteration's count — no
        # regime lag.
        n_all = jnp.int32(nl)
        if axis_name is not None:
            n_all = lax.psum(n_all, axis_name)
        use_dense = first | jnp.logical_not(sparse_ok) | (
            n_cand_all.astype(jnp.float32)
            > config.YY_DENSE_FRACTION * n_all.astype(jnp.float32))
        if debug_mode != 0:  # triage modes must exercise the sparse path
            use_dense = jnp.bool_(False)
        # dense refresh backoff: each refresh that fails to engage the
        # filter (the NEXT iteration is dense again) doubles the number
        # of plain-Lloyd iterations before the next try; a refresh after
        # which the run went sparse resets the period to 1.
        period_adj = jnp.where(
            ref_any_prev & use_dense,
            jnp.minimum(period * 2,
                        jnp.int32(config.YY_REFRESH_BACKOFF_MAX)),
            jnp.where(ref_any_prev, jnp.int32(1), period))
        mode_refresh = use_dense & (refresh_in <= 0) & ~ref_any_prev
        do_tighten = tskip_in <= 0
        # sparse-path lower-bound refresh trigger, directly
        # cost-justified: a refresh costs every passed row the panel
        # matmul (~1.2x the assignment matmul), while stale bounds cost
        # one assignment-width local-filter row for every EXTRA
        # candidate they admit.  Refresh once the candidate count has
        # grown past YY_SPARSE_REFRESH_GROWTH times its level right
        # after the previous refresh (cand_mark, recorded one iteration
        # after each refresh — the first count computed against fresh
        # bounds).  cand_mark starts at 0, so the first sparse iteration
        # always refreshes.
        sparse_refresh = jnp.logical_not(use_dense) & ~ref_any_prev & (
            n_cand_all.astype(jnp.float32)
            > config.YY_SPARSE_REFRESH_GROWTH
            * cand_mark.astype(jnp.float32))
        if debug_mode != 0:  # triage modes must exercise every phase
            do_tighten = jnp.bool_(True)
            sparse_refresh = jnp.bool_(True)
        assign2, u4, l4, lminA3, passed_n = lax.cond(
            use_dense, dense_iter, sparse_iter, assign, u2, l, lminA,
            (mode_refresh, do_tighten, sparse_refresh))
        refresh_in2 = jnp.where(
            ~use_dense, jnp.int32(0),
            jnp.where(mode_refresh, period_adj, refresh_in - 1))
        period2 = period_adj
        # the first candidate count computed against fresh bounds (one
        # iteration after any refresh) is the growth trigger's baseline
        cand_mark2 = jnp.where(ref_any_prev, n_cand_all, cand_mark)
        ref_any2 = sparse_refresh | mode_refresh

        # ---- bound patch for refresh-skipping iterations -----------------
        # l[g] excludes the ASSIGNED centroid from its own group
        # (kmeans_yy_init semantics).  An iteration that rewrites
        # assignments without refreshing l (sparse with the refresh
        # backed off, or a plain dense pass) leaves every MOVED row's
        # stored l excluding its OLD assignment — which is now a
        # legitimate competitor whose distance may undercut the stored
        # bound.  Walk the moved rows (churn-sized — tiny in exactly the
        # regimes that skip refreshes) and give them fresh exact bounds.
        # The recomputed assignment is bitwise the one just stored
        # (argmin_rescored is batch-layout independent), so only
        # (u, l, lminA) are written.
        moved = assign2 != assign
        n_moved = jnp.sum(moved, dtype=jnp.int32)
        skipped_refresh = jnp.where(
            use_dense, ~mode_refresh, ~sparse_refresh)

        def patch_moved(u4, l4, lminA3):
            morder, nm = C.stable_partition(moved)
            order_p = pad_order(morder)
            n_act = (nm + schunk - 1) // schunk

            def pcond(c):
                return c[0] < n_act

            def pbody(c):
                i, u_full, l_full, lminA_full = c
                base = i * schunk
                idx = lax.dynamic_slice(order_p, (base,), (schunk,))
                row_ok = (base + offs) < nm
                _aid, u_new, l_new = exact_assign_bounds(x[idx], x_sq[idx])
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        u_full.at[idx_ok].set(u_new, mode="drop"),
                        l_full.at[idx_ok].set(
                            lower_cast(l_new + C2[None, :]), mode="drop"),
                        lminA_full.at[idx_ok].set(
                            jnp.min(l_new, axis=1) + MG2, mode="drop"))

            pinit = _mark_varying((jnp.int32(0), u4, l4, lminA3),
                                  axis_name)
            _i, u5, l5, lminA5 = lax.while_loop(pcond, pbody, pinit)
            return u5, l5, lminA5

        u4, l4, lminA3 = lax.cond(
            skipped_refresh, patch_moved,
            lambda u, lv, lm: (u, lv, lm), u4, l4, lminA3)

        def d_dense():
            return C.delta_dense(
                x, assign2, assign, n_clusters=k, chunk=chunk,
                axis_name=axis_name)

        def d_sparse():
            morder, nm = C.stable_partition(moved)
            return C.delta_compacted(
                x, assign2, assign, morder, nm, n_clusters=k, chunk=chunk,
                axis_name=axis_name)

        d_sums, d_counts = lax.cond(
            C.predict_dense(prev_changed, n_all), d_dense, d_sparse)
        changed2 = n_moved
        if axis_name is not None:
            d_sums = lax.psum(d_sums, axis_name)
            d_counts = lax.psum(d_counts, axis_name)
            changed2 = lax.psum(changed2, axis_name)
            passed_n = lax.psum(passed_n, axis_name)
        # tighten backoff: when it ran, keep it only if it pruned enough
        # candidates to pay for itself; otherwise back off exponentially.
        # When skipped, passed_n == n_cand (no information) — the counter
        # just ticks down toward the next re-measure.
        tighten_ran = (~use_dense) & do_tighten
        pruned_enough = (
            (n_cand_all - passed_n).astype(jnp.float32)
            >= config.YY_TIGHTEN_MIN_PRUNE * n_cand_all.astype(jnp.float32))
        tskip_in2 = jnp.where(
            tighten_ran,
            jnp.where(pruned_enough, jnp.int32(0), tperiod),
            jnp.where(use_dense, tskip_in, tskip_in - 1))
        tperiod2 = jnp.where(
            tighten_ran & ~pruned_enough,
            jnp.minimum(tperiod * 2,
                        jnp.int32(config.YY_REFRESH_BACKOFF_MAX)),
            jnp.where(tighten_ran, jnp.int32(1), tperiod))
        log_ch = log_ch.at[it].set(changed2)
        log_pa = log_pa.at[it].set(passed_n)
        log_ca = log_ca.at[it].set(n_cand_all)
        mark2, stale2 = _stagnation_update(changed2, bestch, stale)
        return (c_new, assign2, u4, l4, lminA3,
                (sums + d_sums, counts + d_counts), it + 1, changed2,
                log_ch, log_pa, log_ca,
                (refresh_in2, period2, tskip_in2, tperiod2,
                 cand_mark2, ref_any2, C2, MG2, mark2, stale2))

    assign0, u0, l0, lminA0 = _mark_varying(
        (assign0, u0, l0.astype(bounds_dtype), lminA0), axis_name)
    init = (centroids0, assign0, u0, l0, lminA0, (sums0, counts0),
            jnp.int32(0), limits[7],
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            (jnp.int32(0), jnp.int32(1), jnp.int32(0), jnp.int32(1),
             jnp.int32(0), jnp.bool_(False),
             # the drift accumulators C (per group) and MG (global max)
             # start at zero each segment: the stored l / lminA enter in
             # drift-CURRENT coordinates and leave rebased below, so the
             # resume state never carries unbounded accumulators
             jnp.zeros((g,), jnp.float32), jnp.float32(0.0),
             limits[3], limits[4]))
    (c_cur, assign, u_fin, l_fin, lminA_fin, (sums_fin, counts_fin), it,
     _changed, log_ch, log_pa, log_ca, rb) = lax.while_loop(
        cond, body, init)
    # segment-exit rebase: fold the accumulated drift into the stored
    # bounds so the returned (l, lminA) are plain drift-current values
    # (what the bound-invariant tests check and what the next segment
    # enters with C = MG = 0).  One (n, G) pass per SEGMENT, not per
    # iteration; the downward margins keep the rebased values sound.
    C_fin, MG_fin = rb[6], rb[7]
    la = l_fin.astype(jnp.float32)
    l_out = lower_cast((la - C_fin[None, :])
                       - 2.4e-7 * (jnp.abs(la) + C_fin[None, :]))
    lminA_out = ((lminA_fin - MG_fin)
                 - 2.4e-7 * (jnp.abs(lminA_fin) + MG_fin))
    return (c_cur, assign, it, log_ch, log_pa, log_ca, u_fin, l_out,
            lminA_out, sums_fin, counts_fin, jnp.stack([rb[8], rb[9]]))
