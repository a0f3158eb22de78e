"""Yinyang k-means iteration (reference: src/kmeans.cu:432-672, 1028-1263).

State per sample: upper bound ``u`` on the distance to its assigned
centroid and per-group lower bounds ``l[g]`` on the distance to any *other*
centroid of group g (kmeans_yy_init, kmeans.cu:432-485).  Per iteration:

1. adjust centroids from the running sums; per-centroid drift
   (kmeans_yy_calc_drifts, kmeans.cu:488-499) and per-group max drift
   (kmeans_yy_find_group_max_drifts, kmeans.cu:501-538);
2. *global filter*: u += drift erosion, l[g] -= group_drift[g]; samples
   with u < min_g l[g] provably keep their assignment
   (kmeans_yy_global_filter, kmeans.cu:541-582).  TPU form (round 4): the
   stored (n, G) bounds live in drift-ABSOLUTE coordinates (l_now =
   l - C2[g], C2 = accumulated group max drift), so the filter is ONE
   read-only streamed pass at HBM speed — no (n, G) rewrite, no
   per-centroid one-hot drift matvec (the previous design's pass cost
   ~5 ms of a 31 ms Lloyd budget at 1M x 256 @ 1024); u erodes by the
   scalar max drift between its free exact refreshes (every assignment
   matmul yields exact u);
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
           pad_src, pad_pen, flat_slot, u0, l0, ga0, limits, *,
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
    ga0:       (n,) int32 — group id of each sample's ASSIGNED centroid
               (round 4).  Lets the stored u live in group-absolute
               drift coordinates (current value = u + C2[ga]): a
               sample's upper bound erodes only by its OWN group's
               accumulated max drift instead of the global max — the
               global-max erosion was measured to admit 30-45%% of a
               contested 1M x 256 @ 1024 fixture as candidates (one fast
               centroid eroded every row's gap), per-group erosion
               admits only true near-boundary rows.  Maintained for
               free at every assignment write (ga = own panel slot
               // cap).  Fresh start: zeros (vacuous under the forced
               first-iteration refresh); resume: the returned value.
    limits:    int32[16] = (tol_count, max_iterations, patience, mark0,
               stale0, resume, sparse_ok, prev_changed0, refresh_in0,
               period0, tskip0, tperiod0, cand_mark0, acc_extra0,
               prev_passed0, ref_any0) packed in one array (single
               transfer per segment call);
               (mark0, stale0) resume the stagnation counters across
               segments (int32 max / 0 fresh); sparse_ok is the
               wall-clock controller's permission for the compacted
               branch (wall time only, never results); prev_changed0
               seeds the delta-update fused/compacted prediction
               (compact.predict_dense) with the previous segment's — or
               the Lloyd draft's — last reassignment count, keeping the
               accumulation stream in bitwise lockstep with the
               incremental Lloyd driver; the last eight resume the
               refresh/tighten backoff schedule (round 4: without them
               every segment boundary forced a fresh period-1 refresh
               cadence — measured as a ~5-iteration full-refresh
               sawtooth that cost the dense path ~60%% over Lloyd).
               Fresh start: (0, 1, 0, 1, 0, 0, 0, 0).

    Returns (centroids_used, assign, iterations, changed_log, passed_log,
    cand_log, u, l, ga, sums, counts, sched) — ``sched`` is the int32[10]
    (mark, stale, refresh_in, period, tskip, tperiod, cand_mark,
    acc_extra, prev_passed, ref_any) schedule state to feed the next
    segment's limits tail.
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
    iota_g2 = lax.broadcasted_iota(jnp.int32, (1, g), 1)
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
        _bestch, stale = carry[11][9], carry[11][10]
        return (it == 0) | ((changed > tol_count) & (it < max_iterations)
                            & (stale < patience))

    def body(carry):
        (c_cur, assign, u, l, ga, sc, it, prev_changed, log_ch,
         log_pa, log_ca, (refresh_in, period, tskip_in, tperiod,
                          cand_mark, acc_ex, prev_pa, ref_any_prev,
                          accC, bestch, stale)) = carry
        sums, counts = sc
        first = (it == 0) & jnp.logical_not(resume)
        c_new = D.normalize_centroids(
            sums, counts.astype(jnp.float32), metric)
        drift = exact_drift(c_new, c_cur, metric)
        gdrift = jnp.max(
            jnp.where(pad_pen > 0, 0.0, drift[pad_src]), axis=1)
        # drift accumulator for the absolute-coordinate bounds: C2[g]
        # accumulates (at least) each group's max drift since the segment
        # started, rounded UP so the read-side subtraction (l - C2) can
        # only under-estimate, never overshoot, the true drifted bound
        C2 = (accC + gdrift) * (1.0 + 2.0 ** -20)
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

        # group-accumulator value of a batch's assigned groups, via a
        # fused compare/select over a (B, G) tile — never a dynamic
        # gather (small-table gathers lower to element-serial code)
        def c2_of(gab):
            return jnp.sum(
                jnp.where(gab[:, None] == iota_g2, C2[None, :], 0.0),
                axis=1)

        # store an exact upper bound in group-absolute coordinates:
        # current value is recovered as (u + C2[ga]); the upward margins
        # keep it a true upper bound under the fp32 subtract/add pair
        def u_store(u_exact, gab):
            c2w = c2_of(gab)
            return (u_exact - c2w) + 2.4e-7 * (u_exact + c2w)

        # ---- phase 1: READ-ONLY global filter (round 4) ------------------
        # One streamed pass over (valid, u, ga, l).  Both bound arrays
        # live in drift-ABSOLUTE coordinates: u's current value is
        # u + C2[ga] (erodes only by the ASSIGNED group's accumulated
        # max drift — a global-max erosion was measured to admit 30-45%%
        # of a contested fixture; per-group admits only true
        # near-boundary rows), l's current value is l - C2[g] — the
        # classic Yinyang global filter.  The per-row min lands in an
        # (n,) fp32 side array the sparse tighten re-reads (saving its
        # (n, G) gather).  The old drift pass REWROTE the whole (n, G)
        # l array every iteration plus an O(n*k) one-hot drift matvec —
        # measured ~5 ms of a 31 ms Lloyd-pass budget at 1M x 256 @
        # 1024 on v5e; this pass READS (l, u, ga) sequentially at HBM
        # speed (~0.6 ms fp32) and writes only (n,)-sized arrays;
        # non-candidate rows' storage is never touched, so skipped rows
        # accumulate NO erosion beyond their group's true drift.

        def global_filter():
            def cbody(acc, inp):
                vb, ub, gab, lb = inp
                c2r = jnp.sum(
                    jnp.where(gab[:, None] == iota_g2, C2[None, :], 0.0),
                    axis=1)
                u_now = (ub + c2r) + 2.4e-7 * (jnp.abs(ub) + c2r)
                la = lb.astype(jnp.float32)
                l_now = ((la - C2[None, :])
                         - 2.4e-7 * (jnp.abs(la) + C2[None, :]))
                lmin = jnp.min(l_now, axis=1)
                # '>=', not '>': a knife-edge tie must reach the local
                # filter so its argmin matches Lloyd's exactly
                cand = vb & (first | (u_now >= lmin))
                if debug_mode == 1:   # triage: distrust the global test
                    cand = vb
                return (acc + jnp.sum(cand, dtype=jnp.int32),
                        (lmin, cand))

            n_cand, (lmin, cand) = lax.scan(
                cbody, _mark_varying(jnp.int32(0), axis_name),
                (vc, u.reshape(ncheap, cheap_chunk),
                 ga.reshape(ncheap, cheap_chunk),
                 l.reshape(ncheap, cheap_chunk, g)))
            return n_cand, lmin.reshape(nl), cand.reshape(nl)

        n_cand, lmin_now, cand = global_filter()
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

            Returns (aid, u_new, l_new, ga_new): u_new/l_new in PLAIN
            fp32 drift-current coordinates — callers store
            ``u_store(u_new, ga_new)`` / ``lower_cast(l_new + C2)`` to
            convert into the absolute coordinates the stored arrays
            carry — and ga_new the assigned centroid's group id (its
            flat panel slot // capacity, so it costs one small matvec
            shared with the own-slot exclusion)."""
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
            oha = (aid[:, None] == iota_k1).astype(jnp.float32)
            own_flat = jnp.dot(oha, flat_slot_f,
                               precision=lax.Precision.HIGHEST
                               ).astype(jnp.int32)               # (B,)
            ga_new = own_flat // p
            if not with_l:
                return aid, u_new, _mark_varying(
                    jnp.zeros((xb.shape[0], g), jnp.float32),
                    axis_name), ga_new
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
            sp = jnp.where(iota_gp == own_flat[:, None],
                           config.PAD_PENALTY, sp)
            l_sc = jnp.min(sp.reshape(xb.shape[0], g, p), axis=2)
            l_new = D.finalize_distance(l_sc, xsqb[:, None], metric)
            # downward safety margin: the padded-panel matmul rounds
            # differently than the natural-layout one the assignments
            # (and u) come from; a lower bound must never exceed truth
            l_new = l_new - eps * (1.0 + l_new)
            return aid, u_new, l_new, ga_new

        def sparse_iter(assign, u_st, l, ga2, do_tighten, *,
                        l_refresh: bool):
            """Compacted path: tighten u to the exact own-centroid
            distance over the global-filter candidates and re-test
            against the phase-1 ``lmin_now``, then run the local filter
            only over the samples that still pass.  Gathers / scatters
            cost O(candidates), worth it only when the filters actually
            filter.

            The tighten phase is adaptive (``flags[1]``, ``do_tighten``):
            its row costs ~1/3 of a local-filter row (gathers +
            elementwise, no k-matmul), so it pays only when it prunes
            more than ~1/3 of the candidates.  When skipped, every
            candidate goes straight to the local filter — results
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
            time.

            ``l_refresh`` is a PYTHON bool: the refresh/keep variants are
            separate lax.switch branches (round 5) — the former inner
            lax.cond threaded the (n, G) l array through one more
            cond layer, and every cond layer an operand crosses costs one
            full-array XLA copy per iteration (profiled 3.4 ms at
            2M x 102 fp32 on v5e; two layers = the two copies that led
            the sparse-iteration profile)."""
            # ---- phase 2a: tighten u over the compacted candidates ------
            # (the reference's global-filter tightening,
            # kmeans.cu:541-582): take the exact own-centroid distance,
            # re-test against the phase-1 per-row lower bound (gathered
            # from the (n,) side array — no (n, G) gather).  Results are
            # written back with per-chunk scatters (cost proportional to
            # the candidate count) — full-size dynamic-index
            # gathers/scatters run ~20x below HBM speed on TPU, so
            # nothing O(n) goes through them.
            order, n_c = C.stable_partition(cand)
            order = pad_order(order)
            n_active = (n_c + schunk - 1) // schunk

            def tcond(carry):
                return carry[0] < n_active

            def tbody(carry):
                i, u3_full, passed_full = carry
                base = i * schunk
                idx = lax.dynamic_slice(order, (base,), (schunk,))
                row_ok = (base + offs) < n_c
                xb = x[idx]
                xsqb = x_sq[idx]
                ab = jnp.where(row_ok, assign[idx], jnp.uint32(k))
                lminb = lmin_now[idx]
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
                if debug_mode == 2:  # soundness triage: distrust tighten
                    passed_b = row_ok
                idx_ok = jnp.where(row_ok, idx, nl)
                # store the tightened bound in group-absolute
                # coordinates (assignment unchanged: ga comes from the
                # same one-hot as the own-centroid lookup)
                gab = jnp.dot(oh1.astype(jnp.float32), flat_slot_f,
                              precision=lax.Precision.HIGHEST
                              ).astype(jnp.int32) // p
                return (i + 1,
                        u3_full.at[idx_ok].set(u_store(u_ex, gab),
                                               mode="drop"),
                        passed_full.at[idx_ok].set(passed_b, mode="drop"))

            def with_tighten():
                tinit = _mark_varying(
                    (jnp.int32(0), u_st, jnp.zeros((nl,), bool)),
                    axis_name)
                _i, u3, passed = lax.while_loop(tcond, tbody, tinit)
                order2, n_passed = C.stable_partition(passed)
                return u3, pad_order(order2), n_passed

            def without_tighten():
                # every candidate goes to the local filter; the
                # global-filter partition is reused (one sort + one
                # gather walk saved — pays when tighten barely prunes)
                return u_st, order, n_c

            u3, order2, n_passed = lax.cond(
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
                (i, assign_full, u_full, l_full, ga_full) = carry
                base = i * schunk
                idx = lax.dynamic_slice(order2, (base,), (schunk,))
                row_ok = (base + offs) < n_passed
                aid, u_new, l_new, ga_new = exact_assign_bounds(
                    x[idx], x_sq[idx])
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        assign_full.at[idx_ok].set(aid, mode="drop"),
                        u_full.at[idx_ok].set(u_store(u_new, ga_new),
                                              mode="drop"),
                        l_full.at[idx_ok].set(
                            lower_cast(l_new + C2[None, :]), mode="drop"),
                        ga_full.at[idx_ok].set(ga_new, mode="drop"))

            def lbody_keep_l(carry):
                # assignment-width work only: passed rows keep their
                # stored lower bounds (sound — absolute coordinates stay
                # valid forever), u and the assignment are rewritten
                # exactly.  l rides the carry UNTOUCHED so this branch's
                # return is a while output like the refresh branch's —
                # a branch passing the cond operand straight through
                # forced XLA to COPY the (n, G) array every iteration
                # (profiled ~1.6 ms at 2M x 102 fp32 on v5e)
                (i, assign_full, u_full, l_th, ga_full) = carry
                base = i * schunk
                idx = lax.dynamic_slice(order2, (base,), (schunk,))
                row_ok = (base + offs) < n_passed
                aid, u_new, _lv, ga_new = exact_assign_bounds(
                    x[idx], x_sq[idx], with_l=False)
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        assign_full.at[idx_ok].set(aid, mode="drop"),
                        u_full.at[idx_ok].set(u_store(u_new, ga_new),
                                              mode="drop"),
                        l_th,
                        ga_full.at[idx_ok].set(ga_new, mode="drop"))

            linit = _mark_varying(
                (jnp.int32(0), assign, u3, l, ga2), axis_name)
            _i2, assign2, u4, l4, ga4 = lax.while_loop(
                lcond, lbody_refresh if l_refresh else lbody_keep_l, linit)
            return assign2, u4, l4, ga4, passed_n

        def dense_iter(assign, u_st, l, ga2, _do_tighten, *,
                       refresh: bool):
            """Dense path: when the global filter passes (almost)
            everything, one natural-order pass over ALL samples is
            strictly cheaper than compaction — no gathers, no scatters.
            Two bound-maintenance modes, scheduled at the decision site:

            - refresh: recompute every bound exactly (panel matmul) — the
              TPU form of the reference's bounds refresh (kmeans_yy_init
              re-run, YINYANG_REFRESH_EPSILON, kmeans.cu:1117-1158);
              rewrites l in the current absolute coordinates;
            - plain: keep the stored bounds untouched (absolute
              coordinates stay valid with no per-iteration write — the
              old 'preserve' mode's (n, G) copy is now free); costs
              exactly one Lloyd assignment pass.

            u refreshes exactly in both modes (free with the assignment
            matmul).  Per-row assignments are bitwise identical to the
            compacted path in either mode (matmul elements are
            row-independent and the argmin never reads a bound), so mode
            choice never changes the output, only the wall time.

            ``refresh`` is a PYTHON bool — a lax.switch branch each, for
            the same copy-elision reason as sparse_iter's l_refresh."""
            def dpass_refresh():
                def dbody(_, inp):
                    xb, xsqb, vb, ab, ub, gab = inp
                    aid, u_new, l_new, ga_new = exact_assign_bounds(
                        xb, xsqb)
                    aid = jnp.where(vb, aid, jnp.uint32(k))
                    return None, (jnp.where(vb, aid, ab),
                                  jnp.where(vb, u_store(u_new, ga_new),
                                            ub),
                                  lower_cast(l_new + C2[None, :]),
                                  jnp.where(vb, ga_new, gab))

                _, outs = lax.scan(
                    dbody, None,
                    (x.reshape(nchunks, chunk, f),
                     x_sq.reshape(nchunks, chunk),
                     valid.reshape(nchunks, chunk),
                     assign.reshape(nchunks, chunk),
                     u_st.reshape(nchunks, chunk),
                     ga2.reshape(nchunks, chunk)))
                return (outs[0].reshape(nl), outs[1].reshape(nl),
                        outs[2].reshape(nl, g), outs[3].reshape(nl))

            def dpass_plain():
                # l rides the scan carry UNTOUCHED (same copy-elision
                # rationale as lbody_keep_l)
                def dbody(l_th, inp):
                    xb, xsqb, vb, ab, ub, gab = inp
                    aid, u_new, _lv, ga_new = exact_assign_bounds(
                        xb, xsqb, with_l=False)
                    aid = jnp.where(vb, aid, jnp.uint32(k))
                    return l_th, (jnp.where(vb, aid, ab),
                                  jnp.where(vb, u_store(u_new, ga_new),
                                            ub),
                                  jnp.where(vb, ga_new, gab))

                l_out, outs = lax.scan(
                    dbody, l,
                    (x.reshape(nchunks, chunk, f),
                     x_sq.reshape(nchunks, chunk),
                     valid.reshape(nchunks, chunk),
                     assign.reshape(nchunks, chunk),
                     u_st.reshape(nchunks, chunk),
                     ga2.reshape(nchunks, chunk)))
                return (outs[0].reshape(nl), outs[1].reshape(nl), l_out,
                        outs[2].reshape(nl))

            a2, u4, l4, ga4 = dpass_refresh() if refresh else dpass_plain()
            return a2, u4, l4, ga4, n_valid_local

        # global (replicated) dense/compacted decision so every shard
        # compiles and takes the same branch.  The global-filter count is
        # computed before the branch (the phase-1 read-only pass), so the
        # decision uses the CURRENT iteration's count — no regime lag.
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
        # sparse-path lower-bound refresh trigger, ski-rental form
        # (round 4, see config.YY_SPARSE_REFRESH_SURCHARGE): stale
        # bounds admit EXTRA candidates — one assignment-width
        # local-filter row each, every iteration — while a refresh adds
        # the panel matmul (~1.2x an assignment row) to every row
        # passing the local filter once.  Accumulate the extra-row cost
        # since the bounds were last fresh (n_cand - cand_mark, the
        # count right after the previous refresh) and refresh at the
        # rent-vs-buy crossover.  cand_mark == 0 (fresh start / marks
        # never taken) always refreshes.
        surch = jnp.float32(config.YY_SPARSE_REFRESH_SURCHARGE)
        acc_now = acc_ex + jnp.maximum(n_cand_all - cand_mark,
                                       jnp.int32(0))
        # the surcharge base is the passed count the refresh would pay
        # for: the previous iteration's, capped by the current candidate
        # count (passed <= candidates; after a DENSE iteration prev_pa
        # is the full n, which would smother the trigger for ~n/extra
        # iterations)
        surch_base = jnp.minimum(prev_pa, n_cand_all)
        sparse_refresh = jnp.logical_not(use_dense) & ~ref_any_prev & (
            (cand_mark == 0)
            | (acc_now.astype(jnp.float32)
               >= surch * surch_base.astype(jnp.float32)))
        if debug_mode != 0:  # triage modes must exercise every phase
            do_tighten = jnp.bool_(True)
            sparse_refresh = jnp.bool_(True)
        # ONE lax.switch over the four iteration variants (round 5): the
        # former nesting (cond(use_dense) wrapping cond(refresh)) passed
        # the (n, G) l array through two cond layers, and XLA copies a
        # cond operand once per layer — the two f32[n, G] copies at the
        # top of the sparse-iteration profile (6.9 ms/it at 2M x 102).
        branch = jnp.where(
            use_dense,
            jnp.int32(2) + mode_refresh.astype(jnp.int32),
            sparse_refresh.astype(jnp.int32))
        assign2, u4, l4, ga4, passed_n = lax.switch(
            branch,
            [functools.partial(sparse_iter, l_refresh=False),
             functools.partial(sparse_iter, l_refresh=True),
             functools.partial(dense_iter, refresh=False),
             functools.partial(dense_iter, refresh=True)],
            assign, u, l, ga, do_tighten)
        refresh_in2 = jnp.where(
            ~use_dense, jnp.int32(0),
            jnp.where(mode_refresh, period_adj, refresh_in - 1))
        period2 = period_adj
        # the first count computed against fresh bounds (one iteration
        # after any refresh) is the accumulator's baseline
        cand_mark2 = jnp.where(ref_any_prev, n_cand_all, cand_mark)
        ref_any2 = sparse_refresh | mode_refresh
        acc_ex2 = jnp.where(ref_any_prev | ref_any2, jnp.int32(0),
                            acc_now)

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
        # (u, l) are written.
        moved = assign2 != assign
        n_moved = jnp.sum(moved, dtype=jnp.int32)
        # ONE partition of the moved set, shared by the bound patch and
        # the compacted delta update below — each stable_partition is a
        # full (n,)-keyed device sort (~1.6 ms at 1M on v5e, profiled as
        # a top-5 sparse-iteration cost)
        morder, nm = C.stable_partition(moved)
        skipped_refresh = jnp.where(
            use_dense, ~mode_refresh, ~sparse_refresh)

        def patch_moved(u4, l4):
            order_p = pad_order(morder)
            # zero trips when the refresh already wrote fresh bounds for
            # every row (the walk would rewrite bitwise-identical values:
            # exact_assign_bounds is batch-layout independent).  Gating
            # the TRIP COUNT instead of lax.cond-wrapping the walk keeps
            # (u, l) flowing through one while_loop in both cases — a
            # cond whose other branch passes the operands through forced
            # XLA to COPY the (n, G) l array every iteration (profiled
            # ~1.6 ms at 2M x 102 fp32 on v5e)
            n_act = jnp.where(skipped_refresh,
                              (nm + schunk - 1) // schunk, jnp.int32(0))

            def pcond(c):
                return c[0] < n_act

            def pbody(c):
                i, u_full, l_full = c
                base = i * schunk
                idx = lax.dynamic_slice(order_p, (base,), (schunk,))
                row_ok = (base + offs) < nm
                _aid, u_new, l_new, ga_new = exact_assign_bounds(
                    x[idx], x_sq[idx])
                idx_ok = jnp.where(row_ok, idx, nl)
                return (i + 1,
                        u_full.at[idx_ok].set(u_store(u_new, ga_new),
                                              mode="drop"),
                        l_full.at[idx_ok].set(
                            lower_cast(l_new + C2[None, :]), mode="drop"))

            pinit = _mark_varying((jnp.int32(0), u4, l4), axis_name)
            _i, u5, l5 = lax.while_loop(pcond, pbody, pinit)
            return u5, l5

        u4, l4 = patch_moved(u4, l4)

        def d_dense():
            return C.delta_dense(
                x, assign2, assign, n_clusters=k, chunk=chunk,
                axis_name=axis_name)

        def d_sparse():
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
        return (c_new, assign2, u4, l4, ga4,
                (sums + d_sums, counts + d_counts), it + 1, changed2,
                log_ch, log_pa, log_ca,
                (refresh_in2, period2, tskip_in2, tperiod2,
                 cand_mark2, acc_ex2, passed_n, ref_any2, C2,
                 mark2, stale2))

    assign0, u0, l0, ga0 = _mark_varying(
        (assign0, u0, l0.astype(bounds_dtype), ga0), axis_name)
    init = (centroids0, assign0, u0, l0, ga0, (sums0, counts0),
            jnp.int32(0), limits[7],
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            jnp.zeros((LOG_CAPACITY,), jnp.int32),
            # the refresh/tighten backoff schedule resumes from the
            # previous segment (limits[8:16]); the drift accumulator C
            # (per group) starts at zero each segment: the stored l
            # enters in drift-CURRENT coordinates and leaves rebased
            # below, so the resume state never carries an unbounded
            # accumulator
            (limits[8], limits[9], limits[10], limits[11],
             limits[12], limits[13], limits[14], limits[15] != 0,
             jnp.zeros((g,), jnp.float32),
             limits[3], limits[4]))
    (c_cur, assign, u_fin, l_fin, ga_fin, (sums_fin, counts_fin), it,
     _changed, log_ch, log_pa, log_ca, rb) = lax.while_loop(
        cond, body, init)
    # segment-exit rebase: fold the accumulated drift into the stored
    # bounds so the returned (u, l) are plain drift-current values (what
    # the bound-invariant tests check and what the next segment enters
    # with C = 0).  One (n, G)-class pass per SEGMENT, not per
    # iteration; the margins keep the rebased values sound (u up, l
    # down).
    C_fin = rb[8]
    la = l_fin.astype(jnp.float32)
    l_out = lower_cast((la - C_fin[None, :])
                       - 2.4e-7 * (jnp.abs(la) + C_fin[None, :]))
    iota_go = lax.broadcasted_iota(jnp.int32, (1, groups), 1)
    c2fin = jnp.sum(
        jnp.where(ga_fin[:, None] == iota_go, C_fin[None, :], 0.0),
        axis=1)
    u_out = (u_fin + c2fin) + 2.4e-7 * (jnp.abs(u_fin) + c2fin)
    sched = jnp.stack([rb[9], rb[10], rb[0], rb[1], rb[2], rb[3], rb[4],
                       rb[5], rb[6], rb[7].astype(jnp.int32)])
    return (c_cur, assign, it, log_ch, log_pa, log_ca, u_out, l_out,
            ga_fin, sums_fin, counts_fin, sched)
