"""Tuning constants.

The reference keeps its magic numbers as ``#define``s scattered through the
kernels (reference src/kmeans.cu:14-29, src/knn.cu:7-12, src/transpose.cu:3-4,
catalogued in SURVEY.md §2.3).  Here they are real config, in one place.

CUDA block sizes have no TPU analog; the corresponding knobs here are the
sample-chunk length processed per scan step (how much of the distance matrix
is materialized in VMEM at a time — the analog of the reference's ``cstep``
shared-memory centroid tiling, kmeans.cu:243-258) and the Pallas tile shapes.
"""

# ---- algorithm constants (identical semantics to the reference) -----------

#: Yinyang group count = YINYANG_T * clusters; same default as the reference
#: API (kmcuda.h:97-99).
DEFAULT_YINYANG_T = 0.1

#: Tolerance used when clustering the centroids themselves into Yinyang
#: groups (YINYANG_GROUP_TOLERANCE, kmeans.cu:27).
YINYANG_GROUP_TOLERANCE = 0.02

#: The Lloyd "draft" phase runs until fewer than this fraction of samples are
#: reassigned, then Yinyang takes over (YINYANG_DRAFT_REASSIGNMENTS,
#: kmeans.cu:28).  Yinyang is pointless while assignments churn.
YINYANG_DRAFT_REASSIGNMENTS = 0.11

#: If more than (1 - epsilon) of samples pass the global filter, the bounds
#: have gone stale and are recomputed exactly (YINYANG_REFRESH_EPSILON,
#: kmeans.cu:29).
YINYANG_REFRESH_EPSILON = 1e-4

#: Yinyang is disabled entirely when tolerance >= this value — convergence is
#: declared too early for the bounds machinery to pay off (kmeans.cu:1037-1050).
YINYANG_MIN_TOLERANCE = 0.11

#: Default AFK-MC2 Markov chain length (kmcuda.cc:338-345).
AFKMC2_DEFAULT_M = 200

#: Centroids per init-loop dispatch for the segmented k-means++/AFK-MC2
#: drivers (models/initialization._drive_segments).  The reference prints
#: progress bars through its O(k) host init loops (kmcuda.cc:286-290,
#: 368-371); a single silent fori_loop at k >= 1024 gives a watchdog no
#: way to tell compute from hang.  Bounded segments of this many
#: centroids restore the progress signal (verbosity 1: one line per
#: segment) at the cost of k/256 extra async dispatches; results are
#: bitwise independent of the segmentation (carried key stream,
#: golden-locked).
INIT_SEGMENT_CENTROIDS = 256

#: Safety cap on Lloyd/Yinyang iterations.  The reference iterates until the
#: tolerance is met with no cap; a cap guards tolerance=0 runs on adversarial
#: data where Lloyd cycles.
DEFAULT_MAX_ITERATIONS = 65535

#: Stagnation stop: end the iteration when the reassignment count has not
#: improved its running best for this many consecutive iterations.  In
#: reduced precision (bf16 storage) on concentrated data, score rounding
#: flips near-boundary samples forever: the churn floor can sit ABOVE the
#: requested tolerance (measured: ~4% at 8M x 256 uniform bf16 vs a 1%
#: tolerance), and without this stop the loop runs to the iteration cap —
#: hours of no progress (the reference, with no cap at all, would spin
#: forever, README.md:119-122 only warns fp16 "needs more iterations").
#: Generous on purpose: any genuinely converging run sets a new best long
#: before 50 stale iterations.  This stop is an intentional divergence
#: from the reference (which would spin forever); set to None to disable
#: it and run to the tolerance or the iteration cap.  The (mark, stale)
#: counters are part of the device loop's resume state, so the stopping
#: iteration does not depend on LOOP_SEGMENT_ITERATIONS.
STAGNATION_PATIENCE = 50

#: Iterations per device dispatch of the convergence loops.  The on-device
#: while_loop avoids a host sync per iteration (the reference pays one,
#: check_changed, kmeans.cu:697-717), but an UNBOUNDED single dispatch is
#: fragile — runtime watchdogs kill multi-minute programs, and the user
#: sees no progress.  Segmenting costs one host round-trip per this many
#: iterations and streams the ``iteration N:`` lines live per segment.
#: Results AND the stopping iteration are bitwise independent of the
#: segment length: all resume state — centroids, bounds, accumulation
#: sums, and the stagnation (mark, stale) counters — round-trips through
#: the device loop exactly.
LOOP_SEGMENT_ITERATIONS = 256

# ---- size limits (mirroring the reference's uint32 layout constraints,
# README.md:116-118, enforced at kmcuda.cc:31-39 / python.cc:109-118) --------

MAX_SAMPLES = 2**32 - 1
MAX_CLUSTERS = 2**32 - 2
MAX_FEATURES = 2**16
MAX_CLUSTERS_X_FEATURES = 2**32

# ---- TPU execution shape knobs ---------------------------------------------

#: Rows of samples processed per step of the fused assign+update scan.  Sets
#: the transient (chunk x clusters) score-block footprint:
#: 2048 x 1024 x 4 B = 8 MB, sized to stay VMEM-resident alongside the
#: centroid block.
DEFAULT_SAMPLE_CHUNK = 2048

#: Pad the cluster axis to a multiple of this (TPU lane width).
LANE = 128

#: Pad sample counts to a multiple of this (fp32 sublane width).
SUBLANE = 8

#: Additive penalty marking padded cluster slots; +inf breaks ``argmin``
#: tie-breaking via where-min, so use a huge finite score instead.
PAD_PENALTY = 1e30

# ---- Pallas kernel tiles ----------------------------------------------------

#: Sample-tile rows for the fused Pallas assignment kernel.
ASSIGN_TILE_S = 512
#: Cluster-tile columns for the fused Pallas assignment kernel.
ASSIGN_TILE_C = 512
#: Feature-chunk for the Pallas kernels when features are too large to keep
#: a full (tile_s, features) block in VMEM.
ASSIGN_TILE_F = 512

#: K-nn search tiles: queries per chunk (the pruning granularity — the
#: tile-skip test is "any query in the chunk still needs this tile":
#: smaller chunks prune more but dispatch more walks; 512 measured best
#: at 1M x 64 on v5e, and the examined fraction was chunk-insensitive on
#: the 13K fixture) and member-tile rows for the brute-force fallback
#: (the pruned path sizes member tiles from the mean cluster size
#: instead, models/knn._pick_tile_m).
KNN_TILE_Q = 512
KNN_TILE_M = 2048

#: Member rows per step of the pruned walk (= group of
#: KNN_TILE_GROUP_ROWS / tile_m single-cluster tiles).  One tile per step
#: spends more wall time on while-loop dispatch than on the tile matmul;
#: grouping makes each step one MXU-sized (chunk, rows) score matmul at
#: the cost of over-visiting at most group-1 tiles per chunk walk.
KNN_TILE_GROUP_ROWS = 4096

#: Queries per k-nn search dispatch (per device).  The search runs as a
#: sequence of host-level batches rather than one monolithic device
#: program: on weakly-prunable data (high dimensions defeat the triangle
#: inequality) an exact k-nn over 1M+ samples legitimately runs for tens
#: of minutes, and a single dispatch that long is fragile (runtime
#: watchdogs kill the worker — observed on the axon tunnel — and there is
#: no progress signal).  Batches bound each dispatch and surface progress
#: through the logger.  Results are independent of the batch size.
KNN_QUERY_BATCH = 65536

#: Fused Pallas k-nn walk kernel (ops/knn_pallas.py): the pruned tile
#: tour of each query chunk runs as one Mosaic kernel (member tiles
#: DMA'd on demand, top-kk buffer maintained in VMEM) instead of the
#: XLA while-loop that round-trips every distance block through HBM.
#: "auto"/True = use it on TPU when the working set fits
#: (knn_pallas.supported); False = never.  Non-TPU backends always take
#: the XLA walk (interpret-mode Pallas under shard_map trips vma checks;
#: the kernel is exercised directly by tests/test_knn_pallas.py).
#: Validated on the attached v5e (round 3): Mosaic compile clean, bit
#: -identical neighbors vs the XLA walk, and 2.16x faster wall
#: (0.242 s vs 0.522 s at 100K x 64, k=256, 16-nn, warm) — the DMA'd
#: VMEM-resident tour beats the HBM round-tripping while_loop walk.
USE_PALLAS_KNN = "auto"

#: VMEM compiler budget for the fused k-nn walk kernel; the engagement
#: gate (knn_pallas.supported) keeps the live set under 48 MB, leaving
#: headroom for Mosaic's own staging.
KNN_PALLAS_VMEM_LIMIT = 64 * 1024 * 1024

#: Above this many clusters the k-nn layout planner relabels clusters by
#: a principal-direction projection sort (O(k*f)) instead of the greedy
#: nearest-neighbor tour, whose k sequential argmin steps over a
#: materialized k x k distance matrix do not scale (models/knn).  Both
#: orderings only affect pruning efficiency, never results.
KNN_TOUR_MAX_K = 4096

#: Fused Pallas assignment kernel for the Lloyd hot loop
#: (ops/assign_pallas.py).  "auto" = use it for bf16 storage (measured 12%
#: faster than the XLA scan; at fp32-HIGHEST precision XLA wins), True =
#: always when the shape fits, False = never.  Non-TPU backends always
#: take the XLA scan (the kernel is exercised in interpreter mode by
#: tests/test_pallas.py).
USE_PALLAS_ASSIGN = "auto"

#: When more than this fraction of all samples pass the drift (global)
#: filter, the Yinyang iteration runs DENSE: one natural-order pass over
#: every sample, refreshing bounds per the backoff schedule — the TPU
#: form of the reference's bounds refresh (YINYANG_REFRESH_EPSILON pass,
#: kmeans.cu:1117-1158).  Below it, the candidates are compacted and only
#: they are touched.  Results are identical either way; this only trades
#: wall time.  The crossover sits where compaction's per-row
#: gather/scatter cost (~5-10x a streamed row on TPU) matches the dense
#: pass's full matmul: measured near 15-20%% candidates at f=64..256,
#: k=1024 on v5e.
YY_DENSE_FRACTION = 0.35

#: Dense-path bounds-refresh backoff cap: while consecutive refreshes fail
#: to engage the global filter (the next iteration is dense again), the
#: number of plain-Lloyd dense iterations between refreshes doubles up to
#: this many; one sparse (filter-engaged) iteration resets the period to 1.
#: Bounds never affect the argmin, so this trades only wall time: on
#: filter-hostile data the steady-state dense iteration costs exactly one
#: Lloyd pass (the drift/count pass is skipped while the bounds are
#: vacuous — ops.yinyang), so the worst case over plain Lloyd is one
#: refresh probe (~1.3 Lloyd passes) per this many iterations: ~2% at 64.
#: The cost of a large cap is delayed detection when converging drifts
#: finally make the filter bite — but every skipped probe iteration is a
#: full-value Lloyd iteration, so nothing is wasted, only the pruning
#: upside arrives up to this many iterations late.
YY_REFRESH_BACKOFF_MAX = 64

#: Sparse-path lower-bound refresh trigger (ski-rental form, round 4):
#: a refresh ADDS the group-minima panel matmul (~this multiple of one
#: assignment-width row) to every row passing the local filter that
#: iteration, while stale bounds admit extra candidates at one
#: assignment-width row EACH, EVERY iteration.  The device loop
#: accumulates the extra-candidate count since the last refresh
#: (n_cand - cand_fresh, summed) and refreshes once the accumulated
#: cost matches the surcharge (this constant x the previous passed
#: count) — the classic rent-vs-buy crossover, so the trigger
#: self-tunes to the measured erosion rate instead of assuming a
#: growth shape (the previous factor-2 growth trigger let candidates
#: double before refreshing: measured 265K -> 516K over ~25 tail
#: iterations at 2M x 256 @ 1024, ~4 ms/iteration of avoidable
#: local-filter work vs ~0.5 ms/iteration of refresh).  Wall time
#: only, never results (the patch walk keeps skipped-refresh
#: iterations' bound semantics sound).
YY_SPARSE_REFRESH_SURCHARGE = 1.2

#: A sparse-path tighten row (rowwise exact own-centroid distance) costs
#: about a third of a local-filter row (full score + panel matmuls), so
#: the tighten phase pays only when it prunes at least this fraction of
#: the candidates.  Measured prune rates below it trigger the same
#: exponential backoff as the bounds refresh.  Like every Yinyang
#: scheduling knob, this affects wall time only, never results.
YY_TIGHTEN_MIN_PRUNE = 0.33

#: Above this many bytes of (n, G) fp32 lower bounds, Yinyang stores them
#: in bfloat16 (rounded down, so the filter stays sound — see
#: ops.yinyang.lower_cast).  Halving the dominant state array is what lets
#: near-HBM-sized data sets run Yinyang on a single chip.  2 GB: a v5e
#: chip has 16 GB HBM, and the bf16 haircut (one 2^-8 relative round-down
#: per store) measurably loosens the global filter — on the contested
#: deep-tail fixture it inflates the permanent candidate set — so fp32 is
#: worth its memory whenever the array is not a material fraction of HBM
#: (round 4; was 64 MB).
YY_BOUNDS_F32_MAX_BYTES = 1 << 31

#: Yinyang filter triage knob (0 = normal; 1 = treat every sample as a
#: global-filter candidate; 2 = also skip the tightened re-test).  Only for
#: debugging filter soundness.
YY_DEBUG_MODE = 0

# --- host-side Yinyang wall-clock controller (models/yinyang.run) -------
# The device loop's dense/sparse decision is a work model (candidate
# fraction vs YY_DENSE_FRACTION); whether the sparse machinery's fixed
# costs (compaction, gathers, (n, G) bound maintenance) actually beat a
# rooflined Lloyd pass is hardware- and shape-dependent.  The host driver
# measures segment wall clock and revokes the device loop's permission to
# take the sparse branch when measured sparse throughput loses to the
# draft's measured Lloyd throughput — the reference's contract that
# Yinyang is never the slower choice (README.md:8-10), enforced by
# measurement.  Like every Yinyang scheduling knob, this affects wall
# time only, never results (test-locked).

#: Master switch for the controller.  False = always allow the sparse
#: branch (the pure work-model behavior).
YY_WALL_CONTROLLER = True

#: Iteration budget below which Yinyang is not entered at all: grouping +
#: bound init cost a few Lloyd iterations and cannot amortize inside a
#: small fixed `max_iterations`; the run continues on the (bitwise
#: identical) incremental-Lloyd path instead.
YY_MIN_REMAINING = 32

#: Segment length (iterations) while a mode is on probation: the first
#: Yinyang segment, and every re-probe after a revocation.  Short probes
#: bound the cost of a wrong guess; winning segments grow geometrically
#: back to LOOP_SEGMENT_ITERATIONS.
YY_PROBE_ITERS = 8

#: Hysteresis for revoking/granting the sparse branch: revoke when a
#: sparse-heavy segment's s/iter exceeds the Lloyd reference by this
#: factor; re-grant probes start after YY_REPROBE_ITERS iterations and
#: the interval doubles after every failed probe (capped at
#: YY_REPROBE_ITERS_MAX) — converging drifts can make the filter start
#: paying arbitrarily late in a long run.
YY_BAILOUT_MARGIN = 1.02
YY_REPROBE_ITERS = 128
YY_REPROBE_ITERS_MAX = 2048
