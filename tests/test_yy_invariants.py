"""Yinyang bound-soundness invariants on adversarial data.

Locks in the fixes for three numeric bug classes found on TPU:
NaN-poisoned one-hot lookups (0 * NaN spreads a dead centroid's NaN row
everywhere), wrong-group bound exclusion, and precision-rounded value
lookups.  The invariants:

- u[s] >= d(s, centroid[assign[s]])            (upper bound)
- l[s, g] <= min over c in group g, c != assign[s] of d(s, c)
                                               (lower bounds)
- converged Yinyang assignments == Lloyd's exactly.

Data is chosen adversarially: tight, well-separated clusters (knife-edge
boundary samples) and k large enough that some clusters die (NaN
centroids) during the run.
"""

import numpy as np
import pytest

from kmcuda_tpu import kmeans_tpu


@pytest.fixture(scope="module")
def tight():
    rng = np.random.RandomState(0)
    n, k, f = 30000, 256, 32
    # fewer real blobs than requested clusters: contested clusters lose
    # all members -> dead (NaN) centroids during the run
    centers = (rng.rand(96, f) * 2).astype(np.float32)
    x = (centers[rng.randint(0, 96, n)]
         + 0.2 * rng.randn(n, f)).astype(np.float32)
    return x, k


def test_yinyang_matches_incremental_lloyd_tight_clusters(tight):
    """Bitwise trajectory parity on knife-edge data.  The comparison pair
    is Yinyang vs the *incremental* Lloyd path — both accumulate the same
    delta stream, like the reference's kmeans_adjust in both algorithms.
    (The public fused-Lloyd path differs from these two by ulp tie flips
    on adversarial fixtures: its full segment-sums legitimately round
    differently.)"""
    import jax

    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models import yinyang as Y
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    x, k = tight
    topo = Topology(jax.devices()[:1])
    p = prepare(x, k, DistanceMetric.L2, topo, Logger(0))
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    lc, la, *_ = L.run_incremental(
        p, c0, L.new_assignments(p), 0.0, max_iterations=60)
    yc, ya, _b, _it = Y.run(
        p, c0, L.new_assignments(p), 0.0, 25, max_iterations=60, key=key)
    assert np.array_equal(np.asarray(la), np.asarray(ya))
    assert np.array_equal(np.asarray(lc), np.asarray(yc), equal_nan=True)


def test_bound_invariants(tight):
    import jax
    import jax.numpy as jnp

    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.models.yinyang import _build_yy_run, _group_centroids
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    x_np, k = tight
    n = len(x_np)
    groups = 25
    topo = Topology(jax.devices()[:1])
    p = prepare(x_np, k, DistanceMetric.L2, topo, Logger(0))
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    c_d, a_d, sums_d, counts_d, _it, _ch = L.run_incremental(
        p, c0, L.new_assignments(p), 0.11)
    group_of, flat_slot, pad_src, pad_pen, cap = _group_centroids(
        p, c_d, groups, jax.random.fold_in(key, 0x77))
    runy = _build_yy_run(p.topo.mesh, k, groups, cap, p.metric, p.chunk)
    out = runy(p.x, p.x_sq, p.valid, a_d, c_d, sums_d, counts_d,
               p.topo.put_replicated(jnp.asarray(pad_src)),
               p.topo.put_replicated(jnp.asarray(pad_pen)),
               p.topo.put_replicated(jnp.asarray(flat_slot)),
               p.topo.put_sharded(jnp.zeros((p.n_pad,), jnp.float32)),
               p.topo.put_sharded(
                   jnp.zeros((p.n_pad, groups), jnp.float32)),
               p.topo.put_sharded(jnp.zeros((p.n_pad,), jnp.int32)),
               # (tol, seg, patience, mark, stale, resume, sparse_ok,
               # prev_changed, refresh_in, period, tskip, tperiod,
               # cand_mark, acc_extra, prev_passed, ref_any):
               # prev_changed = int32 max ("everything moved") is a
               # valid fresh seed for the delta prediction; the last
               # eight are the fresh-start refresh/tighten schedule
               jnp.asarray([-1, 6, 50, np.iinfo(np.int32).max, 0, 0, 1,
                            np.iinfo(np.int32).max, 0, 1, 0, 1, 0, 0, 0,
                            0], jnp.int32))
    (c_fin, assign, _it2, _lch, _lpa, _lca, u_fin, l_fin, _ga_fin,
     _sums, _counts, _stag) = out
    c_fin = np.asarray(c_fin).astype(np.float64)
    assign = np.asarray(assign)[:n]
    u = np.asarray(u_fin)[:n]
    l_arr = np.asarray(l_fin)[:n]

    alive = np.isfinite(c_fin).all(axis=1)
    assert (~alive).sum() > 0, "fixture must produce dead centroids"
    cz = np.where(alive[:, None], c_fin, 0.0)
    xs = x_np.astype(np.float64)
    d = np.sqrt(np.maximum(
        (xs ** 2).sum(1)[:, None] + (cz ** 2).sum(1)[None, :]
        - 2.0 * xs @ cz.T, 0.0))
    d[:, ~alive] = np.inf

    d_own = d[np.arange(n), assign]
    assert (u + 1e-4 >= d_own).all(), \
        "u must upper-bound the own-centroid distance"

    dmask = d.copy()
    dmask[np.arange(n), assign] = np.inf
    gof = np.asarray(group_of)
    for g_ in range(groups):
        cols = np.where(gof == g_)[0]
        if not len(cols):
            continue
        minother = dmask[:, cols].min(axis=1)
        finite = np.isfinite(minother)
        assert (l_arr[finite, g_] <= minother[finite] + 1e-4).all(), \
            "l[%d] must lower-bound every other centroid of the group" % g_


@pytest.mark.parametrize("knobs", [
    dict(YY_REFRESH_BACKOFF_MAX=1, YY_TIGHTEN_MIN_PRUNE=0.0),
    dict(YY_REFRESH_BACKOFF_MAX=64, YY_TIGHTEN_MIN_PRUNE=1.0),
    dict(YY_DENSE_FRACTION=0.01),
    dict(YY_DENSE_FRACTION=0.99),
])
def test_scheduling_knobs_never_change_results(tight, knobs, monkeypatch):
    """The adaptive machinery (dense/sparse choice, bounds-refresh backoff,
    tighten skip) trades wall time only: bounds never feed the argmin, so
    any knob setting must yield the bitwise-identical trajectory."""
    import jax

    from kmcuda_tpu import config
    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models import yinyang as Y
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    x, k = tight
    topo = Topology(jax.devices()[:1])
    p = prepare(x, k, DistanceMetric.L2, topo, Logger(0))
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    ref_c, ref_a, _b, _it = Y.run(
        p, c0, L.new_assignments(p), 0.0, 25, max_iterations=40, key=key)
    ref_c, ref_a = np.asarray(ref_c), np.asarray(ref_a)

    for name, val in knobs.items():
        monkeypatch.setattr(config, name, val)
    # the knobs are baked into the jitted program; drop the cache entry
    Y._build_yy_run.cache_clear()
    try:
        yc, ya, _b2, _it2 = Y.run(
            p, c0, L.new_assignments(p), 0.0, 25, max_iterations=40,
            key=key)
        assert np.array_equal(ref_a, np.asarray(ya))
        assert np.array_equal(ref_c, np.asarray(yc), equal_nan=True)
    finally:
        Y._build_yy_run.cache_clear()


def test_bf16_bound_storage_never_changes_results(tight, monkeypatch):
    """Forcing bfloat16 lower-bound storage (the near-HBM regime,
    YY_BOUNDS_F32_MAX_BYTES) must yield the bitwise-identical trajectory:
    bounds only gate work, never feed the argmin, and lower_cast rounds
    strictly down so the filter stays sound (ops.yinyang.lower_cast)."""
    import jax

    from kmcuda_tpu import config
    from kmcuda_tpu.models import yinyang as Y

    x, k = tight
    ref_c, ref_a = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                              max_iterations=40, yinyang_t=0.1)
    monkeypatch.setattr(config, "YY_BOUNDS_F32_MAX_BYTES", 0)
    bc, ba = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                        max_iterations=40, yinyang_t=0.1)
    assert np.array_equal(np.asarray(ref_a), np.asarray(ba))
    assert np.array_equal(np.asarray(ref_c), np.asarray(bc),
                          equal_nan=True)


def test_bf16_storage_yinyang_matches_its_lloyd(tight):
    """bf16 *sample* storage (the reference's fp16 Yinyang test class,
    test.py:525-534): Yinyang on fp16 input must still reproduce the
    incremental Lloyd trajectory exactly — both run the same bf16
    assignment matmuls and the same delta-update stream."""
    import jax

    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models import yinyang as Y
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    x, k = tight
    topo = Topology(jax.devices()[:1])
    p = prepare(x.astype(np.float16), k, DistanceMetric.L2, topo,
                Logger(0))
    assert p.x.dtype == jnp_bf16()
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    lc, la, *_ = L.run_incremental(
        p, c0, L.new_assignments(p), 0.0, max_iterations=30)
    yc, ya, _b, _it = Y.run(
        p, c0, L.new_assignments(p), 0.0, 25, max_iterations=30, key=key)
    assert np.array_equal(np.asarray(la), np.asarray(ya))
    assert np.array_equal(np.asarray(lc), np.asarray(yc), equal_nan=True)


def jnp_bf16():
    import jax.numpy as jnp

    return jnp.bfloat16


def test_stagnation_stop(tight, monkeypatch, capsys):
    """With patience=1 the loop must stop at the first iteration that
    fails to improve the running-best reassignment count (the guard that
    keeps reduced-precision churn floors from running to the iteration
    cap), and say so."""
    from kmcuda_tpu import config

    x, k = tight
    monkeypatch.setattr(config, "STAGNATION_PATIENCE", 1)
    kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
               max_iterations=200, yinyang_t=0, verbosity=1)
    out = capsys.readouterr().out
    counts = [int(l.split(": ")[1].split()[0])
              for l in out.splitlines() if l.startswith("iteration")]
    assert 1 < len(counts) < 200
    # every iteration but the last meaningfully (>= mark/64) improved the
    # running mark; the last one failed to, which is what stopped the run
    mark = counts[0]
    for c in counts[1:-1]:
        assert c < mark - (mark >> 6)
        mark = c
    assert counts[-1] >= mark - (mark >> 6) and counts[-1] > 0
    assert "stagnated" in out


def test_segment_length_invariant(tight, monkeypatch):
    """The host-level segmentation of the convergence loops (bounded
    device dispatches) must not change results: resume state is exact."""
    from kmcuda_tpu import config

    x, k = tight
    rc, ra = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                        max_iterations=40, yinyang_t=0.1)
    monkeypatch.setattr(config, "LOOP_SEGMENT_ITERATIONS", 3)
    sc, sa = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                        max_iterations=40, yinyang_t=0.1)
    assert np.array_equal(np.asarray(ra), np.asarray(sa))
    assert np.array_equal(np.asarray(rc), np.asarray(sc), equal_nan=True)


def test_segment_length_invariant_with_stagnation(tight, monkeypatch,
                                                  capsys):
    """The stagnation stop must also be segment-invariant: the (mark,
    stale) counters round-trip through the device loop, so a run that
    stops by stagnation stops at the SAME iteration whether the segment
    is longer or (the hard case) shorter than the patience window."""
    from kmcuda_tpu import config

    # bf16 storage (fp16 input) has a genuine churn floor, so the run
    # plateaus instead of converging — exactly the regime the stop is for
    x, k = tight
    x = x.astype(np.float16)
    monkeypatch.setattr(config, "STAGNATION_PATIENCE", 4)

    def run_and_count():
        c, a = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                          max_iterations=200, yinyang_t=0, verbosity=1)
        out = capsys.readouterr().out
        iters = sum(1 for l in out.splitlines()
                    if l.startswith("iteration"))
        return c, a, iters, ("stagnated" in out)

    rc, ra, r_iters, r_stag = run_and_count()
    assert r_stag, "fixture must actually trip the stagnation stop"
    # segment shorter than the patience window: the device counter alone
    # can never reach 4 inside one dispatch — only the carried state can
    monkeypatch.setattr(config, "LOOP_SEGMENT_ITERATIONS", 2)
    sc, sa, s_iters, s_stag = run_and_count()
    assert s_stag and s_iters == r_iters
    assert np.array_equal(np.asarray(ra), np.asarray(sa))
    assert np.array_equal(np.asarray(rc), np.asarray(sc), equal_nan=True)


def test_wall_controller_never_changes_results(tight, monkeypatch):
    """The wall-clock controller (models/yinyang.run) revokes / re-grants
    the device loop's sparse-branch permission and shortens probe
    segments from host-side timing.  Timing is nondeterministic, so the
    contract is: ANY controller schedule yields the bitwise-identical
    trajectory.  Force the two extreme schedules (revoke-always via
    margin 0, grant-always via margin inf — the conftest default) and a
    tight re-probe cycle, and compare."""
    import jax

    from kmcuda_tpu import config
    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models import yinyang as Y
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    x, k = tight
    topo = Topology(jax.devices()[:1])
    p = prepare(x, k, DistanceMetric.L2, topo, Logger(0))
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    ref_c, ref_a, _b, ref_it = Y.run(
        p, c0, L.new_assignments(p), 0.0, 25, max_iterations=60, key=key)
    ref_c, ref_a = np.asarray(ref_c), np.asarray(ref_a)

    # revoke the sparse branch the moment it is measured (margin 0 makes
    # every sparse-heavy segment "lose"), re-probe after 4 iterations,
    # with 2-iteration probe segments: exercises revoke + regrant + the
    # probe/grow segment schedule
    monkeypatch.setattr(config, "YY_BAILOUT_MARGIN", 0.0)
    monkeypatch.setattr(config, "YY_PROBE_ITERS", 2)
    monkeypatch.setattr(config, "YY_REPROBE_ITERS", 4)
    monkeypatch.setattr(config, "YY_REPROBE_ITERS_MAX", 8)
    yc, ya, _b2, it2 = Y.run(
        p, c0, L.new_assignments(p), 0.0, 25, max_iterations=60, key=key)
    assert it2 == ref_it
    assert np.array_equal(ref_a, np.asarray(ya))
    assert np.array_equal(ref_c, np.asarray(yc), equal_nan=True)


def test_budget_gate_never_changes_results(tight, monkeypatch, capsys):
    """With a small fixed iteration budget the controller refuses to pay
    the Yinyang setup (grouping + bound init) and finishes on the
    incremental-Lloyd path — same results, and the gate must actually
    fire (no grouping debug line)."""
    from kmcuda_tpu import config

    x, k = tight
    ref_c, ref_a = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                              max_iterations=20, yinyang_t=0.1)
    capsys.readouterr()
    monkeypatch.setattr(config, "YY_MIN_REMAINING", 1 << 30)
    gc, ga = kmeans_tpu(x, k, init="random", seed=5, tolerance=0.0,
                        max_iterations=20, yinyang_t=0.1, verbosity=2)
    out = capsys.readouterr().out
    assert "YY_MIN_REMAINING" in out, "the gate must fire"
    assert "group capacity" not in out, "grouping must be skipped"
    assert np.array_equal(np.asarray(ref_a), np.asarray(ga))
    assert np.array_equal(np.asarray(ref_c), np.asarray(gc),
                          equal_nan=True)


def test_knife_edge_ulp_tie_parity():
    """Regression for a real parity hole: a sample whose two nearest
    centroids end up one fp32 ulp apart (fp64 gap ~6e-6 on |score| ~110)
    flipped between the compacted Yinyang path and the Lloyd chunk scan,
    because XLA's gemm rounds gathered vs scan-sliced batches differently.
    The exact top-2 rescore (ops/distance.argmin_rescored) resolves the
    tie with row-local arithmetic; this fixture reproduced the flip at
    iteration 16 before the fix."""
    import jax

    from kmcuda_tpu import config
    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models import lloyd as L
    from kmcuda_tpu.models import yinyang as Y
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    rng = np.random.RandomState(0)
    centers = rng.rand(20, 8).astype(np.float32) * 5
    x = (centers[rng.randint(0, 20, 6000)]
         + 0.1 * rng.randn(6000, 8)).astype(np.float32)
    topo = Topology(jax.devices())
    p = prepare(x, 50, DistanceMetric.L2, topo, Logger(0))
    key = jax.random.key(5)
    c0 = I.init_centroids(p, I.InitMethod.RANDOM, key)
    lc, la, *_ = L.run_incremental(
        p, c0, L.new_assignments(p), 0.0, max_iterations=50)
    yc, ya, _b, _it = Y.run(
        p, c0, L.new_assignments(p), 0.0, 5, max_iterations=50, key=key)
    assert np.array_equal(np.asarray(la), np.asarray(ya))
    assert np.array_equal(np.asarray(lc), np.asarray(yc), equal_nan=True)
