"""K-means integration tests.

Same validation strategy as the reference suite (reference src/test.py,
SURVEY.md §4): behavioral parity against sklearn (one extra KMeans step from
our centroids must reassign less than the tolerance fraction), seed-locked
iteration-count goldens parsed from the ``iteration N: M reassignments``
stdout lines, and multi-device variants of each major test via the device
bitmask — here against the 8-device virtual CPU mesh from conftest.
"""

import numpy as np
import pytest
from sklearn.cluster import KMeans

from kmcuda_tpu import kmeans_tpu


@pytest.fixture(scope="module")
def samples():
    """A deterministic 2D blob mixture, the same *kind* of fixture as the
    reference (test.py:159-168): several uniform squares plus background."""
    rng = np.random.RandomState(0)
    arr = np.empty((13000, 2), dtype=np.float32)
    arr[:2000] = rng.rand(2000, 2) + [0, 0.5]
    arr[2000:4000] = rng.rand(2000, 2) + [0, 1.5]
    arr[4000:6000] = rng.rand(2000, 2) - [0, 0.5]
    arr[6000:8000] = rng.rand(2000, 2) + [0.5, 0]
    arr[8000:10000] = rng.rand(2000, 2) - [0.5, 0]
    arr[10000:] = rng.rand(3000, 2) * 5 - [2, 2]
    return arr


def validate(samples, centroids, assignments, tolerance):
    """One sklearn Lloyd step seeded with our centroids must move fewer
    than tolerance * n samples."""
    assert not np.isnan(centroids).any(), "NaN centroids (empty clusters)"
    ref = KMeans(n_clusters=len(centroids), init=centroids, n_init=1,
                 max_iter=1)
    next_assign = ref.fit_predict(samples)
    reassigned = int(np.sum(assignments != next_assign))
    assert reassigned / len(samples) < tolerance, reassigned


def iters_logged(capsys) -> int:
    return sum(1 for line in capsys.readouterr().out.splitlines()
               if line.startswith("iteration"))


class TestValidation:
    def test_bad_clusters_type(self, samples):
        with pytest.raises(TypeError):
            kmeans_tpu(samples, "bullshit", init="random", yinyang_t=0)

    def test_bad_init(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples, 50, init="bullshit", yinyang_t=0)

    def test_bad_tolerance(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples, 50, init="random", tolerance=100,
                       yinyang_t=0)

    def test_bad_yinyang(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples, 50, init="random", yinyang_t=10)

    def test_bad_device_mask(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples, 50, init="random", yinyang_t=0,
                       device=0xFFFF)

    def test_too_many_clusters(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples[:10], 50, init="random", yinyang_t=0)


class TestLloyd:
    # Seed-locked iteration-count goldens, the determinism pillar of the
    # reference suite (test.py:212,225).  Observed once on the CPU-8 mesh
    # with seed=3 and pinned; coincidentally identical to the reference's
    # own 7/4 on its fixture.
    GOLDEN_RANDOM = 7
    GOLDEN_PLUSPLUS = 4

    def test_random_lloyd(self, samples, capsys):
        centroids, assignments = kmeans_tpu(
            samples, 50, init="random", device=1, verbosity=2, seed=3,
            tolerance=0.05, yinyang_t=0)
        iters = iters_logged(capsys)
        assert centroids.shape == (50, 2)
        assert centroids.dtype == np.float32
        assert assignments.shape == (13000,)
        assert assignments.dtype == np.uint32
        if self.GOLDEN_RANDOM is not None:
            assert iters == self.GOLDEN_RANDOM
        validate(samples, centroids, assignments, 0.05)

    def test_kmeanspp_lloyd(self, samples, capsys):
        centroids, assignments = kmeans_tpu(
            samples, 50, init="kmeans++", device=1, verbosity=2, seed=3,
            tolerance=0.05, yinyang_t=0)
        iters = iters_logged(capsys)
        if self.GOLDEN_PLUSPLUS is not None:
            assert iters == self.GOLDEN_PLUSPLUS
        validate(samples, centroids, assignments, 0.05)

    def test_afkmc2_lloyd(self, samples):
        centroids, assignments = kmeans_tpu(
            samples, 50, init=("afkmc2", 200), device=1, seed=3,
            tolerance=0.05, yinyang_t=0)
        validate(samples, centroids, assignments, 0.05)

    def test_import_lloyd(self, samples):
        centroids, _ = kmeans_tpu(
            samples, 50, init="random", device=1, seed=3, tolerance=0.25,
            yinyang_t=0)
        centroids, assignments = kmeans_tpu(
            samples, 50, init=centroids, device=1, seed=3, tolerance=0.05,
            yinyang_t=0)
        validate(samples, centroids, assignments, 0.05)

    def test_random_lloyd_all_devices(self, samples, capsys):
        """device=0 -> all 8 virtual devices (the reference's multi-GPU
        tests, test.py:256-305, without needing a GPU cluster)."""
        centroids, assignments = kmeans_tpu(
            samples, 50, init="random", device=0, verbosity=2, seed=3,
            tolerance=0.05, yinyang_t=0)
        assert iters_logged(capsys) > 0
        validate(samples, centroids, assignments, 0.05)

    def test_random_lloyd_two_devices(self, samples):
        centroids, assignments = kmeans_tpu(
            samples, 50, init="random", device=3, seed=3,
            tolerance=0.05, yinyang_t=0)
        validate(samples, centroids, assignments, 0.05)

    def test_determinism(self, samples):
        a = kmeans_tpu(samples, 50, init="random", device=1, seed=3,
                       tolerance=0.05, yinyang_t=0)
        b = kmeans_tpu(samples, 50, init="random", device=1, seed=3,
                       tolerance=0.05, yinyang_t=0)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])

    def test_average_distance(self, samples):
        centroids, assignments, ad = kmeans_tpu(
            samples, 50, init="random", device=1, seed=3, tolerance=0.05,
            yinyang_t=0, average_distance=True)
        # cross-check against a numpy recomputation (reference
        # test.py:562-571 does the same to 1e-6)
        d = np.linalg.norm(samples - centroids[assignments], axis=1)
        assert ad == pytest.approx(float(d.mean()), abs=1e-5)

    def test_nan_samples(self, samples):
        corrupted = samples.copy()
        corrupted[42] = np.nan
        corrupted[4242, 0] = np.nan
        centroids, assignments = kmeans_tpu(
            corrupted, 50, init="random", device=1, seed=3,
            tolerance=0.05, yinyang_t=0)
        # NaN samples get the invalid marker id == clusters (kmeans.cu:276-284)
        assert assignments[42] == 50
        assert assignments[4242] == 50
        assert not np.isnan(centroids).any()

    def test_jax_array_io(self, samples):
        import jax
        import jax.numpy as jnp
        x = jnp.asarray(samples)
        centroids, assignments = kmeans_tpu(
            x, 50, init="random", device=1, seed=3, tolerance=0.05,
            yinyang_t=0)
        # jax in -> jax out, no host transfer (the device-pointer protocol
        # analog, python.cc:232-278)
        assert isinstance(centroids, jax.Array)
        assert isinstance(assignments, jax.Array)
        validate(samples, np.asarray(centroids), np.asarray(assignments),
                 0.05)


class TestCosine:
    def test_cosine_basic(self, samples):
        rng = np.random.RandomState(7)
        x = rng.rand(8000, 4).astype(np.float32) + 0.1
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        centroids, assignments = kmeans_tpu(
            x, 16, init="random", metric="cos", device=1, seed=3,
            tolerance=0.05, yinyang_t=0)
        # angular centroids are unit-norm (reference test.py:437-439)
        norms = np.linalg.norm(centroids, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # every sample lands in its max-cosine cluster
        sims = x @ centroids.T
        np.testing.assert_array_equal(assignments, sims.argmax(axis=1))

    def test_cosine_requires_normalized(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples * 3.0, 50, metric="cos", device=1,
                       yinyang_t=0, seed=3)


class TestHalf:
    def test_fp16_lloyd(self, samples):
        centroids, assignments = kmeans_tpu(
            samples.astype(np.float16), 50, init="random", device=1,
            seed=3, tolerance=0.05, yinyang_t=0)
        assert centroids.dtype == np.float16
        validate(samples, centroids.astype(np.float32), assignments, 0.06)

    def test_fp16_vs_fp32_quality(self, samples):
        """The reference compares fp16 and fp32 centroids element-wise
        (test.py:512-521) because fp16's 10 mantissa bits keep the
        trajectories aligned; bf16 (8 bits) flips knife-edge argmins early
        and lands in a different local optimum, so compare solution
        *quality* instead: mean distance within 5% (both runs stop at the
        loose 5% reassignment tolerance, so their optima differ a bit)."""
        ads = []
        for arr in (samples.astype(np.float16), samples):
            _, _, ad = kmeans_tpu(arr, 50, init="random", device=1, seed=3,
                                  tolerance=0.05, yinyang_t=0,
                                  average_distance=True)
            ads.append(ad)
        assert abs(ads[0] - ads[1]) / ads[1] < 0.05


class TestEdges:
    def test_two_clusters_minimal(self):
        x = np.array([[0., 0.], [0., 1.], [10., 10.], [10., 11.]],
                     dtype=np.float32)
        c, a = kmeans_tpu(x, 2, init="random", seed=1, tolerance=0.01,
                          yinyang_t=0, device=1)
        assert a[0] == a[1] and a[2] == a[3] and a[0] != a[2]

    def test_n_equals_clusters(self):
        rng = np.random.RandomState(1)
        x = rng.rand(8, 3).astype(np.float32) * 10
        c, a = kmeans_tpu(x, 8, init="random", seed=1, tolerance=0.0,
                          yinyang_t=0, device=1, max_iterations=50)
        assert len(np.unique(a)) == 8

    def test_second_device_only(self, samples):
        """device=2 selects only the second device (kmcuda.cc:65-71)."""
        c, a = kmeans_tpu(samples, 50, init="random", seed=3,
                          tolerance=0.05, yinyang_t=0, device=2)
        assert c.shape == (50, 2)

    def test_seed_none(self, samples):
        c, a = kmeans_tpu(samples, 50, init="random", tolerance=0.05,
                          yinyang_t=0, device=1)
        assert c.shape == (50, 2)

    def test_bfloat16_input(self, samples):
        import jax.numpy as jnp
        x = jnp.asarray(samples, jnp.bfloat16)
        c, a = kmeans_tpu(x, 50, init="random", seed=3, tolerance=0.05,
                          yinyang_t=0, device=1)
        assert c.dtype == jnp.bfloat16

    def test_import_wrong_shape(self, samples):
        with pytest.raises(ValueError):
            kmeans_tpu(samples, 50, init=np.zeros((49, 2), np.float32),
                       yinyang_t=0, device=1)

    def test_average_distance_golden(self, samples):
        """Seed-locked average_distance, the analog of the reference's R
        golden 0.2124216 +- 1e-7 (test.R:66-74).  Pinned from the first
        CPU-8 run."""
        _, _, ad = kmeans_tpu(samples, 50, init="kmeans++", seed=777,
                              tolerance=0.01, yinyang_t=0, device=1,
                              average_distance=True)
        assert ad == pytest.approx(GOLDEN_AVG_DISTANCE, abs=2e-6)


GOLDEN_AVG_DISTANCE = 0.1821749


def test_cross_device_count_parity(samples, capsys):
    """device=1 (one device) vs device=0 (all 8) on the same seed — the
    reference's multi-GPU tests only check each device set against
    sklearn (test.py:256-305); this compares the two directly.

    Bitwise equality across device COUNTS is not achievable by design:
    the centroid sums are accumulated per shard and psum'd, so an 8-way
    mesh adds 8 partial sums where one device accumulates 8x more chunks
    sequentially — a different fp32 rounding order.  The asserted
    contract is therefore behavioral: the iteration trajectories may
    diverge only by ulp-flip knife-edge samples, so the iteration COUNT
    must match and the final assignments must agree on (nearly) every
    sample; the few legal divergences are knife-edge ties."""
    c1, a1 = kmeans_tpu(samples, 50, init="kmeans++", device=1, seed=3,
                        tolerance=0.01, yinyang_t=0, verbosity=1)
    it1 = iters_logged(capsys)
    c8, a8 = kmeans_tpu(samples, 50, init="kmeans++", device=0, seed=3,
                        tolerance=0.01, yinyang_t=0, verbosity=1)
    it8 = iters_logged(capsys)
    assert abs(it1 - it8) <= 1, (it1, it8)
    disagree = int(np.sum(a1 != a8))
    assert disagree <= 0.002 * len(samples), disagree
    # the centroids of identically-assigned clusters agree to fp32
    # accumulation noise
    match = np.isclose(c1, c8, rtol=1e-4, atol=1e-5).all(axis=1)
    assert match.sum() >= 48, match.sum()


def test_device_input_not_mutated(samples):
    """A device-resident input must come back bit-exact unless the caller
    opted into donation — the analog of the reference's check that the
    internal transpose round-trip restores the caller's GPU buffer
    (test.py:374-399; here there is no transpose, but donation and
    padding paths must never touch the original)."""
    import jax
    import jax.numpy as jnp

    x_dev = jax.device_put(jnp.asarray(samples))
    before = np.asarray(x_dev).copy()
    c, a = kmeans_tpu(x_dev, 50, seed=3, tolerance=0.01, yinyang_t=0.1)
    assert isinstance(c, jax.Array) and isinstance(a, jax.Array)
    assert np.array_equal(np.asarray(x_dev), before)


def test_donated_input_is_consumed():
    """donate=True hands the buffer to the library (the peak-HBM saver
    for near-chip-sized data): a pad-aligned, correctly-sharded input is
    reused in place and the caller's array is invalidated.  (Through the
    public API the same holds when no resharding/padding copy intervenes
    — i.e. exactly when donation can save memory at all.)"""
    import jax
    import jax.numpy as jnp

    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    topo = Topology(tuple(jax.devices()))
    rng = np.random.RandomState(3)
    x_dev = jax.device_put(jnp.asarray(rng.rand(16384, 8), jnp.float32),
                           topo.sharded(2))
    prepare(x_dev, 50, DistanceMetric.L2, topo, Logger(0), donate=True)
    with pytest.raises(RuntimeError):
        np.asarray(x_dev)


def test_verbosity2_plan_and_memory(samples, capsys):
    """Observability parity with the reference's verbosity-2 output: the
    per-device split plan (private.h:291-302) and per-device memory stats
    (kmcuda.cc:172-185) must print at verbosity 2; the allocation map
    (TRACE'd CUMALLOC registry, private.h:129-151) at verbosity 3."""
    from kmcuda_tpu import kmeans_tpu as km

    km(samples, 50, init="random", seed=5, tolerance=0.01, yinyang_t=0,
       verbosity=3, max_iterations=2)
    out = capsys.readouterr().out
    plan = [l for l in out.splitlines() if l.startswith("plan: ")]
    assert len(plan) >= 1 and "rows [0, " in plan[0]
    assert any(("MB in use" in l) or ("memory stats n/a" in l)
               for l in out.splitlines())
    allocs = [l for l in out.splitlines() if l.startswith("alloc ")]
    assert {a.split()[1] for a in allocs} >= {"x", "x_sq", "valid"}


def test_public_api_donation_consumed():
    """End-to-end donation through kmeans_tpu (not just prepare): a
    pad-aligned, mesh-sharded device input with donate_samples=True is
    consumed in place — exactly the case where donation saves peak HBM —
    and the returned assignments are still correct.  (A misaligned or
    misplaced input is staged first and only the staging copy is
    consumed; the caller's buffer survives, by design.)"""
    import jax
    import jax.numpy as jnp

    from kmcuda_tpu.parallel.mesh import Topology

    topo = Topology(tuple(jax.devices()))
    rng = np.random.RandomState(3)
    n = 2048 * topo.n  # == n_pad for this shape: no padding copy
    x_dev = jax.device_put(jnp.asarray(rng.rand(n, 8), jnp.float32),
                           topo.sharded(2))
    c, a = kmeans_tpu(x_dev, 50, init="random", seed=5, tolerance=0.01,
                      yinyang_t=0, donate_samples=True)
    assert a.shape == (n,)
    assert int(jnp.max(a)) < 50
    with pytest.raises(RuntimeError):
        np.asarray(x_dev)


def test_profile_window(samples, tmp_path, monkeypatch, capsys):
    """KMTPU_PROFILE=<dir> brackets the compute span with a jax.profiler
    trace — the runtime analog of the reference's PROFILE build flag
    (kmcuda.cc:12-14,478-480,502-504).  Unset, no trace dir is created."""
    import os

    from kmcuda_tpu import kmeans_tpu as km

    trace_dir = tmp_path / "trace"
    monkeypatch.setenv("KMTPU_PROFILE", str(trace_dir))
    km(samples, 50, init="random", seed=5, tolerance=0.01, yinyang_t=0,
       verbosity=1, max_iterations=2)
    out = capsys.readouterr().out
    assert "profiler trace written to" in out
    profiles = []
    for root, _dirs, files in os.walk(trace_dir):
        profiles += [f for f in files if f.endswith((".xplane.pb", ".json.gz",
                                                     ".trace.json.gz"))]
    assert profiles, "no profiler artifacts under %s" % trace_dir

    monkeypatch.delenv("KMTPU_PROFILE")
    km(samples, 50, init="random", seed=5, tolerance=0.01, yinyang_t=0,
       verbosity=1, max_iterations=1)
    assert "profiler trace" not in capsys.readouterr().out


def test_init_progress_lines_and_bitwise_segmentation(capsys):
    """The segmented init drivers (models/initialization._drive_segments)
    must (a) emit a verbosity-1 progress line per INIT_SEGMENT_CENTROIDS
    centroids — the analog of the reference's init progress bars
    (kmcuda.cc:286-290, 368-371) — and (b) produce BITWISE the same
    centroids as the single-dispatch fori_loop form (same carried key
    stream)."""
    import jax
    import jax.numpy as jnp

    from kmcuda_tpu import config
    from kmcuda_tpu.models import initialization as I
    from kmcuda_tpu.models.problem import prepare
    from kmcuda_tpu.ops.distance import DistanceMetric
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils.logging import Logger

    rng = np.random.RandomState(4)
    n, f, k = 4096, 16, 1024
    x = rng.rand(n, f).astype(np.float32)

    topo = Topology.from_device_mask(0, Logger(0))
    for method, label in ((I.InitMethod.PLUS_PLUS, "kmeans++"),
                          (I.InitMethod.AFKMC2, "afkmc2")):
        p = prepare(x, k, DistanceMetric.L2, topo, Logger(1))
        key = jax.random.key(9)
        cent_seg = np.asarray(
            I.init_centroids(p, method, key, afkmc2_m=8))
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines()
                 if l.startswith("%s: " % label)]
        # k=1024 at segment 256 -> lines for 257, 513, 769, 1024
        want = -(-(k - 1) // config.INIT_SEGMENT_CENTROIDS)
        assert len(lines) == want, out
        assert lines[-1].endswith("%d / %d centroids" % (k, k))

        # bitwise identity with the unsegmented single program
        if method == I.InitMethod.PLUS_PLUS:
            cent_whole = I._init_plus_plus(
                p.x, p.x_sq, p.valid, jnp.int32(p.n_valid), key, k=k,
                metric=p.metric)
        else:
            cent_whole = I._init_afkmc2(
                p.x, p.x_sq, p.valid, jnp.int32(p.n_valid), key, k=k,
                m=8, metric=p.metric)
        np.testing.assert_array_equal(cent_seg, np.asarray(cent_whole))
