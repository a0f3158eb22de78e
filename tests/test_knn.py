"""K-nn tests: element-wise parity with sklearn NearestNeighbors, with a
small tie budget like the reference (test.py:598-603)."""

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

from kmcuda_tpu import kmeans_tpu, knn_tpu


@pytest.fixture(scope="module")
def samples():
    rng = np.random.RandomState(0)
    arr = np.empty((13000, 2), dtype=np.float32)
    arr[:2000] = rng.rand(2000, 2) + [0, 0.5]
    arr[2000:4000] = rng.rand(2000, 2) + [0, 1.5]
    arr[4000:6000] = rng.rand(2000, 2) - [0, 0.5]
    arr[6000:8000] = rng.rand(2000, 2) + [0.5, 0]
    arr[8000:10000] = rng.rand(2000, 2) - [0.5, 0]
    arr[10000:] = rng.rand(3000, 2) * 5 - [2, 2]
    return arr


@pytest.fixture(scope="module")
def clustered(samples):
    return kmeans_tpu(samples, 50, seed=777, tolerance=0.01, yinyang_t=0)


def _expected(samples, k):
    return NearestNeighbors(n_neighbors=k).fit(samples).kneighbors()[1]


def test_small_k(samples, clustered):
    nb = knn_tpu(10, samples, *clustered, device=1)
    assert nb.shape == (13000, 10)
    assert nb.dtype == np.uint32
    bn = _expected(samples, 10)
    assert (nb != bn).sum() <= 4  # tie budget, reference allows dmax

def test_larger_k(samples, clustered):
    nb = knn_tpu(50, samples, *clustered, device=1)
    bn = _expected(samples, 50)
    assert (nb != bn).sum() <= 8


def test_multi_device(samples, clustered):
    nb = knn_tpu(10, samples, *clustered, device=0)
    bn = _expected(samples, 10)
    assert (nb != bn).sum() <= 4


def test_no_self(samples, clustered):
    nb = knn_tpu(10, samples, *clustered, device=1)
    own = np.arange(len(samples))[:, None]
    assert not (nb == own).any()


def test_bad_k(samples, clustered):
    with pytest.raises(ValueError):
        knn_tpu(0, samples, *clustered)
    with pytest.raises(TypeError):
        knn_tpu("ten", samples, *clustered)


def test_pruning_reported(samples, clustered, capsys):
    """The pruned path must report the examined fraction (the reference's
    'calculated %f of all the distances' line, knn.cu:521-530) and it must
    actually prune on clustered data."""
    knn_tpu(10, samples, *clustered, device=1, verbosity=1)
    out = capsys.readouterr().out
    fracs = [float(line.split()[1]) for line in out.splitlines()
             if line.startswith("calculated ")]
    assert fracs and 0.0 < fracs[-1] < 0.9, out


def test_pruning_fraction_golden(samples, clustered, capsys):
    """Seed-locked pruning-fraction golden on the 13K fixture — the
    regression analog of the reference's showcase 0.276552
    (README.md:313).  Pinned from the first CPU-8 run of this
    configuration; a silent pruning regression (bound loosening, visit
    -order damage, tour relabeling breakage) shows up here as a failed
    golden rather than a slow benchmark.  The loose band absorbs
    XLA-version tie flips in the k-means that feeds the structure."""
    import os

    if os.environ.get("KMTPU_TEST_TPU") == "1":
        pytest.skip("golden pinned for the CPU-8 mesh")
    knn_tpu(10, samples, *clustered, verbosity=1)
    out = capsys.readouterr().out
    frac = [float(line.split()[1]) for line in out.splitlines()
            if line.startswith("calculated ")][-1]
    assert frac == pytest.approx(0.286, abs=0.03)


def test_large_k_compiles_and_is_exact(samples, clustered):
    """k=128 neighbors: the former unrolled merge could not compile here;
    the log-depth merge must, and stay exact up to ties."""
    nb = knn_tpu(128, samples, *clustered, device=1)
    bn = _expected(samples, 128)
    mism = (np.asarray(nb) != bn)
    # mismatches must be genuine distance ties, not dropped neighbors
    assert mism.sum() < 50
    if mism.any():
        rows, cols = np.nonzero(mism)
        for r, c in zip(rows[:20], cols[:20]):
            d_ours = np.linalg.norm(samples[r] - samples[nb[r, c]])
            d_ref = np.linalg.norm(samples[r] - samples[bn[r, c]])
            assert d_ours == pytest.approx(d_ref, rel=1e-5)


def test_k_exceeds_cluster_size():
    """kn larger than every cluster: each query MUST pull neighbors from
    several clusters, so the buffer sizing, the walk stop (tau stays inf
    until kn candidates exist), and the cross-cluster merge are all on
    the exact path — the regime the reference's gmem-heap variant covers
    (knn.cu:246-318)."""
    rng = np.random.RandomState(1)
    x = np.concatenate([rng.rand(200, 2) + [3 * i, 0] for i in range(30)]
                       ).astype(np.float32)
    c, a = kmeans_tpu(x, 30, seed=2, tolerance=0.01, yinyang_t=0)
    nb = np.asarray(knn_tpu(256, x, c, a))
    bn = _expected(x, 256)
    mism = nb != bn
    assert mism.sum() < 50
    rows, cols = np.nonzero(mism)
    for r, q in zip(rows[:30], cols[:30]):  # mismatches must be ties
        d_ours = np.linalg.norm(x[r] - x[nb[r, q]])
        d_ref = np.linalg.norm(x[r] - x[bn[r, q]])
        assert d_ours == pytest.approx(d_ref, rel=1e-5)


def test_cosine_knn(samples):
    rng = np.random.RandomState(3)
    x = rng.randn(6000, 8).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c, a = kmeans_tpu(x, 32, seed=7, metric="cos", tolerance=0.01,
                      yinyang_t=0, device=1)
    nb = knn_tpu(5, x, c, a, metric="cos", device=1)
    sims = x @ x.T
    np.fill_diagonal(sims, -np.inf)
    exact = np.argsort(-sims, axis=1, kind="stable")[:, :5]
    assert (nb != exact).mean() < 0.01


def test_bf16_knn(samples):
    """bf16 storage end-to-end — the analog of the reference's fp16 knn
    test (test.py:643-651: fp16 kmeans + knn vs sklearn, < 500
    mismatches on the 13K fixture).  The baseline is brute force over
    the same bf16-rounded values, so every mismatch beyond the budget is
    a dropped neighbor, not a storage-rounding artifact."""
    import jax.numpy as jnp

    xb = jnp.asarray(samples).astype(jnp.bfloat16)
    c, a = kmeans_tpu(xb, 50, seed=777, tolerance=0.01, yinyang_t=0)
    nb = np.asarray(knn_tpu(10, xb, c, a))
    x32 = np.asarray(xb.astype(jnp.float32))
    bn = _expected(x32, 10)
    assert nb.dtype == np.uint32
    # bf16 quantizes this 2D fixture onto a coarse grid, creating far
    # more exact distance ties than fp16 does (the reference's fp16
    # budget is 500 index mismatches) — so assert on the sorted
    # distance profile instead: same kth distances == no neighbor was
    # dropped; tie permutations are free
    rows = np.arange(len(x32))[:, None]
    d_ours = np.linalg.norm(x32[rows] - x32[nb], axis=2)
    d_ref = np.linalg.norm(x32[rows] - x32[bn], axis=2)
    np.testing.assert_allclose(np.sort(d_ours, 1), np.sort(d_ref, 1),
                               rtol=1e-3, atol=1e-5)


def test_query_batching_invariant(samples, clustered):
    """The host-level dispatch batching (config.KNN_QUERY_BATCH) must not
    change results — only how many device programs the search is split
    into."""
    from kmcuda_tpu import config

    ref = knn_tpu(7, samples, *clustered)
    old = config.KNN_QUERY_BATCH
    config.KNN_QUERY_BATCH = 1024   # forces many small batches
    try:
        nb = knn_tpu(7, samples, *clustered)
    finally:
        config.KNN_QUERY_BATCH = old
    assert np.array_equal(np.asarray(ref), np.asarray(nb))


def test_medium_scale_recall():
    """Mid-scale regression (VERDICT r1): 50K x 32 blobs, k=16 over 128
    clusters — between the 13K toy fixture and the 1M bench config.  The
    exactness contract must hold via recall against brute force on a
    query subsample (full sklearn parity at this n is too slow for CI).
    """
    rng = np.random.RandomState(5)
    n, f, kc, kn, nq = 50_000, 32, 128, 16, 512
    centers = rng.rand(kc, f).astype(np.float32) * 6.0
    which = rng.randint(0, kc, n)
    x = centers[which] + 0.4 * rng.randn(n, f).astype(np.float32)
    c, a = kmeans_tpu(x, kc, seed=5, tolerance=0.01, yinyang_t=0)
    nb = np.asarray(knn_tpu(kn, x, c, a))
    assert nb.shape == (n, kn) and nb.dtype == np.uint32

    qi = rng.choice(n, nq, replace=False)
    # chunked brute force: the one-shot (nq, n, f) broadcast is ~3 GB and
    # can OOM the CI runner
    exact = np.empty((nq, kn), np.int64)
    for s in range(0, nq, 64):
        qb = qi[s:s + 64]
        d = np.linalg.norm(x[qb, None, :] - x[None, :, :], axis=2)
        d[np.arange(len(qb)), qb] = np.inf
        exact[s:s + 64] = np.argsort(d, axis=1, kind="stable")[:, :kn]
    recall = np.mean([len(set(exact[i]) & set(nb[qi[i]])) / kn
                      for i in range(nq)])
    assert recall >= 0.999  # exact up to distance ties


def test_nan_rows_sentinel(samples, clustered):
    """Rows with non-finite features come back as the 0xFFFFFFFF sentinel
    (k-means assigned them cluster id == n_clusters and they are excluded
    from the member layout), never as a real-looking index."""
    x = samples.copy()
    x[7] = np.nan
    x[4242, 0] = np.inf
    c, a = kmeans_tpu(x, 50, seed=777, tolerance=0.01, yinyang_t=0)
    nb = knn_tpu(5, x, c, a)
    sentinel = np.uint32(0xFFFFFFFF)
    assert (nb[7] == sentinel).all() and (nb[4242] == sentinel).all()
    valid = np.ones(len(x), bool)
    valid[[7, 4242]] = False
    assert (nb[valid] != sentinel).all()
    # valid rows never report an invalid row as a neighbor
    assert not np.isin(nb[valid], [7, 4242]).any()


def test_duplicate_ties_grouped_walk(monkeypatch):
    """Exact lowest-id tie-break under a grouped tile walk (group > 1):
    duplicate-heavy data puts > kk equal-distance candidates in one walk
    step spanning several tiles, where a whole-group top_k would keep
    lower-COLUMN (not lower-id) duplicates.  Every returned neighbor list
    must match brute force with (distance, id)-lexicographic order."""
    from kmcuda_tpu import config

    # tiny tiles -> many tiles per cluster, grouped 4 per walk step
    monkeypatch.setattr(config, "KNN_TILE_M", 64)
    monkeypatch.setattr(config, "KNN_TILE_GROUP_ROWS", 256)
    rng = np.random.RandomState(9)
    base = rng.rand(40, 3).astype(np.float32) * 4.0
    # 50 exact copies of each of 40 points: any neighbor set is all ties
    x = np.repeat(base, 50, axis=0)
    order = rng.permutation(len(x))
    x = x[order]
    c, a = kmeans_tpu(x, 8, seed=3, tolerance=0.01, yinyang_t=0)
    kn = 12
    nb = np.asarray(knn_tpu(kn, x, c, a)).astype(np.int64)

    d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=2)
    np.fill_diagonal(d, np.inf)
    # lexicographic (distance, id): stable argsort over ids sorted by d
    exact = np.argsort(d, axis=1, kind="stable")[:, :kn]
    assert np.array_equal(nb, exact)
