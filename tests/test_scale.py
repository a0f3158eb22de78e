"""Scale / stress coverage — the analog of the reference's
``test_kmeanspp_lloyd_uint32_overflow`` (test.py:307-326), which clusters
167,772,160 x 8 fp32 samples (5.4 GB: element count and byte count both
exceed UINT32) to prove no 32-bit overflow hides in the indexing and
size math.

The reference builds the 5.4 GB array host-side and ships it over PCIe;
here the host link is a slow tunnel, so the data is generated ON DEVICE
(jax.random) and only the scalar summaries come back.  The full-size run
needs a real accelerator with >6 GB free — it is gated behind
KMTPU_TEST_TPU=1 (or KMTPU_SCALE=1 to force it on CPU with >12 GB RAM);
CI runs the shape-math unit check below instead.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmcuda_tpu import kmeans_tpu


REF_N, REF_F = 167_772_160, 8  # reference test.py:310


@pytest.mark.skipif(
    os.environ.get("KMTPU_TEST_TPU") != "1"
    and os.environ.get("KMTPU_SCALE") != "1",
    reason="5.4 GB fixture: needs the attached TPU (KMTPU_TEST_TPU=1) "
           "or KMTPU_SCALE=1",
)
def test_uint32_overflow_lloyd():
    """167,772,160 x 8 @ k=50, kmeans++, tolerance=0.142 — the reference's
    exact configuration.  Passing means: >UINT32 byte counts flow through
    padding/sharding/segment math unclipped, assignments stay in range,
    and centroids come back finite."""
    n, f, k = REF_N, REF_F, 50
    # 40 well-separated blobs + uniform background, built on device in
    # slabs so peak temp memory stays ~2x the output buffer.
    key = jax.random.key(3)
    kc, kw, ke = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (40, f), jnp.float32) * 8.0

    @jax.jit
    def make(key, which_key):
        which = jax.random.randint(which_key, (n // 8,), 0, 40)
        return centers[which] + 0.3 * jax.random.normal(
            key, (n // 8, f), jnp.float32)

    slabs = []
    for i in range(8):
        slabs.append(make(jax.random.fold_in(ke, i),
                          jax.random.fold_in(kw, i)))
    x = jnp.concatenate(slabs, axis=0)
    del slabs
    x = jax.block_until_ready(x)
    assert x.nbytes > 2**32  # the point of the test

    centroids, assignments = kmeans_tpu(
        x, k, init="kmeans++", seed=3, tolerance=0.142, yinyang_t=0,
        verbosity=1, donate_samples=True)

    assert centroids.shape == (k, f)
    assert assignments.shape == (n,)
    a = np.asarray(assignments[:: n // 65536])  # sparse readback: slow link
    assert a.min() >= 0 and a.max() < k
    assert np.isfinite(np.asarray(centroids)).all()


def test_size_math_beyond_uint32():
    """Hermetic CI stand-in: the padding planner and the validation layer
    must hand the reference's big shape through unclipped (the overflow
    its 5.4 GB fixture would catch lives in this math)."""
    from kmcuda_tpu.parallel.mesh import Topology
    from kmcuda_tpu.utils import validation

    topo = Topology(jax.devices())
    n_pad = topo.pad_to(REF_N, chunk=2048)
    assert n_pad >= REF_N
    assert n_pad % topo.n == 0
    assert n_pad * REF_F * 4 > 2**32          # bytes, as the planner sees them
    assert n_pad - REF_N <= max(0.02 * REF_N, topo.n * 8 * 2048)

    class Shape:
        shape = (REF_N, REF_F)
        dtype = np.float32

    n, features, clusters = validation.check_kmeans_args(
        Shape(), clusters=50, tolerance=0.142, yinyang_t=0.0,
        seed=3, device=0)
    assert (n, features, clusters) == (REF_N, REF_F, 50)


def test_knn_16k_clusters_exact():
    """k-NN over k=16,384 clusters (past KNN_TOUR_MAX_K) must compile and
    return exact results on the CPU mesh (VERDICT r2 #5).  This exercises
    the large-k path end to end: the projection-sort relabeling
    (models/knn._proj_relabel — the greedy tour's k sequential argmins are
    gated off above KNN_TOUR_MAX_K) and the on-the-fly per-chunk CD rows
    (ops/knn_prune.search pass 1) that replaced the materialized
    (k+1, k) matrix — at this k that matrix would be 1 GB replicated."""
    from sklearn.neighbors import NearestNeighbors

    from kmcuda_tpu import config, knn_tpu

    assert 16384 > config.KNN_TOUR_MAX_K  # the point of the test
    k, f, kn = 16384, 8, 4
    rng = np.random.RandomState(7)
    # ~2 members per cluster on average: centroid grid + jitter
    cents = rng.rand(k, f).astype(np.float32) * 100.0
    which = rng.randint(0, k, size=2 * k)
    x = (cents[which] + 0.05 * rng.randn(2 * k, f)).astype(np.float32)
    # true nearest centroid (not `which`): exactness must not depend on
    # assignment quality, only on validity
    d2 = (
        (x ** 2).sum(1)[:, None] - 2.0 * x @ cents.T
        + (cents ** 2).sum(1)[None, :])
    a = np.argmin(d2, axis=1).astype(np.uint32)
    nb = np.asarray(knn_tpu(kn, x, cents, a, verbosity=0))
    ref = NearestNeighbors(n_neighbors=kn + 1).fit(x)
    _, ref_i = ref.kneighbors(x)
    # compare by distance profile (ties among equidistant points may
    # legally order differently), exact to fp32 distance
    dref = np.linalg.norm(x[:, None, :] - x[ref_i[:, 1:]], axis=2)
    dgot = np.linalg.norm(x[:, None, :] - x[nb], axis=2)
    assert nb.min() >= 0 and nb.max() < len(x)
    # no self-neighbors
    assert (nb != np.arange(len(x))[:, None]).all()
    np.testing.assert_allclose(np.sort(dgot, 1), np.sort(dref, 1),
                               rtol=1e-5, atol=1e-5)


def test_large_k_compiles_and_clusters():
    """Large cluster counts must stay compile-bounded (no unrolled
    per-cluster work — the reference handles k up to 2^32-2 with O(1)
    kernel code; an earlier top-k design here unrolled O(k) HLO and
    could not compile at this size).  k=2048 on the CPU mesh covers the
    k-means++ init chain, the Lloyd panel, and the Yinyang grouping at
    a size past every Pallas/lane boundary."""
    rng = np.random.RandomState(0)
    x = rng.rand(8192, 32).astype(np.float32)
    c, a = kmeans_tpu(x, 2048, init="k-means++", seed=2, tolerance=0.01,
                      yinyang_t=0.1, max_iterations=3)
    assert c.shape == (2048, 32)
    assert int(np.asarray(a).max()) < 2048
    # most clusters get members at n/k = 4
    filled = len(np.unique(np.asarray(a)))
    assert filled > 1024
