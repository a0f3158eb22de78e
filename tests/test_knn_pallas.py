"""The fused Pallas k-nn walk must return bit-identical results to the
XLA walk (ops/knn_prune.search pass 2) — same candidates, same pruning
metric.  Exercised in interpreter mode on a single device (the kernel
engages compiled on TPU; under the CPU shard_map interpret mode trips
vma checks, same as the Lloyd kernel, ops/assign.py:84-87)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmcuda_tpu import config, kmeans_tpu
from kmcuda_tpu.models import knn as MK
from kmcuda_tpu.models.problem import prepare
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.ops import knn_prune as KP
from kmcuda_tpu.parallel.mesh import Topology
from kmcuda_tpu.utils.logging import Logger


def _search_inputs(x, n_clusters, k_neighbors, metric=D.DistanceMetric.L2):
    """Build KP.search inputs from the PRODUCTION layout plan
    (models/knn.plan_pruned) on ONE device, so the parity lock always
    exercises exactly the layout run() produces — without shard_map."""
    topo = Topology((jax.devices()[0],))
    p = prepare(x, n_clusters, metric, topo, Logger(0))
    cents, assigns = kmeans_tpu(x, n_clusters, seed=7, tolerance=0.01,
                                yinyang_t=0)
    a_pad = jnp.full((p.n_pad,), np.uint32(n_clusters))
    a_pad = a_pad.at[:len(x)].set(jnp.asarray(assigns, jnp.uint32))

    plan = MK.plan_pruned(p, jnp.asarray(cents, jnp.float32), a_pad)
    kw = dict(k_neighbors=k_neighbors, n_clusters=p.k, metric=metric,
              chunk=plan.q_chunk, tile_m=plan.tile_m, group=plan.group,
              n_batch_chunks=plan.m_total // plan.q_chunk, axis_name=None)
    sq = D.row_sq_norms(plan.xm)
    orig_pos = jnp.where(
        plan.m_spos >= 0,
        plan.sorder[jnp.maximum(plan.m_spos, 0)], jnp.int32(-1))
    args = (plan.xm, sq, plan.q_assign,
            plan.xm, sq, plan.m_spos, orig_pos, plan.c_rank, plan.r_ext,
            plan.inc_c, plan.inc_t, plan.tile_nvalid, plan.xm,
            jnp.int32(0))
    return args, kw, plan.group


@pytest.mark.parametrize("with_nan,f", [
    (False, 128), (True, 128),
    # f=64 exercises the feature-lane padding branch (f % 128 != 0),
    # locked in interpreter mode per ADVICE r3 (verified bit-identical
    # compiled on chip in round 3, but CI never covered it)
    (False, 64),
])
def test_pallas_walk_matches_xla_walk(with_nan, f):
    rng = np.random.RandomState(3)
    kc, n = 16, 16384
    centers = rng.rand(kc, f).astype(np.float32) * 8.0
    which = rng.randint(0, kc, n)
    x = centers[which] + 0.3 * rng.randn(n, f).astype(np.float32)
    if with_nan:
        x[5] = np.nan
        x[999, 3] = np.inf
    args, kw, group = _search_inputs(x, kc, k_neighbors=9)
    assert group > 1  # the grouped-tail / tie-break paths must be live

    fx = jax.jit(functools.partial(KP.search, **kw, use_pallas=False))
    fp = jax.jit(functools.partial(KP.search, **kw, use_pallas=True,
                                   pallas_interpret=True))
    nbr_x, dist_x, cnt_x = jax.device_get(fx(*args))
    nbr_p, dist_p, cnt_p = jax.device_get(fp(*args))
    np.testing.assert_array_equal(nbr_p, nbr_x)
    np.testing.assert_array_equal(dist_p, dist_x)
    assert float(cnt_p) == pytest.approx(float(cnt_x), rel=1e-6)


def test_pallas_walk_matches_xla_walk_bf16():
    """bf16 storage engages the absolute dot-form error envelope
    (eps_env) in BOTH walks; the kernel must inflate identically or the
    two paths prune different tiles (ADVICE r2)."""
    rng = np.random.RandomState(5)
    kc, f, n = 16, 128, 16384
    centers = rng.rand(kc, f).astype(np.float32) * 8.0
    which = rng.randint(0, kc, n)
    x = centers[which] + 0.3 * rng.randn(n, f).astype(np.float32)
    x16 = jnp.asarray(x, jnp.bfloat16)
    args, kw, _group = _search_inputs(x16, kc, k_neighbors=9)

    fx = jax.jit(functools.partial(KP.search, **kw, use_pallas=False))
    fp = jax.jit(functools.partial(KP.search, **kw, use_pallas=True,
                                   pallas_interpret=True))
    nbr_x, dist_x, cnt_x = jax.device_get(fx(*args))
    nbr_p, dist_p, cnt_p = jax.device_get(fp(*args))
    np.testing.assert_array_equal(nbr_p, nbr_x)
    np.testing.assert_array_equal(dist_p, dist_x)
    assert float(cnt_p) == pytest.approx(float(cnt_x), rel=1e-6)


def test_pallas_walk_wide_features_and_kk_exact():
    """Round-4 envelope widening: f > MAX_PALLAS_F_SLAB streams member
    slabs with partial-dot accumulation, and kk > 128 spans two candidate
    lane tiles.  Per-slab partial sums legally round differently than the
    XLA walk's single contraction, so bit-identity of the intermediate
    walk is NOT the contract here — exactness is: both walks must return
    the true top-k (fp64-verified profile), and their final (rescored)
    outputs must agree wherever the fp64 profile has no tie."""
    from kmcuda_tpu.ops import knn_pallas as KNP

    rng = np.random.RandomState(7)
    kc, f, n, kn = 8, 640, 4096, 90   # kk = 90 + 45 = 135 > 128
    centers = rng.rand(kc, f).astype(np.float32) * 6.0
    which = rng.randint(0, kc, n)
    x = centers[which] + 0.4 * rng.randn(n, f).astype(np.float32)
    args, kw, _group = _search_inputs(x, kc, k_neighbors=kn)
    kk = KP.candidate_kk(kn, n)
    assert kk > 128 and f > KNP.MAX_PALLAS_F_SLAB
    assert KNP.supported(kk, f, 32, 128, 128, 2)

    fx = jax.jit(functools.partial(KP.search, **kw, use_pallas=False))
    fp = jax.jit(functools.partial(KP.search, **kw, use_pallas=True,
                                   pallas_interpret=True))
    nbr_x, dist_x, _c = jax.device_get(fx(*args))
    nbr_p, dist_p, _c = jax.device_get(fp(*args))

    # fp64 ground truth over the packed layout (neighbor ids are original
    # sample ids after the in-rescore relabel; distances are id-agnostic)
    xm = np.asarray(jax.device_get(args[0])).astype(np.float64)
    spos = np.asarray(jax.device_get(args[5]))
    valid = spos >= 0
    xv = xm[valid]
    import scipy.spatial.distance as ssd
    # memory-bounded exact distances in chunks
    nv = len(xv)
    for got_n, got_d in ((nbr_x, dist_x), (nbr_p, dist_p)):
        gn = got_n[valid]
        gd = got_d[valid]
        for i0 in range(0, nv, 1024):
            sl = slice(i0, min(i0 + 1024, nv))
            dd = ssd.cdist(xv[sl], xv)
            np.fill_diagonal(dd[:, i0:], np.inf)
            prof = np.sort(dd, axis=1)[:, :kn]
            np.testing.assert_allclose(
                np.sort(gd[sl], axis=1), prof, rtol=1e-5, atol=1e-5)
    # the two walks agree exactly wherever fp64 shows no tie at the
    # boundary (ties may legally swap which partner is returned)
    same = nbr_x == nbr_p
    disagree_rows = np.where(~same.all(axis=1))[0]
    for r in disagree_rows:
        dx = np.sort(dist_x[r])
        dp = np.sort(dist_p[r])
        np.testing.assert_allclose(dx, dp, rtol=1e-6, atol=1e-7)


def test_pallas_walk_matches_xla_walk_cosine():
    rng = np.random.RandomState(11)
    kc, f, n = 16, 128, 16384
    centers = rng.rand(kc, f).astype(np.float32) + 0.05
    which = rng.randint(0, kc, n)
    x = centers[which] + 0.1 * rng.rand(n, f).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    args, kw, _group = _search_inputs(x, kc, k_neighbors=7,
                                      metric=D.DistanceMetric.COSINE)
    fx = jax.jit(functools.partial(KP.search, **kw, use_pallas=False))
    fp = jax.jit(functools.partial(KP.search, **kw, use_pallas=True,
                                   pallas_interpret=True))
    nbr_x, dist_x, cnt_x = jax.device_get(fx(*args))
    nbr_p, dist_p, cnt_p = jax.device_get(fp(*args))
    np.testing.assert_array_equal(nbr_p, nbr_x)
    np.testing.assert_array_equal(dist_p, dist_x)
    assert float(cnt_p) == pytest.approx(float(cnt_x), rel=1e-6)
