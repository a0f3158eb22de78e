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
    args = (plan.xm, D.row_sq_norms(plan.xm), plan.q_assign,
            plan.xm, plan.m_spos, plan.c_rank, plan.r_ext,
            plan.inc_c, plan.inc_t, plan.tile_nvalid, jnp.int32(0))
    return args, kw, plan.group


@pytest.mark.parametrize("with_nan", [False, True])
def test_pallas_walk_matches_xla_walk(with_nan):
    rng = np.random.RandomState(3)
    kc, f, n = 16, 128, 16384
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
