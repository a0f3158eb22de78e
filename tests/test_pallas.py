"""Fused Pallas Lloyd kernel vs the XLA scan (interpreter mode on CPU;
the same kernel compiles through Mosaic on TPU, where it is the default
for bf16 storage)."""

import numpy as np
import pytest


@pytest.mark.parametrize("metric_name", ["L2", "cos"])
def test_fused_pass_matches_xla(metric_name):
    import jax.numpy as jnp

    from kmcuda_tpu.ops.assign import _assign_update_pass
    from kmcuda_tpu.ops.assign_pallas import fused_lloyd_pass
    from kmcuda_tpu.ops.distance import (DistanceMetric, metrics,
                                         normalize_centroids)

    metric = metrics[metric_name]
    rng = np.random.RandomState(0)
    n, f, k = 4096, 16, 50
    x = rng.rand(n, f).astype(np.float32)
    if metric == DistanceMetric.COSINE:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = jnp.asarray(x)
    xsq = (x * x).sum(1)
    valid = jnp.ones((n,), bool)
    prev = jnp.full((n,), k, jnp.uint32)
    c = x[:k].astype(jnp.float32)

    aid, best, sums, counts, changed = fused_lloyd_pass(
        x, valid, prev, c, n_clusters=k, metric=metric, tile=1024,
        interpret=True)
    nc, a2, b2, ch2 = _assign_update_pass(
        x, xsq, valid, prev, c, n_clusters=k, metric=metric, chunk=1024,
        axis_name=None)
    assert (np.asarray(aid) == np.asarray(a2)).all()
    assert np.allclose(np.asarray(best), np.asarray(b2), atol=1e-6)
    assert int(changed) == int(ch2)
    nc_p = normalize_centroids(sums, counts.astype(jnp.float32), metric)
    assert np.allclose(np.asarray(nc_p), np.asarray(nc), rtol=1e-5,
                       atol=1e-6, equal_nan=True)


def test_fused_pass_nan_and_invalid_rows():
    import jax.numpy as jnp

    from kmcuda_tpu.ops.assign import _assign_update_pass
    from kmcuda_tpu.ops.assign_pallas import fused_lloyd_pass
    from kmcuda_tpu.ops.distance import DistanceMetric

    rng = np.random.RandomState(1)
    n, f, k = 2048, 8, 20
    x_np = rng.rand(n, f).astype(np.float32)
    valid_np = np.ones(n, bool)
    valid_np[100:110] = False       # 'NaN rows' pre-zeroed by prepare()
    x_np[100:110] = 0
    x = jnp.asarray(x_np)
    valid = jnp.asarray(valid_np)
    prev = jnp.full((n,), k, jnp.uint32)
    c_np = x_np[:k].copy()
    c_np[3] = np.nan                # dead centroid must never win
    c = jnp.asarray(c_np)

    aid, *_ = fused_lloyd_pass(x, valid, prev, c, n_clusters=k,
                               metric=DistanceMetric.L2, tile=1024,
                               interpret=True)
    _nc, a2, *_ = _assign_update_pass(
        x, (x * x).sum(1), valid, prev, c, n_clusters=k,
        metric=DistanceMetric.L2, chunk=1024, axis_name=None)
    aid = np.asarray(aid)
    assert (aid == np.asarray(a2)).all()
    assert (aid[100:110] == k).all()
    assert not (aid == 3).any()


def test_assign_only_pass_matches_fused():
    """The assignment-only kernel (the adaptive loop's sparse arm) must
    produce bitwise the assignments/scores/changed of the fused kernel —
    that equality is what makes the dense/sparse arm choice a pure
    wall-time decision in ops.assign.lloyd_run_pallas."""
    import jax.numpy as jnp

    from kmcuda_tpu.ops.assign_pallas import (assign_only_pass,
                                              fused_lloyd_pass)
    from kmcuda_tpu.ops.distance import DistanceMetric

    rng = np.random.RandomState(7)
    n, f, k = 4096, 16, 50
    x = jnp.asarray(rng.rand(n, f).astype(np.float32))
    valid = jnp.ones((n,), bool)
    prev = jnp.full((n,), k, jnp.uint32)
    c = x[:k].astype(jnp.float32)

    aid_f, best_f, _sums, _counts, ch_f = fused_lloyd_pass(
        x, valid, prev, c, n_clusters=k, metric=DistanceMetric.L2,
        tile=1024, interpret=True)
    aid_o, best_o, ch_o = assign_only_pass(
        x, valid, prev, c, n_clusters=k, metric=DistanceMetric.L2,
        tile=1024, interpret=True)
    assert (np.asarray(aid_f) == np.asarray(aid_o)).all()
    np.testing.assert_array_equal(np.asarray(best_f), np.asarray(best_o))
    assert int(ch_f) == int(ch_o)
