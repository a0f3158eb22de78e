"""Lloyd k-means driver.

The TPU analog of ``kmeans_cuda_lloyd`` (reference src/kmeans.cu:934-1026):
a host convergence loop around one fused jitted step per iteration.  The
host sync per iteration (reading the reassignment counter) is the same
barrier the reference pays via ``cudaMemcpyFromSymbol`` in ``check_changed``
(kmeans.cu:697-717); everything else stays on device.

Logs ``iteration N: M reassignments`` exactly like check_changed
(kmeans.cu:706) — the machine-readable progress line the test suites parse.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from kmcuda_tpu import config
from kmcuda_tpu.ops import assign as A
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.parallel.mesh import AXIS


@functools.lru_cache(maxsize=64)
def _build_step(mesh, n_clusters, metric, chunk):
    """shard_map + jit the fused Lloyd step for one (mesh, k, metric, chunk).

    Cached so repeated kmeans_tpu calls with the same configuration reuse
    the compiled executable.
    """
    fn = functools.partial(
        A.lloyd_step, n_clusters=n_clusters, metric=metric, chunk=chunk,
        axis_name=AXIS)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(None, None)),
        out_specs=(P(None, None), P(AXIS), P(AXIS), P()))
    # donate prev_assign: it is replaced by the returned assignment.
    return jax.jit(mapped, donate_argnums=(3,))


def new_assignments(problem) -> jax.Array:
    """Fresh 'never assigned' vector (cluster id == k, the invalid marker —
    the id NaN samples keep forever, kmeans.cu:276-284)."""
    return problem.topo.put_sharded(
        jnp.full((problem.n_pad,), problem.k, jnp.uint32))


def run(problem, centroids, assignments, tolerance, max_iterations=None,
        iter_offset=0):
    """Iterate Lloyd until reassignments <= tolerance * n.

    Returns (centroids, assignments, best_scores, iterations, last_changed).
    ``centroids`` are the ones the returned assignments were computed
    against (the reference also breaks *before* re-adjusting,
    kmeans.cu:991-1013).
    """
    p = problem
    if max_iterations is None:
        max_iterations = config.DEFAULT_MAX_ITERATIONS
    step = _build_step(p.topo.mesh, p.k, p.metric, p.chunk)
    threshold = tolerance * p.n
    it = 0
    best = None
    while True:
        new_centroids, assignments, best, changed = step(
            p.x, p.x_sq, p.valid, assignments, centroids)
        it += 1
        changed = int(changed)
        p.logger.iteration(iter_offset + it, changed)
        if changed <= threshold or it >= max_iterations:
            return centroids, assignments, best, it, changed
        centroids = new_centroids


@functools.partial(jax.jit, static_argnames=("metric",))
def average_distance(best_scores, x_sq, valid, n_valid, *, metric):
    """Mean distance of valid samples to their centroid — the reference's
    kmeans_cuda_calc_average_distance (kmeans.cu:675-691, 1265-1300)."""
    d = D.finalize_distance(best_scores, x_sq, metric)
    return jnp.sum(jnp.where(valid, d, 0.0)) / n_valid
