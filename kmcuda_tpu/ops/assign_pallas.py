"""Pallas fused Lloyd pass: the whole iteration as one Mosaic kernel.

The XLA scan version (ops.assign._assign_update_pass) materializes each
(chunk, K) score block in HBM between the distance matmul and the argmin /
one-hot update.  This kernel keeps the block in VMEM: per sample tile it

  1. computes scores on the MXU (``|c|^2 - 2 <x, c>`` form, fp32 accum),
  2. reduces min + lowest-index argmin across lanes (the tie-break that
     keeps Lloyd == Yinyang bitwise, see ops.distance.argmin_lowest_index),
  3. accumulates the one-hot centroid segment-sum and counts into
     grid-persistent VMEM accumulators,
  4. bumps the reassignment counter in SMEM.

This is the TPU-native analog of the reference's fused
``kmeans_assign_lloyd`` + ``kmeans_adjust`` pair (kmeans.cu:215-429), with
the centroid tile resident in VMEM playing the role of the ``cstep``
shared-memory staging (kmeans.cu:243-258).

Constraints: the full (F, Kp) centroid panel and one (TS, Kp) score block
must fit VMEM, so this path engages when K and F are moderate
(K <= 4096, F <= 512 by default); larger shapes fall back to the XLA scan.
Non-TPU backends run the kernel in interpreter mode (tests on the CPU
mesh).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D
#: engage the Pallas kernel only below these shape bounds (VMEM budget)
MAX_PALLAS_K = 4096
MAX_PALLAS_F = 512


def supported(n_clusters: int, features: int) -> bool:
    return (-(-n_clusters // config.LANE) * config.LANE <= MAX_PALLAS_K
            and features <= MAX_PALLAS_F)


def _panel(centroids, storage_dtype, metric):
    """Sanitized score panel: (ct_panel (F, Kp) storage dtype, bias
    (1, Kp) fp32, orig_ids (Kp,) int32).

    Dead (non-finite) centroid rows become zero rows with a PAD_PENALTY
    bias, so every kernel score is finite BY CONSTRUCTION and the kernel
    needs no per-tile ``isfinite`` sanitize pass — one of the handful of
    full (TS, Kp) VPU passes the fused kernel makes per sample tile
    (VERDICT r5: the pass count, not the MXU, bounds the bf16 MFU).
    Bitwise: a dead column's score was ``where(isfinite(NaN), ., PAD)``
    = PAD_PENALTY; now it is ``dot(x, 0) + (0 + PAD_PENALTY)`` — the
    same fp32 value, for every sample.  Samples themselves are finite on
    every driver path (prepare() zeroes invalid rows; models/problem.py),
    which is what makes panel-side sanitization sufficient."""
    k, f = centroids.shape
    kp = -(-k // config.LANE) * config.LANE
    cf = centroids.astype(jnp.float32)
    finite = jnp.isfinite(cf)
    dead = ~jnp.all(finite, axis=1)                         # (k,)
    cf = jnp.where(finite, cf, 0.0)
    c = jnp.zeros((kp, f), jnp.float32).at[:k].set(cf)
    c_sq = D.row_sq_norms(c)
    ids = lax.broadcasted_iota(jnp.int32, (kp, 1), 0)[:, 0]
    penalty = jnp.where(ids < k, 0.0, config.PAD_PENALTY)
    penalty = penalty.at[:k].add(
        jnp.where(dead, config.PAD_PENALTY, 0.0))
    scale = -2.0 if metric == D.DistanceMetric.L2 else -1.0
    ct_panel = (c.T * scale).astype(storage_dtype)
    if metric == D.DistanceMetric.L2:
        bias = (c_sq + penalty)[None, :]
    else:
        bias = penalty[None, :]
    return ct_panel, bias, ids


def _kernel(x_ref, ct_ref, csqpen_ref, ids_ref, valid_ref, prev_ref,
            aid_ref, best_ref, sums_ref, counts_ref, changed_ref, *,
            n_clusters: int):
    i = pl.program_id(0)
    k = n_clusters

    s = jnp.dot(x_ref[:], ct_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                if x_ref.dtype == jnp.float32 else
                jax.lax.Precision.DEFAULT)
    # csq + pad/dead penalty; scores are finite by construction (panel
    # sanitized by _panel, samples pre-zeroed by prepare) — no isfinite
    # pass needed here
    s = s + csqpen_ref[:]                 # (1, Kp)

    best = jnp.min(s, axis=1)             # (TS,)
    ids = ids_ref[:]                       # (1, Kp) int32 original ids
    aid = jnp.min(jnp.where(s <= best[:, None], ids, k), axis=1)
    valid_v = valid_ref[:].reshape(-1)
    aid = jnp.where(valid_v != 0, aid, k).astype(jnp.int32)

    aid_ref[:] = aid.astype(jnp.uint32).reshape(aid_ref.shape)
    best_ref[:] = best.reshape(best_ref.shape)

    onehot = aid[:, None] == ids           # (TS, Kp) — pad cols never hit


    @pl.when(i == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        changed_ref[0, 0] = jnp.int32(0)

    # contract over the sample axis directly (no materialized transpose)
    sums_ref[:] += jax.lax.dot_general(
        onehot.astype(x_ref.dtype), x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
        if x_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    counts_ref[:] += jnp.sum(onehot, axis=0, dtype=jnp.int32)[None, :]
    changed_ref[0, 0] += jnp.sum(
        aid.astype(jnp.uint32) != prev_ref[:].reshape(-1),
        dtype=jnp.int32)


def _kernel_assign_only(x_ref, ct_ref, csqpen_ref, ids_ref, valid_ref,
                        prev_ref, aid_ref, best_ref, changed_ref, *,
                        n_clusters: int):
    """Score + argmin + reassignment count, NO centroid update — the
    sparse-arm companion of :func:`_kernel`.  The score matmul and the
    argmin sequence are the same ops in the same order as the fused
    kernel, so assignments are bitwise identical between the two; the
    caller pairs this with the compacted O(moved) delta update
    (ops.compact.delta_compacted), skipping the one-hot update matmul —
    half the MXU work of a dense iteration in the low-churn tail."""
    i = pl.program_id(0)
    k = n_clusters

    s = jnp.dot(x_ref[:], ct_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                if x_ref.dtype == jnp.float32 else
                jax.lax.Precision.DEFAULT)
    s = s + csqpen_ref[:]   # finite by construction (see _kernel)

    best = jnp.min(s, axis=1)
    ids = ids_ref[:]
    aid = jnp.min(jnp.where(s <= best[:, None], ids, k), axis=1)
    valid_v = valid_ref[:].reshape(-1)
    aid = jnp.where(valid_v != 0, aid, k).astype(jnp.int32)

    aid_ref[:] = aid.astype(jnp.uint32).reshape(aid_ref.shape)
    best_ref[:] = best.reshape(best_ref.shape)

    @pl.when(i == 0)
    def _init():
        changed_ref[0, 0] = jnp.int32(0)

    changed_ref[0, 0] += jnp.sum(
        aid.astype(jnp.uint32) != prev_ref[:].reshape(-1),
        dtype=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "tile", "interpret",
                     "axis_name"))
def assign_only_pass(x, valid, prev_assign, centroids, *, n_clusters: int,
                     metric: D.DistanceMetric, tile: int, interpret: bool,
                     axis_name=None):
    """Assignment-only Pallas pass: returns (assign (Nl,) uint32,
    best (Nl,) fp32, changed () int32 — LOCAL, caller psums)."""
    nl, f = x.shape
    k = n_clusters
    ct_panel, bias, orig_ids = _panel(centroids, x.dtype, metric)
    kp = ct_panel.shape[1]

    grid = nl // tile
    rows = tile // 128
    vma = frozenset() if axis_name is None else frozenset({axis_name})
    if axis_name is not None:
        from kmcuda_tpu.ops.assign import _mark_varying

        ct_panel, bias, orig_ids = _mark_varying(
            (ct_panel, bias, orig_ids), axis_name)
    valid2 = valid.astype(jnp.int32).reshape(nl // 128, 128)
    prev2 = prev_assign.reshape(nl // 128, 128)
    aid, best, changed = pl.pallas_call(
        functools.partial(_kernel_assign_only, n_clusters=k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nl // 128, 128), jnp.uint32, vma=vma),
            jax.ShapeDtypeStruct((nl // 128, 128), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, 1), jnp.int32, vma=vma),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, ct_panel, bias, orig_ids[None, :], valid2, prev2)
    return aid.reshape(nl), best.reshape(nl), changed[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "metric", "tile", "interpret",
                     "axis_name"))
def fused_lloyd_pass(x, valid, prev_assign, centroids, *, n_clusters: int,
                     metric: D.DistanceMetric, tile: int, interpret: bool,
                     axis_name=None):
    """One fused assignment+update pass over the local shard.

    Returns (new_centroids (K, F) fp32 — pre-psum local segment mean parts
    as (sums, counts) —, assign (Nl,) uint32, best (Nl,) fp32, changed ()
    int32).  The caller psums (sums, counts, changed) and normalizes.
    """
    nl, f = x.shape
    k = n_clusters
    # The kernel computes s = dot(x, panel) + bias.
    #   L2:     s = -2<x,c> + (csq + pen)   (panel = -2 c, exact scaling)
    #   cosine: s = -<x,c>  + pen           (panel = -c)
    ct_panel, bias, orig_ids = _panel(centroids, x.dtype, metric)
    kp = ct_panel.shape[1]

    grid = nl // tile
    rows = tile // 128
    vma = frozenset() if axis_name is None else frozenset({axis_name})
    if axis_name is not None:
        # align vma: replicated panels join the device-varying operands
        from kmcuda_tpu.ops.assign import _mark_varying

        ct_panel, bias, orig_ids = _mark_varying(
            (ct_panel, bias, orig_ids), axis_name)
    # vectors travel as (nl/128, 128) 2D arrays with (tile/128, 128)
    # blocks: plain 1D blocks force a Mosaic tiling that clashes with
    # XLA's layout for large 1D arrays, and sublane dims must be
    # multiples of 8 (so tile must be a multiple of 1024)
    valid2 = valid.astype(jnp.int32).reshape(nl // 128, 128)
    prev2 = prev_assign.reshape(nl // 128, 128)
    aid, best, sums, counts, changed = pl.pallas_call(
        functools.partial(_kernel, n_clusters=k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nl // 128, 128), jnp.uint32, vma=vma),
            jax.ShapeDtypeStruct((nl // 128, 128), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((kp, f), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, kp), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((1, 1), jnp.int32, vma=vma),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, ct_panel, bias, orig_ids[None, :], valid2, prev2)
    return (aid.reshape(nl), best.reshape(nl), sums[:k], counts[0, :k],
            changed[0, 0])
