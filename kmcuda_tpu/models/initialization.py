"""Centroid initialization: random, k-means++, AFK-MC2, import.

The reference drives all four from host loops with one CUDA kernel + one
device->host round-trip *per centroid* (k-means++: reference
src/kmcuda.cc:285-333; AFK-MC2: kmcuda.cc:337-396).  Here each scheme is a
single jitted ``lax.fori_loop`` that stays on device for all k steps — the
per-step D2H sync of the reference's init hot loop (SURVEY.md §3.1) is gone.

Semantics preserved:

- k-means++ samples proportionally to the running *distance* (not squared —
  the reference accumulates METRIC::distance_t which takes the sqrt,
  metric_abstraction.h:73-85, kmeans.cu:43-67), with invalid samples
  contributing zero weight (kmeans.cu:52).
- AFK-MC2: q[i] = d0_i^2 / (2 sum d0^2) + 1/(2N) (kmeans.cu:96-105); each of
  the k-1 steps draws m candidates from q and runs the Metropolis-Hastings
  chain with weight d(candidate, nearest chosen centroid)^2 / q(candidate),
  accepting when cand_prob / curr_prob > u (kmcuda.cc:381-389,
  kmeans.cu:160-176).
- random: a uniform draw of k distinct samples (the reference shuffles all
  indices host-side, kmcuda.cc:245-261; we draw without replacement among
  *valid* rows — the reference can seed from a NaN sample, we never do).
- import: adopt user-provided centroids (kmcuda.cc:224-244).

RNG: ``jax.random`` with a user-seeded key replaces the reference's
``srand(seed)`` + ``rand()`` (kmcuda.cc:222); identical seeds therefore do
not reproduce the reference's exact draws, only its distributions.
"""

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from kmcuda_tpu import config
from kmcuda_tpu.ops import distance as D
from kmcuda_tpu.utils.errors import KMTPUInvalidArguments


class InitMethod(enum.IntEnum):
    """Value-compatible with KMCUDAInitMethod (kmcuda.h:57-72)."""

    RANDOM = 0
    PLUS_PLUS = 1
    AFKMC2 = 2
    IMPORT = 3


#: string -> enum map, mirroring the reference's ``init_methods``
#: (kmcuda.h:168-175).
init_methods = {
    "kmeans++": InitMethod.PLUS_PLUS,
    "k-means++": InitMethod.PLUS_PLUS,
    "afkmc2": InitMethod.AFKMC2,
    "afk-mc2": InitMethod.AFKMC2,
    "random": InitMethod.RANDOM,
}


def _valid_probs(valid, n_valid):
    return valid.astype(jnp.float32) / n_valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _init_random(x, valid, n_valid, key, *, k):
    idx = random.choice(key, x.shape[0], (k,), replace=False,
                        p=_valid_probs(valid, n_valid))
    return x[idx].astype(jnp.float32)


def _draw_block_size(n: int) -> int:
    """Static inner-block length for the two-level weighted draw: the
    largest power of two <= 4096 dividing n (1 = single-level)."""
    bs = 1
    cand = 4096
    while cand >= 2:
        if n % cand == 0 and n // cand >= 2:
            bs = cand
            break
        cand //= 2
    return bs


def _weighted_draw(weights, kd):
    """Index ~ Categorical(weights) by two-level inverse CDF.

    The reference samples its k-means++ draws by a host prefix scan over
    the full distance array (kmcuda.cc:301-333); a device cumsum over all
    n is the direct port but costs a full-array scan pass PER CENTROID
    (measured 1.9 ms/step of the 7.5 ms k-means++ step at 8M — the
    second-largest init cost after the unavoidable distance matvec).
    Two-level: block sums -> tiny cumsum picks the block -> one-block
    cumsum picks the row.  Exact inverse-CDF at both levels (the same
    clamp-at-the-end degenerate behavior as the flat form); only fp
    summation order differs, so the drawn STREAM differs from the flat
    form while the distribution is identical."""
    n = weights.shape[0]
    bs = _draw_block_size(n)
    if bs == 1:
        cum = jnp.cumsum(weights)
        u = random.uniform(kd) * cum[-1]
        return jnp.minimum(jnp.searchsorted(cum, u, side="right"), n - 1)
    nb = n // bs
    m2 = weights.reshape(nb, bs)
    cumb = jnp.cumsum(jnp.sum(m2, axis=1))
    u = random.uniform(kd) * cumb[-1]
    j = jnp.minimum(jnp.searchsorted(cumb, u, side="right"), nb - 1)
    resid = u - jnp.where(j > 0, cumb[jnp.maximum(j - 1, 0)],
                          jnp.float32(0.0))
    cumr = jnp.cumsum(lax.dynamic_slice(m2, (j, 0), (1, bs))[0])
    i = jnp.minimum(jnp.searchsorted(cumr, resid, side="right"), bs - 1)
    return j * bs + i


def _pp_body(x, x_sq, valid, metric):
    """One k-means++ step (shared by the whole-loop and segmented forms so
    both run the identical op sequence — the bitwise contract)."""

    def body(i, carry):
        cent, mindist, key = carry
        key, kd = random.split(key)
        idx = _weighted_draw(mindist, kd)
        c = x[idx].astype(jnp.float32)
        cent = cent.at[i].set(c)
        d = jnp.where(valid, D.point_distances(x, x_sq, c, metric), 0.0)
        return cent, jnp.minimum(mindist, d), key

    return body


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _pp_start(x, x_sq, valid, n_valid, key, *, k, metric):
    """First-centroid prologue; returns the (cent, mindist, key) carry the
    step body iterates."""
    n, f = x.shape
    key, k0 = random.split(key)
    idx0 = random.choice(k0, n, p=_valid_probs(valid, n_valid))
    c0 = x[idx0].astype(jnp.float32)
    cent = jnp.zeros((k, f), jnp.float32).at[0].set(c0)
    mindist = jnp.where(valid, D.point_distances(x, x_sq, c0, metric), 0.0)
    return cent, mindist, key


@functools.partial(jax.jit, static_argnames=("steps", "metric"))
def _pp_segment(x, x_sq, valid, cent, mindist, key, start, *,
                steps: int, metric):
    """``steps`` k-means++ draws starting at centroid index ``start``
    (traced, so one compile serves every boundary).  Chaining segments
    replays the exact step sequence of the single fori_loop — same key
    splits, same index arithmetic — so results are bitwise independent of
    the segmentation (the same carried-state contract as the convergence
    loops' _SegmentDriver)."""
    body = _pp_body(x, x_sq, valid, metric)
    return lax.fori_loop(
        0, steps, lambda j, c: body(start + j, c), (cent, mindist, key))


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _init_plus_plus(x, x_sq, valid, n_valid, key, *, k, metric):
    cent, mindist, key = _pp_start(x, x_sq, valid, n_valid, key,
                                   k=k, metric=metric)
    cent, _, _ = lax.fori_loop(1, k, _pp_body(x, x_sq, valid, metric),
                               (cent, mindist, key))
    return cent


def _mc2_body(x, x_sq, q, k, m, metric):
    """One AFK-MC2 Markov-chain step (shared by the whole-loop and
    segmented forms — see _pp_body)."""
    n = x.shape[0]
    ids = lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

    def body(i, carry):
        cent, key = carry
        key, kc, ku = random.split(key, 3)
        cand_idx = random.choice(kc, n, (m,), p=q)
        cand = x[cand_idx]
        cand_sq = x_sq[cand_idx]
        cand_q = q[cand_idx]
        us = random.uniform(ku, (m,))
        # min distance of each candidate to the i chosen centroids: penalty
        # masks the unfilled rows of the centroid buffer.
        pen = jnp.where(ids < i, 0.0, config.PAD_PENALTY)
        c_sq = jnp.sum(cent * cent, axis=1)
        s = D.scores(cand, cent.T.astype(x.dtype), c_sq, pen, metric)
        dmin = D.finalize_distance(jnp.min(s, axis=1), cand_sq, metric)
        w = dmin * dmin  # the reference's p_cand = min_dist^2 (kmeans.cu:175)

        def mh(state, inp):
            cur_idx, cur_prob = state
            idx_j, w_j, q_j, u_j = inp
            prob_j = w_j / q_j
            take = (cur_prob == 0.0) | (prob_j / cur_prob > u_j)
            return (jnp.where(take, idx_j, cur_idx),
                    jnp.where(take, prob_j, cur_prob)), None

        (best_idx, _), _ = lax.scan(
            mh, (jnp.int32(0), jnp.float32(0.0)),
            (cand_idx.astype(jnp.int32), w, cand_q, us))
        cent = cent.at[i].set(x[best_idx].astype(jnp.float32))
        return cent, key

    return body


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _mc2_start(x, x_sq, valid, n_valid, key, *, k, metric):
    """First centroid + the q proposal distribution (kmeans.cu:96-105)."""
    n, f = x.shape
    key, k0 = random.split(key)
    idx0 = random.choice(k0, n, p=_valid_probs(valid, n_valid))
    c0 = x[idx0].astype(jnp.float32)
    cent = jnp.zeros((k, f), jnp.float32).at[0].set(c0)

    d0 = jnp.where(valid, D.point_distances(x, x_sq, c0, metric), 0.0)
    d0_sq = d0 * d0
    # q[i] = d^2/(2 sum d^2) + 1/(2N) (kmeans.cu:96-105); mass restricted to
    # valid rows so a NaN sample can never be drawn.
    q = d0_sq / (2.0 * jnp.sum(d0_sq)) + jnp.where(
        valid, 0.5 / n_valid.astype(jnp.float32), 0.0)
    q = q / jnp.sum(q)
    return cent, key, q


@functools.partial(jax.jit, static_argnames=("k", "m", "steps", "metric"))
def _mc2_segment(x, x_sq, q, cent, key, start, *, k, m, steps: int, metric):
    """``steps`` AFK-MC2 chain steps from centroid index ``start``
    (traced) — bitwise equal to the corresponding slice of the single
    fori_loop (see _pp_segment)."""
    body = _mc2_body(x, x_sq, q, k, m, metric)
    return lax.fori_loop(0, steps, lambda j, c: body(start + j, c),
                         (cent, key))


@functools.partial(jax.jit, static_argnames=("k", "m", "metric"))
def _init_afkmc2(x, x_sq, valid, n_valid, key, *, k, m, metric):
    cent, key, q = _mc2_start(x, x_sq, valid, n_valid, key, k=k,
                              metric=metric)
    cent, _ = lax.fori_loop(1, k, _mc2_body(x, x_sq, q, k, m, metric),
                            (cent, key))
    return cent


def _drive_segments(log, k: int, label: str, carry, seg_fn):
    """Host driver for a segmented O(k) init loop: bounded device
    dispatches of config.INIT_SEGMENT_CENTROIDS steps each, with a
    verbosity-1 progress line per segment — the analog of the reference's
    init progress bars (kmcuda.cc:286-290, 368-371).  A watchdog-minded
    caller can now distinguish a long init from a hang (the same reason
    the convergence loops are segmented, see models/lloyd._SegmentDriver).

    The carried state makes the chained segments replay the single
    fori_loop's op/key sequence exactly, so results are bitwise
    independent of the segmentation (golden-locked).

    At verbosity 0 the segments are dispatched without any host sync
    (progress would not be printed anyway), keeping the device pipeline
    full; at verbosity >= 1 each line is printed only after the segment's
    carry materializes, so lines reflect real device progress."""
    seg = config.INIT_SEGMENT_CENTROIDS
    done = 1
    while done < k:
        steps = min(seg, k - done)
        carry = seg_fn(carry, jnp.int32(done), steps)
        done += steps
        if log.verbosity > 0:
            # the key is the smallest carry leaf: one tiny readback is the
            # progress barrier
            jax.device_get(carry[-1])
            log.info("%s: %d / %d centroids" % (label, done, k))
    return carry[0]


def init_centroids(problem, method: InitMethod, key,
                   afkmc2_m: int = 0, imported=None) -> jax.Array:
    """Dispatcher, the analog of ``kmeans_init_centroids``
    (kmcuda.cc:189-400).  Returns (k, F) fp32 centroids, replicated."""
    p = problem
    log = p.logger
    if method == InitMethod.IMPORT:
        arr = np.asarray(imported, dtype=np.float32) \
            if not isinstance(imported, jax.Array) else imported
        if arr.shape != (p.k, p.features):
            raise KMTPUInvalidArguments(
                "imported centroids must have shape (%d, %d), got %s"
                % (p.k, p.features, (arr.shape,)))
        return p.topo.put_replicated(jnp.asarray(arr, jnp.float32))
    segmented = p.k > config.INIT_SEGMENT_CENTROIDS
    if method == InitMethod.RANDOM:
        log.info("performing random centroid initialization...")
        cent = _init_random(p.x, p.valid, jnp.int32(p.n_valid), key, k=p.k)
    elif method == InitMethod.PLUS_PLUS:
        log.info("performing kmeans++...")
        if segmented:
            carry = _pp_start(p.x, p.x_sq, p.valid, jnp.int32(p.n_valid),
                              key, k=p.k, metric=p.metric)
            cent = _drive_segments(
                log, p.k, "kmeans++", carry,
                lambda c, s, n: _pp_segment(p.x, p.x_sq, p.valid, *c, s,
                                            steps=n, metric=p.metric))
        else:
            cent = _init_plus_plus(p.x, p.x_sq, p.valid,
                                   jnp.int32(p.n_valid), key, k=p.k,
                                   metric=p.metric)
    elif method == InitMethod.AFKMC2:
        m = afkmc2_m
        if m == 0:
            m = min(config.AFKMC2_DEFAULT_M, max(1, p.n_valid // 2))
        elif m > p.n // 2:
            # same limit as the reference (kmcuda.cc:341-345)
            raise KMTPUInvalidArguments(
                "afkmc2: m > %d is not supported (got %d)" % (p.n // 2, m))
        log.info("performing afkmc2 (m = %d)..." % m)
        if segmented:
            cent0, key2, q = _mc2_start(p.x, p.x_sq, p.valid,
                                        jnp.int32(p.n_valid), key, k=p.k,
                                        metric=p.metric)
            cent = _drive_segments(
                log, p.k, "afkmc2", (cent0, key2),
                lambda c, s, n: _mc2_segment(p.x, p.x_sq, q, *c, s, k=p.k,
                                             m=m, steps=n, metric=p.metric))
        else:
            cent = _init_afkmc2(p.x, p.x_sq, p.valid, jnp.int32(p.n_valid),
                                key, k=p.k, m=m, metric=p.metric)
    else:
        raise KMTPUInvalidArguments("unknown init method %r" % (method,))
    return p.topo.put_replicated(cent)
