"""Pallas fused k-NN walk: the pruned tile tour as one Mosaic kernel.

The XLA walk (ops.knn_prune.search pass 2) round-trips every visited
(chunk, group*tile_m) distance block through HBM between the score
matmul, the masking passes, the improvement gate, ``lax.top_k`` and the
merge sort, and pays a ``lax.cond``/``lax.while_loop`` step overhead per
visited tile group.  This kernel keeps the whole walk of one query chunk
in VMEM:

  1. one grid program per query chunk; member tiles are DMA'd from HBM
     on demand in the chunk's most-promising-first order (the analog of
     the reference's per-cluster scan order, knn.cu:218-224),
  2. scores on the MXU + true-distance finalize + self/pad masking
     without leaving VMEM,
  3. a running top-kk buffer merged in-register: kk lexicographic
     (distance, id) extract-min passes over the tile block, then kk
     passes over the tiny (2*kkp) union — the reference heap's job
     (knn.cu:133-175) as O(kk) VPU passes per *improving tile* rather
     than O(log k) per candidate,
  4. the same early stop as the XLA walk: the tour ends when the next
     tile group's chunk-min bound exceeds every query's running kth
     distance (tracked in SMEM and tightened after every merge).

The exactness contract is identical to the XLA path (same SLACK
inflation, same lexicographic (distance, id) tie-break, same (INF, -1)
sentinel ordering — see ops/knn_prune.py); the caller runs the same
exact rescore on the kk survivors, so the two paths return identical
neighbors.

Engagement bounds (:func:`supported`): kk <= 256 (the candidate buffer
spans up to two lane tiles; the extract loop is O(kk) not O(k) and the
per-tile stop_at early-out keeps typical merges to a few passes) and
features <= 2048 — member tiles stream through a fixed-width VMEM slab
with per-slab partial dot accumulation, so the buffer no longer scales
with f (round 4; the reference supports features <= 2^16,
README.md:116-118).  Larger shapes use the XLA walk.  Non-TPU backends
run in interpreter mode (tests on the CPU mesh).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmcuda_tpu.ops import distance as D

INF = np.float32(np.inf)
NEG_INF = np.float32(-np.inf)
BIGI = np.int32(2 ** 31 - 1)

#: engagement bounds: at most two lane tiles for the candidate buffer,
#: and the (chunk, group*tile_m) block + member slab must fit VMEM
MAX_PALLAS_KK = 256
MAX_PALLAS_F = 2048
#: member-slab feature width: tiles wider than this stream through the
#: fixed (gm, slab) VMEM buffer in slab-sized chunks with partial dot
#: accumulation, so xm_buf never scales past gm * slab
MAX_PALLAS_F_SLAB = 512
#: conservative live-set ceilings for the kernel's scalar and vector
#: memory (TPU SMEM is O(100 KB); VMEM 64-128 MB depending on generation)
MAX_SMEM_BYTES = 96 * 1024
MAX_VMEM_BYTES = 48 * 1024 * 1024


def supported(kk: int, features: int, n_tiles: int, chunk: int,
              tile_m: int, group: int, itemsize: int = 4) -> bool:
    """True when the walk kernel's working set fits the chip.

    The tour arrays live in SMEM (scales with n_tiles — unbounded data
    sets must fall back to the XLA walk), the member slab, the
    (chunk, group*tile_m) distance block and the candidate buffers in
    VMEM.  The estimates model what walk() actually allocates (ADVICE
    r3): the feature and tour axes are padded to lane multiples, the
    meta page adds 128 SMEM ints, and the member buffer is capped at the
    slab width."""
    if kk > MAX_PALLAS_KK or features > MAX_PALLAS_F:
        return False
    f_pad = -(-features // 128) * 128
    slab = min(f_pad, MAX_PALLAS_F_SLAB)
    nte = -(-(n_tiles + group - 1) // 128) * 128
    smem = (2 * nte + n_tiles + 128 + 8) * 4
    gm = group * tile_m
    kkp = -(-kk // 128) * 128
    vmem = (gm * slab * itemsize              # xm_buf (slab-capped)
            + 2 * gm * 4                      # msq + mspos rows
            + chunk * f_pad * itemsize        # xq block
            + 2 * chunk * gm * 4              # prod + d live values
            + 8 * chunk * kkp * 4)            # bd/bi/z/inc buffers
    return smem <= MAX_SMEM_BYTES and vmem <= MAX_VMEM_BYTES


def _extract_k(z_d, z_i, kk: int, kkp: int, stop_at=None):
    """kk lexicographic (distance, id) extract-min passes.

    z_d: (rows, m) working distances (consumed functionally).
    z_i: (1, m) or (rows, m) candidate ids (never modified).
    Returns (out_d, out_i) of shape (rows, kkp), columns [0, kk)
    ascending by (distance, id), tail columns the (+inf, -1) sentinel.

    Sentinel entries (d=+inf, id=-1) may repeat; extracting one leaves
    the others eligible (they are masked to +inf, which they already
    are), so sentinel-padded tails reproduce themselves — exactly the
    XLA path's select_k behavior on (+inf, -1) fill.  Among equal
    distances the lowest id wins, so (+inf, -1) always beats a
    masked-out real candidate (+inf, real_id) — real ids with masked
    distances can never enter the buffer (the self/pad exclusion
    guarantee; see ops/knn_prune.py).

    stop_at: optional (rows, 1) thresholds.  When every row's next
    minimum strictly exceeds its threshold, the remaining passes are
    skipped: a caller merging the result with a buffer whose per-row kth
    value is the threshold loses nothing — an unextracted entry is
    strictly worse than kk entries the buffer already holds, so it can
    never make the merged top-kk ('<=' keeps knife-edge id-ties alive).
    Typical improving tiles contribute a handful of candidates, so this
    turns kk full-width passes into a few.
    """
    rows = z_d.shape[0]
    cols = lax.broadcasted_iota(jnp.int32, (1, kkp), 1)
    od0 = jnp.full((rows, kkp), INF)
    oi0 = jnp.full((rows, kkp), jnp.int32(-1))

    def do_pass(j, zd, od, oi):
        m = jnp.min(zd, axis=1, keepdims=True)             # (rows, 1)
        hit = zd <= m
        am = jnp.min(jnp.where(hit, z_i, BIGI), axis=1,
                     keepdims=True)                        # (rows, 1)
        od = jnp.where(cols == j, m, od)
        oi = jnp.where(cols == j, am, oi)
        zd = jnp.where(hit & (z_i == am), INF, zd)
        done = (jnp.bool_(False) if stop_at is None
                else jnp.all(m > stop_at))
        return zd, od, oi, done

    def pass_j(j, carry):
        # skip branch is the identity: once every row is past its
        # threshold the remaining passes cost one branch each
        return lax.cond(carry[3], lambda c: c,
                        lambda c: do_pass(j, c[0], c[1], c[2]), carry)

    _zd, od, oi, _done = lax.fori_loop(
        0, kk, pass_j, (z_d, od0, oi0, jnp.bool_(False)))
    return od, oi


def _kernel(order_hbm, bound_hbm, meta_hbm, nval_ref,
            xq_ref, xqsq_ref, qpos_ref, qvalid_ref,
            xm_hbm, msq_hbm, mspos_hbm,
            bi_ref, ex_ref,
            bd_ref, xm_buf, msq_buf, mspos_buf, zd_buf, zi_buf, tau_ref,
            order_ref, bound_ref, meta_ref,
            sem, sem_s, *,
            kn: int, kk: int, kkp: int, group: int, tile_m: int,
            metric: D.DistanceMetric, precision, slack: float,
            eps_env: float, stop_bound: float):
    i = pl.program_id(0)
    gm = group * tile_m
    chunk = xq_ref.shape[0]

    @pl.when(i == 0)
    def _init_ex():
        ex_ref[0, 0] = jnp.float32(0)

    # per-chunk tour metadata: a (1, nte) block of a (nchunks, nte) SMEM
    # array violates Mosaic's block-shape rule (the sublane dim must be
    # 8-divisible or whole), and a 1-row DMA slice of a 2D tiled memref
    # violates its (8, 128) tiling — both found on hardware, round 3.  So
    # the tours live as (nchunks, 1, nte) arrays with nte padded to a
    # lane multiple (the chunk index is an untiled page dim, sliceable
    # by 1; the DMA'd page is lane-whole) and each program DMAs its own
    # page into SMEM scratch; n_steps/n_qvalid ride one meta page.
    scal = [
        pltpu.make_async_copy(order_hbm.at[i], order_ref, sem_s.at[0]),
        pltpu.make_async_copy(bound_hbm.at[i], bound_ref, sem_s.at[1]),
        pltpu.make_async_copy(meta_hbm.at[i], meta_ref, sem_s.at[2]),
    ]
    for c in scal:
        c.start()
    for c in scal:
        c.wait()

    qvalid = qvalid_ref[:] != 0                            # (chunk, 1)
    # buffer init: valid rows (+inf, -1); invalid rows -inf so they never
    # inflate tau (their results are discarded by the caller)
    bd_ref[:] = jnp.where(jnp.broadcast_to(qvalid, (chunk, kkp)),
                          INF, NEG_INF)
    bi_ref[:] = jnp.full((chunk, kkp), jnp.int32(-1))
    tau_ref[0, 0] = jnp.max(bd_ref[:, kn - 1:kn])

    lane_g = lax.broadcasted_iota(jnp.int32, (1, gm), 1)
    in_tile = lane_g % tile_m
    seg = lane_g // tile_m
    n_qvalid = jnp.float32(meta_ref[0, 1])

    def step(r_step, active):
        r = r_step * group
        bound_r = bound_ref[0, r]
        act = (active & (bound_r <= tau_ref[0, 0])
               & (bound_r < stop_bound))

        @pl.when(act)
        def _visit():
            f = xq_ref.shape[1]
            slab = xm_buf.shape[1]

            # ---- DMA the group's per-member metadata (once) ----------
            copies = []
            for g in range(group):
                row0 = order_ref[0, r + g] * tile_m
                copies.append(pltpu.make_async_copy(
                    msq_hbm.at[:, pl.ds(row0, tile_m)],
                    msq_buf.at[:, pl.ds(g * tile_m, tile_m)],
                    sem.at[3 * g + 1]))
                copies.append(pltpu.make_async_copy(
                    mspos_hbm.at[:, pl.ds(row0, tile_m)],
                    mspos_buf.at[:, pl.ds(g * tile_m, tile_m)],
                    sem.at[3 * g + 2]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            # ---- member rows stream through the (gm, slab) buffer ----
            # one slab for f <= MAX_PALLAS_F_SLAB (the pre-round-4 path,
            # bit-identical); wider features accumulate per-slab partial
            # dot products — the VMEM analog of the reference's
            # feature-chunked partial/finalize accumulation
            # (metric_abstraction.h:103-135, knn.cu:79-101).  Partial
            # sums add in ascending feature order, so the accumulated
            # prod equals the single-matmul contraction only up to fp32
            # rounding — which the SLACK/eps_env margins already absorb
            # (the XLA walk's matmul reassociates the same contraction).
            prod = jnp.zeros((chunk, gm), jnp.float32)
            for f0 in range(0, f, slab):
                fc = min(slab, f - f0)
                copies = []
                for g in range(group):
                    row0 = order_ref[0, r + g] * tile_m
                    copies.append(pltpu.make_async_copy(
                        xm_hbm.at[pl.ds(row0, tile_m), pl.ds(f0, fc)],
                        xm_buf.at[pl.ds(g * tile_m, tile_m),
                                  pl.ds(0, fc)],
                        sem.at[3 * g]))
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
                prod = prod + lax.dot_general(
                    xq_ref[:, f0:f0 + fc], xm_buf[:, :fc],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)

            # ---- scores -> true distances, masks (all in VMEM) -------
            if metric == D.DistanceMetric.L2:
                s = msq_buf[:] - 2.0 * prod                # (chunk, gm)
                d = jnp.sqrt(jnp.maximum(s + xqsq_ref[:], 0.0))
            else:
                d = jnp.arccos(jnp.clip(prod, -1.0, 1.0))
            d = d * (1.0 + slack)                          # upward margin
            if eps_env > 0.0:
                # bf16 storage: same absolute dot-form error envelope as
                # the XLA walk (knn_prune.search pass 2, ADVICE r2) —
                # without it tau can undershoot the true kth distance by
                # ~2^-8 * |q|^2 and prune a tile holding a true neighbor
                if metric == D.DistanceMetric.L2:
                    d = d + jnp.sqrt(
                        eps_env * (xqsq_ref[:] + msq_buf[:]))
                else:
                    d = d + np.float32(np.sqrt(2.0 * eps_env))
            # member padded positions, from the tile ids (no DMA needed)
            mpos = in_tile
            for g in range(group):
                mpos = mpos + jnp.where(
                    seg == g, order_ref[0, r + g] * tile_m, 0)
            d = jnp.where(qpos_ref[:] == mpos, INF, d)     # self
            d = jnp.where(mspos_buf[:] < 0, INF, d)        # padding

            improves = jnp.any(
                jnp.min(d, axis=1, keepdims=True) <= bd_ref[:, kk - 1:kk])

            @pl.when(improves)
            def _merge():
                inc_d, inc_i = _extract_k(d, mpos, kk, kkp,
                                          stop_at=bd_ref[:, kk - 1:kk])
                # union via scratch stores (lane-dim concatenate is less
                # reliably lowered by Mosaic than two static writes)
                zd_buf[:, :kkp] = bd_ref[:]
                zd_buf[:, kkp:] = inc_d
                zi_buf[:, :kkp] = bi_ref[:]
                zi_buf[:, kkp:] = inc_i
                nd, ni = _extract_k(zd_buf[:], zi_buf[:], kk, kkp)
                # invalid query rows stay (-inf, -1): -inf suppresses tau,
                # -1 keeps the rescore from resurrecting their candidates
                bd_ref[:] = jnp.where(qvalid, nd, NEG_INF)
                bi_ref[:] = jnp.where(qvalid, ni, jnp.int32(-1))
                tau_ref[0, 0] = jnp.max(bd_ref[:, kn - 1:kn])

            ex = jnp.float32(0)
            for g in range(group):
                ex = ex + jnp.float32(nval_ref[0, order_ref[0, r + g]])
            ex_ref[0, 0] += ex * n_qvalid

        return act

    lax.fori_loop(0, meta_ref[0, 0], step, jnp.bool_(True))


@functools.partial(
    jax.jit,
    static_argnames=("k_neighbors", "kk", "chunk", "tile_m", "group",
                     "metric", "eps_env", "interpret", "axis_name"))
def walk(xq, xq_sq, q_pos, q_valid, n_qvalid, n_steps, tile_order,
         sorted_min, tile_nvalid, xm, xm_sq, m_spos, *,
         k_neighbors: int, kk: int, chunk: int, tile_m: int, group: int,
         metric: D.DistanceMetric, eps_env: float = 0.0,
         interpret: bool, axis_name=None):
    """Run the fused walk over a batch of query chunks.

    xq: (nb, f) batch queries (cluster-sorted padded layout).
    xq_sq/q_pos/q_valid: (nb,) norms / padded positions / validity.
    n_qvalid/n_steps: (nchunks,) per-chunk valid-query counts and walk
    step bounds.  tile_order/sorted_min: (nchunks, nte) the chunk tours.
    tile_nvalid: (nt,) per-tile member counts.  xm/xm_sq/m_spos:
    (M, f)/(M,)/(M,) replicated members (stay in HBM; tiles are DMA'd).

    Returns (best_i (nb, kkp) int32, examined () f32) with the
    meaningful columns in [0, kk); the caller rescores the candidate ids
    exactly as after the XLA walk (their walk distances are dead —
    the exact rescore recomputes them — so they never leave VMEM).
    """
    from kmcuda_tpu import config
    from kmcuda_tpu.ops import knn_prune as KP

    nb, f = xq.shape
    nchunks = nb // chunk
    nt = tile_nvalid.shape[0]
    # the member-tile DMA slices whole rows out of HBM, and a DMA
    # slice's lane dim must be whole (Mosaic pads f<128 to 128 lanes and
    # forbids the sub-lane slice — found on hardware, round 3): pad the
    # feature dim with zero lanes, which are inert for both metrics
    # (norms arrive separately; zero lanes add nothing to the dot).
    # The replicated member array is normally PRE-padded once by the
    # caller (models/knn.run — ADVICE r3: padding it here re-materialized
    # an (M, f_pad) HBM copy on every host-level batch dispatch); the
    # fallback pad below keeps direct callers (tests) working.
    f_pad = -(-f // 128) * 128
    if f_pad != f:
        xq = jnp.pad(xq, ((0, 0), (0, f_pad - f)))
        f = f_pad
    if xm.shape[1] != f:
        xm = jnp.pad(xm, ((0, 0), (0, f - xm.shape[1])))
    slab = min(f, MAX_PALLAS_F_SLAB)
    # the per-chunk tour pages are DMA'd whole, and a DMA slice's lane
    # dim must be 128-aligned (Mosaic tiling): pad the tours with inert
    # entries (the filler tile, an unreachable bound) up to a multiple
    # of 128.  n_steps and the bound gate keep the walk off the padding.
    nte = -(-tile_order.shape[1] // 128) * 128
    if nte != tile_order.shape[1]:
        pad = nte - tile_order.shape[1]
        tile_order = jnp.pad(tile_order, ((0, 0), (0, pad)),
                             constant_values=nt - 1)
        sorted_min = jnp.pad(sorted_min, ((0, 0), (0, pad)),
                             constant_values=INF)
    kkp = -(-kk // 128) * 128
    gm = group * tile_m
    precision = D.mm_precision(xq.dtype)

    vma = frozenset() if axis_name is None else frozenset({axis_name})
    if axis_name is not None:
        from kmcuda_tpu.ops.assign import _mark_varying

        (xm, xm_sq, m_spos, tile_nvalid) = _mark_varying(
            (xm, xm_sq, m_spos, tile_nvalid), axis_name)

    kern = functools.partial(
        _kernel, kn=k_neighbors, kk=kk, kkp=kkp, group=group,
        tile_m=tile_m, metric=metric, precision=precision,
        slack=float(KP.SLACK), eps_env=float(eps_env),
        stop_bound=float(KP.STOP_BOUND))
    call = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # tile_order (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # sorted_min (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # meta (HBM)
            pl.BlockSpec((1, nt), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # tile_nvalid
            pl.BlockSpec((chunk, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # xq
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # xq_sq col
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # q_pos col
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # q_valid col
            pl.BlockSpec(memory_space=pl.ANY),        # xm (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # xm_sq (1, M)
            pl.BlockSpec(memory_space=pl.ANY),        # m_spos (1, M)
        ],
        out_specs=[
            pl.BlockSpec((chunk, kkp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, kkp), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((1, 1), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, kkp), jnp.float32),       # bd (candidates)
            pltpu.VMEM((gm, slab), xq.dtype),            # xm_buf
            pltpu.VMEM((1, gm), jnp.float32),            # msq_buf
            pltpu.VMEM((1, gm), jnp.int32),              # mspos_buf
            pltpu.VMEM((chunk, 2 * kkp), jnp.float32),   # zd (union)
            pltpu.VMEM((chunk, 2 * kkp), jnp.int32),     # zi (union)
            pltpu.SMEM((1, 1), jnp.float32),             # tau
            pltpu.SMEM((1, nte), jnp.int32),             # tile_order row
            pltpu.SMEM((1, nte), jnp.float32),           # sorted_min row
            pltpu.SMEM((1, 128), jnp.int32),             # meta page
            pltpu.SemaphoreType.DMA((3 * group,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=config.KNN_PALLAS_VMEM_LIMIT),
    )
    meta = jnp.zeros((nchunks, 128), jnp.int32)
    meta = meta.at[:, 0].set(n_steps).at[:, 1].set(n_qvalid)
    bi, ex = call(
        tile_order[:, None, :], sorted_min[:, None, :], meta[:, None, :],
        tile_nvalid[None, :],
        xq, xq_sq[:, None], q_pos[:, None],
        q_valid.astype(jnp.int32)[:, None],
        xm, xm_sq[None, :].astype(jnp.float32), m_spos[None, :])
    return bi, ex[0, 0]
