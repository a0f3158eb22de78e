"""Prepared problem state: upload, padding, NaN hygiene.

The reference's equivalents are ``init_udevptrs`` (replicating host input to
every GPU, reference src/kmcuda.cc:139-170) and the feature-major transpose
it performs for coalesced reads (kmcuda.cc:481-482, transpose.cu).  On TPU:

- replication/sharding is one ``jax.device_put`` with a ``NamedSharding``;
- the transpose component is intentionally absent: distances are MXU
  matmuls, and XLA's layout assignment owns the physical layout
  (SURVEY.md §7.2), so samples stay sample-major;
- NaN handling is hoisted out of the kernels: rows with any non-finite value
  are marked invalid once and zeroed, so downstream matmuls never see NaN
  (the reference instead guards every kernel with ``_eq(s, s)`` checks,
  kmeans.cu:52, 276-284).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kmcuda_tpu import config
from kmcuda_tpu.ops.distance import DistanceMetric
from kmcuda_tpu.parallel.mesh import Topology
from kmcuda_tpu.utils.errors import KMTPUInvalidArguments


@dataclasses.dataclass
class Problem:
    """Device-resident, padded, cleaned inputs plus the execution shape."""

    topo: Topology
    logger: object
    n: int                # true sample count
    n_pad: int            # padded to n_devices * chunk multiple
    features: int
    k: int
    metric: DistanceMetric
    chunk: int            # scan chunk (rows per VMEM-resident score block)
    dtype: object         # storage dtype (fp32 or bf16)
    x: jax.Array          # (n_pad, F) cleaned, storage dtype, dp-sharded
    x_sq: jax.Array       # (n_pad,) fp32 squared norms, dp-sharded
    valid: jax.Array      # (n_pad,) bool, dp-sharded
    assign0: jax.Array    # (n_pad,) uint32 fresh 'never assigned' vector
    n_valid: int          # number of valid (finite, non-pad) rows


def _clean_impl(x_pad, *, n, k, dtype):
    """valid-mask, zero-fill invalid rows, squared norms, and the fresh
    'never assigned' vector (id == k, the invalid marker NaN samples keep
    forever, kmeans.cu:276-284) — one fused pass, one dispatch."""
    rows = lax.broadcasted_iota(jnp.int32, (x_pad.shape[0], 1), 0)[:, 0]
    finite = jnp.all(jnp.isfinite(x_pad.astype(jnp.float32)), axis=1)
    valid = finite & (rows < n)
    x_clean = jnp.where(valid[:, None], x_pad, 0).astype(dtype)
    xf = x_clean.astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=1)
    assign0 = jnp.full((x_pad.shape[0],), k, jnp.uint32)
    return x_clean, x_sq, valid, assign0, jnp.sum(valid, dtype=jnp.int32)


_clean = jax.jit(_clean_impl, static_argnames=("n", "k", "dtype"))
#: donating variant: when the padded input is a throwaway (we made it, or
#: the caller opted in with donate_samples), XLA reuses its buffer for the
#: cleaned copy — at 8 GB-scale inputs this halves peak HBM and decides
#: whether a data set fits one chip at all
_clean_donate = jax.jit(_clean_impl, static_argnames=("n", "k", "dtype"),
                        donate_argnums=(0,))


def _already_sharded(arr, target) -> bool:
    """True when a device array already has the target layout, i.e.
    ``device_put`` would not produce a resharding copy."""
    sharding = getattr(arr, "sharding", None)
    if sharding is None:
        return False
    try:
        return sharding.is_equivalent_to(target, arr.ndim)
    except Exception:
        return False


def storage_dtype_for(samples_dtype) -> object:
    """fp16/bf16 input selects bf16 storage (the reference's fp16x2 mode,
    but without halving features — no packing needed on TPU); everything
    float-like else is fp32."""
    samples_dtype = np.dtype(samples_dtype)
    if samples_dtype in (np.dtype(np.float16), np.dtype(jnp.bfloat16)):
        return jnp.bfloat16
    if samples_dtype in (np.dtype(np.float32), np.dtype(np.float64)):
        return jnp.float32
    raise KMTPUInvalidArguments(
        "samples dtype must be float16/bfloat16/float32/float64, got %s"
        % samples_dtype)


def _shares_buffers(a: jax.Array, b: jax.Array) -> bool:
    """True unless ``a`` and ``b`` provably occupy disjoint device memory.

    Donation safety gate: compares the per-shard device buffer pointers.
    Conservative by construction — if the pointers cannot be read (e.g. a
    committed-elsewhere array), it reports sharing, which merely disables
    a donation optimization, never corrupts a caller buffer."""
    try:
        pa = {s.data.unsafe_buffer_pointer() for s in a.addressable_shards}
        pb = {s.data.unsafe_buffer_pointer() for s in b.addressable_shards}
    except Exception:
        return True
    return bool(pa & pb)


def prepare(samples, k: int, metric: DistanceMetric, topo: Topology,
            logger, chunk: int | None = None, donate: bool = False) -> Problem:
    """Pad, shard, and clean the sample matrix.

    donate=True permits reuse of a device-resident ``samples`` buffer for
    the cleaned copy (the caller's array is invalidated) — the way to fit
    near-HBM-sized data sets on one chip.  Host (numpy) inputs always
    donate their device staging copy.
    """
    n, features = samples.shape
    dtype = storage_dtype_for(samples.dtype)
    if chunk is None:
        chunk = topo.pick_chunk(n, config.DEFAULT_SAMPLE_CHUNK)
    n_pad = topo.pad_to(n, chunk)

    if isinstance(samples, jax.Array):
        if n_pad != n:
            x_pad = jnp.pad(samples, ((0, n_pad - n), (0, 0)))
            donate = True  # the pad copy is ours to consume
        else:
            x_pad = samples
    else:
        arr = np.ascontiguousarray(samples)
        if n_pad != n:
            x_pad = np.zeros((n_pad, features), dtype=arr.dtype)
            x_pad[:n] = arr
        else:
            x_pad = arr
        donate = True  # the device staging copy is ours to consume
    target = topo.sharded(2)
    if not donate and _already_sharded(x_pad, target):
        # pad-aligned device input already laid out right: no staging copy
        # exists, and _clean must not consume the caller's buffer
        pass
    else:
        staged = jax.device_put(x_pad, target)
        if not donate and staged is not x_pad \
                and not _shares_buffers(staged, x_pad):
            # device_put made a resharding copy that is library-owned —
            # consume it, or both it and the cleaned copy stay live and
            # peak HBM doubles in exactly the near-HBM regime donation
            # targets.  Promotion requires PROOF of no-alias (distinct
            # device buffer pointers), not just a distinct Python object:
            # device_put returning a fresh Array view over the caller's
            # buffers is undocumented-but-possible, and donating such a
            # view would invalidate the caller's array (ADVICE r2).
            donate = True
        x_pad = staged

    clean = _clean_donate if donate else _clean
    x, x_sq, valid, assign0, n_valid = clean(x_pad, n=n, k=k, dtype=dtype)
    n_valid = int(n_valid)
    logger.debug("prepared problem: n=%d (pad %d, chunk %d), features=%d, "
                 "k=%d, dtype=%s, devices=%d, valid=%d"
                 % (n, n_pad, chunk, features, k, np.dtype(dtype).name,
                    topo.n, n_valid))
    # the device split plan — the analog of the reference's print_plan
    # (private.h:291-302), one line per device at verbosity 2
    per_dev = n_pad // topo.n
    itemsize = np.dtype(dtype).itemsize
    for i, d in enumerate(topo.devices):
        logger.debug("plan: %s rows [%d, %d) (%d chunks, %.1f MB samples)"
                     % (d, i * per_dev, (i + 1) * per_dev,
                        per_dev // chunk,
                        per_dev * features * itemsize / 2**20))
    # the allocation map — the analog of the reference's TRACE'd CUMALLOC
    # registry (private.h:129-151), at verbosity 3
    for name, arr in (("x", x), ("x_sq", x_sq), ("valid", valid),
                      ("assign0", assign0)):
        logger.trace("alloc %-8s %-14s %-9s %8.1f MB sharded over %d"
                     % (name, arr.shape, arr.dtype, arr.nbytes / 2**20,
                        topo.n))
    return Problem(topo=topo, logger=logger, n=n, n_pad=n_pad,
                   features=features, k=k, metric=metric, chunk=chunk,
                   dtype=dtype, x=x, x_sq=x_sq, valid=valid,
                   assign0=assign0, n_valid=n_valid)
