"""Device topology: the TPU replacement for the reference's multi-GPU runtime.

The reference selects GPUs with a *bitmask* argument (1=dev0, 2=dev1, 3=both,
0=all — reference src/kmcuda.cc:63-137), splits work with a hand-rolled
``distribute()`` planner (private.h:240-273), replicates buffers to every
device (kmcuda.cc:139-170) and broadcasts shard results with pairwise
``cudaMemcpyPeerAsync`` after every kernel phase (CUP2P, private.h:177-183).

Here the same capability is a ``jax.sharding.Mesh`` over the selected
devices with one data-parallel axis:

- ``distribute()``      -> ``NamedSharding(mesh, P(AXIS))`` on the sample axis
- buffer replication    -> ``NamedSharding(mesh, P())``
- CUP2P / host-staged scalar reduction -> ``lax.psum`` inside the step
- P2P enablement ceremony -> nothing; ICI collectives are native

The bitmask API is preserved verbatim, including the error on bits that
address devices that don't exist (kmcuda.cc:72-95; exercised by the
reference's ``device=0xFFFF`` test, test.py:291-295).
"""

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmcuda_tpu.utils.errors import KMTPUNoSuchDevice

#: Name of the data-parallel mesh axis.
AXIS = "dp"


def select_devices(device_mask: int, logger=None) -> list:
    """Decode the reference's device bitmask against ``jax.devices()``.

    mask 0 selects all devices; bit i selects device i.  A set bit beyond
    the available device count raises the NoSuchDevice error, exactly like
    the reference (kmcuda.cc:72-95).
    """
    devices = jax.devices()
    if device_mask == 0:
        selected = list(devices)
    else:
        selected = []
        for i in range(int(device_mask).bit_length()):
            if device_mask >> i & 1:
                if i >= len(devices):
                    raise KMTPUNoSuchDevice(
                        "device mask %#x addresses device %d but only %d "
                        "device(s) exist" % (device_mask, i, len(devices)))
                selected.append(devices[i])
    if logger is not None:
        logger.debug("devices: %s" % ", ".join(str(d) for d in selected))
    return selected


class Topology:
    """A mesh over the selected devices plus sharding helpers.

    A single-device run is just a 1-wide mesh — one code path for every
    device count, unlike the reference's FOR_EACH_DEV loops.
    """

    def __init__(self, devices):
        self.devices = list(devices)
        self.n = len(self.devices)
        self.mesh = Mesh(np.array(self.devices), (AXIS,))

    @classmethod
    def from_device_mask(cls, device_mask: int, logger=None) -> "Topology":
        return cls(select_devices(device_mask, logger))

    # -- shardings ----------------------------------------------------------

    def sharded(self, ndim: int = 1) -> NamedSharding:
        """Sharding with the leading (sample) axis split across the mesh."""
        return NamedSharding(self.mesh, P(AXIS, *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def put_sharded(self, arr) -> jax.Array:
        return jax.device_put(arr, self.sharded(np.ndim(arr)))

    def put_replicated(self, arr) -> jax.Array:
        return jax.device_put(arr, self.replicated())

    def memory_report(self) -> list:
        """Per-device memory lines — the analog of the reference's per-GPU
        ``used/total`` print at verbosity 2 (kmcuda.cc:172-185).  TPU
        backends expose ``Device.memory_stats()``; backends without it
        (CPU) report n/a."""
        lines = []
        for d in self.devices:
            stats = None
            try:
                stats = d.memory_stats()
            except Exception:
                pass
            if not stats or "bytes_in_use" not in stats:
                lines.append("%s: memory stats n/a" % (d,))
                continue
            used = stats["bytes_in_use"] / 2**20
            limit = stats.get("bytes_limit")
            peak = stats.get("peak_bytes_in_use")
            line = "%s: %.0f MB in use" % (d, used)
            if limit:
                line += " / %.0f MB limit" % (limit / 2**20)
            if peak:
                line += " (peak %.0f MB)" % (peak / 2**20)
            lines.append(line)
        return lines

    # -- step wrapping ------------------------------------------------------

    def shard_step(self, fn, in_specs, out_specs, donate_argnums=()):
        """shard_map ``fn`` over the mesh and jit it.

        ``fn`` must already have static parameters bound and accept
        ``axis_name=`` (it receives AXIS so its psums reduce across the
        mesh).
        """
        mapped = jax.shard_map(
            functools.partial(fn, axis_name=AXIS),
            mesh=self.mesh, in_specs=in_specs, out_specs=out_specs)
        return jax.jit(mapped, donate_argnums=donate_argnums)

    def pad_to(self, n: int, chunk: int) -> int:
        """Global padded length: a multiple of n_devices * chunk so every
        shard scans a whole number of chunks (the analog of distribute()'s
        512-byte alignment, private.h:248).  Large inputs pad to 8-chunk
        quanta so bandwidth-bound streaming passes can always fuse 8
        chunks per step (the per-step scan scaffolding otherwise dominates
        them); the extra rows are masked invalid and cost only their
        stream time."""
        base = self.n * chunk
        # prefer the largest quantum whose padding waste stays under 2%:
        # the wide-fused scans want 8 chunks per shard step, but never at
        # the price of streaming meaningfully more rows every iteration
        for mult in (8, 4, 2):
            quantum = base * mult
            padded = -(-n // quantum) * quantum
            if n >= quantum and padded <= 1.02 * n:
                return padded
        return -(-n // base) * base

    def pick_chunk(self, n: int, default_chunk: int) -> int:
        """Shrink the scan chunk for small problems so padding stays sane."""
        per_dev = -(-n // self.n)
        aligned = max(8, -(-per_dev // 8) * 8)
        return min(default_chunk, aligned)
