"""Backend capability probe.

The attached TPU may be reached through the ``axon`` terminal plugin,
which registers its platform under the name "axon" while aliasing the
"tpu" MLIR lowering rules table (so Mosaic/Pallas kernels compile on
it).  ``jax.default_backend()`` therefore returns "axon", not "tpu" —
any gate written as ``default_backend() == "tpu"`` silently disables
every Pallas kernel on that chip.  Use :func:`on_tpu` instead.
"""


def on_tpu() -> bool:
    """True when the active backend compiles Mosaic (TPU) kernels."""
    import jax

    return jax.default_backend() in ("tpu", "axon")
