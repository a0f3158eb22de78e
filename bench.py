#!/usr/bin/env python
"""Headline benchmark: the reference README's 100,000 x 256, k=1024 k-means
run (random init, fp32, tolerance=0.002, 15 iterations — reference
README.md:187-210; kmcuda: 9.2 s on one Titan X, 5.5 s on two).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": kmcuda_s/ours}
vs_baseline > 1 means faster than the reference's single-GPU number.
"""

import json
import sys
import time

import numpy as np

BASELINE_KMCUDA_1GPU_S = 9.2  # README.md:188-191


def main():
    import jax

    from kmcuda_tpu import kmeans_tpu

    import jax.numpy as jnp

    n, f, k, iters = 100_000, 256, 1024, 15
    rng = np.random.RandomState(0)
    # same flavor of synthetic data as the README benchmark: random fp32.
    # Device-resident input (the analog of kmcuda's device-pointer
    # protocol, python.cc:232-278): the timed section is the clustering,
    # not the host link bandwidth.
    samples = jax.device_put(jnp.asarray(rng.rand(n, f), jnp.float32))
    jax.block_until_ready(samples)

    # warmup compile
    kmeans_tpu(samples, k, init="random", seed=1, tolerance=0.002,
               yinyang_t=0, max_iterations=iters, verbosity=0)

    start = time.perf_counter()
    centroids, assignments = kmeans_tpu(
        samples, k, init="random", seed=1, tolerance=0.002, yinyang_t=0,
        max_iterations=iters, verbosity=0)
    jax.block_until_ready(assignments)
    elapsed = time.perf_counter() - start

    print(json.dumps({
        "metric": "kmeans_lloyd_100kx256_k1024_15iter_wall",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_KMCUDA_1GPU_S / elapsed, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
