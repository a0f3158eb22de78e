#!/usr/bin/env python
"""Benchmark matrix mirroring BASELINE.json / the reference README tables.

Prints one JSON line per config as it completes, then a FINAL summary
line carrying the headline metric plus every sub-metric in "extra" (so a
driver that records only the last line still gets the whole matrix):

  {"metric": ..., "value": s, "unit": "s", "vs_baseline": r, "extra": {...}}

vs_baseline > 1 means faster than the reference's published number.
Baselines (reference README.md:188-218):
  - 100K x 256, k=1024, 15 Lloyd iters, fp32: kmcuda 9.2 s (1 Titan X)
  - 8M x 256, k=1024, 1% tolerance: kmcuda 2 GPUs 44 m Lloyd / 36 m Yinyang
  - Yinyang claim: 1.6-2x over (kmcuda's) Lloyd
The spherical and knn configs have no published kmcuda numbers; their
vs_baseline is null and the interesting fields are recall/examined.

All data is generated ON DEVICE (the host link is a slow tunnel) and
every timed section is warmed up first (XLA compile excluded, like the
reference excludes CUDA context setup).
"""

import json
import os
import sys
import time

import numpy as np

BASE_LLOYD_100K = 9.2          # s, 1 GPU (README.md:188-191)
BASE_8M_LLOYD = 44 * 60.0      # s, 2 GPUs (README.md:212-218)
BASE_8M_YY = 36 * 60.0         # s, 2 GPUs

#: KMTPU_BENCH_SMOKE=1 shrinks every config so the full matrix's plumbing
#: (argument paths, log parsing, recall baseline, JSON emission) can be
#: validated on a CPU backend in minutes; timings are then meaningless and
#: vs_baseline must be ignored.  KMTPU_BENCH_CPU=1 additionally forces the
#: CPU backend (the axon env pins JAX_PLATFORMS, so an env override alone
#: does not work — jax.config must be set before first backend use).
SMOKE = os.environ.get("KMTPU_BENCH_SMOKE", "") not in ("", "0")


def _emit(record, extra):
    print(json.dumps(record), flush=True)
    extra[record["metric"]] = {
        "value": record["value"], "unit": record["unit"],
        "vs_baseline": record["vs_baseline"]}


def bench_yy_deep_tail(jax, jnp, kmeans_tpu, extra):
    """Deep-tail Yinyang vs Lloyd (the regime the reference's 1.6-2x claim
    lives in: long runs at tolerance -> 0 where late iterations move
    almost nothing).

    Fixture: 2M x 256 'overlap' clustering — k latent blobs (spread 2.0,
    noise 0.5 sigma, heavily merged) under k=1024.  Chosen by a round-4
    fixture scan: well-separated blobs reach an exact fixed point in a
    few dozen iterations (no tail to measure); uniform data and
    background-contaminated blobs are filter-hostile by concentration of
    measure (true near-boundary candidacy ~30%, which also makes the
    candidate count oscillate around the dense-path threshold — the
    previous 15%-background fixture recorded pure measurement noise);
    merged blobs keep a genuine churn tail alive for ~60 iterations at
    13-26% candidacy.

    Method: converge 15 iterations once from random (also the compile
    warmup), then restart BOTH algorithms from those centroids
    (init=import) with the SAME 45-iteration budget and compare
    whole-run walls (min over 3 trials each — the remote-tunnel
    dispatch jitter is ~10%).  The ratio therefore charges Yinyang its
    full freight: draft, grouping, bound init, controller probes.  The
    marginal per-iteration ratio between the 45- and a 35-iteration
    restart (both real Yinyang budgets, above YY_MIN_REMAINING) is
    recorded alongside as the asymptotic tail rate."""
    n, f, k = (2_000_000, 256, 1024) if not SMOKE else (16_384, 32, 64)
    key = jax.random.key(3)
    kc, kx, ke = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (k, f), jnp.float32) * 2.0
    which = jax.random.randint(kx, (n,), 0, k)
    x = centers[which] + 0.5 * jax.random.normal(ke, (n, f), jnp.float32)
    x = jax.block_until_ready(x)

    import io
    from contextlib import redirect_stdout

    def run(yy, init, iters):
        buf = io.StringIO()
        start = time.perf_counter()
        with redirect_stdout(buf):
            c, _a = kmeans_tpu(x, k, init=init, seed=3, tolerance=0.0,
                               yinyang_t=yy, max_iterations=iters,
                               verbosity=1)
        jax.block_until_ready(c)
        wall = time.perf_counter() - start
        done = sum(1 for l in buf.getvalue().splitlines()
                   if l.startswith("iteration"))
        return c, wall, max(done, 1)

    def best3(yy, init, iters):
        res = [run(yy, init, iters) for _ in range(3)]
        return min(res, key=lambda r: r[1])

    long_it, short_it = (45, 35) if not SMOKE else (8, 5)
    c_tail, _w, _i = run(0.1, "random", 15 if not SMOKE else 4)
    c_tail = jax.block_until_ready(jax.numpy.asarray(c_tail))
    run(0, c_tail, long_it)        # warm the import-init Lloyd path
    run(0.1, c_tail, long_it)      # warm the import-init Yinyang path
    _c, lw_l, li_l = best3(0, c_tail, long_it)
    _c, lw_s, li_s = best3(0, c_tail, short_it)
    _c, yw_l, yi_l = best3(0.1, c_tail, long_it)
    _c, yw_s, yi_s = best3(0.1, c_tail, short_it)
    _emit({"metric": "yy_deep_tail_2mx256_k1024_restart_speedup",
           "value": round(lw_l / yw_l, 3), "unit": "ratio",
           "vs_baseline": None}, extra)
    if li_l > li_s and yi_l > yi_s:
        lspi = (lw_l - lw_s) / (li_l - li_s)
        yspi = (yw_l - yw_s) / (yi_l - yi_s)
        if lspi <= 0 or yspi <= 0:
            # dispatch jitter exceeded the 10-iteration wall delta (tiny
            # smoke shapes): the difference estimator is meaningless,
            # fall back to raw s/it rather than record a negative rate
            lspi, yspi = lw_l / li_l, yw_l / yi_l
    else:  # converged before the long budget: fall back to raw s/it
        lspi, yspi = lw_l / li_l, yw_l / yi_l
    _emit({"metric": "yy_deep_tail_2mx256_k1024_per_iter_speedup",
           "value": round(lspi / yspi, 3), "unit": "ratio",
           "vs_baseline": None}, extra)
    _emit({"metric": "yy_deep_tail_lloyd_s_per_iter",
           "value": round(lspi, 4), "unit": "s",
           "vs_baseline": None}, extra)
    _emit({"metric": "yy_deep_tail_yy_s_per_iter",
           "value": round(yspi, 4), "unit": "s",
           "vs_baseline": None}, extra)


def bench_100k(jax, jnp, kmeans_tpu, extra):
    n, f, k, iters = (100_000, 256, 1024, 15) if not SMOKE else \
                     (8_192, 32, 64, 3)
    # generated ON DEVICE like every other stage: 100 MB through the
    # host tunnel is 25 s when healthy and unbounded when degraded
    samples = jax.random.uniform(jax.random.key(0), (n, f), jnp.float32)
    samples = jax.block_until_ready(samples)

    def run(yy):
        return kmeans_tpu(samples, k, init="random", seed=1,
                          tolerance=0.002, yinyang_t=yy,
                          max_iterations=iters, verbosity=0)

    def timed(yy):
        start = time.perf_counter()
        _c, a = run(yy)
        jax.block_until_ready(a)
        return time.perf_counter() - start

    run(0)  # warmup compile
    run(0.1)
    # min over INTERLEAVED trials: the remote-tunnel dispatch jitter is
    # ~10% between back-to-back identical runs, far above the real
    # lloyd-vs-yinyang delta, and it drifts on a seconds timescale — two
    # separate blocks of trials would hand whichever config ran in the
    # quieter window a spurious win (r4: blocked 3+3 recorded ratios
    # 0.95-1.02 across identical-code runs).  Pairing each lloyd trial
    # with an adjacent yinyang trial decorrelates the drift; the
    # per-config minimum is the standard noise-floor estimator.
    lloyd_t, yy_t = [], []
    for _ in range(5):
        lloyd_t.append(timed(0))
        yy_t.append(timed(0.1))
    lloyd_s, yy_s = min(lloyd_t), min(yy_t)

    _emit({"metric": "kmeans_yinyang_100kx256_k1024_15iter_wall",
           "value": round(yy_s, 4), "unit": "s",
           "vs_baseline": round(BASE_LLOYD_100K / yy_s, 2)}, extra)
    _emit({"metric": "yinyang_over_lloyd_100kx256",
           "value": round(lloyd_s / yy_s, 3), "unit": "ratio",
           "vs_baseline": None}, extra)
    return lloyd_s


def bench_spherical(jax, jnp, kmeans_tpu, extra):
    # BASELINE config: angular metric on L2-normalized embeddings,
    # AFK-MC2 seeding (m=100).  No published kmcuda number.
    n, f, k = (1_000_000, 256, 1024) if not SMOKE else (16_384, 32, 64)
    key = jax.random.key(7)
    x = jax.random.normal(key, (n, f), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    x = jax.block_until_ready(x)

    def run():
        return kmeans_tpu(x, k, init=("afkmc2", 100), seed=7, metric="cos",
                          tolerance=0.01, yinyang_t=0, verbosity=0)

    start = time.perf_counter()
    run()
    cold_s = time.perf_counter() - start   # XLA compile + first run
    start = time.perf_counter()
    _c, a = run()
    jax.block_until_ready(a)
    sph_s = time.perf_counter() - start
    _emit({"metric": "spherical_afkmc2_1mx256_k1024_wall",
           "value": round(sph_s, 3), "unit": "s",
           "vs_baseline": None}, extra)
    _emit({"metric": "spherical_afkmc2_cold_compile_plus_run",
           "value": round(cold_s, 3), "unit": "s",
           "vs_baseline": None}, extra)

    return x


def bench_second_process(jax, extra):
    """Second-process cold start with a populated compilation cache
    (VERDICT r3 weak #5): bench_spherical already compiled this config in
    this process, so a fresh process running it again should pay backend
    init + cache loads instead of the full XLA compile.  The subprocess
    times exactly the kmeans_tpu call.

    MUST run as the LAST stage: the axon tunnel serializes concurrent
    clients so brutally that a subprocess sharing the chip with this
    (idle) parent measures contention, not the cache — 66 s for a smoke
    kmeans that takes 1.6 s solo, measured r4.  clear_backends() hands
    the chip back before spawning; every live jax.Array in this process
    dies with the client, so no stage may follow this one."""
    n, f, k = (1_000_000, 256, 1024) if not SMOKE else (16_384, 32, 64)
    import subprocess
    try:
        import jax.extend.backend as jexb

        jexb.clear_backends()
    except Exception as e:
        print(json.dumps({"metric": "spherical_afkmc2_second_process_cold"
                          "_cached", "error": "clear_backends: "
                          + str(e)[:160]}), flush=True)
        return
    code = (
        "import os, time, json\n"
        "import jax, jax.numpy as jnp\n"
        "from kmcuda_tpu import kmeans_tpu\n"
        "n, f, k = %d, %d, %d\n"
        "key = jax.random.key(7)\n"
        "x = jax.random.normal(key, (n, f), jnp.float32)\n"
        "x = x / jnp.linalg.norm(x, axis=1, keepdims=True)\n"
        "x = jax.block_until_ready(x)\n"
        "t0 = time.perf_counter()\n"
        "c, a = kmeans_tpu(x, k, init=('afkmc2', 100), seed=7,\n"
        "                  metric='cos', tolerance=0.01, yinyang_t=0)\n"
        "jax.block_until_ready(a)\n"
        "print(json.dumps({'wall': time.perf_counter() - t0}))\n"
        % ((n, f, k)))
    try:
        # best of two fresh processes: a single sample conflates cache
        # effectiveness with transient tunnel degradation (r4: one run
        # recorded 111 s where the steady state is ~7 s)
        walls = []
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=900, env=os.environ.copy(),
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            walls.append(float(json.loads(line)["wall"]))
        _emit({"metric": "spherical_afkmc2_second_process_cold_cached",
               "value": round(min(walls), 3), "unit": "s",
               "vs_baseline": None}, extra)
    except Exception as e:  # cache miss/unsupported backend: record why
        print(json.dumps({"metric": "spherical_afkmc2_second_process_cold"
                          "_cached", "error": str(e)[:200]}), flush=True)


def bench_knn(jax, jnp, kmeans_tpu, knn_tpu, extra):
    # BASELINE config: k-NN k=16 over a pre-clustered 1M x 256 set.
    n, f, k, kn = (1_000_000, 256, 1024, 16) if not SMOKE else \
                  (16_384, 32, 64, 8)
    key = jax.random.key(11)
    kc, kx, ke = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (k, f), jnp.float32) * 10.0
    which = jax.random.randint(kx, (n,), 0, k)
    x = centers[which] + 0.5 * jax.random.normal(ke, (n, f), jnp.float32)
    x = jax.block_until_ready(x)
    # AFK-MC2 seeding: random init leaves ~1/e of the latent blobs
    # unseeded at k=1024, and the resulting merged clusters have radii
    # comparable to inter-blob distances, which defeats the triangle
    # -inequality cutoff (measured: examined fraction 0.36 random vs
    # 0.033 afkmc2, knn wall 16.2 s vs 5.3 s).  The metric is about the
    # search, so give it sane cluster structure.
    c, a = kmeans_tpu(x, k, init=("afkmc2", 200), seed=11, tolerance=0.01,
                      yinyang_t=0, verbosity=0)

    import io
    from contextlib import redirect_stdout

    knn_tpu(kn, x, c, a)  # warmup
    buf = io.StringIO()
    start = time.perf_counter()
    with redirect_stdout(buf):
        nb = knn_tpu(kn, x, c, a, verbosity=1)
    jax.block_until_ready(nb)
    knn_s = time.perf_counter() - start
    frac = [float(l.split()[1]) for l in buf.getvalue().splitlines()
            if l.startswith("calculated ")][-1]

    # recall@16 against on-device brute force over a query subsample.
    # x and qi are ARGUMENTS, not closures: a closed-over 1M x 256 array
    # is embedded into the HLO as a literal and the tunnel's
    # remote-compile RPC rejects the GB-sized request body (HTTP 413).
    # Chunked so the (nq, n) distance block stays ~1 GB.  The baseline
    # matmul MUST be Precision.HIGHEST: this data has |x|^2 ~ 17000 vs
    # nearest-neighbor d^2 ~ 128, and a default (bf16-input) MXU dot-form
    # baseline mis-ranks ~30% of true neighbors — the library's own
    # scores run at HIGHEST for fp32 inputs (ops/distance.mm_precision).
    # The brute force keeps a 3x candidate window (kc) so the fp64 tie
    # adjudication below always sees the true top-kn even when the
    # dot-form ranking reorders near-ties around the boundary.
    nq, qc = (1024, 256) if not SMOKE else (256, 128)
    kc = 3 * kn

    @jax.jit
    def exact_top(xq, qi, x):
        def chunk(carry, inp):
            xqb, qib = inp
            prod = jnp.dot(xqb, x.T,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            sq = (jnp.sum(xqb * xqb, 1)[:, None]
                  + jnp.sum(x * x, 1)[None, :] - 2.0 * prod)
            sq = sq.at[jnp.arange(qc), qib].set(jnp.inf)
            _d, idx = jax.lax.top_k(-sq, kc)
            return carry, idx
        _, idx = jax.lax.scan(
            chunk, None, (xq.reshape(nq // qc, qc, -1),
                          qi.reshape(nq // qc, qc)))
        return idx.reshape(nq, kc)

    qi = jax.random.permutation(jax.random.key(13), n)[:nq]
    xq = x[qi]
    exact = np.asarray(exact_top(xq, qi, x))
    got = np.asarray(nb)[np.asarray(qi)]
    # strict index recall (the r3 metric): counts a slot as a miss even
    # when the returned id is a genuine distance tie of the true one
    recall = float(np.mean([
        len(set(exact[i, :kn]) & set(got[i])) / kn for i in range(nq)]))

    # tie-aware adjudication (VERDICT r3 weak #2): the library's contract
    # is "exact up to fp32 distance ties".  Rescore every candidate in
    # fp64 on host (union of the brute-force window and the returned
    # ids), build the TRUE sorted top-kn distance profile, and accept a
    # returned slot iff its fp64 distance is within one fp32 tie window
    # of the true profile's slot.  A genuinely dropped neighbor (replaced
    # by a farther point beyond rounding) fails the window.
    union = np.concatenate([exact, got], axis=1)       # (nq, kc + kn)
    xg = np.asarray(jax.device_get(x[jnp.asarray(union.reshape(-1))])
                    ).astype(np.float64).reshape(nq, union.shape[1], f)
    xq64 = np.asarray(jax.device_get(xq)).astype(np.float64)
    d64 = np.sqrt(((xg - xq64[:, None, :]) ** 2).sum(-1))
    # dedupe: the union may list an id twice (once from each source);
    # mask duplicates to inf so they cannot occupy two profile slots
    order = np.argsort(union, axis=1, kind="stable")
    dup = np.zeros_like(d64, dtype=bool)
    srt = np.take_along_axis(union, order, axis=1)
    dupsrt = np.zeros_like(dup)
    dupsrt[:, 1:] = srt[:, 1:] == srt[:, :-1]
    np.put_along_axis(dup, order, dupsrt, axis=1)
    d64u = np.where(dup, np.inf, d64)
    true_prof = np.sort(np.sort(d64u, axis=1)[:, :kn], axis=1)
    got_prof = np.sort(d64[:, kc:], axis=1)            # returned ids' d64
    ok = got_prof <= true_prof * (1.0 + 1e-5) + 1e-6
    tie_recall = float(np.mean(ok))

    _emit({"metric": "knn16_1mx256_k1024_wall",
           "value": round(knn_s, 3), "unit": "s",
           "vs_baseline": None}, extra)
    _emit({"metric": "knn16_1mx256_recall_at_16",
           "value": round(recall, 5), "unit": "recall",
           "vs_baseline": None}, extra)
    _emit({"metric": "knn16_1mx256_tie_aware_recall_at_16",
           "value": round(tie_recall, 6), "unit": "recall",
           "vs_baseline": None}, extra)
    _emit({"metric": "knn16_1mx256_examined_fraction",
           "value": round(frac, 5), "unit": "fraction",
           "vs_baseline": None}, extra)


def bench_8m_bf16(jax, jnp, kmeans_tpu, extra):
    # BASELINE config: 8M x 256 @ k=1024, 1% reassignment tolerance,
    # k-means++ init like the reference's 93-iteration run
    # (README.md:212-218), fp16-mode (bf16 storage here).  kmcuda: 44 m
    # Lloyd / 36 m Yinyang on TWO GPUs.  Iteration count and s/iteration
    # are recorded alongside wall (VERDICT r3 weak #3): the wall ratio
    # compares whole runs at possibly different iteration counts (init
    # quality and the bf16 churn floor both move ours); the per-iteration
    # ratio (reference: 2640 s / 93 it = 28.4 s/it) compares like work.
    n, f, k = (8_000_000, 256, 1024) if not SMOKE else (32_768, 32, 64)
    x = jax.random.uniform(jax.random.key(17), (n, f), jnp.bfloat16)
    x = jax.block_until_ready(x)

    import io
    from contextlib import redirect_stdout

    def run(cap=None):
        buf = io.StringIO()
        with redirect_stdout(buf):
            c, a = kmeans_tpu(x, k, init="k-means++", seed=17,
                              tolerance=0.01, yinyang_t=0, verbosity=1,
                              max_iterations=cap)
        iters = sum(1 for l in buf.getvalue().splitlines()
                    if l.startswith("iteration"))
        jax.block_until_ready(a)
        return a, iters

    run()
    start = time.perf_counter()
    a, iters = run()
    s8m = time.perf_counter() - start
    spi = s8m / max(iters, 1)
    # phase split (VERDICT r4 weak #3): the aggregate s/it conflates the
    # O(k) sequential k-means++ init — 1023 full-data passes at the HBM
    # read floor, ~45% of the wall — with the Lloyd loop, whose fused
    # kernel runs at ~2/3 MFU.  A 1-iteration run isolates the fixed
    # prep+init cost; the difference per iteration is the loop rate.
    start = time.perf_counter()
    run(cap=1)
    s8m_init = time.perf_counter() - start
    loop_spi = max(s8m - s8m_init, 0.0) / max(iters - 1, 1)
    _emit({"metric": "kmeans_8mx256_k1024_bf16_tol1pct_wall",
           "value": round(s8m, 3), "unit": "s",
           "vs_baseline": round(BASE_8M_LLOYD / s8m, 2)}, extra)
    _emit({"metric": "kmeans_8mx256_iterations",
           "value": iters, "unit": "iterations",
           "vs_baseline": round(iters / 93.0, 3)}, extra)
    _emit({"metric": "kmeans_8mx256_s_per_iteration",
           "value": round(spi, 4), "unit": "s",
           "vs_baseline": round((BASE_8M_LLOYD / 93.0) / spi, 2)}, extra)
    _emit({"metric": "kmeans_8mx256_prep_init_wall",
           "value": round(s8m_init, 3), "unit": "s",
           "vs_baseline": None}, extra)
    _emit({"metric": "kmeans_8mx256_loop_s_per_iteration",
           "value": round(loop_spi, 4), "unit": "s",
           "vs_baseline": round((BASE_8M_LLOYD / 93.0) / loop_spi, 2)
           if loop_spi > 0 else None}, extra)


def _first_contact(jax):
    """Force backend init + one tiny op with retries: a transient tunnel
    failure at the very first JAX op must not zero the whole run (it did
    in round 2 — BENCH_r02.json rc=1, parsed null).  Backoff and a
    backend reset between tries give a flapping link time to recover."""
    import jax.numpy as jnp

    for trial in range(1, 6):
        try:
            jax.block_until_ready(
                jnp.ones((8, 8), jnp.float32) @ jnp.ones((8, 8), jnp.float32))
            return
        except Exception as e:
            print(json.dumps({"metric": "backend_init", "try": trial,
                              "error": str(e)[:200]}), flush=True)
            if trial == 5:
                raise
            time.sleep(10 * trial)
            try:
                import jax.extend.backend as jexb
                jexb.clear_backends()
            except Exception:
                pass


def main():
    # persistent XLA compilation cache for this process AND the
    # second-process cold-start measurement (must be set before the
    # kmcuda_tpu import, which configures jax from it)
    os.environ.setdefault(
        "KMTPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    import jax

    if os.environ.get("KMTPU_BENCH_CPU", "") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_enable_async_dispatch", False)
    import jax.numpy as jnp

    from kmcuda_tpu import kmeans_tpu, knn_tpu

    extra = {}
    failed = []

    def attempt(name, fn, *args, tries=3):
        # retries with backoff: the TPU tunnel's remote-compile RPC can
        # drop a long-running connection ("Broken pipe"); a retry hits
        # warm server-side state and usually succeeds.  Metrics are
        # flushed as they land, so a later crash keeps earlier results.
        for trial in range(1, tries + 1):
            try:
                return fn(*args)
            except Exception as e:
                print(json.dumps({"metric": name, "try": trial,
                                  "error": str(e)[:200]}), flush=True)
                if trial < tries:
                    time.sleep(10 * trial)
        failed.append(name)
        return None

    attempt("backend_init", _first_contact, jax, tries=1)
    lloyd_s = attempt("kmeans_lloyd_100kx256_k1024_15iter_wall",
                      bench_100k, jax, jnp, kmeans_tpu, extra)
    attempt("yy_deep_tail_2mx256_k1024_restart_speedup",
            bench_yy_deep_tail, jax, jnp, kmeans_tpu, extra)
    attempt("spherical_afkmc2_1mx256_k1024_wall",
            bench_spherical, jax, jnp, kmeans_tpu, extra)
    attempt("knn16_1mx256_k1024_wall",
            bench_knn, jax, jnp, kmeans_tpu, knn_tpu, extra)
    attempt("kmeans_8mx256_k1024_bf16_tol1pct_wall",
            bench_8m_bf16, jax, jnp, kmeans_tpu, extra)
    # LAST: releases this process's backend client (clear_backends) so
    # the fresh process measures the compile cache, not chip contention
    attempt("spherical_afkmc2_second_process_cold_cached",
            bench_second_process, jax, extra, tries=1)

    if failed:
        extra["failed"] = failed
    # the headline line LAST, carrying the whole matrix in "extra".  If the
    # headline config itself never succeeded, still emit a summary line so
    # partial results are captured; null value marks the gap explicitly.
    print(json.dumps({
        "metric": "kmeans_lloyd_100kx256_k1024_15iter_wall",
        "value": round(lloyd_s, 4) if lloyd_s is not None else None,
        "unit": "s",
        "vs_baseline": (round(BASE_LLOYD_100K / lloyd_s, 2)
                        if lloyd_s else None),
        "extra": extra,
    }), flush=True)
    # exit 0 when the headline landed (sub-benchmark failures are visible
    # in extra["failed"]); nonzero only when the headline itself is dead
    return 0 if lloyd_s is not None else 1


if __name__ == "__main__":
    sys.exit(main())
