#!/usr/bin/env python
"""Headline benchmark: end-to-end genotype calling throughput, 1 chip.

Generates a ~30x-coverage simulated diploid pileup (BASELINE config 2),
runs the full pipeline (parse -> dedup -> device kernels -> CSV) for the
default ``local`` method on the real device, and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sites/s", "vs_baseline": N}

vs_baseline is measured against this repo's reference-equivalent
single-threaded C++ baseline binary when built (tools/baseline), else a
documented provisional anchor for the reference sid's parse+call throughput
(BASELINE.md). Component timings go to stderr.
"""

import json
import os
import subprocess
import sys
import time

N_SITES = int(os.environ.get("SIDTPU_BENCH_SITES", "1000000"))
PROVISIONAL_ANCHOR_SITES_PER_SEC = 1.0e6  # see BASELINE.md "anchor" note


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def generate(n_sites):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import numpy as np
    from synth import make_pileup_text_fast

    rng = np.random.default_rng(7)
    # fast vectorized simulation (pi=1e-3, eps=1e-2, ~30x)
    cov = rng.poisson(30, n_sites).clip(1)
    is_het = rng.uniform(size=n_sites) < 1e-3
    major = rng.integers(0, 4, n_sites)
    counts = np.zeros((n_sites, 4), np.int64)
    n_err = rng.binomial(cov, 0.01)
    n_good = cov - n_err
    counts[np.arange(n_sites), major] = n_good
    # heterozygous sites split between two alleles
    het_idx = np.nonzero(is_het)[0]
    second = (major[het_idx] + 1 + rng.integers(0, 3, het_idx.size)) % 4
    half = counts[het_idx, major[het_idx]] // 2
    counts[het_idx, major[het_idx]] -= half
    counts[het_idx, second] += half
    err_base = rng.integers(0, 4, n_sites)
    counts[np.arange(n_sites), err_base] += n_err
    return make_pileup_text_fast(counts.astype(np.int32))


def measure_baseline(pileup_path):
    """Reference-equivalent C++ binary, if built (tools/baseline)."""
    exe = os.path.join(os.path.dirname(__file__), "tools", "baseline", "sid_baseline")
    if not os.path.exists(exe):
        return None
    t0 = time.time()
    subprocess.run(
        [exe, pileup_path], stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        check=True,
    )
    return time.time() - t0


def main():
    import sid_tpu  # noqa: F401
    from sid_tpu.config import Options
    from sid_tpu import engine

    log(f"generating {N_SITES} simulated sites...")
    t0 = time.time()
    text = generate(N_SITES)
    log(f"  generate: {time.time()-t0:.1f}s ({len(text)/1e6:.0f} MB)")

    path = "/tmp/sidtpu_bench.pileup"
    with open(path, "wb") as f:
        f.write(text)

    opts = Options(method="local")
    # warmup with the same input so all kernel shapes are compile-cached
    log("  warmup (compilation)...")
    t0 = time.time()
    engine.run(text, opts)
    log(f"  warmup: {time.time()-t0:.1f}s")

    t0 = time.time()
    csv = engine.run(text, opts)
    elapsed = time.time() - t0
    n_rows = csv.count("\n") - 1
    assert n_rows == N_SITES, (n_rows, N_SITES)
    sites_per_sec = N_SITES / elapsed
    log(f"  end-to-end local: {elapsed:.2f}s -> {sites_per_sec:,.0f} sites/s")

    base_t = measure_baseline(path)
    if base_t is not None:
        anchor = N_SITES / base_t
        log(f"  C++ baseline: {base_t:.2f}s -> {anchor:,.0f} sites/s")
    else:
        anchor = PROVISIONAL_ANCHOR_SITES_PER_SEC
        log("  C++ baseline binary not built; provisional anchor "
            f"{anchor:,.0f} sites/s")

    import jax

    print(
        json.dumps(
            {
                "metric": "local_method_end_to_end_sites_per_sec_1chip",
                "value": round(sites_per_sec),
                "unit": "sites/s",
                "vs_baseline": round(sites_per_sec / anchor, 3),
                "platform": jax.devices()[0].platform,
            }
        )
    )


def _watchdog_main():
    """Run the measurement in a child; on a wedged accelerator (hung remote
    tunnel), kill it and re-measure on the CPU backend so the driver always
    gets a metric. One JSON line on stdout either way."""
    import signal

    budget = int(os.environ.get("SIDTPU_BENCH_TIMEOUT", "900"))
    env = dict(os.environ, SIDTPU_BENCH_CHILD="1")
    child = subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env)
    try:
        rc = child.wait(timeout=budget)
        if rc == 0:
            return 0
        log(f"bench child exited rc={rc}; falling back to CPU")
    except subprocess.TimeoutExpired:
        log(f"bench child exceeded {budget}s (wedged accelerator?); "
            "killing and falling back to CPU")
        child.kill()
        child.wait()
    env = dict(os.environ, SIDTPU_BENCH_CHILD="1", SIDTPU_PLATFORM="cpu")
    rc = subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env).wait()
    return rc


if __name__ == "__main__":
    if os.environ.get("SIDTPU_BENCH_CHILD"):
        platform = os.environ.get("SIDTPU_PLATFORM")
        if platform:
            import jax

            jax.config.update("jax_platforms", platform)
        main()
    else:
        sys.exit(_watchdog_main())
