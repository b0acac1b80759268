#!/usr/bin/env python
"""Headline benchmark: end-to-end genotype calling throughput, 1 chip.

Generates a ~30x-coverage simulated diploid pileup (BASELINE config 2) and
runs the full pipeline (parse -> dedup -> device kernels -> CSV) for all
four calling methods on the real device, interleaved with the
reference-equivalent single-threaded C++ baseline binary so each pair shares
the same machine state. Reports the median of K interleaved pairs (the
2-core host swings +-30%; medians of same-run pairs are the honest
comparison, BASELINE.md).

Prints ONE JSON line on stdout:
    {"metric": "local_...", "value": N, "unit": "sites/s",
     "vs_baseline": N, "methods": {<per-method medians and ratios>}}
Per-method JSON lines and component timings go to stderr.

vs_baseline is measured against this repo's reference-equivalent
single-threaded C++ baseline (tools/baseline, all four methods) when built,
else a documented provisional anchor (BASELINE.md).
"""

import json
import os
import statistics
import subprocess
import sys
import time

# SMOKE mode (tests/test_bench_stdout.py): tiny input, 1 round, no grammar-rich
# config, no device-forced legs, no microbench — just enough to exercise the
# end-to-end measurement loop and the stdout contract in seconds on CPU.
SMOKE = bool(os.environ.get("SIDTPU_BENCH_SMOKE"))
N_SITES = int(os.environ.get("SIDTPU_BENCH_SITES", "5000" if SMOKE else "1000000"))
BWA_SITES = int(os.environ.get("SIDTPU_BENCH_BWA_SITES", "1000000"))
ROUNDS = int(os.environ.get("SIDTPU_BENCH_ROUNDS", "1" if SMOKE else "3"))
PROVISIONAL_ANCHOR_SITES_PER_SEC = 1.0e6  # see BASELINE.md "anchor" note

# (method, baseline argv flags, Options kwargs)
METHODS = [
    ("local", [], {}),
    ("quality", ["-m", "quality"], {"method": "quality"}),
    ("bayes", ["-m", "bayes"], {"method": "bayes"}),
    # -R -m likelihood_ratio is the reference thesis-pipeline config
    ("likelihood_ratio", ["-R", "-m", "likelihood_ratio"],
     {"method": "likelihood_ratio", "estimate_prior": True}),
]


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


def generate_bwa(n_sites):
    """Grammar-rich input (BWA/samtools artifact mix): indels, ^X/$ markers,
    '*', N refs, Phred variance — the AVX2 escape fallback and the fused
    terms-only path run for real. Seeded + slow to build, so cached on disk.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    cache = f"/tmp/sidtpu_bench_bwa_{n_sites}.pileup"
    if os.path.exists(cache) and os.path.getsize(cache) > 0:
        with open(cache, "rb") as f:
            return f.read(), cache
    from synth import make_bwa_like_pileup_scaled

    text = make_bwa_like_pileup_scaled(n_sites)
    with open(cache, "wb") as f:
        f.write(text)
    return text, cache


def baseline_exe():
    exe = os.path.join(os.path.dirname(__file__), "tools", "baseline", "sid_baseline")
    return exe if os.path.exists(exe) else None


def measure_baseline(exe, flags, pileup_path):
    t0 = time.time()
    subprocess.run(
        [exe] + flags + [pileup_path], stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, check=True,
    )
    return time.time() - t0


def _measure_config(label, text, path, n_sites, rounds=ROUNDS,
                    extra_opts=None, env=None, with_baseline=True):
    """Interleaved ours/baseline medians for one input config.

    Each of our runs records the per-stage wall (parse/call/serialize) and
    the device split (device-stage seconds + dispatch count), so the JSON
    carries device_fraction — the accelerator's actual share of the
    end-to-end wall (verdict-r2 #4: keep the host-vs-device story visible).

    ``extra_opts``/``env`` parameterize forced-device configs
    (mesh_devices=1, SIDTPU_DEVICE_PREC=ds); ``with_baseline=False`` skips
    the C++ baseline re-runs (the caller reuses the default config's
    baseline medians — the input is identical).
    """
    from sid_tpu.config import Options
    from sid_tpu import engine
    from sid_tpu.utils import profiling

    saved_env = {}
    for k, v in (env or {}).items():
        saved_env[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        return _measure_config_inner(
            label, text, path, n_sites, rounds, extra_opts or {}, with_baseline
        )
    finally:
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _measure_config_inner(label, text, path, n_sites, rounds, extra_opts,
                          with_baseline):
    from sid_tpu.config import Options
    from sid_tpu import engine
    from sid_tpu.utils import profiling

    opts = {m: Options(**{**kw, **extra_opts}) for m, _, kw in METHODS}

    log(f"  [{label}] warmup (compilation)...")
    for m, _, _ in METHODS:
        t0 = time.time()
        engine.run(text, opts[m], binary=True)
        log(f"  [{label}] warmup {m}: {time.time()-t0:.1f}s")

    exe = baseline_exe() if with_baseline else None
    if exe is None and with_baseline:
        log("  C++ baseline binary not built; provisional anchor "
            f"{PROVISIONAL_ANCHOR_SITES_PER_SEC:,.0f} sites/s")

    ours = {m: [] for m, _, _ in METHODS}
    base = {m: [] for m, _, _ in METHODS}
    dev_s = {m: [] for m, _, _ in METHODS}
    disp = {m: [] for m, _, _ in METHODS}
    stage_acc = {m: {} for m, _, _ in METHODS}
    expected_rows = {}
    for r in range(rounds):
        for m, flags, _ in METHODS:
            prof = profiling.StageProfile()
            profiling.activate(prof)
            t0 = time.time()
            csv = engine.run(text, opts[m], binary=True)
            ours[m].append(time.time() - t0)
            profiling.activate(None)
            dev_s[m].append(profiling.device_seconds(prof))
            disp[m].append(int(prof.counters.get("device_dispatches", 0)))
            for name, sec in prof.stages:
                stage_acc[m].setdefault(name, []).append(sec)
            n_rows = csv.count(b"\n") - 1
            if m in expected_rows:
                assert n_rows == expected_rows[m], (m, n_rows)
            else:
                expected_rows[m] = n_rows
                assert 0 < n_rows <= n_sites, (m, n_rows)
            if exe is not None:
                base[m].append(measure_baseline(exe, flags, path))
            log(f"  [{label}] round {r+1} {m}: ours {ours[m][-1]:.2f}s "
                f"(device {dev_s[m][-1]:.3f}s/{disp[m][-1]} dispatches)"
                + (f", baseline {base[m][-1]:.2f}s" if exe else ""))

    methods_out = {}
    for m, _, _ in METHODS:
        t_ours = statistics.median(ours[m])
        sps = n_sites / t_ours
        if exe is not None:
            anchor = n_sites / statistics.median(base[m])
        else:
            anchor = PROVISIONAL_ANCHOR_SITES_PER_SEC
        t_dev = statistics.median(dev_s[m])
        stages = {
            name: round(statistics.median(vals), 4)
            for name, vals in stage_acc[m].items()
        }
        methods_out[m] = {
            "sites_per_sec": round(sps),
            "baseline_sites_per_sec": round(anchor),
            "vs_baseline": round(sps / anchor, 3),
            "device_seconds": round(t_dev, 4),
            "device_fraction": round(t_dev / t_ours, 4) if t_ours else 0.0,
            "device_dispatches": disp[m][-1],
            "stages": stages,
        }
        log(f"  [{label}] {m}: {round(sps):,} sites/s, device "
            f"{t_dev:.3f}s ({100*t_dev/t_ours:.0f}%), stages {stages}")
    return methods_out


def _device_microbench():
    """Per-kernel device throughput at the 1M-row bucket + fit iteration rate.

    Measures the mesh-sharded executables the device-forced e2e runs use
    (sid_tpu.utils.warmup.microbench_kernels): the slim local classify and
    the quality finalize, f64 vs double-single. Two numbers per kernel:

    - ``per_dispatch_wall_s``: median wall of one dispatch on device-resident
      inputs — what one classify costs the pipeline end-to-end through this
      container's remote tunnel (includes the ~60 ms dispatch floor).
    - ``per_execution_s``: kernel execution time proper, measured by running
      the kernel K times inside ONE dispatch (on-device fori_loop with a
      value-preserving data dependency, warmup.make_looped_kernel) at two
      loop lengths and differencing: (wall(K2) - wall(K1)) / (K2 - K1). The
      dispatch floor, transfers and host overhead cancel exactly; this is
      the number the MFU figure divides into.

    FLOPs come from XLA's cost analysis of the single-dispatch optimized
    module (HLO-level op counts — for emulated f64 this counts pre-expansion
    f64 ops, so the f64 number understates executed hardware work);
    mfu_vs_bf16_peak divides by the chip's published dense bf16 peak
    (v5e: 197 TFLOP/s) as a conservative utilization yardstick for the f32
    VPU path.
    """
    import statistics as stats

    import jax

    from sid_tpu.utils.warmup import (
        LOOP_K_BIG,
        LOOP_K_SMALL,
        MICROBENCH_U,
        make_looped_kernel,
        microbench_inputs,
        microbench_kernels,
    )

    bf16_peak = 197e12
    out = {}
    if jax.default_backend() != "cpu" and not os.environ.get(
        "SIDTPU_BENCH_PALLAS"
    ):
        # the honest record for the Mosaic prototype on THIS platform
        # (see warmup._pallas_microbench_entries for the measurement)
        out["local_log_likelihoods_pallas"] = {
            "skipped": "axon remote compiler rejects Mosaic payloads "
            "(HTTP 500 tpu_compile_helper, r5 warm-cache; minimal "
            "pallas_call hangs >300s) — opt in with SIDTPU_BENCH_PALLAS=1 "
            "on hardware with a local Mosaic toolchain",
        }
    import numpy as np

    def sync(x):
        """Reliable completion barrier: fetch one element to host.

        jax.block_until_ready is NOT a completion barrier on the axon
        backend (measured r5: after heavy async queuing it returned in
        0.2 ms while the dispatched 1M-row kernel plus 200 MB of pending
        device_puts took 45 s to actually finish — ready events appear to
        fire at enqueue). An 8-byte d2h fetch cannot complete before the
        producing computation has, so every timed region below ends with
        one; the constant fetch round trip cancels in the two-point loop
        differencing.
        """
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)

    # Distinct-content input variants (same shapes/dtypes -> one executable):
    # every timed call below runs on buffers no prior call of that executable
    # has seen — repeat execution on identical buffers returned in ~0.3 ms
    # (a served result, not a re-execution; r5). Each variant is drained
    # (fetch-synced) BEFORE any timing so pending uploads can't leak into a
    # timed region.
    n_variants = 6
    variants = [microbench_inputs(seed=i) for i in range(n_variants)]
    for v in variants:
        for leaf in jax.tree_util.tree_leaves(v):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)
    args = variants[0]
    for name, fn in microbench_kernels():
        try:
            sync(fn(args))  # compile/warm (variant 0)
        except Exception as exc:
            # a kernel that fails to lower on this platform (e.g. the Mosaic
            # prototype) becomes an honest microbench row, not a crash
            out[name] = {"error": str(exc)[:300]}
            log(f"  [micro] {name}: FAILED {str(exc)[:200]}")
            continue
        times = []
        for r in range(5):
            v = variants[1 + r % (n_variants - 1)]
            t0 = time.perf_counter()
            sync(fn(v))
            times.append(time.perf_counter() - t0)
        t_dispatch = stats.median(times)

        # per-execution via the two-point on-device loop
        t_loop = {}
        for k in (LOOP_K_SMALL, LOOP_K_BIG):
            looped = make_looped_kernel(fn, k)
            sync(looped(args))  # compile/warm (variant 0)
            samples = []
            for r in range(3):
                v = variants[1 + r]
                t0 = time.perf_counter()
                sync(looped(v))
                samples.append(time.perf_counter() - t0)
            t_loop[k] = stats.median(samples)
        t_exec = max(
            (t_loop[LOOP_K_BIG] - t_loop[LOOP_K_SMALL])
            / (LOOP_K_BIG - LOOP_K_SMALL),
            1e-9,
        )
        entry = {
            "rows": MICROBENCH_U,
            "per_dispatch_wall_s": round(t_dispatch, 5),
            "per_execution_s": round(t_exec, 6),
            "loop_walls_s": {
                str(k): round(v, 5) for k, v in sorted(t_loop.items())
            },
            "rows_per_sec_execution": round(MICROBENCH_U / t_exec),
            "rows_per_sec_dispatch": round(MICROBENCH_U / t_dispatch),
        }
        try:
            cost = jax.jit(fn).lower(args).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0))
            entry["hlo_flops"] = flops
            entry["hlo_flops_per_sec_execution"] = round(flops / t_exec)
            entry["mfu_vs_bf16_peak"] = round(flops / t_exec / bf16_peak, 6)
        except Exception as exc:  # cost analysis is best-effort
            entry["cost_analysis_error"] = str(exc)[:120]
        out[name] = entry
        log(f"  [micro] {name}: {entry}")

    # fit iteration rate at the production 8192 bucket, f64 vs ds, through
    # the same sharded path the device-forced e2e uses (fit_lynch_global)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(1)
    u = 2000
    profiles = rng.multinomial(30, [0.85, 0.08, 0.05, 0.02], (u,)).astype(np.int32)
    mult = rng.integers(1, 1000, u).astype(np.int64)
    from sid_tpu.parallel.fit import fit_lynch_global
    from sid_tpu.parallel.mesh import make_site_mesh

    mesh = make_site_mesh(1)
    fit_precs = ("f64", "ds") if (
        jax.default_backend() != "cpu" or os.environ.get("SIDTPU_BENCH_DS")
    ) else ("f64",)
    for prec in fit_precs:
        saved = os.environ.get("SIDTPU_DEVICE_PREC")
        os.environ["SIDTPU_DEVICE_PREC"] = prec
        try:
            fit_lynch_global(profiles, mult, mesh)  # compile/warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                pi, eps, _, _, _ = fit_lynch_global(profiles, mult, mesh)
                times.append(time.perf_counter() - t0)
        finally:
            if saved is None:
                os.environ.pop("SIDTPU_DEVICE_PREC", None)
            else:
                os.environ["SIDTPU_DEVICE_PREC"] = saved
        t = stats.median(times)
        out[f"fit_lynch_{prec}"] = {
            "unique_profiles": u,
            "pad_bucket": 8192,
            "seconds": round(t, 4),
            "pi": pi,
            "eps": eps,
        }
        log(f"  [micro] fit_lynch_{prec}: {out[f'fit_lynch_{prec}']}")
    return out


def _start_device_keepalive():
    """Tiny dispatch every 45 s for the life of the bench.

    The axon tunnel's device connection can die silently after long idle
    stretches: at default flags the clean/bwa configs do zero device work
    (~25 min host-only), after which the first device_put of the
    device-forced section hung indefinitely (observed r4). A 1 ms heartbeat
    keeps the connection exercised; the noise it adds is far below the
    +-30% host variance.
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return

    # synchronous first ROUND TRIP (d2h fetch, not block_until_ready — the
    # latter is not a completion barrier on this backend, CLAUDE.md): if the
    # device is unreachable, fail loudly NOW (the watchdog falls back to
    # CPU) instead of hanging 25 minutes in
    import numpy as _np

    t0 = time.time()
    _np.asarray(jnp.zeros(128)[:1])
    log(f"  device probe ok ({time.time() - t0:.2f}s, {jax.devices()[0]})")

    # the heartbeat itself is the shared implementation (one thread per
    # process even when engine.call_batch also starts it; ADVICE r4 #2)
    from sid_tpu.utils.keepalive import ensure_device_keepalive

    ensure_device_keepalive()


def main():
    import sid_tpu  # noqa: F401

    _start_device_keepalive()
    log(f"generating {N_SITES} simulated sites...")
    t0 = time.time()
    text = generate(N_SITES)
    log(f"  generate: {time.time()-t0:.1f}s ({len(text)/1e6:.0f} MB)")
    path = "/tmp/sidtpu_bench.pileup"
    with open(path, "wb") as f:
        f.write(text)

    if not SMOKE:
        log(f"generating {BWA_SITES} grammar-rich (BWA-artifact) sites...")
        t0 = time.time()
        bwa_text, bwa_path = generate_bwa(BWA_SITES)
        log(f"  generate/load: {time.time()-t0:.1f}s ({len(bwa_text)/1e6:.0f} MB)")

    # forced-device configs FIRST (verdict-r3 #1): the same clean input with
    # every stage on the accelerator (mesh_devices=1 engages the sharded
    # kernels and the device psum fit — the multi-chip path, measured on one
    # chip), at emulated-f64 and double-single f32 precision. Device work
    # runs at the head of the process: the tunnel's device claim has been
    # observed to go unusable after long host-only stretches, and the
    # device-first order is the pattern that reliably works.
    import jax as _jax

    dev_rounds = int(os.environ.get("SIDTPU_BENCH_DEV_ROUNDS", "2"))
    # the ds legs exist for the accelerator; on the CPU fallback their
    # LLVM compiles cost minutes for kernels no CPU run uses by default
    precs = ("f64", "ds") if (
        _jax.default_backend() != "cpu" or os.environ.get("SIDTPU_BENCH_DS")
    ) else ("f64",)
    device_forced = {}
    if not SMOKE:
        for prec in precs:
            device_forced[prec] = _measure_config(
                f"device_{prec}", text, path, N_SITES, rounds=dev_rounds,
                extra_opts={"mesh_devices": 1},
                env={"SIDTPU_DEVICE_PREC": prec}, with_baseline=False,
            )

    micro = {} if SMOKE else _device_microbench()

    methods_out = _measure_config("clean", text, path, N_SITES)
    bwa_out = {} if SMOKE else _measure_config("bwa_mix", bwa_text, bwa_path, BWA_SITES)

    # vs_baseline for the forced-device legs reuses the clean config's
    # baseline medians (identical input and flags)
    for prec in device_forced:
        for m in device_forced[prec]:
            anchor = methods_out[m]["baseline_sites_per_sec"]
            device_forced[prec][m]["baseline_sites_per_sec"] = anchor
            device_forced[prec][m]["vs_baseline"] = round(
                device_forced[prec][m]["sites_per_sec"] / anchor, 3
            )

    import jax

    platform = jax.devices()[0].platform
    for m, _, _ in METHODS:
        log(json.dumps({"metric": f"{m}_end_to_end_sites_per_sec_1chip",
                        "value": methods_out[m]["sites_per_sec"],
                        "unit": "sites/s",
                        "vs_baseline": methods_out[m]["vs_baseline"],
                        "platform": platform}))

    head = methods_out["local"]
    detail = {
        "metric": "local_method_end_to_end_sites_per_sec_1chip",
        "value": head["sites_per_sec"],
        "unit": "sites/s",
        "vs_baseline": head["vs_baseline"],
        "platform": platform,
        "rounds": ROUNDS,
        "methods": methods_out,
        "methods_bwa_mix": bwa_out,
        "device_forced": device_forced,
        "device_microbench": micro,
    }
    detail_path = os.environ.get(
        "SIDTPU_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_detail.json"),
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        log(f"full detail written to {detail_path}")
    except OSError as exc:
        log(f"could not write detail file: {exc}")
    log(json.dumps(detail))  # full record on stderr too

    # stdout contract: EXACTLY ONE compact JSON line (< ~1 KB). The driver
    # records only a 2000-char tail of the output and json-parses its last
    # line; rounds 3-4 fattened this line past 2000 chars (methods_bwa_mix,
    # device_forced, microbench) so the tail truncated it mid-object and the
    # authoritative record was lost ("parsed": null). Detail lives in the
    # file/stderr; this line stays small enough to never truncate
    # (tests/test_bench_stdout.py pins both properties).
    compact = {
        "metric": "local_method_end_to_end_sites_per_sec_1chip",
        "value": head["sites_per_sec"],
        "unit": "sites/s",
        "vs_baseline": head["vs_baseline"],
        "platform": platform,
        "rounds": ROUNDS,
        "methods_sites_per_sec": {
            m: methods_out[m]["sites_per_sec"] for m, _, _ in METHODS
        },
        "methods_vs_baseline": {
            m: methods_out[m]["vs_baseline"] for m, _, _ in METHODS
        },
    }
    if device_forced:
        compact["device_forced_sites_per_sec"] = {
            prec: {m: v[m]["sites_per_sec"] for m in v}
            for prec, v in device_forced.items()
        }
    mfu = {
        name: row["mfu_vs_bf16_peak"]
        for name, row in micro.items()
        if "mfu_vs_bf16_peak" in row
    }
    if mfu:
        compact["kernel_mfu_vs_bf16_peak"] = mfu
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # hard guard: never regress the tail-parse contract
        line = json.dumps(
            {k: compact[k] for k in
             ("metric", "value", "unit", "vs_baseline", "platform", "rounds")},
            separators=(",", ":"),
        )
    sys.stderr.flush()
    print(line, flush=True)


def _watchdog_main():
    """Run the measurement in a child; on a wedged accelerator (hung remote
    tunnel), kill it and re-measure on the CPU backend so the driver always
    gets a metric. One JSON line on stdout either way."""
    budget = int(os.environ.get("SIDTPU_BENCH_TIMEOUT", "2100"))
    env = dict(os.environ, SIDTPU_BENCH_CHILD="1")
    # restore the axon trigger the re-exec below stripped from the parent
    if os.environ.get("SIDTPU_AXON_POOL_IPS_STASH"):
        env["PALLAS_AXON_POOL_IPS"] = os.environ["SIDTPU_AXON_POOL_IPS_STASH"]
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
        # The ambient sitecustomize registers the axon PJRT plugin in EVERY
        # python interpreter — including this watchdog, which never touches
        # the device. A registered parent holds the single-chip tunnel
        # claim, and the child's first device execution then hangs forever
        # (measured r4: a bare `jnp.arange(8)*2` in a subprocess of a
        # registered parent never completes). Re-exec the watchdog with the
        # registration trigger stripped; _watchdog_main restores it for the
        # measurement child.
        if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
            "SIDTPU_BENCH_REEXEC"
        ):
            env = dict(os.environ, SIDTPU_BENCH_REEXEC="1")
            env["SIDTPU_AXON_POOL_IPS_STASH"] = env.pop("PALLAS_AXON_POOL_IPS")
            os.execve(
                sys.executable,
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env,
            )
        sys.exit(_watchdog_main())
