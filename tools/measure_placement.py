#!/usr/bin/env python
"""Re-measure the work-placement decisions with interleaved medians.

Produces the numbers DESIGN.md's placement table cites: for the 1M-site
clean config, the `local` method end-to-end under each classify placement —
host long-double (default), device slim f64, device slim double-single —
interleaved in the same process, median of K rounds each (the 2-core host
swings +-30%; only same-run interleaved medians are comparable).

Run on the TPU platform with a warm cache:  python tools/measure_placement.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = int(os.environ.get("SIDTPU_PLACEMENT_SITES", "1000000"))
ROUNDS = int(os.environ.get("SIDTPU_PLACEMENT_ROUNDS", "3"))

PLACEMENTS = [
    # (label, Options overrides, env overrides)
    ("host_ld", {}, {}),
    ("device_slim_f64", {}, {"SIDTPU_EXACT_LOCAL_MAX_U": "0"}),
    ("device_slim_ds", {}, {"SIDTPU_EXACT_LOCAL_MAX_U": "0",
                            "SIDTPU_DEVICE_PREC": "ds"}),
]


def main():
    import bench

    import sid_tpu  # noqa: F401
    from sid_tpu import engine
    from sid_tpu.config import Options

    bench._start_device_keepalive()
    print(f"generating {N_SITES} sites...", file=sys.stderr, flush=True)
    text = bench.generate(N_SITES)

    outputs = {}
    for label, kw, env in PLACEMENTS:  # warm + compile each
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            outputs[label] = engine.run(text, Options(**kw), binary=True)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    # all placements must emit identical CSV on this input
    base = outputs["host_ld"]
    agree = {lab: outputs[lab] == base for lab, _, _ in PLACEMENTS}

    walls = {lab: [] for lab, _, _ in PLACEMENTS}
    for r in range(ROUNDS):
        for label, kw, env in PLACEMENTS:
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                t0 = time.time()
                engine.run(text, Options(**kw), binary=True)
                walls[label].append(time.time() - t0)
            finally:
                for k, v in saved.items():
                    os.environ.pop(k, None) if v is None else os.environ.update({k: v})
            print(f"  round {r+1} {label}: {walls[label][-1]:.2f}s",
                  file=sys.stderr, flush=True)

    import jax

    result = {
        "metric": "local_placement_sites_per_sec",
        "n_sites": N_SITES,
        "rounds": ROUNDS,
        "platform": jax.devices()[0].platform,
        "placements": {
            lab: {
                "median_s": round(statistics.median(w), 3),
                "sites_per_sec": round(N_SITES / statistics.median(w)),
                "csv_equal_to_host_ld": agree[lab],
            }
            for lab, w in walls.items()
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
