"""Deliberate kernel-cache warmup (``sid-tpu --warm-cache``).

On remote-compile targets a cold XLA compile costs minutes and a killed
compile loses the persistent-cache entry (CLAUDE.md environment rules), so
instead of paying that price mid-run the CLI offers a warmup subcommand
that compiles every production kernel shape bucket up front:

- all four calling methods' classify kernels (local/bayes/LR per-profile
  chains, quality per-site finalize),
- the Lynch fit ``lax.while_loop`` (via ``-R`` on likelihood_ratio and the
  bayes path),
- the lgamma table builders at their floor bucket.

Shape bucketing (utils/padding.bucket_size, floor 8192; ops/lgamma
floor 1024) means a small synthetic input compiles the *same* kernels a
production run uses, as long as the production unique-profile count stays
within the floor bucket; bigger inputs add at most log-many pow-2 buckets,
each a one-time compile.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

from sid_tpu.config import Options

# deterministic ~30x synthetic sites: a rotating mix of hom/het/error
# profiles with both quality columns so the quality method's terms path
# compiles too. Small enough to parse in milliseconds; profile count is far
# below the 8192-row floor bucket.
_N_SITES = 2048


def _synthetic_pileup() -> bytes:
    bases = b"ACGT"
    lines = []
    for i in range(_N_SITES):
        ref = bases[i & 3]
        cov = 24 + (i % 13)
        n_err = i % 3
        n_second = (cov // 2) if i % 97 == 0 else 0
        n_major = cov - n_err - n_second
        col = (
            b"." * n_major
            + bases[(i + 1) & 3 : ((i + 1) & 3) + 1] * n_second
            + bases[(i + 2) & 3 : ((i + 2) & 3) + 1] * n_err
        )
        qual = bytes(33 + 20 + (j % 20) for j in range(cov))
        lines.append(
            b"chrW\t%d\t%c\t%d\t%s\t%s\t%s" % (i + 1, ref, cov, col, qual, qual)
        )
    return b"\n".join(lines) + b"\n"


def warm_cache(
    options: Options, log: Optional[Callable[[str], None]] = None
) -> int:
    """Compile all production kernels; returns the number of runs executed.

    Respects ``options.platform``/engine knobs so ``--platform cpu
    --warm-cache`` warms the CPU cache instead.
    """
    from sid_tpu import engine

    log = log or (lambda s: None)
    text = _synthetic_pileup()
    # (method, estimate_prior): -R on likelihood_ratio compiles the fit
    # loop + prior-weighted classify; bayes compiles the fit-with-posterior
    # path; local/quality compile the per-site kernels and erfc chain.
    plan = [
        # (method, estimate_prior, extra Options overrides)
        ("local", False, {}),
        ("quality", False, {}),
        ("bayes", False, {}),
        ("likelihood_ratio", True, {}),
        ("local", True, {}),  # -R local: fit-for-prior + capped-error classify
        # explicit device paths (defaults run these stages on host since r3):
        # the jitted Lynch fit while-loop, the full device local classify,
        # and the device quality finalize
        ("bayes", False, {"fit_backend": "device"}),
        ("likelihood_ratio", True, {"fit_backend": "device"}),
        ("local", False, {"exact_pvalues": False}),
        ("quality", False, {"exact_pvalues": False}),
    ]
    for method, est, extra in plan:
        opts = dataclasses.replace(
            options, method=method, estimate_prior=est, diagnostics=False,
            stream=False, population="", multihost=False, **extra,
        )
        t0 = time.time()
        engine.run(text, opts, binary=True)
        flag = " -R" if est else ""
        suffix = "".join(f" {k}={v}" for k, v in extra.items())
        log(f"# warm {method}{flag}{suffix}: {time.time() - t0:.1f}s")

    # slim device local kernel (local_log_likelihoods): default single-device
    # local runs host long-double since r3, so force the device branch by
    # zeroing the exact-local cap — this bucket still serves meshes and
    # U > SIDTPU_EXACT_LOCAL_MAX_U inputs
    import os

    prev = os.environ.get("SIDTPU_EXACT_LOCAL_MAX_U")
    os.environ["SIDTPU_EXACT_LOCAL_MAX_U"] = "0"
    try:
        opts = dataclasses.replace(
            options, method="local", estimate_prior=False, diagnostics=False,
            stream=False, population="", multihost=False,
        )
        t0 = time.time()
        engine.run(text, opts, binary=True)
        log(f"# warm local slim-device: {time.time() - t0:.1f}s")
    finally:
        if prev is None:
            os.environ.pop("SIDTPU_EXACT_LOCAL_MAX_U", None)
        else:
            os.environ["SIDTPU_EXACT_LOCAL_MAX_U"] = prev
    return len(plan) + 1
