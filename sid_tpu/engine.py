"""Top-level dispatch: parsed batch + options -> CallResult.

Mirrors the reference's method dispatch (sid.cpp:92-100), including the
quirk that an unrecognized method produces no records (the CLI then prints
only the CSV header). ``options.engine`` selects the device compute path
(default) or the host-exact long-double oracle.
"""

from __future__ import annotations

from typing import Callable, Optional

from sid_tpu.config import Options
from sid_tpu.io.pileup import PileupBatch, parse_pileup
from sid_tpu.models.common import CallResult


def call_batch(
    batch: PileupBatch,
    options: Options,
    diag: Optional[Callable[[str], None]] = None,
) -> Optional[CallResult]:
    """Dispatch one parsed batch to the selected method implementation."""
    method = options.method
    if options.engine == "exact":
        from sid_tpu.exact import engine as exact_engine

        table = {
            "local": exact_engine.call_local_exact,
            "bayes": exact_engine.call_bayes_exact,
            "likelihood_ratio": exact_engine.call_likelihood_ratio_exact,
            "quality": exact_engine.call_quality_exact,
        }
    else:
        from sid_tpu.models import bayes, likelihood_ratio, local, quality

        table = {
            "local": local.call_local,
            "bayes": bayes.call_bayes,
            "likelihood_ratio": likelihood_ratio.call_likelihood_ratio,
            "quality": quality.call_quality,
        }
    fn = table.get(method)
    if fn is None:
        return None  # unknown method: header-only output (sid.cpp:92-102)
    if options.per_shard_fit:
        from sid_tpu.parallel.pipeline import call_per_shard

        return call_per_shard(batch, options, fn, diag, by="chromosome")
    return fn(batch, options, diag)


def run(
    src,
    options: Optional[Options] = None,
    diag: Optional[Callable[[str], None]] = None,
) -> str:
    """Parse + call + serialize: the whole tool as a function returning CSV."""
    options = options or Options()
    needs_reads = options.method == "quality"
    batch = parse_pileup(
        src,
        parse_base_qualities=needs_reads,
        parse_mapping_qualities=needs_reads,
        backend=options.io_backend,
    )
    result = call_batch(batch, options, diag)
    if result is None:
        from sid_tpu.models.common import CSV_HEADER

        return CSV_HEADER + "\n"
    return result.to_csv()
