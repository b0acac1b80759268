"""Host-side IO: mpileup parsing -> dense tensors, CSV serialization."""

from sid_tpu.io.pileup import PileupBatch, parse_pileup  # noqa: F401
