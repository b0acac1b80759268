"""Calling methods (the framework's model families).

One module per reference method (call.cpp): ``local`` (per-site ML error,
default), ``bayes`` (Lynch posterior), ``likelihood_ratio`` (Lynch + LRT +
BH), ``quality`` (per-read Phred path). Each exposes
``call_<method>(batch, options) -> CallResult`` producing reference-ordered
output records.
"""

from sid_tpu.models.common import CallResult  # noqa: F401
