"""sid-tpu: a TPU-native diploid genotype-calling engine.

A from-scratch framework with the capabilities of the reference C++ tool
``sid`` (EvolBioInf/sid): it reads ``samtools mpileup`` text and emits one CSV
row per genome site with the most likely diploid genotype and confidence
values, via four calling methods (``local``, ``bayes``, ``likelihood_ratio``,
``quality``; reference dispatch at sid.cpp:92-100).

Architecture (TPU-first, not a port):

- host runtime (C++ / NumPy): streaming mpileup parser -> dense per-site
  tensors; CSV serialization with C++-ostream-compatible ``%.6g`` floats.
- device engine (JAX/XLA, float64 log-space): vectorized genotype-likelihood
  kernels, a GSL-nmsimplex2-faithful batched Nelder-Mead fit of the Lynch
  (pi, epsilon) model under ``lax.while_loop``, p-values/BH corrections.
- parallel layer: ``jax.sharding.Mesh`` over the site axis; the global model
  fit reduces sufficient statistics with ``psum`` across shards.

Float64 is enabled globally at import: the output CSV exposes 6 significant
digits (C++ default ostream precision, call.hpp:29-38) and the engine computes
in f64 log-space to clear that bar.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# persistent XLA compilation cache: first TPU compile through the remote
# tunnel is minutes; cached recompiles are milliseconds
_cache_dir = _os.environ.get(
    "SIDTPU_XLA_CACHE", _os.path.join(_os.path.expanduser("~"), ".cache", "sid_tpu_xla")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache is best-effort
    pass

__version__ = "0.1.0"

from sid_tpu.config import Options  # noqa: E402,F401
