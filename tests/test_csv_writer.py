"""Native CSV writer vs the Python %g spec, adversarial values.

The native writer short-circuits %g for exactly-1.0 / ±0.0 confidences
(append_g in native/parser.cpp) — these are the LRT's constant outputs —
so this differential hammers the boundary values: denormals, infinities,
NaN signs, style-switch exponents (1e-5/1e6), and round-to-even digits.
CPython's repr machinery is correctly rounded like glibc, so ``fmt_g`` is
the byte-parity spec (utils/format.py).
"""

import numpy as np
import pytest

from sid_tpu.io import native
from sid_tpu.models.common import CSV_HEADER, CallResult

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsidtpu not built"
)

ADVERSARIAL = [
    1.0, 0.0, -0.0, -1.0, 0.5, 2.0/3.0,
    1e-5, 9.999999e-5, 1e-4, 0.0001000001, 999999.4, 999999.5, 1e6, 1e6 - 0.5,
    5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
    float("inf"), float("-inf"), float("nan"), -float("nan"),
    0.1, 1/3, 123456.789, 1.0000005, 0.99999995, 1.25e-10, 7.5e19,
]


def _result(vals_hom, vals_het):
    n = len(vals_hom)
    return CallResult(
        chrom_id=np.zeros(n, np.int32),
        chrom_table=["chrX"],
        pos=np.arange(1, n + 1, dtype=np.int32),
        is_het=np.zeros(n, bool),
        major=np.zeros(n, np.int32),
        second=np.ones(n, np.int32),
        conf_hom=np.asarray(vals_hom, np.float64),
        conf_het=np.asarray(vals_het, np.float64),
        conf_type="p_value",
    )


def _python_csv(res):
    return "\n".join([CSV_HEADER] + res.to_csv_lines()) + "\n"


def test_adversarial_values():
    res = _result(ADVERSARIAL, list(reversed(ADVERSARIAL)))
    native_csv = res._to_csv_native(True)
    assert native_csv is not None
    assert native_csv.decode("latin1") == _python_csv(res)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_log_uniform(seed):
    rng = np.random.default_rng(seed)
    n = 20000
    # log-uniform magnitudes across the whole double range, random signs,
    # plus a seasoning of exact 0/1 (the fast-path values)
    exp = rng.uniform(-320, 308, n)
    vals = 10.0 ** exp * rng.choice([-1.0, 1.0], n)
    vals[rng.uniform(size=n) < 0.1] = 1.0
    vals[rng.uniform(size=n) < 0.1] = 0.0
    other = np.roll(vals, 7)
    res = _result(vals, other)
    native_csv = res._to_csv_native(True)
    assert native_csv is not None
    assert native_csv.decode("latin1") == _python_csv(res)


def _format_fns():
    import ctypes

    lib = ctypes.CDLL(native._find_library())
    lib.sidtpu_format_g.restype = ctypes.c_int
    libc = ctypes.CDLL("libc.so.6")
    buf = ctypes.create_string_buffer(64)
    buf2 = ctypes.create_string_buffer(64)

    def fast(v):
        n = lib.sidtpu_format_g(ctypes.c_double(v), buf)
        return buf.raw[:n]

    def glibc(v):
        n = libc.snprintf(buf2, 64, b"%g", ctypes.c_double(v))
        return buf2.raw[:n]

    return fast, glibc


def test_format_g_boundary_ties():
    """format_g6 vs glibc %g on exact 6-digit rounding boundaries.

    The fast formatter (parser.cpp format_g6) must agree with glibc for
    every double; exact half-way ties (round-half-even in glibc) and their
    ulp-neighbors are the values where a rounding-margin bug would show —
    by design they take the snprintf fallback, so this also pins the
    fallback plumbing.
    """
    import math

    fast, glibc = _format_fns()
    rng = np.random.default_rng(2024)
    for _ in range(20000):
        D = int(rng.integers(100000, 1000000))
        X = int(rng.integers(-310, 306))
        v = (D + 0.5) * math.pow(10.0, X - 5)
        if not math.isfinite(v) or v == 0.0:
            continue
        for u in (v, math.nextafter(v, 0.0), math.nextafter(v, math.inf)):
            assert fast(u) == glibc(u), (u.hex(), fast(u), glibc(u))
    for X in range(-320, 309):
        u0 = math.pow(10.0, X)
        for u in (u0, math.nextafter(u0, 0.0), math.nextafter(u0, math.inf)):
            assert fast(u) == glibc(u), (u.hex(), fast(u), glibc(u))


@pytest.mark.parametrize("seed", range(2))
def test_format_g_random_bit_patterns(seed):
    """format_g6 vs glibc %g over uniform random 64-bit patterns."""
    fast, glibc = _format_fns()
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2**64, 50000, dtype=np.uint64)
    vals = bits.view(np.float64)
    for v in vals[np.isfinite(vals)]:
        v = float(v)
        assert fast(v) == glibc(v), (v.hex(), fast(v), glibc(v))


def test_negative_positions_and_multibyte_chrom():
    res = _result([0.25, 1.0], [1.0, 0.125])
    res.pos = np.asarray([-2147483648, 2147483647], np.int32)
    res.chrom_table = ["scaffold_äé"]
    native_csv = res._to_csv_native(True)
    assert native_csv is not None
    assert native_csv.decode("latin1") == _python_csv(res)


def test_format_g_fallback_rate_zero_on_method_outputs():
    """The Ryu-style %g fast path covers real method outputs completely:
    zero snprintf fallbacks across all four methods on a grammar-rich input
    (verdict-r2 #7; measured 0 per 2.4M fields at 300k sites)."""
    import ctypes

    from sid_tpu.io.native import _load
    from sid_tpu import engine
    from sid_tpu.config import Options
    from synth import make_bwa_like_pileup

    lib = _load()
    if lib is None or not hasattr(lib, "sidtpu_format_g_fallbacks"):
        pytest.skip("libsidtpu not available")
    lib.sidtpu_format_g_fallbacks.restype = ctypes.c_uint64
    lib.sidtpu_format_g_fallbacks.argtypes = [ctypes.c_int]

    text = make_bwa_like_pileup(3000, seed=77)
    total_fields = 0
    lib.sidtpu_format_g_fallbacks(1)
    for method in ("local", "quality", "bayes", "likelihood_ratio"):
        kw = {"estimate_prior": True} if method == "likelihood_ratio" else {}
        csv = engine.run(text, Options(method=method, **kw), binary=True)
        total_fields += 2 * (csv.count(b"\n") - 1)
    fallbacks = lib.sidtpu_format_g_fallbacks(0)
    assert total_fields > 20000
    assert fallbacks == 0, f"{fallbacks} fallbacks / {total_fields} fields"


def test_format_g_fallback_counter_fires_on_nonfinite():
    import ctypes

    from sid_tpu.io.native import _load

    lib = _load()
    if lib is None or not hasattr(lib, "sidtpu_format_g_fallbacks"):
        pytest.skip("libsidtpu not available")
    lib.sidtpu_format_g_fallbacks.restype = ctypes.c_uint64
    lib.sidtpu_format_g_fallbacks.argtypes = [ctypes.c_int]
    lib.sidtpu_format_g.restype = ctypes.c_int
    lib.sidtpu_format_g.argtypes = [ctypes.c_double, ctypes.c_char_p]
    buf = ctypes.create_string_buffer(64)
    lib.sidtpu_format_g_fallbacks(1)
    lib.sidtpu_format_g(float("inf"), buf)
    lib.sidtpu_format_g(float("nan"), buf)
    assert lib.sidtpu_format_g_fallbacks(0) == 2
