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


def test_negative_positions_and_multibyte_chrom():
    res = _result([0.25, 1.0], [1.0, 0.125])
    res.pos = np.asarray([-2147483648, 2147483647], np.int32)
    res.chrom_table = ["scaffold_äé"]
    native_csv = res._to_csv_native(True)
    assert native_csv is not None
    assert native_csv.decode("latin1") == _python_csv(res)
