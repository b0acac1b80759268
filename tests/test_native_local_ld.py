"""Differential tests: native long-double local classifier vs the numpy spec.

sidtpu_local_classify_ld (parser.cpp) must be bitwise-identical to
exact/engine.local_classify_profiles_ld — the long-double oracle for the
reference's per-profile `local` loop (call.cpp:238-273). p-values are f64,
compared by exact equality with NaN-position matching; labels by equality.
"""

import numpy as np
import pytest

from sid_tpu.exact.engine import local_classify_profiles_ld
from sid_tpu.exact.lynch_ld import native_local_classify_ld
from sid_tpu.models import common

pytestmark = pytest.mark.skipif(
    native_local_classify_ld(
        np.zeros((1, 4), np.uint16), np.zeros(1, np.int64), np.ones(1, np.int64),
        0.1, -1.0, 0.05,
    )
    is None,
    reason="libsidtpu not available",
)


def _assert_bitwise(profiles, thr, prior, alpha=0.05):
    major, second = common.major_allele_indices_np(profiles)
    ih_s, p1_s, p2_s = local_classify_profiles_ld(
        profiles, major, second, thr, prior, alpha
    )
    ih_n, p1_n, p2_n = native_local_classify_ld(
        profiles, major, second, thr, prior, alpha
    )
    for spec, nat, label in ((p1_s, p1_n, "p1"), (p2_s, p2_n, "p2")):
        eq = (spec == nat) | (np.isnan(spec) & np.isnan(nat))
        bad = np.nonzero(~eq)[0]
        assert bad.size == 0, (
            f"{label} mismatch at u={bad[0]}: spec={spec[bad[0]]!r} "
            f"native={nat[bad[0]]!r} profile={profiles[bad[0]]}"
        )
    assert np.array_equal(np.asarray(ih_s, bool), np.asarray(ih_n, bool))


def _adversarial_profiles():
    rng = np.random.default_rng(11)
    prof = rng.integers(0, 60, (8192, 4)).astype(np.uint16)
    prof[0] = 0  # zero coverage: 0/0 error -> NaN -> powl(x,0)==1
    prof[1] = [1, 0, 0, 0]
    prof[2] = [0, 0, 0, 1]
    prof[3] = [3000, 2, 1, 0]  # deep coverage: powl underflow to 0 -> p=0
    prof[4] = [800, 800, 0, 0]  # balanced het, large n
    prof[5] = [10, 10, 10, 10]  # 4-way tie
    prof[6] = [2, 2, 0, 0]
    prof[7] = [65535, 0, 0, 0]  # uint16 extreme
    return prof


@pytest.mark.parametrize("thr", [0.0, 0.1, 1.0])
@pytest.mark.parametrize("prior", [-1.0, 1e-3, 0.5])
def test_bitwise_equal_adversarial(thr, prior):
    _assert_bitwise(_adversarial_profiles(), thr, prior)


def test_bitwise_equal_random_bulk():
    rng = np.random.default_rng(7)
    prof = rng.integers(0, 200, (50000, 4)).astype(np.uint16)
    # sprinkle zero rows and deep rows so the threaded ranges hit edge cases
    prof[rng.integers(0, 50000, 100)] = 0
    deep = rng.integers(0, 50000, 100)
    prof[deep, rng.integers(0, 4, 100)] = 5000
    _assert_bitwise(prof, 0.1, -1.0)
    _assert_bitwise(prof, 0.1, 2.5e-4)


def test_engine_paths_agree(tmp_path, monkeypatch):
    """The native-LD local path and the slim device path produce identical
    CSV bytes through the engine (both byte-match the oracle)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sid_tpu import engine
    from sid_tpu.config import Options

    rng = np.random.default_rng(3)
    lines = []
    for i in range(500):
        cov = int(rng.integers(1, 25))
        bases = "".join(rng.choice(list("ACGT.,"), cov))
        quals = "I" * len(bases)
        lines.append(f"chr1\t{i + 1}\tA\t{cov}\t{bases}\t{quals}")
    text = ("\n".join(lines) + "\n").encode()

    monkeypatch.setenv("SIDTPU_EXACT_LOCAL_MAX_U", "1000000")
    out_ld = engine.run(text, Options(), binary=True)
    monkeypatch.setenv("SIDTPU_EXACT_LOCAL_MAX_U", "0")
    out_dev = engine.run(text, Options(), binary=True)
    assert out_ld == out_dev
