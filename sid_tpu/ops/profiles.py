"""Host-side profile compaction and nucleotide distribution.

The key algorithmic dedup of the engine (pileup.cpp:169-217): genome-scale
site counts collapse to a small set of unique (A,C,G,T) profiles, so all
per-profile device math is O(U) with U << N. ``np.unique`` reproduces the
reference's lexicographic profile ordering (profile_t operator<), and the
inverse index replaces its ``std::map<profile_t, size_t>`` join
(call.cpp:82-86).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def unique_profiles(counts: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact per-site base-count rows into unique profiles.

    Returns ``(profiles (U,4) int32 lexicographically sorted, multiplicity
    (U,) int64, inverse (N,) int64)`` with ``profiles[inverse] == counts``.
    Empty input gives empty arrays (countUniqueProfiles' empty case).

    Large inputs dispatch to the native histogram (threaded O(N) flat-hash
    classing in libsidtpu — a comparison sort over N keys is the slow part
    of the numpy path); the numpy path is the fallback and spec.
    """
    counts = np.asarray(counts)
    if counts.shape[0] == 0:
        return (
            np.zeros((0, 4), np.int32),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
        )
    if counts.shape[0] >= 65536:
        native = _unique_profiles_native(counts)
        if native is not None:
            return native
    return _unique_profiles_np(counts)


def _unique_profiles_np(counts: np.ndarray):
    # pack each (c0,c1,c2,c3) row into one uint64 whose numeric order equals
    # the row's lexicographic order, then group via one argsort (much faster
    # than np.unique's axis=0 structured sort or its return_inverse path)
    c = counts.astype(np.uint64)
    keys = (c[:, 0] << 48) | (c[:, 1] << 32) | (c[:, 2] << 16) | c[:, 3]
    uniq = np.unique(keys)  # sort-only path, no inverse bookkeeping
    inverse = np.searchsorted(uniq, keys)
    mult = np.bincount(inverse, minlength=uniq.shape[0]).astype(np.int64)
    inverse = inverse.astype(np.int64)
    prof = np.empty((uniq.shape[0], 4), np.int32)
    prof[:, 0] = (uniq >> 48) & 0xFFFF
    prof[:, 1] = (uniq >> 32) & 0xFFFF
    prof[:, 2] = (uniq >> 16) & 0xFFFF
    prof[:, 3] = uniq & 0xFFFF
    return prof, mult, inverse


def _unique_profiles_native(counts: np.ndarray):
    """Threaded flat-hash histogram via libsidtpu; None if lib unavailable."""
    try:
        from sid_tpu.io.native import _load
        from sid_tpu.native.bridge import unique_profiles_native

        lib = _load()
        if lib is None or not hasattr(lib, "sidtpu_unique_profiles"):
            return None
        return unique_profiles_native(lib, counts)
    except Exception:
        return None


def coverage_of(profiles: np.ndarray) -> np.ndarray:
    return profiles.sum(axis=1, dtype=np.int64)


def filter_min_coverage(
    profiles: np.ndarray, mult: np.ndarray, min_coverage: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop profiles below the coverage threshold (call.cpp:66-70).

    Returns (profiles, mult, kept_mask over the original U axis).
    """
    keep = coverage_of(profiles) >= min_coverage
    return profiles[keep], mult[keep], keep


def nucleotide_distribution(profiles: np.ndarray, mult: np.ndarray) -> np.ndarray:
    """Weighted base composition over unique profiles (pileup.cpp:198-217).

    acc[i] = sum(mult * profile[:, i]) normalized by total base count;
    uniform {0.25}*4 when the total is zero.
    """
    profiles = np.asarray(profiles, np.uint64)
    mult = np.asarray(mult, np.uint64)
    acc = (profiles * mult[:, None]).sum(axis=0, dtype=np.uint64)
    total = acc.sum(dtype=np.uint64)
    if total == 0:
        return np.array([0.25, 0.25, 0.25, 0.25])
    return acc.astype(np.float64) / np.float64(total)
