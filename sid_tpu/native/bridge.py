"""ctypes marshalling: libsidtpu parse results -> PileupBatch."""

from __future__ import annotations

import ctypes

import numpy as np

from sid_tpu.utils.errors import MALFORMED, MALFORMED_OR_MISSING, ErrorChannel


import struct


def encode_chrom_blob(names) -> bytes:
    """[u32 len][bytes]... — names may contain any byte."""
    parts = []
    for name in names:
        raw = name.encode("latin1")
        parts.append(struct.pack("<I", len(raw)) + raw)
    return b"".join(parts)


def decode_chrom_blob(blob: bytes):
    out = []
    i = 0
    while i + 4 <= len(blob):
        (ln,) = struct.unpack_from("<I", blob, i)
        i += 4
        out.append(blob[i : i + ln].decode("latin1"))
        i += ln
    return out


def _as_array(ptr_fn, res, ctype, count, dtype):
    if count == 0:
        return np.zeros(0, dtype)
    ptr = ctypes.cast(ptr_fn(res), ctypes.POINTER(ctype))
    return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)


def _configure(lib):
    if getattr(lib, "_sidtpu_configured", False):
        return
    lib.sidtpu_parse.restype = ctypes.c_void_p
    lib.sidtpu_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.sidtpu_parse_ex.restype = ctypes.c_void_p
    lib.sidtpu_parse_ex.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sidtpu_set_quality_table.restype = None
    lib.sidtpu_set_quality_table.argtypes = [ctypes.POINTER(ctypes.c_double)]
    for name in ("sidtpu_num_sites", "sidtpu_num_reads", "sidtpu_num_errors",
                 "sidtpu_num_terms"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    for name in (
        "sidtpu_chrom_id", "sidtpu_pos", "sidtpu_ref_base", "sidtpu_counts",
        "sidtpu_read_offsets", "sidtpu_read_code", "sidtpu_read_strand",
        "sidtpu_read_bq", "sidtpu_read_mq", "sidtpu_err_line", "sidtpu_err_code",
        "sidtpu_term_hom", "sidtpu_term_het", "sidtpu_term_major",
        "sidtpu_term_second",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_void_p
        fn.argtypes = [ctypes.c_void_p]
    lib.sidtpu_chrom_blob.restype = ctypes.c_void_p
    lib.sidtpu_chrom_blob.argtypes = [ctypes.c_void_p]
    lib.sidtpu_chrom_blob_len.restype = ctypes.c_int64
    lib.sidtpu_chrom_blob_len.argtypes = [ctypes.c_void_p]
    lib.sidtpu_free.restype = None
    lib.sidtpu_free.argtypes = [ctypes.c_void_p]
    lib._sidtpu_configured = True


def _ensure_quality_table(lib) -> bool:
    """Inject the (256, 4) f64 term table once so inline accumulation is
    bitwise identical to models/quality.accumulate_read_terms."""
    if getattr(lib, "_sidtpu_qual_table_set", False):
        return True
    from sid_tpu.models.quality import quality_term_tables

    tab = np.ascontiguousarray(quality_term_tables(), np.float64)
    assert tab.shape == (256, 4)
    lib.sidtpu_set_quality_table(tab.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    lib._sidtpu_qual_table_set = True
    return True


def parse_with_lib(lib, data: bytes, parse_bq: bool, parse_mq: bool,
                   errors: ErrorChannel, n_threads: int = 0,
                   terms_only: bool = False):
    from sid_tpu.io.pileup import PileupBatch

    _configure(lib)
    with_reads = parse_bq or parse_mq
    # the quality method's per-site term sums are computed inline during the
    # threaded parse whenever both quality columns are requested — the extra
    # cost is a few L1-resident flops per read, vs ~15 memory passes in numpy.
    # terms_only additionally skips materializing the per-read arrays.
    flags = 0
    if parse_bq and parse_mq and _ensure_quality_table(lib):
        flags |= 1
        if terms_only:
            flags |= 2
    res = lib.sidtpu_parse_ex(
        data, len(data), int(parse_bq), int(parse_mq),
        int(errors.strict), n_threads, flags,
    )
    try:
        n_err = lib.sidtpu_num_errors(res)
        if n_err:
            err_lines = _as_array(lib.sidtpu_err_line, res, ctypes.c_int64, n_err, np.int64)
            err_codes = _as_array(lib.sidtpu_err_code, res, ctypes.c_int32, n_err, np.int32)
            for ln, code in zip(err_lines, err_codes):
                # strict channels raise on the first report
                errors.report(
                    int(ln), MALFORMED_OR_MISSING if code == 1 else MALFORMED
                )
        n = lib.sidtpu_num_sites(res)
        blob_len = lib.sidtpu_chrom_blob_len(res)
        blob = ctypes.string_at(lib.sidtpu_chrom_blob(res), blob_len) if blob_len else b""
        chrom_table = decode_chrom_blob(blob)
        batch = PileupBatch(
            chrom_id=_as_array(lib.sidtpu_chrom_id, res, ctypes.c_int32, n, np.int32),
            chrom_table=chrom_table,
            pos=_as_array(lib.sidtpu_pos, res, ctypes.c_int32, n, np.int32),
            ref_base=_as_array(lib.sidtpu_ref_base, res, ctypes.c_uint8, n, np.uint8),
            counts=_as_array(
                lib.sidtpu_counts, res, ctypes.c_uint16, n * 4, np.uint16
            ).reshape(-1, 4),
            errors=errors,
        )
        if with_reads and not flags & 2:
            r = lib.sidtpu_num_reads(res)
            batch.read_offsets = _as_array(
                lib.sidtpu_read_offsets, res, ctypes.c_int64, n + 1, np.int64
            )
            batch.read_code = _as_array(lib.sidtpu_read_code, res, ctypes.c_int8, r, np.int8)
            batch.read_strand = _as_array(lib.sidtpu_read_strand, res, ctypes.c_uint8, r, np.uint8)
            batch.read_bq = _as_array(lib.sidtpu_read_bq, res, ctypes.c_uint8, r, np.uint8)
            batch.read_mq = _as_array(lib.sidtpu_read_mq, res, ctypes.c_uint8, r, np.uint8)
        if flags & 1 and lib.sidtpu_num_terms(res) == n:
            batch.q_log_hom = _as_array(lib.sidtpu_term_hom, res, ctypes.c_double, n, np.float64)
            batch.q_log_het = _as_array(lib.sidtpu_term_het, res, ctypes.c_double, n, np.float64)
            batch.q_major = _as_array(lib.sidtpu_term_major, res, ctypes.c_int8, n, np.int32)
            batch.q_second = _as_array(lib.sidtpu_term_second, res, ctypes.c_int8, n, np.int32)
        return batch
    finally:
        lib.sidtpu_free(res)


def _configure_writer(lib):
    if getattr(lib, "_sidtpu_writer_configured", False):
        return
    lib.sidtpu_write_csv.restype = ctypes.c_int64
    lib.sidtpu_write_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
    ]
    lib.sidtpu_buffer_free.restype = None
    lib.sidtpu_buffer_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
    _configure_writer_indexed(lib)
    lib._sidtpu_writer_configured = True


def unique_profiles_native(lib, counts: np.ndarray):
    """Threaded unique-profile histogram through libsidtpu.

    Returns (profiles (U,4) int32 sorted, mult (U,) int64, inverse (N,)
    int64) — identical contract to ops.profiles._unique_profiles_np.
    """
    if not getattr(lib, "_sidtpu_unique_configured", False):
        lib.sidtpu_unique_profiles.restype = ctypes.c_void_p
        lib.sidtpu_unique_profiles.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int,
        ]
        lib.sidtpu_unique_num_classes.restype = ctypes.c_int64
        lib.sidtpu_unique_num_classes.argtypes = [ctypes.c_void_p]
        for name in (
            "sidtpu_unique_class_profiles", "sidtpu_unique_class_mult",
            "sidtpu_unique_inverse",
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p]
        lib.sidtpu_unique_free.restype = None
        lib.sidtpu_unique_free.argtypes = [ctypes.c_void_p]
        lib._sidtpu_unique_configured = True
    arr = np.ascontiguousarray(counts, np.uint16)
    n = arr.shape[0]
    res = lib.sidtpu_unique_profiles(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, 0
    )
    try:
        u = lib.sidtpu_unique_num_classes(res)
        profiles = _as_array(
            lib.sidtpu_unique_class_profiles, res, ctypes.c_uint16, u * 4, np.int32
        ).reshape(-1, 4)
        mult = _as_array(lib.sidtpu_unique_class_mult, res, ctypes.c_int64, u, np.int64)
        inverse = _as_array(lib.sidtpu_unique_inverse, res, ctypes.c_int32, n, np.int64)
        return profiles, mult, inverse
    finally:
        lib.sidtpu_unique_free(res)


def erfc_libm(lib, x: np.ndarray) -> np.ndarray:
    """Batched glibc erfc through libsidtpu (the exact_pvalues path)."""
    if not getattr(lib, "_sidtpu_erfc_configured", False):
        lib.sidtpu_erfc.restype = None
        lib.sidtpu_erfc.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib._sidtpu_erfc_configured = True
    arr = np.ascontiguousarray(x, np.float64)
    out = np.empty_like(arr)
    lib.sidtpu_erfc(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.size,
    )
    return out


def lrt_pvalues_libm(lib, log_l0: np.ndarray, log_l1: np.ndarray) -> np.ndarray:
    """Fused threaded LRT p-values (stats.lrt_pvalue_from_logs_np in one
    native pass: chisq, sqrt, glibc erfc, -inf short-circuit)."""
    if not getattr(lib, "_sidtpu_lrt_configured", False):
        lib.sidtpu_lrt_pvalues.restype = None
        lib.sidtpu_lrt_pvalues.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib._sidtpu_lrt_configured = True
    a = np.ascontiguousarray(log_l0, np.float64)
    b = np.ascontiguousarray(log_l1, np.float64)
    if a.shape != b.shape:
        a, b = np.broadcast_arrays(a, b)
        a = np.ascontiguousarray(a)
        b = np.ascontiguousarray(b)
    out = np.empty_like(a)
    lib.sidtpu_lrt_pvalues(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.size,
        0,
    )
    return out


def _configure_writer_indexed(lib):
    if getattr(lib, "_sidtpu_writer_idx_configured", False):
        return
    lib.sidtpu_write_csv_indexed.restype = ctypes.c_int64
    lib.sidtpu_write_csv_indexed.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
    ]
    lib._sidtpu_writer_idx_configured = True
