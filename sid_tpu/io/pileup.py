"""PileupBatch: dense tensor representation of a parsed mpileup stream.

This is the host->device boundary of the framework (SURVEY §3.1): raw mpileup
text becomes
- ``counts``  (N, 4) uint16   per-site A/C/G/T occurrence profile
- ``pos``     (N,)  int32     1-based genome coordinate
- ``chrom_id``(N,)  int32     index into ``chrom_table``
- ``ref_base``(N,)  uint8     reference base byte
and, only when the ``quality`` method needs per-read data (call.cpp:291-372):
- ``read_offsets`` (N+1,) int64 CSR offsets into the flattened read arrays
- ``read_code``    (R,) int8    0..3 = A,C,G,T (filtered bases, in order)
- ``read_strand``  (R,) uint8   1 = forward strand
- ``read_bq`` / ``read_mq`` (R,) uint8  Phred qualities paired positionally
  with the filtered bases (reference pairing semantics, call.cpp:330-331).

Backends: "native" = multithreaded C++ parser (sid_tpu/native), "python" =
exact-grammar fallback (pileup_py). Both implement the identical grammar and
are property-tested against each other.
"""

from __future__ import annotations

import dataclasses
import io as _io
import os
from typing import List, Optional, Union

import numpy as np

from sid_tpu.utils.errors import ErrorChannel
from sid_tpu.io import pileup_py


@dataclasses.dataclass
class PileupBatch:
    chrom_id: np.ndarray
    chrom_table: List[str]
    pos: np.ndarray
    ref_base: np.ndarray
    counts: np.ndarray
    read_offsets: Optional[np.ndarray] = None
    read_code: Optional[np.ndarray] = None
    read_strand: Optional[np.ndarray] = None
    read_bq: Optional[np.ndarray] = None
    read_mq: Optional[np.ndarray] = None
    # quality-method per-site terms, precomputed inline by the native parser
    # (bitwise equal to models/quality.accumulate_read_terms; None from the
    # Python backend)
    q_log_hom: Optional[np.ndarray] = None
    q_log_het: Optional[np.ndarray] = None
    q_major: Optional[np.ndarray] = None
    q_second: Optional[np.ndarray] = None
    errors: Optional[ErrorChannel] = None

    @property
    def num_sites(self) -> int:
        return int(self.counts.shape[0])

    def chrom_names(self) -> np.ndarray:
        """Per-site chromosome names as a numpy object array."""
        table = np.asarray(self.chrom_table, dtype=object)
        return table[self.chrom_id]

    @staticmethod
    def empty(with_reads: bool = False) -> "PileupBatch":
        b = PileupBatch(
            chrom_id=np.zeros(0, np.int32),
            chrom_table=[],
            pos=np.zeros(0, np.int32),
            ref_base=np.zeros(0, np.uint8),
            counts=np.zeros((0, 4), np.uint16),
        )
        if with_reads:
            b.read_offsets = np.zeros(1, np.int64)
            b.read_code = np.zeros(0, np.int8)
            b.read_strand = np.zeros(0, np.uint8)
            b.read_bq = np.zeros(0, np.uint8)
            b.read_mq = np.zeros(0, np.uint8)
        return b


def _parse_python(
    data: bytes,
    parse_bq: bool,
    parse_mq: bool,
    errors: ErrorChannel,
) -> PileupBatch:
    """Exact-grammar fallback parser over a whole buffer."""
    with_reads = parse_bq or parse_mq
    chrom_table: List[str] = []
    chrom_index = {}
    chrom_id: List[int] = []
    pos: List[int] = []
    ref_base: List[int] = []
    counts: List[List[int]] = []
    read_lens: List[int] = []
    read_code: List[int] = []
    read_strand: List[int] = []
    read_bq: List[int] = []
    read_mq: List[int] = []

    line_no = 0
    for line in data.split(b"\n"):
        line_no += 1
        if len(line) == 0:  # readFile skips empty lines (call.cpp:14)
            continue
        parsed = pileup_py.parse_pileup_line(line, parse_bq, parse_mq, errors, line_no)
        if parsed is None:
            continue
        name = parsed.chrom.decode("latin1")
        cid = chrom_index.get(name)
        if cid is None:
            cid = len(chrom_table)
            chrom_index[name] = cid
            chrom_table.append(name)
        chrom_id.append(cid)
        pos.append(parsed.pos)
        ref_base.append(parsed.ref_base)
        counts.append(parsed.counts)
        if with_reads:
            nb = len(parsed.codes)
            read_lens.append(nb)
            read_code.extend(parsed.codes)
            read_strand.extend(parsed.strands)
            bq = parsed.base_qualities or []
            mq = parsed.mapping_qualities or []
            # positional pairing with filtered bases; missing -> clamp-min 1,
            # the value any sub-33 byte decodes to (pileup.cpp:159-163)
            for j in range(nb):
                read_bq.append(bq[j] if j < len(bq) else 1)
                read_mq.append(mq[j] if j < len(mq) else 1)

    batch = PileupBatch(
        chrom_id=np.asarray(chrom_id, np.int32),
        chrom_table=chrom_table,
        pos=np.asarray(pos, np.int32),
        ref_base=np.asarray(ref_base, np.uint8),
        counts=np.asarray(counts, np.uint16).reshape(-1, 4),
        errors=errors,
    )
    if with_reads:
        batch.read_offsets = np.concatenate(
            [[0], np.cumsum(np.asarray(read_lens, np.int64))]
        ).astype(np.int64)
        batch.read_code = np.asarray(read_code, np.int8)
        batch.read_strand = np.asarray(read_strand, np.uint8)
        batch.read_bq = np.asarray(read_bq, np.uint8)
        batch.read_mq = np.asarray(read_mq, np.uint8)
    return batch


def parse_pileup(
    src: Union[str, bytes, os.PathLike, _io.IOBase],
    parse_base_qualities: bool = False,
    parse_mapping_qualities: bool = False,
    backend: str = "auto",
    strict: bool = True,
    quality_terms_only: bool = False,
) -> PileupBatch:
    """Parse mpileup text into a PileupBatch.

    ``src`` may be a path, a bytes buffer, or a binary file object.
    ``backend``: "auto" prefers the native C++ parser, falling back to the
    Python implementation.
    ``quality_terms_only``: the caller needs only the quality method's
    per-site term sums (``q_log_hom``/``q_log_het``/``q_major``/
    ``q_second``), not the per-read arrays — the native parser then skips
    materializing reads entirely. The Python backend ignores this (its
    batches carry reads and no precomputed terms).
    """
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            data = f.read()
    elif isinstance(src, bytes):
        data = src
    else:
        data = src.read()
        if isinstance(data, str):
            data = data.encode()
    if data[:2] == b"\x1f\x8b":  # transparent gzip input (magic-detected)
        import gzip

        data = gzip.decompress(data)

    errors = ErrorChannel(strict=strict)
    if backend in ("auto", "native"):
        from sid_tpu.io import native

        if native.available():
            return native.parse(data, parse_base_qualities, parse_mapping_qualities,
                                errors, terms_only=quality_terms_only)
        if backend == "native":
            raise RuntimeError("native parser requested but libsidtpu is not built")
    return _parse_python(data, parse_base_qualities, parse_mapping_qualities, errors)
