"""Shard orchestration: chromosome/range splitting and per-shard calling.

The reference pipeline fans one sid process per chromosome with GNU parallel
(scripts/sid-pipeline/parallel-run-sid.sh), which makes every statistic —
including the Lynch fit — per-chromosome. ``call_per_shard`` reproduces those
semantics in-process (for script parity and parity testing); the default
global-fit path instead shares one fit across all shards via the mesh
(sid_tpu.parallel.fit).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from sid_tpu.config import Options
from sid_tpu.io.pileup import PileupBatch
from sid_tpu.models.common import CallResult


def _slice_batch(batch: PileupBatch, idx: np.ndarray) -> PileupBatch:
    """Sub-batch over a site index array (keeps read CSR consistent)."""
    sub = PileupBatch(
        chrom_id=batch.chrom_id[idx],
        chrom_table=batch.chrom_table,
        pos=batch.pos[idx],
        ref_base=batch.ref_base[idx],
        counts=batch.counts[idx],
    )
    if batch.read_offsets is not None:
        starts = batch.read_offsets[:-1][idx]
        ends = batch.read_offsets[1:][idx]
        lens = ends - starts
        sub.read_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        gather = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends)]
        ) if len(starts) else np.zeros(0, np.int64)
        sub.read_code = batch.read_code[gather]
        sub.read_strand = batch.read_strand[gather]
        sub.read_bq = batch.read_bq[gather]
        sub.read_mq = batch.read_mq[gather]
    return sub


def split_by_chromosome(batch: PileupBatch) -> List[PileupBatch]:
    """One shard per chromosome, in first-appearance order (script semantics)."""
    return [
        _slice_batch(batch, np.nonzero(batch.chrom_id == cid)[0])
        for cid in range(len(batch.chrom_table))
    ]


def split_ranges(batch: PileupBatch, k: int) -> List[PileupBatch]:
    """k contiguous site-range shards (byte-range analogue for one host)."""
    idx = np.arange(batch.num_sites)
    return [_slice_batch(batch, part) for part in np.array_split(idx, k)]


def concat_results(parts: List[CallResult]) -> CallResult:
    parts = [p for p in parts if p.num_records >= 0]
    first = parts[0]
    merged = CallResult(
        chrom_id=np.concatenate([p.chrom_id for p in parts]),
        chrom_table=first.chrom_table,
        pos=np.concatenate([p.pos for p in parts]),
        is_het=np.concatenate([p.is_het for p in parts]),
        major=np.concatenate([p.major for p in parts]),
        second=np.concatenate([p.second for p in parts]),
        conf_hom=np.concatenate([p.conf_hom for p in parts]),
        conf_het=np.concatenate([p.conf_het for p in parts]),
        conf_type=first.conf_type,
    )
    # keep the per-class payload (offset each part's class indices into the
    # concatenated class table) so serialization stays on the indexed
    # %g-once-per-class fast path
    if all(p.class_idx is not None for p in parts):
        idx_parts = []
        offset = 0
        for p in parts:
            idx_parts.append(p.class_idx.astype(np.int64) + offset)
            offset += p.cls_is_het.shape[0]
        merged.class_idx = np.concatenate(idx_parts).astype(np.int32)
        merged.cls_is_het = np.concatenate([p.cls_is_het for p in parts])
        merged.cls_major = np.concatenate([p.cls_major for p in parts])
        merged.cls_second = np.concatenate([p.cls_second for p in parts])
        merged.cls_conf_hom = np.concatenate([p.cls_conf_hom for p in parts])
        merged.cls_conf_het = np.concatenate([p.cls_conf_het for p in parts])
    return merged


def call_per_shard(
    batch: PileupBatch,
    options: Options,
    call_one: Callable[[PileupBatch, Options, Optional[Callable]], CallResult],
    diag: Optional[Callable[[str], None]] = None,
    by: str = "chromosome",
    k: Optional[int] = None,
) -> CallResult:
    """Run a method independently per shard and merge in coordinate order.

    ``by="chromosome"`` reproduces parallel-run-sid.sh's per-chromosome
    statistics; ``by="ranges"`` shards into ``k`` contiguous ranges.
    """
    if by == "chromosome":
        shards = split_by_chromosome(batch)
    else:
        shards = split_ranges(batch, k or 1)
    opts = dataclasses.replace(options, per_shard_fit=False)
    parts = [call_one(s, opts, diag) for s in shards if s.num_sites > 0]
    if not parts:
        return call_one(batch, opts, diag)
    return concat_results(parts)
