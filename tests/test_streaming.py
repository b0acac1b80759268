"""Streaming two-pass engine: identical output to the in-memory path."""

import io

import numpy as np
import pytest

from sid_tpu.config import Options
from sid_tpu import engine
from sid_tpu.io.stream import accumulate_histogram, iter_chunks
from sid_tpu.ops.profiles import unique_profiles

from synth import make_pileup_text, simulate_diploid_counts


@pytest.fixture(scope="module")
def text():
    counts = simulate_diploid_counts(2500, coverage=18, pi=0.03, eps=0.01)
    return make_pileup_text(counts, with_qualities=True)


class TestIterChunks:
    def test_newline_alignment(self, text):
        chunks = list(iter_chunks(text, chunk_bytes=1 << 12))
        assert b"".join(chunks) == text
        for c in chunks[:-1]:
            assert c.endswith(b"\n")

    def test_single_chunk(self, text):
        chunks = list(iter_chunks(text, chunk_bytes=1 << 30))
        assert chunks == [text]

    def test_no_trailing_newline(self):
        data = b"c\t1\tA\t1\t."
        assert list(iter_chunks(data, 4)) == [data]


class TestHistogram:
    def test_matches_batch_unique(self, text):
        from sid_tpu.io.pileup import parse_pileup

        batch = parse_pileup(text)
        want_p, want_m, _ = unique_profiles(batch.counts)
        got_p, got_m, total = accumulate_histogram(text, chunk_bytes=1 << 13)
        assert total == batch.num_sites
        np.testing.assert_array_equal(got_p, want_p)
        np.testing.assert_array_equal(got_m, want_m)


@pytest.mark.parametrize("method", ["local", "bayes", "likelihood_ratio", "quality"])
def test_stream_equals_batch(text, method):
    whole = engine.run(text, Options(method=method))
    buf = io.StringIO()
    engine.run_streaming(
        text, Options(method=method), buf, chunk_bytes=1 << 14
    )
    assert buf.getvalue() == whole


def test_stream_with_estimated_prior(text):
    whole = engine.run(text, Options(method="local", estimate_prior=True))
    buf = io.StringIO()
    engine.run_streaming(
        text, Options(method="local", estimate_prior=True), buf, chunk_bytes=1 << 14
    )
    assert buf.getvalue() == whole


def test_stream_unknown_method(text):
    buf = io.StringIO()
    n = engine.run_streaming(text, Options(method="bogus"), buf)
    assert n == 0
    assert buf.getvalue() == "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n"


def test_stream_rejects_nonseekable():
    with pytest.raises(TypeError):
        engine.run_streaming(io.BytesIO(b"x"), Options())
