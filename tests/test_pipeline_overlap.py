"""The overlapped chunk pipeline must be byte-equal to the monolithic path.

engine._run_pipelined_single_pass engages above SIDTPU_PIPELINE_MB (default
1 GB, so neither the suite nor the 110 MB bench inputs ever executed it —
verdict-r3 weak #1). These tests force it on with a 1 MB threshold and 1 MB
chunks over a grammar-rich multi-chunk input and assert the pipelined output
is byte-identical to the monolithic run for both eligible methods
(local/quality), from bytes and from a path, including the error channel.
"""

import os

import pytest

from sid_tpu import engine
from sid_tpu.config import Options

from synth import make_bwa_like_pileup_scaled


@pytest.fixture(scope="module")
def big_text():
    # ~25k grammar-rich sites (~3 MB): indels, ^X/$ markers, '*', N refs,
    # Phred variance — several 1 MB chunks with escape-fallback lines inside
    return make_bwa_like_pileup_scaled(25_000)


@pytest.fixture()
def pipeline_env(monkeypatch):
    monkeypatch.setenv("SIDTPU_PIPELINE_MB", "1")
    monkeypatch.setenv("SIDTPU_PIPELINE_CHUNK_MB", "1")


@pytest.mark.parametrize("method", ["local", "quality"])
def test_pipelined_byte_equal_bytes_input(big_text, pipeline_env, method, monkeypatch):
    opts = Options(method=method)
    assert len(big_text) > 2 * (1 << 20), "input must span multiple chunks"
    got = engine.run(big_text, opts, binary=True)
    monkeypatch.delenv("SIDTPU_PIPELINE_MB")
    want = engine.run(big_text, opts, binary=True)
    assert not engine._pipeline_eligible(opts, len(big_text))
    assert got == want


@pytest.mark.parametrize("method", ["local", "quality"])
def test_pipelined_byte_equal_path_input(
    big_text, pipeline_env, method, tmp_path, monkeypatch
):
    src = tmp_path / "in.pileup"
    src.write_bytes(big_text)
    opts = Options(method=method)
    got = engine.run(str(src), opts, binary=True)
    monkeypatch.delenv("SIDTPU_PIPELINE_MB")
    want = engine.run(str(src), opts, binary=True)
    assert got == want


def test_pipelined_text_mode_and_eligibility(big_text, pipeline_env):
    opts = Options(method="local")
    assert engine._pipeline_eligible(opts, len(big_text))
    # ineligible combinations stay monolithic even above the threshold
    assert not engine._pipeline_eligible(
        Options(method="bayes"), len(big_text)
    )
    assert not engine._pipeline_eligible(
        Options(method="local", estimate_prior=True), len(big_text)
    )
    assert not engine._pipeline_eligible(
        Options(method="local", engine="exact"), len(big_text)
    )
    # str return mode joins text parts
    got = engine.run(big_text, opts)
    assert isinstance(got, str) and got.startswith("chrom,pos,")


def test_pipelined_empty_input(pipeline_env, monkeypatch):
    # the first-chunk-None path returns a bare header; force eligibility
    # by dropping the threshold to zero
    monkeypatch.setenv("SIDTPU_PIPELINE_MB", "0")
    got = engine.run(b"", Options(method="local"), binary=True)
    assert got == b"chrom,pos,label,gt,hom_conf,het_conf,conf_type\n"
