"""Checkpoint/resume: persisted fit state and restartable streaming."""

import io
import os

import numpy as np

from sid_tpu.config import Options
from sid_tpu import engine
from sid_tpu.utils.checkpoint import (
    StreamProgress,
    input_fingerprint,
    load_fit_state,
    save_fit_state,
)

from synth import make_pileup_text, simulate_diploid_counts


def test_fit_state_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    profiles = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
    mult = np.array([10, 20], np.int64)
    save_fit_state(p, profiles, mult, pi=0.01, eps=0.005, nt=[0.3, 0.2, 0.3, 0.2])
    st = load_fit_state(p)
    np.testing.assert_array_equal(st["profiles"], profiles)
    np.testing.assert_array_equal(st["mult"], mult)
    assert st["pi"] == 0.01 and st["eps"] == 0.005
    assert load_fit_state(str(tmp_path / "missing.npz")) is None


def test_fit_state_fingerprint_mismatch_invalidates(tmp_path):
    p = str(tmp_path / "state.npz")
    profiles = np.array([[1, 2, 3, 4]], np.int32)
    mult = np.array([3], np.int64)
    fp_a = input_fingerprint(b"chr1\t1\tA\t2\t..\n")
    fp_b = input_fingerprint(b"chr1\t1\tA\t2\tCC\n")
    assert fp_a != fp_b
    save_fit_state(p, profiles, mult, fingerprint=fp_a)
    assert load_fit_state(p, fingerprint=fp_a) is not None
    # modified/different input: the stale histogram must be rejected
    assert load_fit_state(p, fingerprint=fp_b) is None
    # no fingerprint requested: still loads (API compatibility)
    assert load_fit_state(p) is not None


def test_input_fingerprint_path_matches_bytes(tmp_path):
    data = b"chr1\t1\tA\t2\t..\n" * 1000
    f = tmp_path / "in.pileup"
    f.write_bytes(data)
    assert input_fingerprint(str(f)) == input_fingerprint(data)


def test_resume_with_corrupt_sidecar_truncates_stale_output(tmp_path):
    counts = simulate_diploid_counts(300, coverage=15, pi=0.02, eps=0.01)
    text = make_pileup_text(counts)
    expected = engine.run(text, Options(method="local"))
    out_path = str(tmp_path / "out.csv")
    # a previous, longer output with no (or corrupt) progress sidecar
    with open(out_path, "w") as f:
        f.write(expected + "STALE-TRAILING-ROWS\n" * 50)
    with open(out_path, "r+") as out:
        engine.run_streaming(
            text, Options(method="local"), out, chunk_bytes=1 << 13,
            progress=StreamProgress(out_path), resume=True,
        )
    assert open(out_path).read() == expected


def test_streaming_checkpoint_skips_pass1(tmp_path):
    counts = simulate_diploid_counts(800, coverage=15, pi=0.02, eps=0.01)
    text = make_pileup_text(counts)
    ckpt = str(tmp_path / "hist.npz")
    buf1 = io.StringIO()
    engine.run_streaming(text, Options(method="bayes"), buf1, chunk_bytes=1 << 13,
                         checkpoint=ckpt)
    assert os.path.exists(ckpt)
    # resume: histogram comes from the checkpoint, output identical
    buf2 = io.StringIO()
    engine.run_streaming(text, Options(method="bayes"), buf2, chunk_bytes=1 << 13,
                         checkpoint=ckpt, resume=True)
    assert buf1.getvalue() == buf2.getvalue()


def test_streaming_pass2_resume(tmp_path):
    counts = simulate_diploid_counts(1200, coverage=15, pi=0.02, eps=0.01)
    text = make_pileup_text(counts)
    full = engine.run(text, Options(method="local"))

    out_path = str(tmp_path / "out.csv")
    progress = StreamProgress(out_path)
    # simulate an interrupted run: process only some chunks then stop
    chunks_budget = [2]
    real_save = progress.save

    class Stop(Exception):
        pass

    def limited_save(chunks_done, bytes_written):
        real_save(chunks_done, bytes_written)
        chunks_budget[0] -= 1
        if chunks_budget[0] <= 0:
            raise Stop()

    progress.save = limited_save
    try:
        with open(out_path, "w") as out:
            engine.run_streaming(text, Options(method="local"), out,
                                 chunk_bytes=1 << 13, progress=progress)
    except Stop:
        pass
    done, _ = StreamProgress(out_path).load()
    assert done == 2  # partial progress recorded

    # resume completes and matches the non-streaming output exactly
    progress2 = StreamProgress(out_path)
    with open(out_path, "r+") as out:
        engine.run_streaming(text, Options(method="local"), out,
                             chunk_bytes=1 << 13, progress=progress2, resume=True)
    assert open(out_path).read() == full
    assert not os.path.exists(progress2.sidecar)  # cleared on completion


def test_fit_state_suffixless_path_roundtrips(tmp_path):
    """--checkpoint without .npz: np.savez appends the suffix, so load must
    normalize identically or resume silently re-runs pass 1 every time."""
    p = str(tmp_path / "ckpt")  # no .npz
    profiles = np.array([[5, 1, 0, 0], [3, 3, 0, 0]], np.int32)
    mult = np.array([10, 2], np.int64)
    save_fit_state(p, profiles, mult, fingerprint="fp1")
    state = load_fit_state(p, fingerprint="fp1")
    assert state is not None
    np.testing.assert_array_equal(state["profiles"], profiles)
    assert load_fit_state(p, fingerprint="other") is None
