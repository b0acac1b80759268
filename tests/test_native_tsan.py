"""ThreadSanitizer pass over the native parser + CSV writer (SURVEY §5.2)."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_parser_is_race_free(tmp_path):
    exe = str(tmp_path / "tsan_check")
    build = subprocess.run(
        [
            "g++", "-std=c++17", "-g", "-O1", "-fsanitize=thread", "-pthread",
            "-o", exe,
            os.path.join(REPO, "tools", "tsan_check.cpp"),
            os.path.join(REPO, "sid_tpu", "native", "parser.cpp"),
        ],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[-200:]}")
    run = subprocess.run([exe], capture_output=True, text=True, timeout=120)
    assert "WARNING: ThreadSanitizer" not in run.stderr, run.stderr[:2000]
    assert run.returncode == 0, (run.stdout, run.stderr[:2000])
    assert "tsan_check ok" in run.stdout
