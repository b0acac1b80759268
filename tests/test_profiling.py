"""Profiling/observability module."""

from sid_tpu.config import Options
from sid_tpu import engine
from sid_tpu.utils import profiling

from synth import make_pileup_text, simulate_diploid_counts


def test_stage_profile_records_and_reports():
    p = profiling.StageProfile()
    with p.stage("alpha"):
        pass
    with p.stage("beta"):
        pass
    p.count("sites", 100)
    d = p.as_dict()
    assert "time_alpha_s" in d and "time_beta_s" in d
    assert d["sites"] == 100
    report = p.report()
    assert "# stage alpha" in report and "# throughput" in report


def test_engine_run_populates_active_profile():
    counts = simulate_diploid_counts(100, coverage=10)
    text = make_pileup_text(counts)
    p = profiling.StageProfile()
    profiling.activate(p)
    try:
        engine.run(text, Options(method="local"))
    finally:
        profiling.activate(None)
    names = [n for n, _ in p.stages]
    # default single-device local runs the host long-double classifier:
    # zero device dispatches; the host classify nests inside "call"
    assert [n for n in names if not n.startswith(("device:", "host:"))] == [
        "parse", "call", "serialize",
    ]
    assert "host:local_classify_ld" in names
    assert p.counters.get("device_dispatches", 0) == 0


def test_engine_run_device_path_profile(monkeypatch):
    """Forcing the slim device kernel records the device stage + dispatch."""
    monkeypatch.setenv("SIDTPU_EXACT_LOCAL_MAX_U", "0")
    counts = simulate_diploid_counts(100, coverage=10)
    text = make_pileup_text(counts)
    p = profiling.StageProfile()
    profiling.activate(p)
    try:
        engine.run(text, Options(method="local"))
    finally:
        profiling.activate(None)
    names = [n for n, _ in p.stages]
    assert "device:local_log_likelihoods" in names
    assert p.counters.get("device_dispatches") == 1
    assert profiling.device_seconds(p) > 0


def test_inactive_profile_is_noop():
    profiling.activate(None)
    with profiling.maybe_stage("x"):
        pass  # must not raise
