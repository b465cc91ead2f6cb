"""Unit tests for bench.py's BENCH_BEST.json bookkeeping.

The outage fallback (round-3 verdict #1) is only as durable as
BENCH_BEST.json: the round-4 machine reset wiped the retry harness's copy,
so bench.py now self-heals the file after every successful run. These tests
pin that logic without touching hardware — they drive _save_best_record
directly against a temp path.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    # bench.py lives at the repo root, outside the package; import it by
    # path so the test is independent of sys.path ordering.
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_save_best_writes_and_only_improves(tmp_path):
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    # zero value: nothing written (a failed/outage run must not clobber)
    bench._RESULT["value"] = 0.0
    bench._save_best_record(str(best))
    assert not best.exists()

    # first real value lands with provenance
    bench._RESULT["value"] = 1234.5
    bench._RESULT["vs_baseline"] = 24.69
    bench._RESULT["detail"]["best_batch"] = 128
    bench._save_best_record(str(best))
    payload = json.loads(best.read_text())
    assert payload["record"]["value"] == 1234.5
    assert payload["harness"] == "bench.py"
    assert payload["measured_at"]

    # a worse later run must NOT overwrite the stored best
    bench._RESULT["value"] = 1000.0
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 1234.5

    # a better later run supersedes it
    bench._RESULT["value"] = 2000.0
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 2000.0


_ALL_BASELINE_SECTIONS = [
    "imports", "infer_b128", "sw_b1", "sw_b16", "infer_b1",
    "train_b8", "train_b64",
]


def test_save_best_sha_refresh_rules(tmp_path):
    """A COMPLETE run at the current HEAD may refresh a record whose
    measuring sha is unknown/stale even at a slightly lower value (fallback
    provenance freshness beats ≤7% noise) — but partial runs, same-sha
    runs, and >7% regressions never do."""
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    def store(value, sha):
        best.write_text(json.dumps({
            "record": {"value": value, "metric": "m", "unit": "u",
                       "vs_baseline": 1.0,
                       "detail": {"sections_done": _ALL_BASELINE_SECTIONS}},
            "git_sha": sha,
        }))

    # complete current-HEAD run vs null-sha record, within 7%: refreshes
    store(14000.0, None)
    bench._RESULT.update(value=13500.0, metric="m", unit="u", vs_baseline=1.0)
    bench._RESULT["detail"]["sections_done"] = list(_ALL_BASELINE_SECTIONS)
    bench._save_best_record(str(best))
    payload = json.loads(best.read_text())
    assert payload["record"]["value"] == 13500.0
    assert payload["git_sha"], "refresh must stamp the measuring sha"
    assert payload["superseded_prev"]["value"] == 14000.0

    # same sha, lower value: keeps the stored record
    bench._RESULT["value"] = 13000.0
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 13500.0

    # PARTIAL run vs stale sha: never refreshes (headline-only sections)
    store(14000.0, "deadbeef")
    bench._RESULT["value"] = 13900.0
    bench._RESULT["detail"]["sections_done"] = ["imports", "infer_b128"]
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 14000.0

    # complete run but >7% below the stored value: never refreshes
    bench._RESULT["value"] = 12000.0
    bench._RESULT["detail"]["sections_done"] = list(_ALL_BASELINE_SECTIONS)
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 14000.0


def test_save_best_survives_corrupt_file(tmp_path):
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"
    best.write_text("{not json")
    bench._RESULT["value"] = 42.0
    # must not raise; a corrupt prior best is treated as absent (prev=0)
    # so the real measurement still lands instead of being wedged forever
    bench._save_best_record(str(best))
    assert json.loads(best.read_text())["record"]["value"] == 42.0


def test_fallback_to_best_replaces_zero_with_stored_record(tmp_path):
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    # no stored best: fallback is a no-op
    bench._RESULT["value"] = 0.0
    assert bench._fallback_to_best("watchdog_no_measurement", str(best)) is False

    # store a real record, then simulate a zero run (cold-cache watchdog)
    bench._RESULT["value"] = 13000.0
    bench._RESULT["vs_baseline"] = 260.0
    bench._RESULT["detail"]["best_batch"] = 128
    bench._RESULT["detail"]["watchdog_fired"] = True  # stale flag must not leak
    bench._save_best_record(str(best))

    bench._RESULT["value"] = 0.0
    bench._RESULT["vs_baseline"] = 0.0
    bench._RESULT["detail"] = {"volume": [96, 96, 96], "best_batch": 0,
                               "sections_done": []}
    assert bench._fallback_to_best("watchdog_no_measurement", str(best)) is True
    assert bench._RESULT["value"] == 13000.0
    assert bench._RESULT["vs_baseline"] == 260.0
    d = bench._RESULT["detail"]
    assert d["from_best_record"] is True
    assert d["fallback_reason"] == "watchdog_no_measurement"
    assert d["measured_at"]
    assert "watchdog_fired" not in d  # the stored run's flag was scrubbed

    # a PARTIAL run (headline section never completed) must yield to a
    # better stored record — the metric is peak throughput, and a b1-only
    # run reporting 724 vol/s as "the" number is the round-4 driver bug
    bench._RESULT["value"] = 724.0
    bench._RESULT["detail"]["sections_done"] = ["imports", "train_b8", "infer_b1"]
    assert bench._fallback_to_best("sections_no_measurement", str(best)) is True
    assert bench._RESULT["value"] == 13000.0
    assert bench._RESULT["detail"]["fallback_reason"] == "headline_section_missing"
    assert bench._RESULT["detail"]["this_run_value"] == 724.0
    assert bench._RESULT["detail"]["this_run_sections"] == [
        "imports", "train_b8", "infer_b1"]

    # a COMPLETE run (headline section done) always stands, even if slower
    # than the stored best — regressions must stay visible
    bench._RESULT["value"] = 9000.0
    bench._RESULT["detail"]["sections_done"] = ["imports", "infer_b128"]
    bench._RESULT["detail"].pop("from_best_record")
    assert bench._fallback_to_best("sections_no_measurement", str(best)) is False
    assert bench._RESULT["value"] == 9000.0

    # a partial run BETTER than the stored record also stands
    bench._RESULT["value"] = 15000.0
    bench._RESULT["detail"]["sections_done"] = ["imports", "infer_b1"]
    assert bench._fallback_to_best("sections_no_measurement", str(best)) is False
    assert bench._RESULT["value"] == 15000.0


def test_errored_headline_does_not_count_as_done(tmp_path):
    """round-4 advisor: an infer_b128 that RAISED must not satisfy the
    'headline done' check — a partial run would otherwise report batch-1
    latency as the peak-throughput metric through the exception path."""
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    bench._RESULT["value"] = 13000.0
    bench._RESULT["detail"]["sections_done"] = ["imports", "infer_b128"]
    bench._save_best_record(str(best))

    # partial run: infer_b1 succeeded (724), infer_b128 errored. With
    # success-only sections_done the name is absent; the error key is the
    # belt-and-braces second signal.
    bench._RESULT["value"] = 724.0
    bench._RESULT["detail"] = {
        "volume": [96, 96, 96], "best_batch": 1,
        "sections_done": ["imports", "infer_b1"],
        "infer_b128_error": "RuntimeError",
    }
    assert bench._fallback_to_best("sections_no_measurement", str(best)) is True
    assert bench._RESULT["value"] == 13000.0
    assert bench._RESULT["detail"]["this_run_value"] == 724.0


def test_best_record_carries_git_sha_and_flags_mismatch(tmp_path):
    """round-4 advisor: a fallback must say WHICH commit's code the stored
    number measured, and flag when that differs from the current HEAD."""
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    bench._RESULT["value"] = 9000.0
    bench._save_best_record(str(best))
    payload = json.loads(best.read_text())
    assert payload["git_sha"], "measuring SHA not recorded at save time"

    # simulate the record having been measured on an older commit
    payload["git_sha"] = "0" * 40
    best.write_text(json.dumps(payload))

    bench._RESULT["value"] = 0.0
    bench._RESULT["detail"] = {"volume": [96, 96, 96], "best_batch": 0,
                               "sections_done": []}
    assert bench._fallback_to_best("watchdog_no_measurement", str(best)) is True
    d = bench._RESULT["detail"]
    assert d["best_record_git_sha"] == "0" * 40
    assert d["best_record_sha_mismatch"] is True
    assert d["from_best_record_keys"]  # per-key provenance present


def test_merge_best_details_fills_skipped_sections(tmp_path):
    """round-4 verdict #2: a run whose budget skipped the sliding-window
    sections must still carry their metrics in the final record, each key
    explicitly attributed to the stored best record."""
    bench = _load_bench()
    best = tmp_path / "BENCH_BEST.json"

    bench._RESULT["value"] = 13000.0
    bench._RESULT["detail"] = {
        "volume": [96, 96, 96], "best_batch": 128,
        "sections_done": ["imports", "infer_b128", "sw_b1", "sw_b16"],
        "sliding_window_192x224x192_volumes_per_sec": 145.0,
        "sliding_window_192x224x192_x16_volumes_per_sec": 310.0,
    }
    bench._save_best_record(str(best))

    # this run: headline done, sw sections budget-skipped
    bench._RESULT["value"] = 13900.0
    bench._RESULT["detail"] = {
        "volume": [96, 96, 96], "best_batch": 128,
        "sections_done": ["imports", "infer_b128"],
        "train_64cube_batch8_volumes_per_sec": 1885.0,
    }
    bench._merge_best_details(str(best))
    d = bench._RESULT["detail"]
    assert d["sliding_window_192x224x192_volumes_per_sec"] == 145.0
    assert d["sliding_window_192x224x192_x16_volumes_per_sec"] == 310.0
    assert set(d["from_best_record_keys"]) == {
        "sliding_window_192x224x192_volumes_per_sec",
        "sliding_window_192x224x192_x16_volumes_per_sec",
    }
    # keys measured THIS run are never overwritten or re-attributed
    assert d["train_64cube_batch8_volumes_per_sec"] == 1885.0
    # a complete headline + merged details must NOT trigger a full fallback
    assert bench._fallback_to_best("sections_no_measurement", str(best)) is False
    assert bench._RESULT["value"] == 13900.0
