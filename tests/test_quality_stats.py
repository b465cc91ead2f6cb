"""tools/quality_stats.py: eval-grid reduction + error-bar aggregation."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "quality_stats", REPO / "tools" / "quality_stats.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["quality_stats"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_grid(run_dir: Path, values: dict, f1_as_dict: bool = False):
    """values: {(iou, sc): (mAP, f1)}. cli.eval writes f1_score as a plain
    float for single-class runs (the committed artifacts) and as a per-class
    dict for multi-class ones — cover both shapes."""
    run_dir.mkdir(parents=True, exist_ok=True)
    for (iou, sc), (mAP, f1) in values.items():
        p = run_dir / f"metrics_(min_IoU={iou}_min_score={sc}).json"
        p.write_text(json.dumps({
            "mAP": mAP, "f1_score": {"1": f1} if f1_as_dict else f1,
            "precision": 0.5, "recall": 0.5,
        }))


def test_reduce_run_takes_operating_point_maxima(tmp_path):
    qs = _load()
    _write_grid(tmp_path, {
        ("0.5", "0.1"): (0.30, 0.20),
        ("0.5", "0.5"): (0.28, 0.40),   # best f1 at a different score
        ("0.1", "0.1"): (0.55, 0.50),
        ("0.1", "0.5"): (0.50, 0.52),
    })
    r = qs.reduce_run(tmp_path)
    assert r["mAP@0.5"] == 0.30 and r["mAP@0.5_at_score"] == 0.1
    assert r["best_f1@0.5"] == 0.40 and r["best_f1@0.5_at_score"] == 0.5
    assert r["mAP@0.1"] == 0.55
    assert r["best_f1@0.1"] == 0.52


def test_reduce_run_accepts_per_class_f1_dicts(tmp_path):
    qs = _load()
    _write_grid(tmp_path, {
        ("0.5", "0.1"): (0.30, 0.20),
        ("0.5", "0.5"): (0.28, 0.40),
    }, f1_as_dict=True)
    r = qs.reduce_run(tmp_path)
    assert r["best_f1@0.5"] == 0.40 and r["best_f1@0.5_at_score"] == 0.5


def test_mean_sd_and_group(tmp_path):
    qs = _load()
    stats = qs.mean_sd([0.30, 0.32, 0.34])
    assert stats["mean"] == 0.32 and stats["n"] == 3
    assert abs(stats["sd"] - 0.02) < 1e-9
    # single sample: sd 0, not NaN/crash
    assert qs.mean_sd([0.5])["sd"] == 0.0

    runs = {
        "a": {"mAP@0.5": 0.30, "best_f1@0.5": 0.4,
              "mAP@0.1": 0.5, "best_f1@0.1": 0.5},
        "b": {"mAP@0.5": 0.34, "best_f1@0.5": 0.5,
              "mAP@0.1": 0.6, "best_f1@0.1": 0.6},
    }
    g = qs.group(runs)
    assert g["mAP@0.5"]["mean"] == 0.32
    assert g["mAP@0.5"]["values"] == [0.3, 0.34]
