"""Cross-run validation aggregation (reference archive/analyze_validation.py)."""

import json

import numpy as np

from stereo_vision_tpu.pipeline.aggregation import (
    collect_run_results,
    error_vs_distance_table,
    generate_validation_report,
    overall_metrics,
    save_error_plots,
    save_run_results,
)
from stereo_vision_tpu.track.validators import ValidationResult


def _make_runs(tmp_path):
    """Three synthetic runs: JSON artifacts + one reference-schema pickle."""
    runs = [
        ("run_dist_2000mm", 2000.0, 2060.0),
        ("run_dist_3000mm", 3000.0, 2880.0),
        ("run_dist_4000mm", 4000.0, 4200.0),
    ]
    for name, actual, measured in runs[:2]:
        save_run_results(
            [ValidationResult.make("distance", measured, actual, 10.0)],
            tmp_path / f"{name}_validation.json",
            source=f"{name}.mp4",
        )
    # Reference pickle schema (analyze_validation.py:56-90), actual distance
    # only encoded in the filename.
    import pickle

    name, actual, measured = runs[2]
    with open(tmp_path / f"{name}_validation_results.pkl", "wb") as f:
        pickle.dump([{"measured_distance_mm": measured, "source": f"{name}.mp4"}], f)
    return runs


def test_collect_and_metrics(tmp_path):
    runs = _make_runs(tmp_path)
    results = collect_run_results(tmp_path)
    assert len(results) == 3
    m = overall_metrics(results)
    assert m["count"] == 3
    errs = sorted(100 * abs(me - a) / a for _, a, me in runs)
    assert abs(m["mean_error_percent"] - np.mean(errs)) < 1e-9
    assert abs(m["max_error_percent"] - max(errs)) < 1e-9

    table = error_vs_distance_table(results)
    assert [r["actual_distance_mm"] for r in table] == [2000.0, 3000.0, 4000.0]
    # pickle run's actual distance came from the filename convention
    assert table[2]["error_percent"] == 5.0


def test_report_and_plots(tmp_path):
    _make_runs(tmp_path)
    results = collect_run_results(tmp_path)
    out = tmp_path / "report"
    p = generate_validation_report(results, out)
    text = p.read_text()
    assert "Number of validation tests:** 3" in text
    assert "| 2000 |" in text and "| 4000 |" in text
    # mean error < 5% -> "excellent" recommendation branch
    metrics = json.loads((out / "validation_metrics.json").read_text())
    if metrics["mean_error_percent"] < 5.0:
        assert "excellent" in text
    plots = save_error_plots(results, out)
    assert len(plots) == 3 and all(q.stat().st_size > 1000 for q in plots)


def test_empty_dir(tmp_path):
    assert collect_run_results(tmp_path) == []
    assert overall_metrics([]) is None
    p = generate_validation_report([], tmp_path, plots=False)
    assert "No validation tests" in p.read_text()
