"""The AutoML benchmark harness (benchmark/automl.py, VERDICT r3 #5).

The real suite needs OpenML (no egress here); these tests drive the identical
pipeline/scoring/table code path through the offline synthetic fallback on the
smallest tasks, and check the reference-protocol constants.
"""

import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from benchmark import automl  # noqa: E402
from benchmark import synthetic  # noqa: E402


def _args(**overrides):
    base = {"smoke": True, "limit": None, "skip_reference": True, "no_record": True}
    base.update(overrides)
    return argparse.Namespace(**base)


def test_dataset_lists_match_reference_protocol() -> None:
    """Same suites and skip thresholds as the reference scripts
    (ref benchmark/classification.py:22-63,92-98; regression.py:22-56)."""
    assert len(automl.CLASSIFICATION_TASKS) == 38
    assert len(automl.REGRESSION_TASKS) == 33
    assert ("churn", 1) in automl.CLASSIFICATION_TASKS
    assert ("tecator", 1) in automl.REGRESSION_TASKS
    assert ("diamonds", 1) in automl.REGRESSION_TASKS
    assert automl.MAX_TRAIN_CELLS == 1_000_000
    assert automl.MAX_SVM_ROWS == 10_000


def test_smoke_regression_suite_end_to_end(monkeypatch: pytest.MonkeyPatch) -> None:
    monkeypatch.setattr(synthetic, "TASKS", ["small-reg"])
    status, records = automl.run_suite("reg", _args())
    assert status == 0
    by_model = {r["model"]: r for r in records}
    assert "NeoLSSVM" in by_model and "SVR" in by_model
    for r in records:
        assert r["kind"] == "reg"
        assert r["fit_seconds"] > 0
        assert np.isfinite(r["r2"])
    assert by_model["NeoLSSVM"]["r2"] > by_model["SVR"]["r2"] - 0.2
    table = automl.comparison_table(records, "r2")
    assert "🥇" in table and "small-reg" in table


def test_smoke_classification_suite_end_to_end(monkeypatch: pytest.MonkeyPatch) -> None:
    monkeypatch.setattr(synthetic, "TASKS", ["small-dual"])
    status, records = automl.run_suite("clf", _args())
    assert status == 0
    by_model = {r["model"]: r for r in records}
    assert "NeoLSSVM" in by_model and "SVC" in by_model
    for r in records:
        assert r["kind"] == "clf"
        assert 0.0 <= r["roc_auc"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0


def test_offline_without_smoke_skips_cleanly(monkeypatch: pytest.MonkeyPatch) -> None:
    monkeypatch.setattr(automl, "online", lambda *a, **k: False)
    status, records = automl.run_suite("reg", _args(smoke=False))
    assert status == 1
    assert records == []


def test_append_results_merges_on_task_and_model(tmp_path) -> None:
    path = str(tmp_path / "results.json")
    automl.append_results(
        [{"task": "t", "model": "m", "r2": 0.5, "kind": "reg", "n": 1, "d": 1,
          "fit_seconds": 0.1}],
        path,
    )
    automl.append_results(
        [{"task": "t", "model": "m", "r2": 0.7, "kind": "reg", "n": 1, "d": 1,
          "fit_seconds": 0.2}],
        path,
    )
    import json

    with open(path) as fh:
        rows = json.load(fh)
    assert len(rows) == 1
    assert rows[0]["r2"] == 0.7
