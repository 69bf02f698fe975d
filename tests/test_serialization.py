"""Checkpoint/resume: state-dict and pickle round-trips preserve predictions."""

import pickle

import numpy as np
import pytest

from neo_ls_svm_tpu import NeoLSSVM

from .conftest import make_classification_dataset, make_regression_dataset


@pytest.mark.parametrize("task,n", [("regression", 1500), ("classification", 1500),
                                    ("regression", 700), ("classification", 700)])
def test_state_dict_roundtrip(task, n) -> None:
    if task == "regression":
        X, y = make_regression_dataset(n=n, seed=51)
    else:
        X, y = make_classification_dataset(n=n, seed=51)
    model = NeoLSSVM().fit(X[:-200], y[:-200])
    X_test = X[-200:]
    # Fit a conformal predictor so the lazy caches round-trip too.
    iv_before = np.asarray(model.predict_interval(X_test, coverage=0.9))
    state = model.to_state_dict()
    restored = NeoLSSVM.from_state_dict(state)
    np.testing.assert_array_equal(restored.predict(X_test), model.predict(X_test))
    np.testing.assert_array_equal(
        np.asarray(restored.decision_function(X_test)), np.asarray(model.decision_function(X_test))
    )
    np.testing.assert_array_equal(
        np.asarray(restored.predict_std(X_test)), np.asarray(model.predict_std(X_test))
    )
    np.testing.assert_array_equal(np.asarray(restored.predict_interval(X_test, coverage=0.9)), iv_before)
    if task == "classification":
        np.testing.assert_array_equal(
            np.asarray(restored.predict_proba(X_test)), np.asarray(model.predict_proba(X_test))
        )
    np.testing.assert_array_equal(restored.loo_residuals_, model.loo_residuals_)
    assert restored.γ_ == model.γ_


def test_state_dict_is_arrays_and_scalars() -> None:
    X, y = make_regression_dataset(n=1300, seed=52)
    model = NeoLSSVM().fit(X, y)
    state = model.to_state_dict()

    def walk(node, path=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        else:
            assert (
                node is None
                or isinstance(node, (str, bool, int, float, np.generic, np.ndarray, np.dtype, tuple))
            ), f"non-serialisable leaf at {path}: {type(node)}"

    walk(state)


def test_pickle_roundtrip() -> None:
    X, y = make_classification_dataset(n=1400, seed=53)
    model = NeoLSSVM().fit(X[:-100], y[:-100])
    blob = pickle.dumps(model)
    restored = pickle.loads(blob)
    np.testing.assert_array_equal(restored.predict(X[-100:]), model.predict(X[-100:]))
