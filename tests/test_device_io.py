"""Device-resident prediction: jax.Array in → jax.Array out, no host round-trip.

Beyond-reference capability for TPU serving pipelines whose features already live on
device: `decision_function`, `predict_std`, and regressor `predict` accept a
``jax.Array`` and return one, with metadata-only validation (the NaN scan is skipped —
documented — because a device reduction would cost the round-trip the path avoids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neo_ls_svm_tpu import NeoLSSVM

from .conftest import make_classification_dataset, make_regression_dataset


@pytest.mark.parametrize("n", [1600, 700])  # primal and dual routes
def test_device_prediction_matches_host(n) -> None:
    X, y = make_regression_dataset(n=n, seed=21)
    model = NeoLSSVM().fit(X, y)
    X_dev = jnp.asarray(X[:200])
    for method in ("decision_function", "predict_std", "predict"):
        host = getattr(model, method)(X[:200])
        dev = getattr(model, method)(X_dev)
        assert isinstance(dev, jax.Array), f"{method} must stay on device"
        np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-10, atol=1e-12)


def test_device_classifier_predict_falls_back_to_labels() -> None:
    X, y = make_classification_dataset(n=700, seed=22)
    model = NeoLSSVM().fit(X, y)
    labels_host = model.predict(X[:100])
    labels_dev_in = model.predict(jnp.asarray(X[:100]))
    assert np.array_equal(labels_host, labels_dev_in)
    # decision_function itself stays on device for classifiers too.
    dev = model.decision_function(jnp.asarray(X[:100]))
    assert isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), model.decision_function(X[:100]), rtol=1e-10)


def test_device_input_validation() -> None:
    X, y = make_regression_dataset(n=1600, seed=23)
    model = NeoLSSVM().fit(X, y)
    with pytest.raises(ValueError, match="2D"):
        model.decision_function(jnp.asarray(X[0]))
    with pytest.raises(ValueError, match="features"):
        model.decision_function(jnp.asarray(X[:10, :3]))


def test_device_prediction_chunks(monkeypatch) -> None:
    import neo_ls_svm_tpu.models.estimator as est_mod

    X, y = make_regression_dataset(n=1600, seed=24)
    model = NeoLSSVM().fit(X, y)
    full = model.decision_function(jnp.asarray(X[:300]))
    monkeypatch.setattr(est_mod, "PREDICT_CHUNK_ROWS", 128)
    chunked = model.decision_function(jnp.asarray(X[:300]))
    assert isinstance(chunked, jax.Array)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-12)


def test_device_f32_input_casts_to_model_dtype() -> None:
    X, y = make_regression_dataset(n=1600, seed=25)
    model = NeoLSSVM().fit(X, y)  # f64 model (x64 test config)
    dev = model.decision_function(jnp.asarray(X[:50], dtype=jnp.float32))
    assert isinstance(dev, jax.Array)
    host = model.decision_function(X[:50])
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n", [1600, 700])  # primal and dual routes
def test_device_prediction_after_restore(n) -> None:
    """Device-resident prediction must work on a model restored from a state dict
    (the device cache re-stages from host state on first use)."""
    X, y = make_regression_dataset(n=n, seed=26)
    model = NeoLSSVM().fit(X, y)
    restored = NeoLSSVM.from_state_dict(model.to_state_dict())
    for method in ("decision_function", "predict_std", "predict"):
        dev = getattr(restored, method)(jnp.asarray(X[:50]))
        assert isinstance(dev, jax.Array)
        np.testing.assert_allclose(
            np.asarray(dev), getattr(model, method)(X[:50]), rtol=1e-10, atol=1e-12
        )
