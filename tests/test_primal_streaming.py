"""The streaming (O(chunk) memory) primal solver matches the in-memory solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from neo_ls_svm_tpu.models.primal import gamma_grid, primal_fit, primal_fit_streaming
from neo_ls_svm_tpu.ops.orff import OrthogonalRandomFourierFeatures

from .conftest import make_classification_dataset, make_regression_dataset


@pytest.mark.parametrize("task", ["regression", "classification"])
def test_streaming_matches_inmemory(task) -> None:
    if task == "regression":
        X, y = make_regression_dataset(n=2048, seed=61)
    else:
        X, y_raw = make_classification_dataset(n=2048, seed=61)
        y = np.where(y_raw == "pos", 1.0, -1.0)
    s = np.random.RandomState(62).rand(len(y)) + 0.25
    fmap = OrthogonalRandomFourierFeatures(num_features=64).fit(X, y, s)
    M_map, b_map = fmap.linear_map()
    gammas = gamma_grid(np.float64)
    args = (
        jnp.asarray(X),
        jnp.asarray(M_map),
        jnp.asarray(b_map),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gammas),
    )
    dense = primal_fit(*args, is_classifier=(task == "classification"))
    streamed = primal_fit_streaming(
        *args, is_classifier=(task == "classification"), row_chunk=256
    )
    assert float(streamed["gamma"]) == pytest.approx(float(dense["gamma"]), rel=1e-12)
    for key in ("loo_residuals", "loo_leverage", "loo_std", "residuals", "beta_emb"):
        np.testing.assert_allclose(
            np.asarray(streamed[key]), np.asarray(dense[key]), rtol=1e-6, atol=1e-10, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(streamed["loo_errors_gammas"]),
        np.asarray(dense["loo_errors_gammas"]),
        rtol=1e-8,
    )
    assert float(streamed["loo_score"]) == pytest.approx(float(dense["loo_score"]), rel=1e-8)


def test_streaming_with_padding_matches_unpadded() -> None:
    X, y = make_regression_dataset(n=1000, seed=63)
    s = np.ones_like(y)
    fmap = OrthogonalRandomFourierFeatures(num_features=32).fit(X, y, s)
    M_map, b_map = fmap.linear_map()
    gammas = gamma_grid(np.float64)
    # Pad rows to the chunk multiple with zero weights.
    pad = 1024 - 1000
    X_p = np.vstack([X, np.zeros((pad, X.shape[1]))])
    y_p = np.concatenate([y, np.zeros(pad)])
    s_p = np.concatenate([s, np.zeros(pad)])
    padded = primal_fit_streaming(
        jnp.asarray(X_p),
        jnp.asarray(M_map),
        jnp.asarray(b_map),
        jnp.asarray(y_p),
        jnp.asarray(s_p),
        jnp.asarray(gammas),
        is_classifier=False,
        row_chunk=256,
        num_samples=1000,
    )
    dense = primal_fit(
        jnp.asarray(X),
        jnp.asarray(M_map),
        jnp.asarray(b_map),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gammas),
        is_classifier=False,
    )
    assert float(padded["gamma"]) == pytest.approx(float(dense["gamma"]), rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(padded["loo_residuals"])[:1000],
        np.asarray(dense["loo_residuals"]),
        rtol=1e-6,
        atol=1e-10,
    )


def test_pallas_gram_path_matches(monkeypatch) -> None:
    """The fused Pallas Gram (interpret mode on CPU) gives the same fit."""
    import neo_ls_svm_tpu.ops.pallas.gram as gram_mod

    original = gram_mod.fused_augmented_gram

    def interpreted(*args, **kwargs):
        kwargs["interpret"] = True
        return original.__wrapped__(*args, **kwargs)

    monkeypatch.setattr(gram_mod, "fused_augmented_gram", interpreted)
    X, y = make_regression_dataset(n=1024, seed=64)
    s = np.ones_like(y)
    fmap = OrthogonalRandomFourierFeatures(num_features=32).fit(X, y, s)
    M_map, b_map = fmap.linear_map()
    gammas = gamma_grid(np.float64)
    args = (
        jnp.asarray(X),
        jnp.asarray(M_map),
        jnp.asarray(b_map),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gammas),
    )
    plain = primal_fit_streaming(*args, is_classifier=False, row_chunk=256)
    fused = primal_fit_streaming(
        *args, is_classifier=False, row_chunk=256, use_pallas_gram=True
    )
    assert float(fused["gamma"]) == pytest.approx(float(plain["gamma"]), rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(fused["loo_residuals"]), np.asarray(plain["loo_residuals"]), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(fused["beta_emb"]), np.asarray(plain["beta_emb"]), rtol=1e-7, atol=1e-12
    )


def test_pallas_sweep_path_matches(monkeypatch) -> None:
    """The fused Pallas sweep (interpret mode on CPU) selects the same gamma."""
    import neo_ls_svm_tpu.ops.pallas.sweep as sweep_mod

    original = sweep_mod.fused_loo_sweep

    def interpreted(*args, **kwargs):
        kwargs["interpret"] = True
        return original.__wrapped__(*args, **kwargs)

    monkeypatch.setattr(sweep_mod, "fused_loo_sweep", interpreted)
    X, y_raw = make_classification_dataset(n=1024, seed=65)
    y = np.where(y_raw == "pos", 1.0, -1.0)
    s = np.random.RandomState(66).rand(len(y)) + 0.25
    fmap = OrthogonalRandomFourierFeatures(num_features=32).fit(X, y, s)
    M_map, b_map = fmap.linear_map()
    gammas = gamma_grid(np.float64)
    args = (
        jnp.asarray(X),
        jnp.asarray(M_map),
        jnp.asarray(b_map),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gammas),
    )
    plain = primal_fit_streaming(*args, is_classifier=True, row_chunk=256)
    fused = primal_fit_streaming(
        *args, is_classifier=True, row_chunk=256, use_pallas_sweep=True
    )
    assert float(fused["gamma"]) == pytest.approx(float(plain["gamma"]), rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(fused["loo_errors_gammas"]),
        np.asarray(plain["loo_errors_gammas"]),
        rtol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(fused["loo_residuals"]), np.asarray(plain["loo_residuals"]), rtol=1e-6, atol=1e-10
    )
