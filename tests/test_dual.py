"""Parity of the eigenbasis-refactored dual solver against the reference."""

import jax.numpy as jnp
import functools

import numpy as np
import pytest

from neo_ls_svm_tpu.models.dual import dual_decision_function, dual_fit, dual_predict_var
from neo_ls_svm_tpu.models.primal import gamma_grid
from neo_ls_svm_tpu.ops.affine import AffineSeparator

from .conftest import make_classification_dataset, make_regression_dataset
from .reference_shim import import_reference

import_reference()
from neo_ls_svm import NeoLSSVM as RefNeoLSSVM  # noqa: E402


@functools.lru_cache(maxsize=None)
def _fit_both(task: str, weighted: bool = False, n: int = 700):
    # Module-level cache: the unweighted-regression pair is consumed by two tests
    # (parity + decision/variance); every consumer reads the results only
    # (suite-wall budget, VERDICT r4 #7).
    if task == "regression":
        X, y = make_regression_dataset(n=n, seed=21)
    else:
        X, y_raw = make_classification_dataset(n=n, seed=21)
        y = np.where(y_raw == "pos", 1.0, -1.0)
    s = (np.random.RandomState(22).rand(len(y)) + 0.25) if weighted else np.ones_like(y)

    sep = AffineSeparator().fit(X, y, s)
    X_t = sep.transform(X)

    ref = RefNeoLSSVM()
    ref._estimator_type = "classifier" if task == "classification" else "regressor"
    ref_alpha, ref_gamma = ref._optimize_α̂_γ(X_t.copy(), y, s.copy())

    gammas = gamma_grid(np.float64, num=128)
    ours = dual_fit(
        jnp.asarray(X_t),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gammas),
        is_classifier=(task == "classification"),
    )
    return X, X_t, y, s, sep, ref, ref_alpha, ref_gamma, ours


@pytest.mark.parametrize("task", ["regression", "classification"])
@pytest.mark.parametrize("weighted", [False, True])
def test_dual_solver_matches_reference(task, weighted) -> None:
    X, X_t, y, s, sep, ref, ref_alpha, ref_gamma, ours = _fit_both(task, weighted)
    assert float(ours["gamma"]) == pytest.approx(ref_gamma, rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(ours["loo_errors_gammas"]), ref.loo_errors_γs_, rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ours["loo_residuals"]), ref.loo_residuals_, rtol=1e-5, atol=1e-9
    )
    assert float(ours["loo_error"]) == pytest.approx(ref.loo_error_, rel=1e-6)
    assert float(ours["loo_score"]) == pytest.approx(ref.loo_score_, rel=1e-6)
    np.testing.assert_allclose(np.asarray(ours["alpha"]), ref_alpha, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["loo_std"]), ref.loo_std_, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["residuals"]), ref.residuals_, rtol=1e-5, atol=1e-9)


def test_dual_decision_and_var_consistency() -> None:
    X, X_t, y, s, sep, ref, ref_alpha, ref_gamma, ours = _fit_both("regression")
    X_new = np.random.RandomState(23).randn(150, X.shape[1])
    X_new_t = sep.transform(X_new)
    # Reference decision function: k(x, X)α̂ + Σα̂ with sklearn's rbf_kernel.
    from sklearn.metrics.pairwise import rbf_kernel as sk_rbf

    ref_decision = sk_rbf(X_new_t, X_t, gamma=0.5) @ ref_alpha + np.sum(ref_alpha)
    ours_decision = np.asarray(
        dual_decision_function(jnp.asarray(X_new_t), jnp.asarray(X_t), ours["alpha"])
    )
    np.testing.assert_allclose(ours_decision, ref_decision, rtol=1e-6, atol=1e-10)
    var = np.asarray(dual_predict_var(jnp.asarray(X_new_t), jnp.asarray(X_t), ours["chol"]))
    assert var.shape == (150,)
    assert np.all(var > -1e-9)
    # In-sample variance must match the stored loo_std².
    var_train = np.asarray(dual_predict_var(jnp.asarray(X_t), jnp.asarray(X_t), ours["chol"]))
    np.testing.assert_allclose(var_train, np.asarray(ours["loo_std"]) ** 2, rtol=1e-6, atol=1e-10)


def test_dual_solver_rho_surface_regulariser_matches_reference() -> None:
    """ρ ≠ 1 activates the surface-complexity term C (ref _neo_ls_svm.py:256-263)."""
    X, y = make_regression_dataset(n=500, seed=25)
    s = np.ones_like(y)
    sep = AffineSeparator().fit(X, y, s)
    X_t = sep.transform(X)
    ref = RefNeoLSSVM()
    ref._estimator_type = "regressor"
    ref_alpha, ref_gamma = ref._optimize_α̂_γ(X_t.copy(), y, s.copy(), ρ=0.7)
    ours = dual_fit(
        jnp.asarray(X_t),
        jnp.asarray(y),
        jnp.asarray(s),
        jnp.asarray(gamma_grid(np.float64, num=128)),
        rho=0.7,
        is_classifier=False,
    )
    assert float(ours["gamma"]) == pytest.approx(ref_gamma, rel=1e-12)
    np.testing.assert_allclose(np.asarray(ours["alpha"]), ref_alpha, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours["loo_residuals"]), ref.loo_residuals_, rtol=1e-5, atol=1e-9
    )
