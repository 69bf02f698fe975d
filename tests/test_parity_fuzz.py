"""Randomized-regime parity fuzz: full fits vs the reference across mixed datasets.

A compressed version of the 20-seed sweep run during development (0/20 divergent):
random sizes straddling the primal/dual boundary, random feature scales, and four
target regimes (continuous, binary, skewed, few-unique-numeric — the last exercises
the direct-code binning path).
"""

import numpy as np
import pytest

from neo_ls_svm_tpu import NeoLSSVM

from .reference_shim import import_reference

import_reference()
from neo_ls_svm import NeoLSSVM as RefNeoLSSVM  # noqa: E402


@pytest.mark.parametrize("seed", [0, 3, 7, 11, 15, 19])
def test_randomized_regime_parity(seed) -> None:
    gen = np.random.RandomState(seed)
    n = int(gen.choice([300, 1024, 1025, 1800]))
    d = int(gen.randint(2, 16))
    kind = gen.choice(["reg", "clf", "skewed", "discrete"])
    X = gen.randn(n, d) * np.exp(gen.randn(d))
    if kind == "reg":
        y = X[:, 0] + np.sin(X[:, 1 % d]) + 0.3 * gen.randn(n)
    elif kind == "clf":
        y = np.where(X[:, 0] + 0.5 * gen.randn(n) > 0, "a", "b")
    elif kind == "skewed":
        y = np.exp(0.3 * X[:, 0] + 0.1 * gen.randn(n))
    else:
        y = np.round(X[:, 0] * 2).clip(-3, 3)
    ours = NeoLSSVM().fit(X, y)
    theirs = RefNeoLSSVM().fit(X, y)
    assert ours.γ_ == pytest.approx(theirs.γ_, rel=1e-9)
    scale = max(1.0, float(np.std(theirs.loo_residuals_)))
    np.testing.assert_allclose(
        ours.loo_residuals_, theirs.loo_residuals_, rtol=1e-4, atol=1e-4 * scale
    )
