"""Isotonic calibrator parity vs sklearn's IsotonicRegression (the reference's choice)."""

import numpy as np
import pytest
from sklearn.isotonic import IsotonicRegression

from neo_ls_svm_tpu.models.isotonic import IsotonicCalibrator, pool_adjacent_violators


def test_pav_basic() -> None:
    y = np.array([1.0, 3.0, 2.0, 4.0])
    w = np.ones(4)
    out = pool_adjacent_violators(y, w)
    assert np.all(np.diff(out) >= 0)
    np.testing.assert_allclose(out, [1.0, 2.5, 2.5, 4.0])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("weighted", [False, True])
def test_matches_sklearn(seed, weighted) -> None:
    gen = np.random.RandomState(seed)
    x = gen.randn(500)
    # Binary targets as in predict_proba calibration, with duplicate x values.
    x = np.round(x, 1)
    y = (x + 0.5 * gen.randn(500) > 0).astype(float)
    w = gen.rand(500) + 0.1 if weighted else None
    ours = IsotonicCalibrator(y_min=0, y_max=1, increasing=True, out_of_bounds="clip")
    ours.fit(x, y, sample_weight=w)
    theirs = IsotonicRegression(out_of_bounds="clip", y_min=0, y_max=1, increasing=True)
    theirs.fit(x, y, sample_weight=w)
    x_new = np.concatenate([gen.randn(300), [-10, 10]])  # incl. out-of-range probes
    np.testing.assert_allclose(ours.transform(x_new), theirs.transform(x_new), atol=1e-12)
