"""Property-based invariants for the statistics layer (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from neo_ls_svm_tpu.ops.quantizer import Quantizer, hist_quantized_ecdf
from neo_ls_svm_tpu.ops.weighted_quantile import weighted_quantile

finite_floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(finite_floats, min_size=20, max_size=400),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_weighted_quantile_bounds_and_uniform_limit(values, q) -> None:
    a = np.asarray(values)
    w = np.ones_like(a)
    out = float(weighted_quantile(a, w, q, axis=None)[0])
    # Bounded by the data range.
    assert a.min() - 1e-9 <= out <= a.max() + 1e-9
    # Monotone in q.
    lo = float(weighted_quantile(a, w, max(q - 0.2, 0.0), axis=None)[0])
    assert lo <= out + 1e-9


@settings(max_examples=25, deadline=None)
@given(st.lists(finite_floats, min_size=40, max_size=2000))
def test_hist_quantized_ecdf_invariants(values) -> None:
    x = np.asarray(values)
    hist, edges = hist_quantized_ecdf(x, density=False)
    assert len(edges) == len(hist) + 1
    # Edges are sorted and span the data.
    assert np.all(np.diff(edges) >= 0)
    assert edges[0] <= x.min() and edges[-1] >= x.max()
    # Counts are nonnegative and near-complete (the reference's merge branch may be
    # off by one or two — parity-preserved behaviour).
    assert np.all(np.asarray(hist) >= 0)
    assert abs(int(np.sum(hist)) - len(x)) <= 2


@settings(max_examples=25, deadline=None)
@given(st.lists(finite_floats, min_size=50, max_size=1000))
def test_quantizer_transform_in_range(values) -> None:
    x = np.asarray(values)[:, None]
    q = Quantizer().fit(x)
    codes = q.transform(np.concatenate([x, [[1e9], [-1e9]]]))
    assert codes.min() >= 0
    assert codes.max() <= len(q.X_bin_edges_[0]) - 2
