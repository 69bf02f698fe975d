"""The strict-warnings posture must not silence this package's own RuntimeWarnings.

pyproject's ``filterwarnings = ["error", ...]`` mirrors the reference's CI posture
(ref pyproject.toml:82-83) with one targeted ignore: the vendored reference emits
RuntimeWarnings on extreme fuzz inputs (e.g. subnormal overflow in its _quantizer
merge branch) and parity tests must still run it. That ignore is scoped by a module
regex — an unanchored ``neo_ls_svm.*`` would also match ``neo_ls_svm_tpu`` and turn
the regression net off for the package itself (round-5 review finding).
"""

import warnings

import pytest


def test_reference_runtimewarnings_ignored() -> None:
    # Attributed to the vendored reference: swallowed by the targeted ignore.
    warnings.warn_explicit(
        "overflow encountered in multiply",
        RuntimeWarning,
        "ref.py",
        1,
        module="neo_ls_svm._quantizer",
    )


def test_own_runtimewarnings_escalate_to_errors() -> None:
    # Attributed to this package: must hit the blanket ``error`` filter.
    with pytest.raises(RuntimeWarning, match="divide by zero"):
        warnings.warn_explicit(
            "divide by zero encountered",
            RuntimeWarning,
            "ours.py",
            1,
            module="neo_ls_svm_tpu.ops.affine",
        )
