"""Minimal sklearn-compatible estimator base classes.

The reference inherits from ``sklearn.base.BaseEstimator`` everywhere; this package must
not depend on scikit-learn, so we provide the same constructor-params-as-config protocol
(``get_params`` / ``set_params`` / ``clone``; ref ``_neo_ls_svm.py:43``,
``_affine_feature_map.py:17``) ourselves. ``sklearn.clone`` works on these classes when
scikit-learn happens to be installed, because it only relies on this protocol.
"""

import copy
import inspect
from typing import Any


class BaseEstimator:
    """Constructor-parameters-as-configuration base class."""

    @classmethod
    def _get_param_names(cls) -> list[str]:
        init = cls.__init__
        if init is object.__init__:
            return []
        sig = inspect.signature(init)
        names = [
            p.name
            for p in sig.parameters.values()
            if p.name != "self" and p.kind not in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
        ]
        return sorted(names)

    def get_params(self, deep: bool = True) -> dict[str, Any]:
        """Return this estimator's constructor parameters."""
        params: dict[str, Any] = {}
        for name in self._get_param_names():
            value = getattr(self, name)
            params[name] = value
            if deep and hasattr(value, "get_params") and not isinstance(value, type):
                for sub_name, sub_value in value.get_params(deep=True).items():
                    params[f"{name}__{sub_name}"] = sub_value
        return params

    def set_params(self, **params: Any) -> "BaseEstimator":
        """Update this estimator's constructor parameters."""
        if not params:
            return self
        valid = set(self._get_param_names())
        nested: dict[str, dict[str, Any]] = {}
        for key, value in params.items():
            if "__" in key:
                head, _, tail = key.partition("__")
                nested.setdefault(head, {})[tail] = value
            else:
                if key not in valid:
                    msg = f"Invalid parameter {key!r} for estimator {self!r}."
                    raise ValueError(msg)
                setattr(self, key, value)
        for head, sub_params in nested.items():
            if head not in valid:
                msg = f"Invalid parameter {head!r} for estimator {self!r}."
                raise ValueError(msg)
            getattr(self, head).set_params(**sub_params)
        return self

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self.get_params(deep=False).items())
        return f"{type(self).__name__}({params})"

    def _fitted_attribute_names(self) -> list[str]:
        return [k for k in vars(self) if k.endswith("_") and not k.startswith("_")]

    # sklearn interop: the kind subclasses advertise ("classifier", "regressor",
    # "transformer", or None). Only consulted when scikit-learn is installed.
    _estimator_kind: str | None = None

    def __sklearn_tags__(self):  # noqa: ANN204 - sklearn protocol type lives in sklearn
        from sklearn.utils import (  # noqa: PLC0415
            ClassifierTags,
            InputTags,
            RegressorTags,
            Tags,
            TargetTags,
            TransformerTags,
        )

        kind = self._estimator_kind
        if kind is None:
            # Derive from the classic sklearn markers: RegressorMixin-style
            # `_estimator_type` strings first, then a `transform` method.
            derived = getattr(self, "_estimator_type", None)
            if isinstance(derived, str):
                kind = derived
            elif hasattr(self, "transform"):
                kind = "transformer"
        tags = Tags(
            estimator_type=kind,
            target_tags=TargetTags(required=kind in ("classifier", "regressor")),
            transformer_tags=TransformerTags() if kind == "transformer" else None,
            classifier_tags=ClassifierTags() if kind == "classifier" else None,
            regressor_tags=RegressorTags() if kind == "regressor" else None,
            input_tags=InputTags(),
        )
        return tags


class TransformerMixin:
    """Adds ``fit_transform`` to transformers."""

    def fit_transform(self, X: Any, y: Any = None, **fit_params: Any) -> Any:
        """Fit this transformer, then transform the same data."""
        return self.fit(X, y, **fit_params).transform(X)


class RegressorMixin:
    """Marker mixin for regressors."""

    _estimator_type = "regressor"


def clone(estimator: Any) -> Any:
    """Construct an unfitted estimator with the same constructor parameters."""
    if isinstance(estimator, (list, tuple)):
        return type(estimator)(clone(e) for e in estimator)
    if not hasattr(estimator, "get_params") or isinstance(estimator, type):
        return copy.deepcopy(estimator)
    params = estimator.get_params(deep=False)
    params = {k: clone(v) if hasattr(v, "get_params") else copy.deepcopy(v) for k, v in params.items()}
    return type(estimator)(**params)
