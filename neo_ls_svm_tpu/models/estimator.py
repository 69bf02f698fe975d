"""Neo LS-SVM — the public sklearn-compatible estimator, TPU-native inside.

Thin orchestration shell over the jitted solvers: validation, task-type inference,
primal/dual routing, calibration, conformal prediction, and pandas passthrough happen
at the host boundary (mirroring the reference's ``NeoLSSVM``, ref ``_neo_ls_svm.py:43-821``);
every O(n·D)+ floating-point operation runs on device through
``models/primal.py`` / ``models/dual.py``.

Feature parity checklist vs the reference:
  1. linear-complexity training via orthogonal random Fourier features (primal path)
  2. zero-cost closed-form LOO tuning of γ
  3. prediction-surface complexity regulariser (C matrix; identity fast path)
  4. free LOO residuals/error/score after fit
  5. supervised learned affine pre-transform
  6. primal and dual solvers (auto-routed at n = 1024)
  7. isotonically calibrated ``predict_proba``
  8. conformally calibrated ``predict_quantiles`` / ``predict_interval``
  9. Bayesian ``predict_std``
 10. pandas in → pandas out
"""

from typing import TYPE_CHECKING, Any, Literal

import jax
import jax.numpy as jnp
import numpy as np
import numpy.typing as npt

from neo_ls_svm_tpu.models.conformal import ConformalMixin
from neo_ls_svm_tpu.models.cqr import CoherentLinearQuantileRegressor
from neo_ls_svm_tpu.models.dual import (
    dual_decision_function,
    dual_fit,
    dual_predict_var,
)
from neo_ls_svm_tpu.models.isotonic import IsotonicCalibrator
from neo_ls_svm_tpu.models.primal import (
    gamma_grid,
    primal_decision_function,
    primal_fit,
    primal_fit_streaming,
    primal_predict_var,
    trim_per_row,
)
from neo_ls_svm_tpu.ops.affine import AffineSeparator, _is_tunneled_backend
from neo_ls_svm_tpu.ops.orff import (
    KernelApproximatingFeatureMap,
    OrthogonalRandomFourierFeatures,
    RandomFourierFeatures,
)
from neo_ls_svm_tpu.utils.base import BaseEstimator, clone
from neo_ls_svm_tpu.utils.metrics import accuracy_score, r2_score
from neo_ls_svm_tpu.utils.transfer import staged_device_put, symmetric_int8_grid, will_stage
from neo_ls_svm_tpu.utils.typing import (
    FloatMatrix,
    FloatVector,
    GenericVector,
)
from neo_ls_svm_tpu.utils.validation import (
    _check_n_features,
    check_array,
    check_consistent_length,
    check_is_fitted,
    check_X_y,
    is_device_array as _is_device_array,
    is_pandas,
    train_test_split,
)

if TYPE_CHECKING:  # pandas is an optional I/O convenience, never a runtime dependency.
    import pandas as pd

DUAL_THRESHOLD = 1024  # n ≤ 1024 → dual space (ref _neo_ls_svm.py:375).
STREAMING_BYTES_THRESHOLD = 6 * 1024**3  # In-memory working set above this → stream.
STREAMING_ROW_CHUNK = 32768
PREDICT_CHUNK_ROWS = 1 << 20  # Chunk predictions beyond this many rows (bounds the
# transient n×2M feature block on device).
LAZY_MATERIALIZE_MIN_ROWS = 65_536  # Below this, fit pulls the host copy eagerly.

# Auto-routing policy (thresholds, int8 cost model, plan resolution) lives in
# models/routing.py; re-exported here for back-compat with pre-0.5 imports.
from . import routing
from .routing import (  # noqa: F401  (re-exports)
    _estimate_int8_score_cost,
    _resolve_fit_plan,
)

_ROUTING_THRESHOLD_NAMES = (
    "AUTO_DEVICE_PT_MIN_BYTES",
    "AUTO_INT8_MIN_BYTES",
    "INT8_SCORE_BUDGET",
)


def __getattr__(name: str) -> Any:
    # Live forwarding (PEP 562) instead of a snapshot binding: fit reads the
    # thresholds from ``routing``, so a copied name here would make reads at the
    # documented pre-0.5 location silently drift from what fit actually uses after
    # anyone rebinds ``routing.AUTO_*`` (e.g. a test monkeypatch). Writes must
    # still target ``models.routing`` — setting the name on this module only
    # shadows the forwarder.
    if name in _ROUTING_THRESHOLD_NAMES:
        return getattr(routing, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    # PEP 562 pairs module __getattr__ with __dir__ so the forwarded names stay
    # visible to dir()/tab-completion/doc tooling, not just to attribute access.
    return [*globals(), *_ROUTING_THRESHOLD_NAMES]

# Fitted attributes materialised lazily from the device-resident fit result (one
# batched device→host transfer on first access; see NeoLSSVM.__getattr__).
_LAZY_RESULT_ATTRS = frozenset(
    {
        "beta_emb_",
        "β̂_",
        "_eig_Qs",
        "_eig_lam",
        "α̂_",
        "_chol",
        "loo_errors_γs_",
        "loo_residuals_",
        "loo_ŷ_",
        "loo_error_",
        "loo_score_",
        "loo_std_",
        "loo_leverage_",
        "residuals_",
        "predict_proba_calibrator_",
        "nonconformity_calib_l1_",
        "nonconformity_calib_l2_",
        "ŷ_calib_l1_",
        "ŷ_calib_l2_",
        "residuals_calib_l1_",
        "residuals_calib_l2_",
        "sample_weight_calib_l1_",
        "sample_weight_calib_l2_",
        "conformal_l1_",
        "conformal_l2_",
        # pre_transform="device" defers these to the materialise pull; the host
        # pre-transform sets them eagerly in fit so the lookup below never fires.
        "_M_map",
        "_b_map",
    }
)


def _primal_working_set_bytes(n_rows: int, num_features: int, itemsize: int) -> int:
    """Primal-solver working-set estimate: ~3 transient copies of the n×2M real
    embedding of φ. Single definition — the fit route decision and both mesh
    routes must threshold on the SAME formula or they silently diverge."""
    return 3 * n_rows * 2 * (num_features + 1) * itemsize


def _bucket_rows(n: int) -> int:
    """Round n up to a ~6% shape bucket so repeated fits across datasets reuse XLA
    compilations (zero-weight padding is exactly invariant for the in-memory primal
    solver). Compiles cost tens of seconds on a cold TPU; padding costs <= 6% flops."""
    granularity = max(64, 1 << max(n.bit_length() - 5, 0))
    return -(-n // granularity) * granularity


def _bucket_features(d: int) -> int:
    """Round the feature count up to a multiple of 8 (zero columns are inert)."""
    return -(-d // 8) * 8


def _maybe_pandas_series(values: npt.NDArray, X_df: Any) -> Any:
    if is_pandas(X_df):
        try:
            import pandas as pd
        except ImportError:
            return values
        return pd.Series(values, index=X_df.index)
    return values


class NeoLSSVM(ConformalMixin, BaseEstimator):
    """Neo LS-SVM: a modern least-squares SVM with O(n) training, hyperparameter-free
    LOO tuning, calibrated probabilities, and conformal prediction — running its linear
    algebra on TPU via JAX/XLA."""

    def __init__(
        self,
        *,
        primal_feature_map: KernelApproximatingFeatureMap | Literal["auto"] = "auto",
        dual_feature_map: AffineSeparator | Literal["auto"] = "auto",
        dual: bool | Literal["auto"] = "auto",
        estimator_type: Literal["auto", "classifier", "regressor"] = "auto",
        random_state: int | np.random.RandomState | None = 42,
        precision: Literal["high", "fast"] = "high",
        pre_transform: Literal["auto", "host", "device"] = "auto",
        transfer: Literal["auto", "float32", "bfloat16", "int8"] = "auto",
        mesh: Any = None,
        conformal_method: Literal["exact", "smooth"] = "exact",
    ) -> None:
        self.primal_feature_map = primal_feature_map
        self.dual_feature_map = dual_feature_map
        self.dual = dual
        self.random_state = random_state
        self.estimator_type = estimator_type
        self.precision = precision
        self.pre_transform = pre_transform
        self.transfer = transfer
        self.mesh = mesh
        self.conformal_method = conformal_method

    # ------------------------------------------------------------------ fitting

    def _clear_fit_state(self) -> None:
        """Drop every attribute a previous fit may have left behind.

        Refitting must not serve stale results: the lazy observability attributes are
        only pulled from ``_pending_result`` when *absent* from ``__dict__``, so any
        copy left by an earlier fit would permanently shadow the new fit's values, and
        route-conditional attributes (``classes_``, the dual path's ``X_``) would leak
        across task types / routes.
        """
        for name in (
            *_LAZY_RESULT_ATTRS,
            "_pending_result",
            "_pending_ctx",
            "_device_cache",
            "classes_",
            "X_",
            "γ_",
            "primal_feature_map_",
            "dual_feature_map_",
            "_M_map",
            "_b_map",
            "_inv_c0",
            "pre_transform_",
            "transfer_",
            "mesh_",
        ):
            self.__dict__.pop(name, None)

    def fit(
        self,
        X: "FloatMatrix | pd.DataFrame",
        y: "GenericVector | pd.Series",
        sample_weight: "FloatVector | pd.Series | None" = None,
    ) -> "NeoLSSVM":
        """Fit this predictor."""
        # Device-resident ingestion (VERDICT r4 #2): a ``jax.Array`` X never takes the
        # device→host→device round-trip (the worst possible pattern on a ~100 ms
        # tunnel). Validation is metadata-only (the serving contract of
        # :meth:`_validate_device_X`); the O(n) target/weight vectors are pulled once
        # so the host-side routing/label logic is unchanged. JAX-native pipelines
        # therefore feed ``fit`` → ``predict`` without X ever leaving the chip.
        X_on_device = _is_device_array(X)
        if X_on_device:
            X = self._validate_fit_device_X(X)
            if isinstance(y, jax.Array) or isinstance(sample_weight, jax.Array):
                y, sample_weight = jax.device_get((y, sample_weight))
            y = np.ravel(np.asarray(y))
            if y.shape[0] != X.shape[0]:
                msg = (
                    "Found input variables with inconsistent numbers of samples: "
                    f"[{X.shape[0]}, {y.shape[0]}]"
                )
                raise ValueError(msg)
            # y is host-resident here, so the same finiteness gate check_X_y applies
            # on the host path costs no tunnel traffic — only the O(n·d) X scan is
            # skipped by design (a NaN in y would otherwise silently fit an
            # all-NaN model instead of raising).
            if np.issubdtype(y.dtype, np.floating) and not np.all(np.isfinite(y)):
                msg = "Input y contains NaN or infinity."
                raise ValueError(msg)
        else:
            X, y = check_X_y(X, y, dtype=(np.float64, np.float32), ensure_min_samples=2)
            y = np.ravel(np.asarray(y))
        self.n_features_in_ = X.shape[1]
        self.y_dtype_: npt.DTypeLike = y.dtype
        sample_weight_ = (
            np.ones(y.shape, X.dtype)
            if sample_weight is None
            else np.ravel(np.asarray(sample_weight)).astype(X.dtype)
        )
        check_consistent_length(y, sample_weight_)
        if np.sum(sample_weight_) <= 0:
            msg = "The sample weights are all zero; at least one weight must be positive."
            raise ValueError(msg)
        self._clear_fit_state()
        if self.pre_transform not in ("auto", "host", "device"):
            msg = f"pre_transform must be 'auto', 'host' or 'device', got {self.pre_transform!r}."
            raise ValueError(msg)
        if self.transfer not in ("auto", "float32", "bfloat16", "int8"):
            msg = (
                f"transfer must be 'auto', 'float32', 'bfloat16' or 'int8', "
                f"got {self.transfer!r}."
            )
            raise ValueError(msg)
        if self.conformal_method not in ("exact", "smooth"):
            msg = (
                f"conformal_method must be 'exact' (host HiGHS LP, reference-grade "
                f"optimum) or 'smooth' (batched on-device Newton), "
                f"got {self.conformal_method!r}."
            )
            raise ValueError(msg)
        if X_on_device and self.transfer not in ("auto", "float32"):
            msg = (
                f"transfer={self.transfer!r} narrows the host→device upload, but X is "
                "already device-resident — there is no upload to narrow."
            )
            raise ValueError(msg)
        if self.transfer not in ("auto", "float32") and self.pre_transform == "host":
            msg = (
                f"transfer={self.transfer!r} requires the on-device pre-transform: the "
                "host pre-transform path carries the bit-parity contract, which a lossy "
                "feature upload would silently break."
            )
            raise ValueError(msg)
        # Infer the task type from the target (two classes → classifier; numeric or
        # datetime-like → regressor; ref :347-373).
        unique_y = np.unique(y)
        inferred: str | None = None
        if len(unique_y) == 2:
            inferred = "classifier"
        elif (
            np.issubdtype(y.dtype, np.number)
            or np.issubdtype(y.dtype, np.datetime64)
            or np.issubdtype(y.dtype, np.timedelta64)
        ):
            inferred = "regressor"
        self._estimator_type: str | None = (
            inferred if self.estimator_type == "auto" else self.estimator_type
        )
        y_: npt.NDArray
        if self._estimator_type == "classifier" and len(unique_y) != 2:
            # Explicitly-requested classifier with a non-binary target.
            if np.issubdtype(y.dtype, np.floating) and np.any(y != np.round(y)):
                msg = (
                    "Unknown label type: continuous. Maybe you are trying to fit a "
                    "classifier, which expects discrete classes on a regression target."
                )
                raise ValueError(msg)
            msg = (
                "Only binary classification is supported. The type of the target is "
                f"{'multiclass' if len(unique_y) > 2 else 'constant'}."
            )
            raise ValueError(msg)
        if self._estimator_type == "classifier":
            self.classes_: npt.NDArray = unique_y
            y_ = np.ones(y.shape, dtype=X.dtype)
            y_[y == self.classes_[0]] = -1
        elif self._estimator_type == "regressor":
            y_ = y.astype(X.dtype)
        else:
            msg = "Target type not supported"
            raise ValueError(msg)
        is_classifier = self._estimator_type == "classifier"
        # mesh="auto" builds the ("data", "feature") mesh over every visible device,
        # so scale-out does not require hand-constructing jax.sharding.Mesh objects
        # (VERDICT r3 #7). A concrete Mesh passes through; None keeps single-chip.
        # With a single visible device "auto" resolves to None: the single-chip
        # route is strictly better there (narrow-wire transfer modes, no GSPMD
        # staging), and "auto" means best-available, not mesh-at-any-cost.
        if self.mesh == "auto":
            from neo_ls_svm_tpu.parallel.mesh import make_mesh  # noqa: PLC0415

            self.mesh_: Any = make_mesh() if len(jax.devices()) > 1 else None
        elif self.mesh is None or isinstance(self.mesh, jax.sharding.Mesh):
            self.mesh_ = self.mesh
        else:
            msg = f"mesh must be None, 'auto', or a jax.sharding.Mesh, got {self.mesh!r}."
            raise ValueError(msg)
        # Primal vs dual routing (ref :375).
        self.dual_ = X.shape[0] <= DUAL_THRESHOLD if self.dual == "auto" else self.dual
        self.primal_ = not self.dual_
        if X_on_device and (self.dual_ or self.pre_transform == "host"):
            # These paths run the host pre-transform (the dual solver's feature map,
            # or an explicitly requested bit-parity "host" pre-transform), which needs
            # host X: one explicit pull, cheap for the dual (n ≤ 1024) and the
            # documented cost of opting out of the device route.
            X = np.asarray(jax.device_get(X))
            X_on_device = False
        if self.primal_:
            self.primal_feature_map_ = clone(
                OrthogonalRandomFourierFeatures()
                if self.primal_feature_map == "auto"
                else self.primal_feature_map
            )
            # Decide the route and *start the X transfer asynchronously now*, so the
            # ~0.x s host→device copy rides under the host-side feature-map fit below.
            n_rows = X.shape[0]
            M_cols = getattr(self.primal_feature_map_, "num_features", 512) + 1
            working_set_bytes = _primal_working_set_bytes(
                n_rows, M_cols - 1, np.dtype(X.dtype).itemsize
            )
            route = (
                "mesh"
                if self.mesh_ is not None
                else ("streaming" if working_set_bytes > STREAMING_BYTES_THRESHOLD else "inmemory")
            )
            # Opt-in fully on-device pre-transform: binning, normalizer statistics,
            # the separator, and the ORFF draw run as one jitted program with JAX RNG
            # — zero mid-fit host round-trips (the host path below is the bit-parity
            # default; see ops/pretransform_device.py for the documented deviations).
            # Applies to the single-chip primal routes with a random-Fourier feature
            # map whose complexity matrix is the shipped identity (a subclass
            # overriding `complexity_matrix` needs the whitened-GEVD host solver);
            # the dual (n ≤ 1024) and mesh routes keep the host pre-transform.
            device_pt_eligible = (
                route in ("streaming", "inmemory", "mesh")
                and isinstance(self.primal_feature_map_, RandomFourierFeatures)
                and type(self.primal_feature_map_).complexity_matrix
                is RandomFourierFeatures.complexity_matrix
            )
            if X_on_device and not device_pt_eligible:
                # A custom feature map needs the host pre-transform — one explicit
                # pull is the only way to honour it.
                X = np.asarray(jax.device_get(X))
                X_on_device = False
            row_pad = col_pad = 0
            X_dev = None
            X_p = X
            if route == "streaming":
                row_pad = (-n_rows) % STREAMING_ROW_CHUNK
                if not row_pad:
                    X_p = X
                elif X_on_device:
                    X_p = jnp.pad(X, ((0, row_pad), (0, 0)))  # pad on device, no host hop
                else:
                    X_p = np.vstack([X, np.zeros((row_pad, X.shape[1]), X.dtype)])
            elif route == "inmemory":
                nb, db = _bucket_rows(n_rows), _bucket_features(X.shape[1])
                row_pad, col_pad = nb - n_rows, db - X.shape[1]
                if X_on_device:
                    X_p = (
                        jnp.pad(X, ((0, row_pad), (0, col_pad)))
                        if row_pad or col_pad
                        else X
                    )
                else:
                    X_p = np.pad(X, ((0, row_pad), (0, col_pad)))
            payload_bytes = n_rows * X.shape[1] * np.dtype(X.dtype).itemsize
            # The narrow-wire modes target the single-chip tunneled topology;
            # mesh fits stage rows sharded at full precision, and a
            # device-resident X crosses no wire at all.
            tunneled = _is_tunneled_backend() and route != "mesh" and not X_on_device
            # Score-aware wire narrowing: predict the int8 quantisation cost from a
            # row subsample ONLY when the decision is actually live (auto transfer,
            # tunneled wire, payload at the int8 crossover) — it is an O(sample·d)
            # host pass, not something every fit should pay.
            int8_cost = None
            if (
                self.transfer == "auto"
                and self.pre_transform != "host"
                and tunneled
                and device_pt_eligible
                # Read through the module so tests patching routing's threshold
                # steer this guard and _resolve_fit_plan identically.
                and payload_bytes >= routing.AUTO_INT8_MIN_BYTES
            ):
                # Same row set as symmetric_int8_grid: zero-weight rows never
                # shape the grid, so they must not shape the cost estimate either.
                int8_cost = _estimate_int8_score_cost(X, sample_weight_)
            self.pre_transform_, self.transfer_ = _resolve_fit_plan(
                # A device-resident X forces the device pre-transform (eligibility
                # was settled above; the host path would cost the pull it avoids).
                "device" if X_on_device else self.pre_transform,
                self.transfer,
                payload_bytes=payload_bytes,
                device_pt_eligible=device_pt_eligible,
                tunneled=tunneled,
                int8_score_cost=int8_cost,
            )
            use_device_pt = self.pre_transform_ == "device" and device_pt_eligible
            # pre_transform_ records the route ACTUALLY taken: an explicit
            # pre_transform="device" on an ineligible fit (e.g. a custom feature
            # map overriding complexity_matrix) falls back to the host path, and
            # the fitted attribute must say so rather than echo the request.
            self.pre_transform_ = "device" if use_device_pt else "host"
            if self.transfer_ != "float32" and route == "mesh":
                msg = (
                    f"transfer={self.transfer!r} is not supported on the mesh route: "
                    "sharded fits stage rows at full precision (the narrow-wire modes "
                    "target the single-chip tunneled topology)."
                )
                raise ValueError(msg)
            if self.transfer_ != "float32" and not use_device_pt:
                msg = (
                    f"transfer={self.transfer!r} only applies when the fit takes the "
                    "on-device pre-transform route (primal, random-Fourier feature map "
                    "with the identity complexity matrix); this fit would route "
                    f"through {route!r} with the host pre-transform, silently "
                    "ignoring the narrow upload you opted into."
                )
                raise ValueError(msg)
            if route in ("streaming", "inmemory") and not use_device_pt:
                X_dev = staged_device_put(X_p)
            if use_device_pt:
                self.γs_ = gamma_grid(X.dtype, num=1024)
                result = self._fit_primal_device_pt(
                    X_p,
                    X.shape,
                    y_,
                    sample_weight_,
                    is_classifier=is_classifier,
                    route=route,
                    row_pad=row_pad,
                    col_pad=col_pad,
                )
                self._pending_ctx = {
                    "y_": y_,
                    "sample_weight": sample_weight_,
                    "is_classifier": is_classifier,
                    "num_rows": X.shape[0],
                }
                self._pending_result = result
                return self._finish_fit(X.shape[0], result)
            # Let the supervised pre-transform reuse the device copy of X staged above:
            # its per-bin statistics then run on the TPU (sort-free bisection medians +
            # one-hot-matmul masses) instead of B·d host argsorts, with only O(n)
            # codes/weights crossing the tunnel. The mesh route stages X *sharded*
            # inside the sharded fit, so its stats stay on host — the normalizer must
            # not duplicate the whole matrix onto one chip.
            affine = getattr(self.primal_feature_map_, "affine_feature_map", None)
            if affine is not None:
                if X_dev is not None:
                    affine._device_X_hint = X_dev
                elif route == "mesh":
                    affine._stats_host_only = True
            try:
                self.primal_feature_map_.fit(X, y_, sample_weight_)
            finally:
                if affine is not None:
                    for hint in ("_device_X_hint", "_stats_host_only"):
                        if hasattr(affine, hint):
                            delattr(affine, hint)
            M_map, b_map = self.primal_feature_map_.linear_map()
            self.γs_ = gamma_grid(X.dtype, num=1024)
            # Surface-complexity regulariser. The shipped complexity matrix is the
            # identity (fast path, C_emb=None); a custom feature map with a nontrivial
            # matrix routes through the whitened-GEVD path (ref _neo_ls_svm.py:116-124).
            sweep_precision = (
                jax.lax.Precision.DEFAULT if self.precision == "fast" else None
            )
            C = np.asarray(self.primal_feature_map_.complexity_matrix, dtype=X.dtype)
            if np.array_equiv(C, C[0, 0] * np.eye(C.shape[0], dtype=X.dtype)):
                C_emb = None
            else:
                c_norm = np.mean(np.abs(np.diag(C))) * (X.shape[0] * C.shape[0])
                C_n = C / c_norm
                C_emb = jnp.asarray(
                    np.block(
                        [[C_n, np.zeros_like(C_n)], [np.zeros_like(C_n), C_n]]
                    )
                )
            if route == "mesh":
                # Multi-chip fit: rows sharded over the mesh's "data" axis; the Gram
                # reduction crosses chips as one psum. When even the per-chip row
                # shard would blow the in-memory working set, each chip additionally
                # streams its local rows (sharding × streaming compose).
                from neo_ls_svm_tpu.parallel.mesh import (  # noqa: PLC0415
                    sharded_primal_fit,
                    sharded_primal_fit_streaming,
                )

                num_data = self.mesh_.shape["data"]
                stream_over_mesh = working_set_bytes / num_data > STREAMING_BYTES_THRESHOLD
                extra_kwargs: dict[str, Any] = {}
                if stream_over_mesh:
                    sharded_fit = sharded_primal_fit_streaming
                    # Each chip runs the same fused Mosaic kernels the single-chip
                    # streaming fit defaults to on TPU.
                    mesh_platform = next(iter(self.mesh_.devices.flat)).platform
                    use_pallas = mesh_platform == "tpu"
                    extra_kwargs = {
                        "use_pallas_gram": use_pallas and C_emb is None,
                        "use_pallas_sweep": use_pallas,
                    }
                else:
                    sharded_fit = sharded_primal_fit
                result = sharded_fit(
                    self.mesh_,
                    X,
                    M_map.astype(X.dtype),
                    b_map.astype(X.dtype),
                    y_,
                    sample_weight_,
                    self.γs_,
                    None if C_emb is None else np.asarray(C_emb),
                    is_classifier=is_classifier,
                    sweep_precision=sweep_precision,
                    **extra_kwargs,
                )
            elif route == "streaming":
                y_p = np.concatenate([y_, np.zeros(row_pad, X.dtype)]) if row_pad else y_
                s_p = (
                    np.concatenate([sample_weight_, np.zeros(row_pad, X.dtype)])
                    if row_pad
                    else sample_weight_
                )
                # One batched transfer: each host→device copy pays ~100 ms of tunnel
                # latency, so the five solver operands ride together.
                M_d, b_d, y_d, s_d, g_d = jax.device_put(
                    (M_map.astype(X.dtype), b_map.astype(X.dtype), y_p, s_p, self.γs_)
                )
                # The streaming route runs the fused Pallas kernels by default on TPU
                # backends (hardware-verified f32-exact multiplies at precision='high';
                # single-pass bf16 multiplies at precision='fast'). Mosaic kernels
                # exist ONLY for TPU — gate on the platform affirmatively so unknown
                # backends fall back to the XLA path instead of failing to lower.
                use_pallas = jax.devices()[0].platform == "tpu"
                result = primal_fit_streaming(
                    X_dev,
                    M_d,
                    b_d,
                    y_d,
                    s_d,
                    g_d,
                    C_emb,
                    is_classifier=is_classifier,
                    row_chunk=STREAMING_ROW_CHUNK,
                    num_samples=n_rows,
                    sweep_precision=sweep_precision,
                    use_pallas_gram=(use_pallas and C_emb is None),
                    use_pallas_sweep=use_pallas,
                )
                if row_pad:
                    result = trim_per_row(result, n_rows)
            else:
                # Bucketed shapes (padding computed before the async upload above) let
                # nearby dataset sizes share one compilation; zero-weight rows and zero
                # feature columns are exactly invariant, and the true row count rides
                # as a traced scalar.
                y_p = np.pad(y_, (0, row_pad))
                s_p = np.pad(sample_weight_, (0, row_pad))
                M_p = np.pad(M_map.astype(X.dtype), ((0, col_pad), (0, 0)))
                # One batched transfer (each copy pays ~100 ms of tunnel latency).
                M_d, b_d, y_d, s_d, g_d = jax.device_put(
                    (M_p, b_map.astype(X.dtype), y_p, s_p, self.γs_)
                )
                result = primal_fit(
                    X_dev,
                    M_d,
                    b_d,
                    y_d,
                    s_d,
                    g_d,
                    C_emb,
                    is_classifier=is_classifier,
                    sweep_precision=sweep_precision,
                    num_samples=n_rows,
                )
                if row_pad:
                    result = trim_per_row(result, n_rows)
            self._M_map, self._b_map = M_map.astype(X.dtype), b_map.astype(X.dtype)
            # Computational state stays on device (one tunnel round-trip per host pull
            # is ~100 ms); the batched host copy below serves the observability API.
            self._device_cache = {
                "beta_emb": result["beta_emb"],
                "Qs": result["Qs"],
                "lam": result["lam"],
                "M_map": jnp.asarray(self._M_map),
                "b_map": jnp.asarray(self._b_map),
            }
            # The GEVD (custom-C) eigenbasis is C-orthonormal: resolvent scale is 1.
            M = M_map.shape[1] + 1
            self._inv_c0 = 1.0 if C_emb is not None else float(X.shape[0] * M)
        else:
            if self.transfer not in ("auto", "float32"):
                msg = (
                    f"transfer={self.transfer!r} only applies to the on-device "
                    f"pre-transform route; this fit (n={X.shape[0]} ≤ {DUAL_THRESHOLD}) "
                    "routes to the dual solver with the host pre-transform."
                )
                raise ValueError(msg)
            self.pre_transform_, self.transfer_ = "host", "float32"
            nz = sample_weight_ > 0
            X, y_, sample_weight_ = X[nz], y_[nz], sample_weight_[nz]
            y = y[nz]
            self.dual_feature_map_ = clone(
                AffineSeparator() if self.dual_feature_map == "auto" else self.dual_feature_map
            )
            self.dual_feature_map_.fit(X, y_, sample_weight_)
            self.X_ = self.dual_feature_map_.transform(X)
            self.γs_ = gamma_grid(X.dtype, num=128)
            # One batched transfer (each copy pays ~100 ms of tunnel latency).
            X_d, y_d, s_d, g_d = jax.device_put((self.X_, y_, sample_weight_, self.γs_))
            result = dual_fit(
                X_d,
                y_d,
                s_d,
                g_d,
                is_classifier=is_classifier,
            )
            self._device_cache = {
                "alpha": result["alpha"],
                "chol": result["chol"],
                "X_train": X_d,
            }
        # Defer the bulky host materialisation of the observability API (LOO arrays,
        # eigenbasis, conformal split): the device result stays resident and is pulled
        # in ONE batched transfer on first attribute access (see __getattr__). Fit
        # still BLOCKS until every kernel in the fit graph has executed — the scalar
        # fingerprint below transitively depends on all of them — so the fit wall-clock
        # honestly includes all device work; only the host copy is lazy. On the
        # tunneled TPU this replaces a multi-MB pull with an 8-byte one.
        self._pending_ctx = {
            "y_": y_,
            "sample_weight": sample_weight_,
            "is_classifier": is_classifier,
            "num_rows": X.shape[0],
        }
        self._pending_result = result
        return self._finish_fit(X.shape[0], result)

    def _device_pt_seed(self) -> int:
        """The JAX-PRNG seed of the device pre-transform (single definition: the
        single-chip and mesh device-pt routes must draw identically for the same
        ``random_state`` or their fits diverge on the same data)."""
        from neo_ls_svm_tpu.utils.validation import check_random_state  # noqa: PLC0415

        rs = self.random_state
        if isinstance(rs, (int, np.integer)):
            return int(rs)
        return int(check_random_state(rs).randint(0, 2**31 - 1))

    def _fit_primal_device_pt(
        self,
        X_p: npt.NDArray,
        X_shape: tuple[int, ...],
        y_: npt.NDArray,
        sample_weight_: npt.NDArray,
        *,
        is_classifier: bool,
        route: str,
        row_pad: int,
        col_pad: int,
    ) -> dict[str, Any]:
        """Primal fit with the fully on-device pre-transform (``pre_transform="device"``).

        One batched upload (X, y, weights, γ grid), then the jitted pre-transform
        (``ops/pretransform_device.py``) feeds the solver directly — the feature
        matrix never returns to the host mid-fit. The fitted pre-transform state
        rides back lazily with the observability pull (see ``_materialize_result``).
        """
        from neo_ls_svm_tpu.ops.pretransform_device import (  # noqa: PLC0415
            DEVICE_PRETRANSFORM_BINS,
            device_pre_transform,
        )

        n_rows, d = X_shape
        dtype = X_p.dtype
        if route == "mesh":
            return self._fit_mesh_device_pt(X_p, y_, sample_weight_, is_classifier=is_classifier)
        y_p = np.concatenate([y_, np.zeros(row_pad, dtype)]) if row_pad else y_
        s_p = (
            np.concatenate([sample_weight_, np.zeros(row_pad, dtype)])
            if row_pad
            else sample_weight_
        )
        cast_dtype = None
        cast_fn = None
        quant_scale = None
        if self.transfer_ == "bfloat16":
            # Lossy-transfer mode: X crosses the wire at half width (the tunnel upload
            # is the measured wall of large device-pre-transform fits) and is widened
            # back on device. Targets/weights stay full precision (they are O(n), not
            # O(n·d)). Features are rounded to an 8-bit mantissa — a documented
            # accuracy trade the parity (host) path never makes.
            import ml_dtypes  # noqa: PLC0415 - ships with jax

            cast_dtype = ml_dtypes.bfloat16
        elif self.transfer_ == "int8":
            # Quarter-width wire mode: symmetric per-column affine quantisation,
            # x ≈ q·(max|x|/127) with q ∈ [-127, 127], dequantised on device right
            # after the upload. For column-scaled data the ~7-bit effective mantissa
            # is close to bfloat16's 8 (which spends bits on dynamic range a single
            # column doesn't have); heavy-tailed columns lose more — this mode is for
            # tunnel/DCN-bound ingestion where the upload dominates the fit wall.
            rows = X_p[:n_rows]
            if not np.all(sample_weight_ > 0):
                # Zero-weight rows must not influence the fit; an absurd-valued
                # zero-weight row would otherwise stretch the grid and quantise the
                # real data to zero. (They still upload, clipped to the ±127 rim.)
                rows = rows[sample_weight_ > 0]
            quant_scale, cast_fn = symmetric_int8_grid(rows)
            cast_dtype = np.dtype(np.int8)

        # Large X rides a pipelined chunk train (staged_device_put overlaps the
        # host-side serialization/cast with the wire transfer) with the O(n) vectors
        # in ONE separate batched put; when staging would not engage, everything
        # shares a single batched transfer instead — every host→device copy pays
        # ~100 ms of tunnel latency, so the call count only grows where pipelining
        # buys it back.
        small_put = (y_p, s_p, self.γs_) if quant_scale is None else (y_p, s_p, self.γs_, quant_scale)
        if _is_device_array(X_p):
            # Device-resident ingestion: X never crossed the host, so only the O(n)
            # vectors ride one batched put (transfer_ is "float32" by construction —
            # there is no wire to narrow).
            X_dev = X_p
            small_dev = list(jax.device_put(small_put))
        elif will_stage(X_p, cast_dtype):
            X_dev = staged_device_put(X_p, cast_dtype=cast_dtype, cast_fn=cast_fn)
            small_dev = jax.device_put(small_put)
        else:
            if cast_fn is not None:
                X_host = cast_fn(X_p)
            else:
                X_host = X_p if cast_dtype is None else X_p.astype(cast_dtype)
            X_dev, *small_dev = jax.device_put((X_host, *small_put))
        y_d, s_d, g_d = small_dev[:3]
        if X_dev.dtype != dtype:
            X_dev = X_dev.astype(dtype)
        if quant_scale is not None:
            X_dev = X_dev * small_dev[3][None, :]
        seed = self._device_pt_seed()
        fm = self.primal_feature_map_
        affine = fm.affine_feature_map
        pt = device_pre_transform(
            X_dev,
            y_d,
            s_d,
            jax.random.PRNGKey(seed),
            num_bins=2 if is_classifier else DEVICE_PRETRANSFORM_BINS,
            num_features=int(fm.num_features),
            edge_sample_size=int(getattr(affine, "edge_sample_size", 384)),
            edge_search_multiplier=int(getattr(affine, "edge_search_multiplier", 4)),
            rank_threshold=float(getattr(affine, "rank_threshold", 2e-2)),
            is_classifier=is_classifier,
            # A plain RandomFourierFeatures map keeps its configured i.i.d. Gaussian
            # draw; only the orthogonal variant gets the blockwise QR + χ rescale.
            orthogonal=isinstance(fm, OrthogonalRandomFourierFeatures),
        )
        M_d, b_d = pt["M"], pt["b"]
        sweep_precision = jax.lax.Precision.DEFAULT if self.precision == "fast" else None
        if route == "streaming":
            use_pallas = jax.devices()[0].platform == "tpu"
            result = primal_fit_streaming(
                X_dev,
                M_d,
                b_d,
                y_d,
                s_d,
                g_d,
                None,
                is_classifier=is_classifier,
                row_chunk=STREAMING_ROW_CHUNK,
                num_samples=n_rows,
                sweep_precision=sweep_precision,
                use_pallas_gram=use_pallas,
                use_pallas_sweep=use_pallas,
            )
        else:
            result = primal_fit(
                X_dev,
                M_d,
                b_d,
                y_d,
                s_d,
                g_d,
                None,
                is_classifier=is_classifier,
                sweep_precision=sweep_precision,
                num_samples=n_rows,
            )
        if row_pad:
            result = trim_per_row(result, n_rows)
        M_serve = M_d[:d] if col_pad else M_d  # padded zero feature rows are inert
        result = {
            **result,
            "pt_M": M_serve,
            "pt_b": b_d,
            **{k: pt[k] for k in ("pt_shift", "pt_scale", "pt_A", "pt_Z", "pt_folded")},
        }
        self._device_cache = {
            "beta_emb": result["beta_emb"],
            "Qs": result["Qs"],
            "lam": result["lam"],
            "M_map": M_serve,
            "b_map": b_d,
        }
        self._inv_c0 = float(n_rows * (int(fm.num_features) + 1))
        return result

    def _fit_mesh_device_pt(
        self,
        X: npt.NDArray,
        y_: npt.NDArray,
        sample_weight_: npt.NDArray,
        *,
        is_classifier: bool,
    ) -> dict[str, Any]:
        """Mesh fit with the on-device pre-transform (VERDICT r3 #3).

        X/y/weights stage sharded ONCE; the jitted pre-transform runs as a GSPMD
        program over the row shards and its operands feed the sharded solver
        directly, so multi-chip fits no longer pay the host pre-transform wall
        (round 3 forced mesh fits back to host statistics).
        """
        from neo_ls_svm_tpu.ops.pretransform_device import (  # noqa: PLC0415
            DEVICE_PRETRANSFORM_BINS,
        )
        from neo_ls_svm_tpu.parallel.mesh import (  # noqa: PLC0415
            sharded_primal_fit_device_pt,
        )

        n_rows, d = X.shape
        fm = self.primal_feature_map_
        M_cols = int(fm.num_features) + 1
        working_set_bytes = _primal_working_set_bytes(
            n_rows, int(fm.num_features), np.dtype(X.dtype).itemsize
        )
        num_data = self.mesh_.shape["data"]
        stream_over_mesh = working_set_bytes / num_data > STREAMING_BYTES_THRESHOLD
        mesh_platform = next(iter(self.mesh_.devices.flat)).platform
        use_pallas = stream_over_mesh and mesh_platform == "tpu"
        seed = self._device_pt_seed()
        affine = fm.affine_feature_map
        result = sharded_primal_fit_device_pt(
            self.mesh_,
            X,
            y_,
            sample_weight_,
            jax.random.PRNGKey(seed),
            self.γs_,
            is_classifier=is_classifier,
            num_bins=2 if is_classifier else DEVICE_PRETRANSFORM_BINS,
            num_features=int(fm.num_features),
            edge_sample_size=int(getattr(affine, "edge_sample_size", 384)),
            edge_search_multiplier=int(getattr(affine, "edge_search_multiplier", 4)),
            rank_threshold=float(getattr(affine, "rank_threshold", 2e-2)),
            orthogonal=isinstance(fm, OrthogonalRandomFourierFeatures),
            stream=stream_over_mesh,
            row_chunk=STREAMING_ROW_CHUNK,
            sweep_precision=(
                jax.lax.Precision.DEFAULT if self.precision == "fast" else None
            ),
            use_pallas_gram=use_pallas,
            use_pallas_sweep=use_pallas,
        )
        self._device_cache = {
            "beta_emb": result["beta_emb"],
            "Qs": result["Qs"],
            "lam": result["lam"],
            "M_map": result["pt_M"],
            "b_map": result["pt_b"],
        }
        self._inv_c0 = float(n_rows * M_cols)
        return result

    def _finish_fit(self, num_rows: int, result: dict[str, Any]) -> "NeoLSSVM":
        """Shared fit epilogue: eager materialisation for small fits, else the 8-byte
        fingerprint barrier that blocks until every kernel in the fit graph ran."""
        if num_rows < LAZY_MATERIALIZE_MIN_ROWS:
            # Small fits: the host copy is cheap — pull everything now in one batch.
            # (This also keeps sklearn's check_dict_unchanged green: __dict__ is final
            # when fit returns for the tiny inputs check_estimator drives.)
            self._materialize_result()
            return self
        fingerprint = (
            result["residuals"][-1]
            + result["loo_std"][0]
            + result["loo_errors_gammas"][-1]
            + result["loo_residuals"][0]
            + result["loo_score"]
        )
        if self.primal_:
            fingerprint = fingerprint + jnp.sum(result["beta_emb"])
        else:
            fingerprint = fingerprint + jnp.sum(result["alpha"]) + jnp.sum(result["chol"])
        gamma_h, _ = jax.device_get((result["gamma"], fingerprint))
        self.γ_ = float(gamma_h)
        return self

    def _materialize_result(self) -> None:
        """Pull the device-resident fit result to the host and populate the
        observability API (the reference's fitted attributes, ref :146-187,295-311),
        the isotonic calibrator, and the two-level conformal split."""
        pending = self.__dict__.get("_pending_result")
        if pending is None:
            return
        ctx = self._pending_ctx
        # Pull BEFORE dropping the handles: on a flaky transport (the tunneled axon
        # backend) a failed device_get must stay retryable, not discard the fit.
        result = jax.device_get(pending)
        del self.__dict__["_pending_result"]
        del self.__dict__["_pending_ctx"]
        self.γ_ = float(result["gamma"])
        y_ = ctx["y_"]
        sample_weight_ = ctx["sample_weight"]
        is_classifier = ctx["is_classifier"]
        if self.primal_:
            beta_emb = result["beta_emb"]
            M = beta_emb.shape[0] // 2
            self.beta_emb_ = beta_emb
            # Reference-compatible complex coefficient view: β̂ = u + i·v.
            self.β̂_ = beta_emb[:M] + 1j * beta_emb[M:]
            self._eig_Qs = result["Qs"]
            self._eig_lam = result["lam"]
            self.loo_leverage_ = result["loo_leverage"]
            if "pt_M" in result:
                # pre_transform="device": the fitted pre-transform state was computed
                # on device; populate the host feature-map/serving attributes from the
                # batched pull (padding feature columns sliced away).
                d = self.n_features_in_
                self._M_map = result["pt_M"]
                self._b_map = result["pt_b"]
                fm = self.primal_feature_map_
                affine = fm.affine_feature_map
                affine.n_features_in_ = d
                affine.shift_ = result["pt_shift"][:, :d]
                affine.scale_ = result["pt_scale"][:, :d]
                affine.A_ = result["pt_folded"][:d]
                fm.n_features_in_ = d
                fm.Z_ = result["pt_Z"]
                fm.prefold_A_ = result["pt_A"][:d]
                fm.folded_A_ = result["pt_folded"][:d]
        else:
            self.α̂_ = result["alpha"]
            self._chol = result["chol"]
        # Shared LOO statistics.
        self.loo_errors_γs_ = result["loo_errors_gammas"]
        self.loo_residuals_ = result["loo_residuals"]
        self.loo_ŷ_ = result["loo_yhat"]
        self.loo_error_ = float(result["loo_error"])
        self.loo_score_ = float(result["loo_score"])
        self.loo_std_ = result["loo_std"]
        self.residuals_ = result["residuals"]
        # Isotonic probability calibration on the LOO predictions (ref :406-412).
        if is_classifier:
            self.predict_proba_calibrator_ = IsotonicCalibrator(
                out_of_bounds="clip", y_min=0, y_max=1, increasing=True
            )
            target = np.zeros_like(y_)
            target[y_ == np.max(y_)] = 1.0
            self.predict_proba_calibrator_.fit(self.loo_ŷ_, target, sample_weight_)
        # Two-level conformal calibration split (ref :414-430).
        num_rows = ctx["num_rows"]
        (
            self.nonconformity_calib_l1_,
            self.nonconformity_calib_l2_,
            self.ŷ_calib_l1_,
            self.ŷ_calib_l2_,
            self.residuals_calib_l1_,
            self.residuals_calib_l2_,
            self.sample_weight_calib_l1_,
            self.sample_weight_calib_l2_,
        ) = train_test_split(
            self.loo_std_,
            self.loo_ŷ_,
            self.loo_residuals_,
            sample_weight_,
            train_size=min(1440, max(1024, (num_rows * 2) // 3), num_rows - 1),
            random_state=self.random_state,
        )
        self.conformal_l1_: dict[str, dict[tuple[float, ...], CoherentLinearQuantileRegressor]] = {
            "Δŷ": {},
            "Δŷ/ŷ": {},
        }
        self.conformal_l2_: dict[str, dict[tuple[float, ...], npt.NDArray]] = {
            "Δŷ": {},
            "Δŷ/ŷ": {},
        }

    def __getattr__(self, name: str) -> Any:
        # Normal lookup failed: if the attribute belongs to the lazily-materialised
        # fit result, pull it now (one batched device transfer for everything).
        if name in _LAZY_RESULT_ATTRS and self.__dict__.get("_pending_result") is not None:
            self._materialize_result()
            try:
                return self.__dict__[name]
            except KeyError:
                pass
        msg = f"{type(self).__name__!r} object has no attribute {name!r}"
        raise AttributeError(msg)

    def _device(self, key: str):
        """Fetch a computational-state array, uploading from host state on first use
        (e.g. after unpickling/state-dict restore)."""
        cache = self.__dict__.setdefault("_device_cache", {})
        if key not in cache:
            host = {
                "beta_emb": lambda: self.beta_emb_,
                "Qs": lambda: self._eig_Qs,
                "lam": lambda: self._eig_lam,
                "M_map": lambda: self._M_map,
                "b_map": lambda: self._b_map,
                "alpha": lambda: self.α̂_,
                "chol": lambda: self._chol,
                "X_train": lambda: self.X_,
                # Scalars too: a fresh per-call put of γ/1/c₀ would cost the very
                # ~100 ms-class tunnel transfer the fused chunk programs save.
                "gamma": lambda: np.asarray(self.γ_, dtype=self._compute_dtype()),
                "inv_c0": lambda: np.asarray(self._inv_c0, dtype=self._compute_dtype()),
            }[key]()
            cache[key] = jnp.asarray(host)
        return cache[key]

    def __getstate__(self) -> dict[str, Any]:
        self._materialize_result()  # device handles are not picklable; pull them now
        state = dict(self.__dict__)
        # Don't serialise device handles: they'd pickle (jax.Array is picklable) but
        # as redundant host copies of state the host attributes already carry.
        state.pop("_device_cache", None)
        return state

    # ------------------------------------------------------------- core predictors

    def _in_chunks(self, X: Any, fn: Any, *, device_out: bool) -> Any:
        """Apply a per-chunk device function over row chunks of X.

        ``fn`` returns device arrays; chunk dispatches are asynchronous, so uploads
        and compute pipeline across chunks. With ``device_out`` the concatenated
        result stays on device; otherwise every chunk is pulled in ONE batched
        ``jax.device_get`` at the end (a per-chunk pull would serialise each chunk's
        upload → compute → round-trip).
        """
        if X.shape[0] <= PREDICT_CHUNK_ROWS:
            parts = [fn(X)]
        else:
            parts = [
                fn(X[start : start + PREDICT_CHUNK_ROWS])
                for start in range(0, X.shape[0], PREDICT_CHUNK_ROWS)
            ]
        if device_out:
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        host_parts = jax.device_get(parts)
        return host_parts[0] if len(host_parts) == 1 else np.concatenate(host_parts)

    def _validate_fit_device_X(self, X: jax.Array) -> jax.Array:
        """Metadata-only validation of a device-resident training X.

        The fit-time counterpart of :meth:`_validate_device_X`: shape and dtype come
        from array metadata, and the NaN/inf scan is skipped — a host-side finiteness
        reduction would cost exactly the device→host round-trip the device-ingestion
        path exists to avoid (the caller's pipeline owns its data hygiene). Matches
        ``check_X_y``'s dtype policy: f32/f64 pass through, everything else widens to
        f64 (ref fit validation, ``_neo_ls_svm.py:327-341``).
        """
        if X.ndim != 2:
            msg = f"Expected 2D array, got {X.ndim}D device array instead."
            raise ValueError(msg)
        if X.shape[0] < 2:
            msg = (
                f"Found array with {X.shape[0]} sample(s) while a minimum of 2 "
                "is required."
            )
            raise ValueError(msg)
        if X.shape[1] < 1:
            msg = (
                f"Found array with 0 feature(s) (shape={X.shape}) while a minimum "
                "of 1 is required."
            )
            raise ValueError(msg)
        if jnp.issubdtype(X.dtype, jnp.complexfloating):
            msg = "Complex data not supported."
            raise ValueError(msg)
        if X.dtype not in (jnp.dtype("float32"), jnp.dtype("float64")):
            X = X.astype(
                jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
            )
        return X

    def _validate_device_X(self, X: jax.Array) -> jax.Array:
        """Metadata-only validation for device-resident inputs.

        ``jax.Array`` inputs stay on device end-to-end: shape/dtype are checked from
        metadata, but the NaN/inf scan is skipped — pulling a reduction back to the
        host would cost the round-trip the device path exists to avoid. Serving
        pipelines own their data hygiene; NumPy/pandas inputs keep the full sklearn
        validation contract.
        """
        if X.ndim != 2:
            msg = f"Expected 2D array, got {X.ndim}D device array instead."
            raise ValueError(msg)
        _check_n_features(self, X)
        compute_dtype = self._compute_dtype()
        if X.dtype != compute_dtype:
            X = X.astype(compute_dtype)
        return X

    def _compute_dtype(self) -> Any:
        """The dtype the device programs actually run in.

        Prefers the device-cache copy (which exists before the lazy materialise pull
        in ``pre_transform="device"`` fits); the host-side model state may be f64
        while the device runs f32 (x64 off), so the dtype is canonicalized.
        """
        cache = self.__dict__.get("_device_cache", {})
        arr = cache.get("M_map" if self.primal_ else "X_train")
        if arr is None:
            arr = self._M_map if self.primal_ else self.X_
        return jax.dtypes.canonicalize_dtype(arr.dtype)

    def _upload_chunk(self, X_c: np.ndarray) -> jax.Array:
        """Upload one host prediction chunk at the model's wire width.

        ``transfer="bfloat16"``/``"int8"`` models opted into lossy feature uploads at
        fit time; the host predict path honors the same policy, shrinking its wall
        (which the bench floor analysis shows is ~85-95% wire transfer) by the same
        2×/4×. The int8 grid is per chunk — it is dequantised immediately on device,
        so no cross-chunk (or fit-time) grid consistency is needed. The default
        ``transfer="float32"`` path is byte-identical to a plain upload.
        """
        # getattr fallback: models fitted before the resolved-plan attributes
        # existed (pre-0.4 pickles/state dicts) could only have used the lossless
        # f32 wire, so "float32" is the faithful default on restore.
        transfer = getattr(self, "transfer_", "float32")
        if transfer == "bfloat16":
            import ml_dtypes  # noqa: PLC0415 - ships with jax

            X_d = staged_device_put(X_c, cast_dtype=np.dtype(ml_dtypes.bfloat16))
            return X_d.astype(self._compute_dtype())
        if transfer == "int8":
            # The dequantisation grid rides the first chunk's put as one batched
            # call (ADVICE r3: a separate jnp.asarray(scale) transfer per chunk
            # pays ~100 ms of tunnel latency each, eroding the narrow-wire win).
            scale, cast_fn = symmetric_int8_grid(X_c)
            q_d, (scale_d,) = staged_device_put(
                X_c, cast_dtype=np.dtype(np.int8), cast_fn=cast_fn, extras=(scale,)
            )
            return q_d.astype(self._compute_dtype()) * scale_d[None, :]
        return staged_device_put(X_c)

    def _primal_decision_device(self, X_c: jax.Array) -> jax.Array:
        """ŷ for one device-resident chunk (shared by the host and device paths)."""
        return primal_decision_function(
            X_c, self._device("M_map"), self._device("b_map"), self._device("beta_emb")
        )

    def _primal_var_device(self, X_c: jax.Array) -> jax.Array:
        """σ² for one device-resident chunk (shared by the host and device paths).

        Dtype comes from :meth:`_compute_dtype` (NOT ``self._M_map``, which is a lazy
        attribute on ``pre_transform="device"`` fits — touching it here would force
        the full observability pull onto the serving path)."""
        return primal_predict_var(
            X_c,
            self._device("M_map"),
            self._device("b_map"),
            self._device("Qs"),
            self._device("lam"),
            self._device("gamma"),
            self._device("inv_c0"),
        )

    def _device_dual_transform(self, X: jax.Array) -> jax.Array:
        """Apply the dual feature map's affine form on device (host-free transform)."""
        cache = self.__dict__.setdefault("_device_cache", {})
        if "dual_map" not in cache:
            # linear_form returns (M, offset, inv_scale) for an A-bearing map, and
            # (None, shift, inv_scale) for a pure shift/scale map.
            M, offset, inv_scale = self.dual_feature_map_.linear_form(self.n_features_in_)
            dtype = self.X_.dtype
            if M is None:
                cache["dual_map"] = (
                    None,
                    jnp.asarray(np.asarray(offset, dtype).reshape(1, -1)),
                    jnp.asarray(np.broadcast_to(np.asarray(inv_scale, dtype), offset.shape).reshape(1, -1)),
                )
            else:
                cache["dual_map"] = (
                    jnp.asarray(M.astype(dtype)),
                    jnp.asarray(np.asarray(offset, dtype).reshape(1, -1)),
                    None,
                )
        M_d, off_d, inv_scale_d = cache["dual_map"]
        if M_d is None:
            return (X - off_d) * inv_scale_d
        return jnp.dot(X, M_d) + off_d

    def decision_function(self, X: "FloatMatrix | pd.DataFrame") -> "FloatVector | pd.Series":
        """Evaluate the prediction function ŷ(x) (ref ``:655-681``).

        A ``jax.Array`` input stays resident: the result is returned as a ``jax.Array``
        on the same backend with no host round-trip (see :meth:`_validate_device_X`).
        """
        check_is_fitted(self, ["γ_"])
        if _is_device_array(X):
            X_d = self._validate_device_X(X)
            if self.primal_:
                return self._in_chunks(X_d, self._primal_decision_device, device_out=True)
            return self._in_chunks(
                X_d,
                lambda X_c: dual_decision_function(
                    self._device_dual_transform(X_c),
                    self._device("X_train"),
                    self._device("alpha"),
                ),
                device_out=True,
            )
        X_df = X
        X = _check_n_features(self, check_array(X, dtype=(np.float64, np.float32)))
        if self.primal_:
            yhat = self._in_chunks(
                X.astype(self._compute_dtype()),
                lambda X_c: self._primal_decision_device(self._upload_chunk(X_c)),
                device_out=False,
            )
        else:
            X_t = self.dual_feature_map_.transform(X)
            yhat = self._in_chunks(
                X_t,
                lambda X_c: dual_decision_function(
                    jnp.asarray(X_c), self._device("X_train"), self._device("alpha")
                ),
                device_out=False,
            )
        return _maybe_pandas_series(yhat, X_df)

    def predict_std(self, X: "FloatMatrix | pd.DataFrame") -> "FloatVector | pd.Series":
        """Bayesian estimate of the predictive standard deviation (ref ``:452-487``).

        Uncalibrated; its value is as a nonconformity score for the conformal stack.
        A ``jax.Array`` input returns a device-resident ``jax.Array`` (no host pull).
        """
        check_is_fitted(self, ["γ_"])
        if _is_device_array(X):
            X_d = self._validate_device_X(X)
            if self.primal_:
                var = self._in_chunks(X_d, self._primal_var_device, device_out=True)
            else:
                var = self._in_chunks(
                    X_d,
                    lambda X_c: dual_predict_var(
                        self._device_dual_transform(X_c),
                        self._device("X_train"),
                        self._device("chol"),
                    ),
                    device_out=True,
                )
            return jnp.sqrt(jnp.maximum(var, 0.0))
        X_df = X
        X = _check_n_features(self, check_array(X, dtype=(np.float64, np.float32)))
        if self.primal_:
            var = self._in_chunks(
                X.astype(self._compute_dtype()),
                lambda X_c: self._primal_var_device(self._upload_chunk(X_c)),
                device_out=False,
            )
        else:
            X_t = self.dual_feature_map_.transform(X)
            var = self._in_chunks(
                X_t,
                lambda X_c: dual_predict_var(
                    jnp.asarray(X_c), self._device("X_train"), self._device("chol")
                ),
                device_out=False,
            )
        return _maybe_pandas_series(np.sqrt(np.maximum(var, 0.0)), X_df)


    # ------------------------------------------------------------------- prediction

    def predict(
        self,
        X: "FloatMatrix | pd.DataFrame",
        *,
        coverage: float | None = None,
        quantiles: npt.ArrayLike | None = None,
    ) -> "FloatVector | FloatMatrix | pd.Series | pd.DataFrame":
        """Predict on a given dataset (point, interval, or quantile predictions)."""
        assert coverage is None or quantiles is None
        if coverage is not None:
            return self.predict_interval(X, coverage=coverage)
        if quantiles is not None:
            return self.predict_quantiles(X, quantiles=quantiles)
        check_is_fitted(self, ["γ_"])
        if _is_device_array(X):
            if self._estimator_type == "regressor" and np.issubdtype(self.y_dtype_, np.floating):
                # Device-resident fast path: point predictions never leave the chip.
                # canonicalize_dtype folds f64 -> f32 silently when x64 is off.
                return self.decision_function(X).astype(
                    jax.dtypes.canonicalize_dtype(self.y_dtype_)
                )
            # Classifier labels (and exotic target dtypes) need host-side mapping.
            X = np.asarray(X)
        X_df = X
        X = _check_n_features(self, check_array(X, dtype=(np.float64, np.float32)))
        yhat_df = self.decision_function(X)
        if self._estimator_type == "classifier":
            # Ties at 0 break to the negative class (sklearn decision_function contract).
            yhat_sign = np.sign(yhat_df)
            yhat_sign[yhat_sign == 0] = -1
            yhat = self.classes_[((yhat_sign + 1) // 2).astype(np.intp)]
        else:
            yhat = yhat_df
        if not np.issubdtype(self.y_dtype_, np.integer):
            yhat = yhat.astype(self.y_dtype_)
        return _maybe_pandas_series(yhat, X_df)

    def _iso_thresholds_device(self, dtype: Any) -> tuple[jax.Array, jax.Array]:
        """Stage the isotonic calibrator's thresholds on device (once per fit)."""
        cache = self.__dict__.setdefault("_device_cache", {})
        if "iso_thresholds" not in cache:
            calibrator = self.predict_proba_calibrator_
            cache["iso_thresholds"] = jax.device_put(
                (
                    np.asarray(calibrator.X_thresholds_, dtype),
                    np.asarray(calibrator.y_thresholds_, dtype),
                )
            )
        return cache["iso_thresholds"]

    def predict_proba(
        self, X: "FloatMatrix | pd.DataFrame"
    ) -> "FloatVector | FloatMatrix | pd.Series | pd.DataFrame":
        """Predict class probabilities (classifier) or point predictions (regressor).

        A ``jax.Array`` input stays resident: classifiers return the (n, 2) calibrated
        probability matrix as a ``jax.Array`` (isotonic calibration is a device
        interp); regressors return device point predictions.
        """
        check_is_fitted(self, ["γ_"])
        if _is_device_array(X):
            yhat = self.decision_function(X)
            if self._estimator_type != "classifier":
                return yhat
            x_thr, y_thr = self._iso_thresholds_device(yhat.dtype)
            proba_pos = jnp.interp(yhat, x_thr, y_thr)
            return jnp.stack([1 - proba_pos, proba_pos], axis=1)
        X_df = X
        X = _check_n_features(self, check_array(X, dtype=(np.float64, np.float32)))
        yhat_df = self.decision_function(X)
        if self._estimator_type == "classifier":
            proba_pos = self.predict_proba_calibrator_.transform(yhat_df)
            proba = np.hstack([1 - proba_pos[:, np.newaxis], proba_pos[:, np.newaxis]])
        else:
            proba = yhat_df
            if not np.issubdtype(self.y_dtype_, np.integer):
                proba = yhat_df.astype(self.y_dtype_)
        if is_pandas(X_df):
            try:
                import pandas as pd
            except ImportError:
                return proba
            if self._estimator_type == "classifier":
                return pd.DataFrame(proba, index=X_df.index, columns=self.classes_)
            return pd.Series(proba, index=X_df.index)
        return proba

    def score(
        self,
        X: "FloatMatrix | pd.DataFrame",
        y: "GenericVector | pd.Series",
        sample_weight: npt.NDArray | None = None,
    ) -> float:
        """Accuracy (classifier) or R² (regressor) on the given data."""
        yhat = self.predict(X)
        if self._estimator_type == "classifier":
            return accuracy_score(np.asarray(y), np.asarray(yhat), sample_weight=sample_weight)
        return r2_score(
            np.asarray(y).astype(np.float64),
            np.asarray(yhat).astype(np.float64),
            sample_weight=sample_weight,
        )

    # ---------------------------------------------------------------- persistence

    def to_state_dict(self) -> dict[str, Any]:
        """Serialise the fitted model to a nested dict of plain arrays/scalars.

        The result is orbax-/np.savez-storable; ``NeoLSSVM.from_state_dict`` restores a
        model whose predictions are bit-identical. Plain pickling also works.
        """
        from neo_ls_svm_tpu.utils.serialization import model_to_state_dict

        check_is_fitted(self, ["γ_"])
        return model_to_state_dict(self)

    @classmethod
    def from_state_dict(cls, state: dict[str, Any]) -> "NeoLSSVM":
        """Reconstruct a fitted model from :meth:`to_state_dict` output."""
        from neo_ls_svm_tpu.utils.serialization import model_from_state_dict

        return model_from_state_dict(state)

    def _more_tags(self) -> dict[str, Any]:
        return {"binary_only": True, "requires_y": True}

    def __sklearn_tags__(self):  # noqa: ANN204 - sklearn protocol
        from sklearn.utils import ClassifierTags, InputTags, RegressorTags, Tags, TargetTags

        kind = None if self.estimator_type == "auto" else self.estimator_type
        kind = getattr(self, "_estimator_type", None) or kind
        return Tags(
            estimator_type=kind,
            target_tags=TargetTags(required=True),
            classifier_tags=ClassifierTags(multi_class=False) if kind == "classifier" else None,
            regressor_tags=RegressorTags() if kind == "regressor" else None,
            input_tags=InputTags(),
        )
