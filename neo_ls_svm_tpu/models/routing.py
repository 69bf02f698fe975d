"""Auto-routing policy: resolve ``pre_transform="auto"`` / ``transfer="auto"``.

Pure policy, no estimator state — split out of ``models/estimator.py`` so the
routing thresholds, the quantisation-cost model, and the resolution rules live in
one small reviewable unit (the estimator re-exports these names for back-compat).

The reference has no analogue (it has one fixed fit path, ref ``_neo_ls_svm.py``);
this module exists because the TPU build has several lanes — host vs on-device
pre-transform, f32/bf16/int8 wire — whose crossovers were measured on hardware.
"""

from __future__ import annotations

import numpy as np
import numpy.typing as npt

# Auto-routing thresholds (VERDICT r3 #3: the default config should not leave the
# fast lanes opt-in). Crossovers measured on this repo's tunneled v5e chip
# (CLAUDE.md round-3 numbers): at 262k×32 f32 (32 MiB payload) the host and device
# pre-transforms tie (~1 s, both tunnel-floored) and the narrow wire wins on a quiet
# minute; at 1M×32 (128 MiB) the host prep costs 3-4 s that the device pre-transform
# removes, and int8 beats bf16 (2.26 s vs 2.4-2.5 s) because the wire share dominates
# the extra host quantisation pass. Auto therefore routes on the raw f32 payload
# size (n·d·itemsize), not the row count, and only narrows the wire when the upload
# actually rides the high-latency tunnel — on locally-attached backends the wire is
# cheap and lossless f32 is strictly better.
AUTO_DEVICE_PT_MIN_BYTES = 32 * 1024**2
AUTO_INT8_MIN_BYTES = 100 * 1024**2
# Score budget for lossy auto wire narrowing (VERDICT r4 #4): transfer="auto" may
# only pick int8 when the PREDICTED LOO-R² cost of per-column 8-bit quantisation is
# below this. Explicit transfer="int8" remains an unbounded user choice.
INT8_SCORE_BUDGET = 0.005
# Calibration of the predicted cost model (see _estimate_int8_score_cost): the
# recorded 1M×32 Gaussian bench A/B measured ΔLOO-R² = 0.0184 (f32 0.7533 → int8
# 0.7349) at worst-column step/σ ratio r = max|x|/(127·σ) ≈ 0.039 → κ = Δ/r² ≈ 12.
_INT8_COST_COEFF = 12.0
_INT8_STATS_SAMPLE_ROWS = 65536


def _estimate_int8_score_cost(
    X: npt.NDArray, sample_weight: npt.NDArray | None = None
) -> float:
    """Predicted LOO-R² cost of the int8 wire mode, from column dynamic range.

    Symmetric per-column quantisation has step Δ_c = max|x_c|/127; its damage is
    governed by the worst column's step-to-spread ratio r = max_c Δ_c/σ_c (binning
    and normalisation are per-column, so one heavy-tailed column is enough to flip
    bin assignments). The cost model ĉ = κ·r² is calibrated on the recorded 1M
    bench A/B (κ = :data:`_INT8_COST_COEFF`). Gaussian columns (max|x| ≈ 4-5σ at
    n ≥ 1e5) land at ĉ ≈ 0.01-0.02 — over budget, routed to bfloat16 — while
    bounded/low-kurtosis columns (max|x| ≈ √3σ uniform) land at ĉ ≈ 0.002 and keep
    the quarter-width wire.

    The row set matches what ``symmetric_int8_grid`` actually quantises: zero-weight
    rows never shape the grid there, so they are excluded here too (otherwise one
    absurd-valued zero-weight row would veto int8 that the real grid handles fine).
    max|x_c| — the grid's own quantity and the sample-sensitive one — is computed
    exactly over all kept rows via two temp-free column reductions; only σ_c (stable
    under subsampling) comes from a strided subsample of ≤
    :data:`_INT8_STATS_SAMPLE_ROWS` rows, keeping the host pass O(n·d) reads +
    O(sample·d) arithmetic.
    """
    if sample_weight is not None and not np.all(sample_weight > 0):
        keep = np.asarray(sample_weight) > 0
        idx = np.flatnonzero(keep)
    else:
        keep = idx = None
    # One definition of the empty guard, subsample stride, and f64 subsample for
    # both branches — the weighted and unweighted fits must compute the same cost
    # statistics by construction.
    n_kept = X.shape[0] if idx is None else idx.size
    if n_kept == 0:
        return 0.0
    if keep is None:
        amax = np.maximum(np.max(X, axis=0), -np.min(X, axis=0), dtype=np.float64)
    else:
        # Where-reductions + an index-strided subsample: same statistics as masking
        # X outright, without materialising an O(n·d) copy on a path that exists to
        # shave host milliseconds off ≥100 MiB fits.
        amax = np.maximum(
            np.max(X, axis=0, where=keep[:, None], initial=-np.inf),
            -np.min(X, axis=0, where=keep[:, None], initial=np.inf),
            dtype=np.float64,
        )
    step = max(1, -(-n_kept // _INT8_STATS_SAMPLE_ROWS))
    rows = np.asarray(X[::step] if idx is None else X[idx[::step]], dtype=np.float64)
    sigma = np.std(rows, axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(sigma > 0, (amax / 127.0) / sigma, 0.0)
    r = float(np.max(ratio)) if ratio.size else 0.0
    return _INT8_COST_COEFF * r * r


def _resolve_fit_plan(
    pre_transform: str,
    transfer: str,
    *,
    payload_bytes: int,
    device_pt_eligible: bool,
    tunneled: bool,
    int8_score_cost: float | None = None,
) -> tuple[str, str]:
    """Resolve ``pre_transform="auto"`` / ``transfer="auto"`` to concrete modes.

    Pure routing policy (unit-tested in ``tests/test_auto_routing.py``):

    - ``pre_transform="auto"`` → ``"device"`` when the fit is eligible for the
      on-device pre-transform (single-chip primal, random-Fourier map with the
      identity complexity matrix) and the feature payload is large enough that the
      host prep dominates (≥ :data:`AUTO_DEVICE_PT_MIN_BYTES`); else the bit-parity
      ``"host"`` path.
    - ``transfer="auto"`` → a narrow wire only for device-pre-transform fits whose
      upload rides the tunneled backend AND is big enough that wire width (not
      per-call latency) is the wall (≥ :data:`AUTO_DEVICE_PT_MIN_BYTES`, the same
      crossover that justifies the device pre-transform): ``"int8"`` above
      :data:`AUTO_INT8_MIN_BYTES` (wire share dominates) **and only when the
      predicted LOO-R² cost of quantisation is within**
      :data:`INT8_SCORE_BUDGET` (``int8_score_cost``, estimated from column
      dynamic-range statistics — see :func:`_estimate_int8_score_cost`);
      ``"bfloat16"`` otherwise (its ~0.2%-of-value rounding measured ≈0.004
      LOO-R² on the 1M bench, within budget); lossless ``"float32"`` everywhere
      else. Auto may therefore trade accuracy for wall-clock only inside a stated,
      tested budget — int8's unbounded tail risk is opt-in via an explicit
      ``transfer="int8"``.

    Explicit values pass through untouched — ``pre_transform="host"`` remains the
    documented bit-parity escape hatch.
    """
    resolved_pt = pre_transform
    if pre_transform == "auto":
        resolved_pt = (
            "device"
            if device_pt_eligible and payload_bytes >= AUTO_DEVICE_PT_MIN_BYTES
            else "host"
        )
    resolved_tr = transfer
    if transfer == "auto":
        if (
            resolved_pt == "device"
            and device_pt_eligible
            and tunneled
            # Lossy narrowing needs a payload where wire width is the wall: below
            # the device-pt crossover the ~100 ms tunnel latency dominates and
            # bf16 would spend its ~0.004 LOO-R² rounding for zero wall-clock —
            # reachable via an explicit pre_transform="device" on a small fit.
            and payload_bytes >= AUTO_DEVICE_PT_MIN_BYTES
        ):
            int8_within_budget = (
                int8_score_cost is not None and int8_score_cost < INT8_SCORE_BUDGET
            )
            resolved_tr = (
                "int8"
                if payload_bytes >= AUTO_INT8_MIN_BYTES and int8_within_budget
                else "bfloat16"
            )
        else:
            resolved_tr = "float32"
    return resolved_pt, resolved_tr
