"""Benchmark: fit wall-clock on synthetic RBF regression, TPU vs NumPy reference path.

Artifact contract (the driver captures the tail of stdout):
- stdout carries EXACTLY ONE compact JSON line — the headline — containing the
  primary 262k metric, ``vs_baseline``, per-trial statistics, the Pallas value
  check, a tunnel-weather probe, and a one-entry summary of the best 1M lane.
  It is size-bounded (well under 2000 chars) so tail-truncation can never eat it.
- The full lane matrix (every alternate fit mode, serving lanes, device phase
  breakdown — each with ``{trials, best_s, median_s, all_s}``) is written to
  ``benchmark/bench_extra.json`` and echoed to stderr.
- If a tunnel hang stalls the run past ``BENCH_WATCHDOG_S`` (default 3300 s), a
  watchdog emits whatever headline evidence exists so far (flagged
  ``watchdog_fired`` with the hung stage) as the stdout line and exits 2 —
  a partial artifact beats the empty stdout a driver-side kill would leave.

Protocol (BASELINE.md north star): synthetic RBF regression, default n=262144 rows,
d=32 features, float32 (the reference keeps float32 inputs in float32). Both sides run
the identical host-side supervised pre-transform (this package's separator/ORFF — they
are bit-compatible with the reference's, see tests/); the baseline then executes the
reference-equivalent complex NumPy primal solver, while ours runs the real-embedding
solver on the TPU. Timed quantity is the full fit wall-clock after a warm-up fit
(compile time excluded for ours; BLAS warm for the baseline).

Usage: python bench.py [--smoke] [--n N] [--skip-baseline]
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
# Overridable so test subprocesses (tests/test_bench_contract.py) never clobber the
# repo's real perf evidence with their tiny-n / induced-failure artifacts (VERDICT r4
# weak-item 2: the failure-path overwrite rule used to destroy the committed matrix).
EXTRA_PATH = os.environ.get(
    "BENCH_EXTRA_PATH", os.path.join(REPO_DIR, "benchmark", "bench_extra.json")
)

# Hang insurance: the tunneled TPU occasionally blocks a single device call for many
# minutes (one 345 s hang is on record; this session observed >10 min). If the whole
# run exceeds this budget, a daemon watchdog emits whatever headline evidence exists
# so far as THE stdout JSON line and exits — a partially-measured artifact beats the
# empty stdout a driver-side kill would leave. Override via BENCH_WATCHDOG_S.
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "3300"))
_WATCHDOG = {"done": False, "stage": "start", "partial": {}}


def _write_extras(payload: dict) -> None:
    """Persist the side file; failure paths overwrite it too, so a stale matrix
    from an earlier run can never masquerade as this run's evidence."""
    os.makedirs(os.path.dirname(EXTRA_PATH), exist_ok=True)
    with open(EXTRA_PATH, "w") as fh:
        json.dump(payload, fh, indent=1)


def _watchdog_fire(timeout_s: float) -> None:
    time.sleep(timeout_s)
    if _WATCHDOG["done"]:
        return
    headline = {
        "metric": "fit_wallclock_synthetic_rbf",
        **_WATCHDOG["partial"],
        "watchdog_fired": True,
        "hung_at": _WATCHDOG["stage"],
        "watchdog_s": timeout_s,
    }
    try:
        _write_extras({"headline": headline, "extra_metrics": []})
    except Exception:
        pass
    line = json.dumps(headline, separators=(",", ":"))[:1900]
    print(f"[bench] WATCHDOG: no completion after {timeout_s:.0f}s; stage "
          f"{_WATCHDOG['stage']!r}; emitting partial headline", file=sys.stderr)
    sys.stderr.flush()
    print(line, flush=True)
    os._exit(2)


def trial_stats(times: list[float]) -> dict:
    """The shared per-lane trial record: every timed lane carries its trial count,
    best, median, and the raw samples so cross-lane/cross-round comparisons can be
    made on evidence instead of single draws (tunnel weather swings minute-to-minute)."""
    return {
        "trials": len(times),
        "best_s": round(min(times), 4),
        "median_s": round(statistics.median(times), 4),
        "all_s": [round(t, 4) for t in times],
    }


def make_dataset(n: int, d: int, seed: int = 0, dtype=np.float32):
    gen = np.random.RandomState(seed)
    X = gen.randn(n, d).astype(dtype)
    y = (
        np.sin(X[:, 0])
        + 0.5 * X[:, 1] * X[:, 2]
        + 0.25 * np.abs(X[:, 3])
        + 0.1 * gen.randn(n)
    ).astype(dtype)
    return X, y


def tunnel_probe(mb: int = 32, trials: int = 3) -> dict:
    """Quantify tunnel weather inside the artifact: a fixed-size host→device upload
    and an 8-byte scalar pull, each timed best/median-of-N. Healthy tunnel ≈ 0.1 s
    for 32 MB and ≈ 0.1 s for the pull; a stalled minute reads 10-100× worse. Lane
    numbers in this artifact should be interpreted against this probe."""
    import jax
    import jax.numpy as jnp

    payload = np.random.RandomState(0).randn(mb * 1024 * 1024 // 4).astype(np.float32)
    upload_times, pull_times = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        x = jax.device_put(payload)
        jax.device_get(jnp.sum(x[:8]))  # completion barrier on the transfer
        upload_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(x[:8]))
        pull_times.append(time.perf_counter() - t0)
        del x
    return {
        "mb": mb,
        "upload": trial_stats(upload_times),
        "scalar_pull": trial_stats(pull_times),
        "platform": jax.devices()[0].platform,
    }


def numpy_reference_fit(phi: np.ndarray, y: np.ndarray, gammas: np.ndarray) -> dict:
    """Reference-equivalent complex NumPy primal solve (the baseline's device math).

    Same math as ``_optimize_β̂_γ`` of the reference with the shipped identity
    complexity matrix: Gram → complex Hermitian eigh → closed-form LOO residuals over
    the γ grid → Cholesky re-solve (see SURVEY.md §3.1).
    """
    import scipy.linalg

    n, M = phi.shape
    s = np.full(n, 1.0 / n, dtype=y.dtype)
    s_phi = s[:, None] * phi
    gram = s_phi.conj().T @ s_phi
    gram = (gram + gram.conj().T) / 2
    inv_c0 = n * M
    lam, Q = scipy.linalg.eigh(inv_c0 * gram)
    rhs = s_phi.conj().T @ (s * y)
    beta_basis = Q * (inv_c0 * (Q.conj().T @ rhs))[None, :]
    phi_beta = np.ascontiguousarray(np.real(phi @ beta_basis))
    leverage_basis = np.ascontiguousarray(
        np.real(s_phi @ Q * (inv_c0 * (Q.conj().T @ s_phi.conj().T)).T)
    )
    resolvent = 1.0 / (gammas[None, :] + lam[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        loo_residuals = (phi_beta @ resolvent - y[:, None]) / (1 - leverage_basis @ resolvent)
    loo_errors = s @ np.abs(loo_residuals)
    best = int(np.argmin(loo_errors))
    gamma = gammas[best]
    L = scipy.linalg.cho_factor(gamma / inv_c0 * np.eye(M, dtype=gram.dtype) + gram)
    beta = scipy.linalg.cho_solve(L, rhs)
    return {"gamma": float(gamma), "beta": beta, "loo_error": float(loo_errors[best])}


def run_baseline(X, y, fmap, gammas) -> float:
    """Full reference-equivalent fit: host pre-transform + complex NumPy solver."""
    from neo_ls_svm_tpu.utils.base import clone

    t0 = time.perf_counter()
    fm = clone(fmap).fit(X, y, np.ones_like(y))
    phi = fm.transform(X)
    numpy_reference_fit(phi, y, gammas)
    return time.perf_counter() - t0


def timed_best_fit(X, y, trials: int = 2, **params) -> tuple[dict, object, dict]:
    """Best-of-``trials`` timed fits (after one compile warm-up) with phase breakdown.

    Phase instrumentation: host_prep = the supervised pre-transform + feature-map
    fit (which the in-flight X upload rides under; absent for
    ``pre_transform="device"``, whose pre-transform runs inside the device program);
    solve_tail = everything after (solver dispatch + device execution + the scalar
    completion barrier); materialize = the deferred device→host pull of the
    observability API. Returns (trial_stats_dict, best_model, best_phases) —
    best-of-N because tunneled-TPU transfer latency swings by an order of magnitude
    minute to minute, but every sample is recorded.
    """
    import neo_ls_svm_tpu.ops.orff as orff_mod
    from neo_ls_svm_tpu import NeoLSSVM
    from neo_ls_svm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()  # Repeat bench runs skip the cold XLA compile.
    phase: dict[str, float] = {}
    orig_fit = orff_mod.OrthogonalRandomFourierFeatures.fit

    def timed_fm_fit(self, *args, **kwargs):
        t0 = time.perf_counter()
        out = orig_fit(self, *args, **kwargs)
        phase["host_prep_s"] = time.perf_counter() - t0
        return out

    orff_mod.OrthogonalRandomFourierFeatures.fit = timed_fm_fit
    try:
        NeoLSSVM(**params).fit(X, y)  # warm-up: XLA compiles once, production caches
        times: list[float] = []
        best = float("inf")
        best_phase: dict[str, float] = {}
        model = None
        for _ in range(trials):
            phase.clear()
            t0 = time.perf_counter()
            m = NeoLSSVM(**params).fit(X, y)
            dt = time.perf_counter() - t0
            t1 = time.perf_counter()
            m.loo_residuals_  # noqa: B018 - forces the lazy device→host pull
            phase["materialize_s"] = time.perf_counter() - t1
            phase["solve_tail_s"] = dt - phase.get("host_prep_s", 0.0)
            times.append(dt)
            if dt < best:
                best, best_phase, model = dt, dict(phase), m
    finally:
        orff_mod.OrthogonalRandomFourierFeatures.fit = orig_fit
    return trial_stats(times), model, {k: round(v, 4) for k, v in best_phase.items()}


def run_ours(X, y, trials: int = 3) -> tuple[dict, object, dict]:
    stats, model, best_phase = timed_best_fit(X, y, trials=trials)
    # Serving-path throughput: full predict (validate → upload → fused
    # feature-map+gemv on device → pull) over the training-sized matrix.
    model.predict(X)  # compile the full-shape predict program off the clock
    predict_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        model.predict(X)
        predict_s = min(predict_s, time.perf_counter() - t0)
    best_phase["predict_s"] = round(predict_s, 4)
    best_phase["predict_rows_per_s"] = round(X.shape[0] / predict_s, 1)
    return stats, model, best_phase


def timed_best_device(fn, *, trials: int = 2):
    """The bench's standard device-timing protocol: warm once (compile), then
    best-of-``trials`` with a scalar-pull completion barrier on the first output
    leaf (``block_until_ready`` is unreliable through the tunnel; best-of-N because
    tunnel latency swings minute to minute). Returns (trial_stats, last_output)."""
    import jax
    import jax.numpy as jnp

    def barrier(out):
        jax.device_get(jnp.sum(jax.tree.leaves(out)[0]))

    out = fn()
    barrier(out)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        barrier(out)
        times.append(time.perf_counter() - t0)
    return trial_stats(times), out


def measure_device_predict(model, X) -> dict:
    """Device-resident serving throughput: jax.Array in → jax.Array out.

    The upload is excluded (scalar-pull barrier first); the timed quantity is
    dispatch + device compute + the scalar completion probe, i.e. what a serving
    pipeline whose features already live on device would pay.
    """
    import jax
    import jax.numpy as jnp

    X_d = jax.device_put(X)
    jax.device_get(jnp.sum(X_d))  # barrier on the upload
    stats, _ = timed_best_device(lambda: model.predict(X_d))
    return stats


def measure_device_quantile_serving(model, X) -> dict:
    """Device-resident conformal serving: jax.Array in → calibrated quantiles out.

    Same protocol as ``measure_device_predict`` (upload excluded via a barrier;
    warm best-of-2). Covers the full conformal chain on device: CQR plane matmuls,
    the per-row min-dispersion abs/rel choice, and the interval combine."""
    import jax
    import jax.numpy as jnp

    X_d = jax.device_put(X)
    jax.device_get(jnp.sum(X_d))
    stats_q, _ = timed_best_device(
        lambda: model.predict_quantiles(X_d, quantiles=(0.025, 0.5, 0.975))
    )
    stats_i, _ = timed_best_device(lambda: model.predict_interval(X_d, coverage=0.95))
    return {"quantiles": stats_q, "interval": stats_i}


def pallas_value_check(n: int = 32768, d: int = 32) -> str:
    """Hardware-value regression for the fused Pallas kernels vs the XLA path.

    Returns "ok" when the Pallas streaming fit's γ is near-optimal under the XLA
    objective and its LOO residuals agree to f32 summation-order tolerance;
    "skipped" on non-TPU backends (Pallas does not lower there).
    """
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform in ("cpu", "gpu"):
        return "skipped"
    import numpy as np

    from neo_ls_svm_tpu.models.primal import gamma_grid, primal_fit_streaming
    from neo_ls_svm_tpu.ops.orff import OrthogonalRandomFourierFeatures

    X, y_reg = make_dataset(n, d, seed=7)
    y_clf = np.where(y_reg > np.median(y_reg), 1.0, -1.0).astype(np.float32)
    for is_classifier, y in ((False, y_reg), (True, y_clf)):
        s = np.ones_like(y)
        fm = OrthogonalRandomFourierFeatures().fit(X, y, s)
        M_map, b_map = fm.linear_map()
        g = gamma_grid(np.float32)
        X_d = jax.device_put(X)
        M_d, b_d, y_d, s_d, g_d = jax.device_put(
            (M_map.astype(np.float32), b_map.astype(np.float32), y, s, g)
        )
        out = {}
        for name, kw in (
            ("xla", {}),
            ("pallas", {"use_pallas_gram": True, "use_pallas_sweep": True}),
        ):
            r = primal_fit_streaming(
                X_d, M_d, b_d, y_d, s_d, g_d,
                is_classifier=is_classifier, row_chunk=8192, **kw,
            )
            out[name] = jax.device_get(
                {k: r[k] for k in ("gamma", "loo_residuals", "loo_errors_gammas", "loo_score")}
            )
        xla, pallas = out["xla"], out["pallas"]
        idx = int(np.argmin(np.abs(gamma_grid(np.float32) - pallas["gamma"])))
        gamma_near_optimal = xla["loo_errors_gammas"][idx] <= xla["loo_errors_gammas"].min() * (
            1 + 1e-3
        )
        resid_scale = float(np.std(xla["loo_residuals"]))
        resid_ok = float(np.max(np.abs(pallas["loo_residuals"] - xla["loo_residuals"]))) < max(
            1e-3 * resid_scale, 1e-6
        )
        score_ok = abs(float(pallas["loo_score"]) - float(xla["loo_score"])) < 1e-3
        if not (gamma_near_optimal and resid_ok and score_ok):
            return (
                f"FAIL clf={is_classifier} gamma_near_optimal={bool(gamma_near_optimal)} "
                f"resid_ok={resid_ok} score_ok={score_ok}"
            )
    return "ok"


def device_phase_breakdown(X, y, model) -> dict:
    """Per-op device times for the fit's three dominant kernels (gram/eigh/sweep).

    Times each stage warm with a scalar-pull completion barrier on staged device
    data, so the numbers are device-execution + dispatch only (no host prep, no
    data upload) — the context that makes the headline effective-TFLOP/s figure
    judgeable."""
    import jax
    import jax.numpy as jnp

    from neo_ls_svm_tpu.models.primal import (
        _eigendecompose,
        embed_from_gram_blocks,
        gamma_grid,
    )
    from neo_ls_svm_tpu.ops.pallas.gram import fused_augmented_gram, w_basis_from_augmented
    from neo_ls_svm_tpu.ops.pallas.sweep import fused_loo_sweep

    if jax.devices()[0].platform != "tpu":
        return {"skipped": "non-TPU backend"}
    n = X.shape[0]
    D = model._M_map.shape[1]
    M = D + 1
    dtype = X.dtype
    s = np.full(n, 1.0 / n, dtype=dtype)
    g = gamma_grid(dtype)
    X_d, M_d, b_d, y_d, s_d = jax.device_put(
        (X, model._M_map.astype(dtype), model._b_map.astype(dtype), y, s)
    )
    s2_d = s_d * s_d
    jax.device_get(jnp.sum(X_d[0]))  # barrier on the staging transfer
    sign = jnp.concatenate([jnp.ones((M,), dtype), -jnp.ones((M,), dtype)])

    gram_stats, G_aug = timed_best_device(
        lambda: fused_augmented_gram(X_d, M_d, b_d, s2_d, y_d, block_rows=256)
    )
    G, b_vec = w_basis_from_augmented(G_aug, D)
    B = embed_from_gram_blocks(G, M)
    inv_c0 = jnp.asarray(float(n * M), dtype)
    eigh_stats, (lam, Qs, inv_c0_out) = timed_best_device(
        lambda: _eigendecompose(B, None, inv_c0, sign)
    )
    k = jnp.dot(Qs.T, b_vec)
    r_all = 1.0 / (jnp.asarray(g)[None, :] + lam[:, None])
    sweep_stats, _ = timed_best_device(
        lambda: fused_loo_sweep(
            X_d, M_d, b_d, y_d, s_d, s2_d, Qs, r_all, k,
            block_rows=128, is_classifier=False, inv_c0_static=float(n * M),
        )
    )
    return {"gram": gram_stats, "eigh": eigh_stats, "sweep": sweep_stats}


FIT_LANES: tuple[tuple[str, dict], ...] = (
    ("fast_precision", {"precision": "fast"}),
    ("host_pretransform", {"pre_transform": "host"}),
    ("device_pretransform", {"pre_transform": "device", "transfer": "float32"}),
    ("device_pretransform_bf16", {"pre_transform": "device", "transfer": "bfloat16"}),
    ("device_pretransform_int8", {"pre_transform": "device", "transfer": "int8"}),
)


def run_fit_lane(X, y, lane: str, params: dict, trials: int = 2) -> dict:
    """One alternate-configuration fit lane with full trial statistics recorded."""
    n = X.shape[0]
    _WATCHDOG["stage"] = f"lane:{lane}:n{n}"
    try:
        stats, lane_model, lane_phases = timed_best_fit(X, y, trials=trials, **params)
        record = {
            "metric": f"fit_{lane}_n{n}",
            "value": stats["best_s"],
            "unit": "s",
            **stats,
            "loo_score": round(float(lane_model.loo_score_), 4),
            "phases": lane_phases,
        }
        print(
            f"[bench] {lane} fit: best {stats['best_s']:.3f}s median {stats['median_s']:.3f}s "
            f"(loo R2 {lane_model.loo_score_:.4f}) phases={lane_phases}",
            file=sys.stderr,
        )
        return record
    except Exception as exc:  # pragma: no cover - lane resilience
        print(f"[bench] {lane} fit FAILED: {exc}", file=sys.stderr)
        return {"metric": f"fit_{lane}_n{n}", "error": str(exc)}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="small shapes for a quick check")
    parser.add_argument("--full", action="store_true", help="the 1M-row north-star protocol")
    parser.add_argument("--n", type=int, default=None)
    parser.add_argument("--d", type=int, default=32)
    parser.add_argument("--skip-baseline", action="store_true")
    args = parser.parse_args()

    default_n = 8192 if args.smoke else (1048576 if args.full else 262144)
    n = args.n if args.n is not None else default_n
    X, y = make_dataset(n, args.d)
    print(f"[bench] dataset n={n} d={args.d} dtype={X.dtype}", file=sys.stderr)

    import threading  # noqa: PLC0415

    threading.Thread(target=_watchdog_fire, args=(WATCHDOG_S,), daemon=True).start()
    _WATCHDOG["partial"]["metric"] = f"fit_wallclock_synthetic_rbf_n{n}_d{args.d}_f32"

    _WATCHDOG["stage"] = "tunnel_probe"
    probe = tunnel_probe(mb=4 if args.smoke else 32)
    print(f"[bench] tunnel probe: {probe}", file=sys.stderr)
    _WATCHDOG["partial"]["tunnel_probe_upload_best_s"] = probe["upload"]["best_s"]

    _WATCHDOG["stage"] = "primary_fit"
    ours_stats, model, phases = run_ours(X, y, trials=2 if args.smoke else 3)
    ours_s = ours_stats["best_s"]
    _WATCHDOG["partial"].update(
        value=round(ours_s, 4), unit="s", **{k: v for k, v in ours_stats.items() if k != "best_s"}
    )
    # Device-phase throughput estimate: dominant fit flops (augmented Gram, eigenbasis
    # projection, the two G-wide resolvent contractions, pass-3 stats, eigh) over the
    # post-host-prep wall (includes dispatch + the completion round-trip, so this is a
    # lower bound on raw kernel throughput).
    D, G = 512, 1024
    M2 = 2 * (D + 1)
    fit_flops = (
        2 * n * (M2 + 1) ** 2  # augmented Gram
        + 2 * 2 * n * M2 * M2  # Gu projections (sweep + pass 3)
        + 2 * 2 * n * M2 * G  # num/lev resolvent contractions
        + 10 * M2**3  # eigh (order-of-magnitude)
    )
    solve_tail = max(phases.get("solve_tail_s", ours_s), 1e-9)
    device_tflops = fit_flops / solve_tail / 1e12
    print(
        f"[bench] ours fit: best {ours_s:.3f}s median {ours_stats['median_s']:.3f}s "
        f"(loo R2 {model.loo_score_:.4f}) phases={phases} "
        f"device-phase ≈ {device_tflops:.1f} TFLOP/s effective",
        file=sys.stderr,
    )
    check = pallas_value_check()
    print(f"[bench] pallas value check: {check}", file=sys.stderr)

    # Extra recorded lanes (VERDICT r2 #2/#8, r3 #1/#8): device-resident serving, the
    # alternate fit modes (every lane through the shared trial-stats protocol), and —
    # on the default protocol — the 1M-row north star. Lane failures are recorded,
    # not fatal.
    extra_metrics: list[dict] = []
    one_m_summary: dict | None = None
    if not args.smoke:
        _WATCHDOG["stage"] = "serving_and_alternate_lanes"
        try:
            dev_stats = measure_device_predict(model, X)
            dev_predict_s = dev_stats["best_s"]
            extra_metrics.append(
                {
                    "metric": f"predict_device_resident_n{n}",
                    "value": dev_predict_s,
                    "unit": "s",
                    **dev_stats,
                    "rows_per_s": round(n / dev_predict_s, 1),
                }
            )
            print(
                f"[bench] device-resident predict: {dev_predict_s:.4f}s "
                f"({n / dev_predict_s:,.0f} rows/s)",
                file=sys.stderr,
            )
            # Host-path predict floor analysis: the host path is upload + device
            # compute + pull; the transfer share quantifies how much of predict_s is
            # tunnel-bound (irreducible without moving the data pipeline on device —
            # which the device-resident lane above measures).
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            X_d = jax.device_put(X)
            jax.device_get(jnp.sum(X_d[0]))  # scalar-pull completion barrier
            upload_s = time.perf_counter() - t0
            host_predict_s = phases.get("predict_s", float("nan"))
            transfer_s = max(host_predict_s - dev_predict_s, 0.0)
            extra_metrics.append(
                {
                    "metric": f"predict_host_floor_analysis_n{n}",
                    "host_predict_s": host_predict_s,
                    "upload_s": round(upload_s, 4),
                    "device_s": round(dev_predict_s, 4),
                    "transfer_bound_frac": round(transfer_s / host_predict_s, 3)
                    if host_predict_s
                    else None,
                }
            )
            print(
                f"[bench] host predict floor: upload {upload_s:.3f}s + device "
                f"{dev_predict_s:.3f}s of {host_predict_s:.3f}s total "
                f"({100 * transfer_s / host_predict_s:.0f}% transfer-bound)",
                file=sys.stderr,
            )
            del X_d
        except Exception as exc:  # pragma: no cover - lane resilience
            extra_metrics.append({"metric": f"predict_device_resident_n{n}", "error": str(exc)})
        try:
            q_serving = measure_device_quantile_serving(model, X)
            extra_metrics.append(
                {
                    "metric": f"quantile_serving_device_resident_n{n}",
                    "value": q_serving["quantiles"]["best_s"],
                    "unit": "s",
                    **q_serving,
                    "rows_per_s": round(n / q_serving["quantiles"]["best_s"], 1),
                }
            )
            print(f"[bench] device-resident quantile serving: {q_serving}", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - lane resilience
            extra_metrics.append(
                {"metric": f"quantile_serving_device_resident_n{n}", "error": str(exc)}
            )
        try:
            # Conformal first-call latency. The very first predict_quantiles call
            # compiles the fused ŷ+σ serving programs (a one-off, tunnel-expensive);
            # a fresh quantile tuple on a WARM program cache forces only the two
            # level-1 CQR LP fits (which run concurrently, _fit_conformal_pair), so
            # cold→fresh→warm isolates compile / LP-fit / steady-state shares.
            t0 = time.perf_counter()
            model.predict_quantiles(X[:1024], quantiles=(0.05, 0.5, 0.95))
            cold_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            model.predict_quantiles(X[:1024], quantiles=(0.1, 0.5, 0.9))
            fresh_tuple_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            model.predict_quantiles(X[:1024], quantiles=(0.1, 0.5, 0.9))
            warm_s = time.perf_counter() - t0
            extra_metrics.append(
                {
                    "metric": f"conformal_first_call_n{n}",
                    "cold_s": round(cold_s, 4),
                    "fresh_tuple_s": round(fresh_tuple_s, 4),
                    "warm_s": round(warm_s, 4),
                    "lp_fit_share_s": round(max(fresh_tuple_s - warm_s, 0.0), 4),
                    "compile_share_s": round(max(cold_s - fresh_tuple_s, 0.0), 4),
                }
            )
            print(
                f"[bench] conformal first call: cold {cold_s:.3f}s, fresh tuple "
                f"{fresh_tuple_s:.3f}s, warm {warm_s:.3f}s",
                file=sys.stderr,
            )
            # TPU-native conformal solver lane: the same fresh-tuple level-1 fit
            # through the batched vmapped-Newton device program
            # (conformal_method="smooth") instead of the host HiGHS LPs — the
            # serving programs are already warm, so this isolates the solver swap.
            model.conformal_method = "smooth"
            try:
                t0 = time.perf_counter()
                model.predict_quantiles(X[:1024], quantiles=(0.15, 0.5, 0.85))
                smooth_fresh_s = time.perf_counter() - t0
            finally:
                model.conformal_method = "exact"
            extra_metrics.append(
                {
                    "metric": f"conformal_smooth_fresh_tuple_n{n}",
                    "value": round(smooth_fresh_s, 4),
                    "unit": "s",
                    "exact_fresh_tuple_s": round(fresh_tuple_s, 4),
                }
            )
            print(
                f"[bench] smooth (TPU-native) conformal fresh tuple: "
                f"{smooth_fresh_s:.3f}s (exact LP path: {fresh_tuple_s:.3f}s)",
                file=sys.stderr,
            )
        except Exception as exc:  # pragma: no cover - lane resilience
            extra_metrics.append({"metric": f"conformal_first_call_n{n}", "error": str(exc)})
        try:
            breakdown = device_phase_breakdown(X, y, model)
            extra_metrics.append({"metric": f"device_phase_breakdown_n{n}", **breakdown})
            print(f"[bench] device phases: {breakdown}", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - lane resilience
            extra_metrics.append({"metric": f"device_phase_breakdown_n{n}", "error": str(exc)})
        for lane, params in FIT_LANES:
            extra_metrics.append(run_fit_lane(X, y, lane, params))
    if not args.smoke and not args.full and args.n is None and args.d == 32:
        # The 1M-row north star rides in the default driver run. Its NumPy baseline
        # costs ~15 minutes per execution, so the recorded round-1 measurement on
        # this host (852 s, see BASELINE.md north-star table / CLAUDE.md) stands in,
        # flagged via "baseline_recorded".
        recorded_1m_baseline_s = 852.0
        _WATCHDOG["stage"] = "1m_lanes"
        X1, y1 = make_dataset(1 << 20, 32)
        probe_1m = tunnel_probe()
        extra_metrics.append({"metric": "tunnel_probe_before_1m", **probe_1m})
        print(f"[bench] tunnel probe before 1M lanes: {probe_1m}", file=sys.stderr)
        for lane, params in (
            ("auto", {}),  # the default config: auto pre-transform/transfer routing
            ("host_pretransform", {"pre_transform": "host"}),
            ("device_pretransform", {"pre_transform": "device", "transfer": "float32"}),
            ("device_pretransform_bf16", {"pre_transform": "device", "transfer": "bfloat16"}),
            ("device_pretransform_int8", {"pre_transform": "device", "transfer": "int8"}),
        ):
            record = run_fit_lane(X1, y1, f"wallclock_synthetic_rbf_1m_{lane}", params)
            if "value" in record:
                record["vs_baseline"] = round(recorded_1m_baseline_s / record["value"], 1)
                record["baseline_recorded"] = True
                if one_m_summary is None or record["value"] < one_m_summary["value"]:
                    one_m_summary = {
                        "lane": lane,
                        "value": record["value"],
                        "vs_baseline": record["vs_baseline"],
                    }
            extra_metrics.append(record)
        del X1, y1

    _WATCHDOG["stage"] = "numpy_baseline"
    if args.skip_baseline:
        baseline_s = float("nan")
    else:
        from neo_ls_svm_tpu.models.primal import gamma_grid
        from neo_ls_svm_tpu.ops.orff import OrthogonalRandomFourierFeatures

        gammas = gamma_grid(X.dtype, num=1024)
        baseline_s = run_baseline(X, y, OrthogonalRandomFourierFeatures(), gammas)
        print(f"[bench] numpy reference fit: {baseline_s:.3f}s", file=sys.stderr)

    speedup = baseline_s / ours_s if np.isfinite(baseline_s) else None
    headline = {
        "metric": f"fit_wallclock_synthetic_rbf_n{n}_d{args.d}_f32",
        "value": round(ours_s, 4),
        "unit": "s",
        "vs_baseline": round(speedup, 2) if speedup else None,
        "trials": ours_stats["trials"],
        "median_s": ours_stats["median_s"],
        "all_s": ours_stats["all_s"],
        "loo_score": round(float(model.loo_score_), 4),
        "phases": phases,
        "device_tflops_est": round(device_tflops, 2),
        "pallas_value_check": check,
        "tunnel_probe": {
            "mb": probe["mb"],
            "upload_best_s": probe["upload"]["best_s"],
            "upload_median_s": probe["upload"]["median_s"],
            "pull_best_s": probe["scalar_pull"]["best_s"],
            "pull_median_s": probe["scalar_pull"]["median_s"],
        },
        "best_1m_lane": one_m_summary,
        "extras": os.path.relpath(EXTRA_PATH, REPO_DIR),
    }
    # Full lane matrix → side file + stderr; the size-bounded headline alone →
    # stdout, as the LAST line, so driver tail-truncation can never eat it.
    _write_extras({"headline": headline, "extra_metrics": extra_metrics})
    print(f"[bench] extras: {json.dumps(extra_metrics)}", file=sys.stderr)
    line = json.dumps(headline, separators=(",", ":"))
    assert len(line) < 1900, f"headline line must fit the driver tail ({len(line)} chars)"
    _WATCHDOG["done"] = True  # the real headline is about to land; stand down
    print(line)


def _main_with_headline_guard() -> None:
    """Run main(); on a fatal error (e.g. 'Unable to initialize backend: UNAVAILABLE'
    when the tunnel is down — observed as a ~25-min block then a hard failure) still
    emit a parseable stdout headline recording the failure and the stage reached,
    instead of a bare traceback the driver cannot parse. A driver-sent SIGTERM is
    routed through the same path (the handler fires between Python bytecodes, so it
    covers slow-but-alive runs; true native hangs are the watchdog's job)."""
    import signal

    def _on_sigterm(signum, frame):  # pragma: no cover - driver-kill path
        # SystemExit (not RuntimeError): the per-lane `except Exception` resilience
        # guards must NOT swallow a kill signal and keep benching.
        raise SystemExit(143)

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env: keep default behavior
    try:
        main()
    except SystemExit as exc:
        if exc.code in (0, None):
            raise
        headline = {
            "metric": "fit_wallclock_synthetic_rbf",
            **_WATCHDOG["partial"],
            "error": f"SystemExit: {exc.code} (SIGTERM / driver timeout?)",
            "failed_at": _WATCHDOG["stage"],
        }
        try:
            _write_extras({"headline": headline, "extra_metrics": []})
        except Exception:
            pass
        print(json.dumps(headline, separators=(",", ":"))[:1900], flush=True)
        raise
    except BaseException as exc:
        import traceback

        traceback.print_exc(file=sys.stderr)
        headline = {
            "metric": "fit_wallclock_synthetic_rbf",
            **_WATCHDOG["partial"],
            "error": f"{type(exc).__name__}: {exc}"[:400],
            "failed_at": _WATCHDOG["stage"],
        }
        try:
            _write_extras({"headline": headline, "extra_metrics": []})
        except Exception:
            pass
        print(json.dumps(headline, separators=(",", ":"))[:1900], flush=True)
        raise SystemExit(1) from exc


if __name__ == "__main__":
    _main_with_headline_guard()
