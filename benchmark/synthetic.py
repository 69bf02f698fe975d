"""Offline benchmark suite: NeoLSSVM-TPU vs classic SVMs on synthetic tabular tasks.

Mirrors the protocol of the reference's benchmark scripts
(``benchmark/classification.py`` / ``benchmark/regression.py``: 85/15 split, default
hyperparameters, single fit, score + fit wall-clock) on a spread of synthetic datasets
that exercise the regimes the AutoML-Benchmark datasets cover — heterogeneous feature
scales, heteroskedastic noise, redundant features, class imbalance — without requiring
network access to OpenML.

Usage: python benchmark/synthetic.py [--quick]
"""

import argparse
import time

import numpy as np


def _gen(seed):
    return np.random.RandomState(seed)


def make_task(name: str, seed: int = 0):
    g = _gen(seed)
    if name == "scales":  # wildly heterogeneous feature scales (clf)
        X = g.randn(4000, 12) * np.logspace(-3, 3, 12)
        z = X[:, 0] * 1e3 + np.sin(X[:, 6]) + 0.5 * g.randn(4000)
        return X, np.where(z > 0, "a", "b"), "clf"
    if name == "xor":  # interaction-dominated decision boundary (clf)
        X = g.randn(5000, 8)
        z = X[:, 0] * X[:, 1] + 0.3 * g.randn(5000)
        return X, np.where(z > 0, "pos", "neg"), "clf"
    if name == "imbalanced":  # 10:1 class imbalance (clf)
        X = g.randn(6000, 10)
        z = X[:, 0] + 0.7 * X[:, 1] - 1.8 + 0.4 * g.randn(6000)
        return X, np.where(z > 0, "rare", "common"), "clf"
    if name == "small-dual":  # n ≤ 1024 → dual route (clf)
        X = g.randn(800, 6)
        z = np.sin(X[:, 0]) + X[:, 1] * X[:, 2] + 0.3 * g.randn(800)
        return X, np.where(z > 0, "y", "n"), "clf"
    if name == "prices":  # positive skewed target (reg)
        X = g.randn(6000, 10)
        y = np.exp(0.4 * np.sin(X[:, 0]) + 0.2 * X[:, 1] + 0.1 * g.randn(6000)) * 100
        return X, y, "reg"
    if name == "hetero":  # heteroskedastic noise (reg)
        X = g.randn(5000, 8)
        y = 10 + np.sin(X[:, 0]) + 0.5 * X[:, 1] + (0.2 + 0.4 * np.abs(X[:, 5])) * g.randn(5000)
        return X, y, "reg"
    if name == "redundant":  # correlated/redundant features (reg)
        Z = g.randn(4000, 4)
        X = np.hstack([Z, Z @ g.randn(4, 12) + 0.05 * g.randn(4000, 12)])
        y = 5 + Z[:, 0] ** 2 + Z[:, 1] + 0.2 * g.randn(4000)
        return X, y, "reg"
    if name == "small-reg":  # n ≤ 1024 → dual route (reg)
        X = g.randn(900, 5)
        y = 3 + np.abs(X[:, 0]) + 0.5 * X[:, 1] + 0.2 * g.randn(900)
        return X, y, "reg"
    raise ValueError(name)


TASKS = ["scales", "xor", "imbalanced", "small-dual", "prices", "hetero", "redundant", "small-reg"]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    from sklearn.svm import SVC, SVR

    from neo_ls_svm_tpu import NeoLSSVM

    tasks = TASKS[:4] if args.quick else TASKS
    header = f"{'task':<12} {'kind':<5} {'n':>6} {'neo score':>10} {'neo fit':>8} {'svm score':>10} {'svm fit':>8}"
    print(header)
    print("-" * len(header))
    for name in tasks:
        X, y, kind = make_task(name)
        split = int(0.85 * len(y))
        X_tr, y_tr, X_te, y_te = X[:split], y[:split], X[split:], y[split:]
        t0 = time.perf_counter()
        neo = NeoLSSVM().fit(X_tr, y_tr)
        neo_fit = time.perf_counter() - t0
        neo_score = neo.score(X_te, y_te)
        svm = SVC() if kind == "clf" else SVR()
        t0 = time.perf_counter()
        svm.fit(X_tr, y_tr)
        svm_fit = time.perf_counter() - t0
        svm_score = svm.score(X_te, y_te)
        print(
            f"{name:<12} {kind:<5} {len(y):>6} {neo_score:>9.1%} {neo_fit:>7.2f}s "
            f"{svm_score:>9.1%} {svm_fit:>7.2f}s"
        )


if __name__ == "__main__":
    main()
