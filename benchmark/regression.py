"""Regression benchmark — the reference's AutoML suite protocol.

Mirrors ``/root/reference/benchmark/regression.py`` (dataset list ``:22-56``,
skip rules and scoring ``:88-102``) through the shared harness in
``benchmark/automl.py``. On a networked checkout this reproduces the README
regression table with one command; offline, ``--smoke`` runs the synthetic
fallback through the identical pipeline.

Usage: python benchmark/regression.py [--smoke] [--limit N] [--skip-reference]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmark.automl import make_parser, run_suite  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_suite("reg", make_parser("regression").parse_args())[0])
