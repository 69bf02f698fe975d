"""Classification benchmark — the reference's AutoML suite protocol.

Mirrors ``/root/reference/benchmark/classification.py`` (dataset list ``:22-63``,
skip rules ``:92-98``, scoring ``:110-112``) through the shared harness in
``benchmark/automl.py``. On a networked checkout this reproduces the README
classification table with one command; offline, ``--smoke`` runs the synthetic
fallback through the identical pipeline.

Usage: python benchmark/classification.py [--smoke] [--limit N] [--skip-reference]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmark.automl import make_parser, run_suite  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_suite("clf", make_parser("classification").parse_args())[0])
