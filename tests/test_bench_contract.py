"""The driver contract: bench.py prints exactly one valid JSON metric line."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_json_line() -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--n", "2048", "--skip-baseline"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    lines = [l for l in result.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines}"
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["unit"] == "s"
    assert payload["value"] > 0
    assert payload["pallas_value_check"] == "skipped"  # forced-CPU run
    assert payload["phases"]["host_prep_s"] > 0
    assert payload["phases"]["predict_s"] > 0  # serving-path metric
    assert payload["phases"]["predict_rows_per_s"] > 0
    # Extra recorded lanes (device-resident serving + alternate fit modes) ride in
    # "extra_metrics"; each succeeds (has a value) or records its error string.
    lanes = {m["metric"]: m for m in payload["extra_metrics"]}
    for name in (
        "predict_device_resident_n2048",
        "fit_fast_precision_n2048",
        "fit_device_pretransform_n2048",
    ):
        assert name in lanes, lanes.keys()
        assert lanes[name].get("value", 0) > 0, lanes[name]
