"""Doc/number drift gate: every measured block in the perf docs must match
docs/measurements.json (regenerate with scripts/update_docs.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_measured_blocks_match_measurements_json():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "update_docs.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO, timeout=60,
    )
    assert out.returncode == 0, (
        f"perf docs drifted from docs/measurements.json:\n{out.stdout}"
        f"{out.stderr}"
    )


def test_measurements_json_parses_and_has_headline():
    import json

    with open(os.path.join(REPO, "docs", "measurements.json")) as f:
        m = json.load(f)
    assert m["bench"]["fft_bf16_x8"] > 0
    assert m["vs_baseline"] > 1.0
