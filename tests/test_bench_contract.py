"""Driver-contract smoke for bench.py: must print exactly ONE JSON
line with the fields the driver records, at a tiny scale so the test
stays minutes-not-hours.  (The driver runs the real thing at sf0.1.)
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_prints_one_json_line_with_contract_fields():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SCALING_SAMPLES="1",
        SPARK_GRAFT_MIN_SCALING_DOCS="500",
        SPARK_GRAFT_SCALING_PAIR_DOCS="500",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout[-2000:]
    obj = json.loads(json_lines[0])
    assert obj["metric"] == "headline_queries_total"
    assert obj["unit"] == "sec" and obj["value"] > 0
    assert "extract_metadata" in obj["queries"]
    assert all(v >= 0 for v in obj["queries"].values())
    assert 0 < obj["scaling_efficiency"] <= 1.0
    assert obj["scaling_pair_docs"] == 500
    assert any(k.startswith("docs_per_sec_local") for k in obj)
