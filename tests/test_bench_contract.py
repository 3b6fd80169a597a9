"""Pin the driver contract: bench.py prints exactly one JSON line with the
required fields on stdout."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_json_contract(tmp_path):
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               BENCH_ITERS="1", BENCH_BATCH="8",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jaxcache"))
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, timeout=300,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "pbs_per_sec_per_chip"
    assert rec["unit"] == "bootstraps/s"
    assert rec["value"] > 0
    assert abs(rec["vs_baseline"] - rec["value"] / 100.0) < 0.01
