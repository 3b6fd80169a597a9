"""Pin the driver contract: bench.py prints exactly one JSON line with the
required fields on stdout."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _check_record(line: str) -> dict:
    rec = json.loads(line)
    assert rec["metric"] == "pbs_per_sec_per_chip"
    assert rec["unit"] == "bootstraps/s"
    assert rec["value"] > 0
    assert abs(rec["vs_baseline"] - rec["value"] / 100.0) < 0.01
    return rec


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
    _check_record(lines[0])


def test_bench_ladder_prints_best(tmp_path):
    """Ladder mode (the TPU driver path): the parent prints exactly ONE
    JSON line — the best completed stage."""
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               BENCH_ITERS="1", BENCH_LADDER="jnp:8,jnp:16",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jaxcache"))
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, timeout=300,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    _check_record(lines[0])
    stages = [l for l in out.stderr.splitlines() if "stage result" in l]
    assert len(stages) == 2, out.stderr


def test_bench_ladder_dual_metric_ref64(tmp_path):
    """With BENCH_REF64 on, the ladder parent prints TWO JSON lines: the
    primary metric first, then the reference-exact-set line
    (pbs_per_sec_per_chip_ref64) — the VERDICT r4 #5 artifact contract.
    On CPU the ref64 stage is pointed at TEST_PARAMS_64 (a real n=742
    bootstrap takes minutes off-TPU; the emission path is identical)."""
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               BENCH_ITERS="1", BENCH_LADDER="jnp:8",
               BENCH_REF64="1", BENCH_REF64_PARAMS="TEST_PARAMS_64",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jaxcache"))
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, timeout=300,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-800:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 2, out.stdout
    _check_record(lines[0])
    ref = json.loads(lines[1])
    assert ref["metric"] == "pbs_per_sec_per_chip_ref64"
    assert ref["params"] == "TEST_PARAMS_64"
    assert ref["value"] > 0


def test_bench_ladder_sigterm_prints_best_so_far(tmp_path):
    """A driver timeout (SIGTERM) mid-ladder must still record the best
    completed stage — the round-2 failure mode (rc 124, parsed null) is
    pinned out."""
    import signal
    import time

    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               BENCH_ITERS="1", BENCH_LADDER="jnp:8,jnp:131072",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jaxcache"))
    p = subprocess.Popen([sys.executable, str(REPO / "bench.py")],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=REPO)
    # wait for stage 1 to land, then simulate the driver timeout
    deadline = time.time() + 240
    stderr_lines = []
    while time.time() < deadline:
        line = p.stderr.readline()
        stderr_lines.append(line)
        if "stage result" in line:
            break
    else:
        p.kill()
        raise AssertionError("stage 1 never completed: " +
                             "".join(stderr_lines))
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=60)
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, out
    _check_record(lines[0])
