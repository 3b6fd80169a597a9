"""Round-3 consolidated hardware validation — ONE process, many stages.

The axon remote Mosaic compiler charges a large first-compile cost per
process (~20 min observed round 3) and ~100-200 s per additional
executable, so every hardware table is produced from a single process:

  e2e32      e2e driver configs, REAL encryption, warm repeats (fuse on)
  e2e32s     same but per-level launches (fuse off) — megarun comparison
  e2e64      e2e at TPU64_MESSAGE_2_CARRY_2 (pallas64), REAL encryption
  serving    serving.py, REAL encryption (mv auto-default ON -> validates
             the auto plan on hardware)
  mv         mv_serving.py, REAL encryption
  multi      multipattern.py, REAL encryption
  long       long.py, REAL encryption

Usage: python benchmarks/r3_all.py [stage ...]   (default: all, in order)
Each stage's stdout lines are prefixed '== stage =='-delimited for the
docs tables.
"""

from __future__ import annotations

import os
import runpy
import sys
import time
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".cache/jax"))

STAGES = ["e2e32", "e2e32s", "e2e64", "serving", "mv", "multi", "long"]


def run_stage(name: str) -> None:
    bench = ROOT / "benchmarks"
    envs: dict = {"BENCH_ENC": "real"}
    if name == "e2e32":
        argv = [str(bench / "e2e.py"), "--repeat", "2"]
        path = bench / "e2e.py"
        envs["FHE_REGEX_FUSE_LEVELS"] = "1"
    elif name == "e2e32s":
        argv = [str(bench / "e2e.py"), "--repeat", "2"]
        path = bench / "e2e.py"
        envs["FHE_REGEX_FUSE_LEVELS"] = "0"
    elif name == "e2e64":
        argv = [str(bench / "e2e.py"), "--repeat", "2",
                "--params", "TPU64_MESSAGE_2_CARRY_2"]
        path = bench / "e2e.py"
        envs["FHE_REGEX_FUSE_LEVELS"] = "1"
    elif name == "serving":
        argv = [str(bench / "serving.py")]
        path = bench / "serving.py"
    elif name == "mv":
        argv = [str(bench / "mv_serving.py")]
        path = bench / "mv_serving.py"
    elif name == "multi":
        argv = [str(bench / "multipattern.py")]
        path = bench / "multipattern.py"
    elif name == "long":
        argv = [str(bench / "long.py")]
        path = bench / "long.py"
    else:
        raise SystemExit(f"unknown stage {name}")

    print(f"== {name} ==", flush=True)
    old_argv, old_env = sys.argv, {k: os.environ.get(k) for k in envs}
    sys.argv = argv
    os.environ.update(envs)
    t0 = time.time()
    try:
        runpy.run_path(str(path), run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"== {name} FAILED rc={e.code} ==", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"== {name} FAILED ==", flush=True)
    finally:
        sys.argv = old_argv
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(f"== {name} done {time.time() - t0:.1f}s ==", flush=True)


def main():
    for name in (sys.argv[1:] or STAGES):
        run_stage(name)


if __name__ == "__main__":
    main()
