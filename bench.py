"""Benchmark: bootstraps/sec/chip on the primary parameter set.

Prints ONE JSON line:
  {"metric": "pbs_per_sec_per_chip", "value": N, "unit": "bootstraps/s",
   "vs_baseline": N / 100}

Baseline: the reference's crypto stack (tfhe-rs 0.2 on CPU) runs a
PARAM_MESSAGE_2_CARRY_2 bootstrap in O(10 ms) single-thread (BASELINE.md —
the repo publishes no numbers; 100 bootstraps/s is the CPU baseline row).
Correctness is asserted in-run: every timed batch is decrypted and checked.

Driver-window robustness (round 3): the remote Mosaic compile of the
B=1792 fused kernel costs 765-2520 s depending on compiler weather (the
round-2 driver bench timed out with nothing recorded).  On TPU this script
therefore runs a LADDER of batch shapes in a child process — B=256
(compiles in minutes, ~730 pbs/s), then B=1024 (~915), then B=1792
(939.7) — and the parent prints the best completed measurement: on
SIGTERM (the driver's timeout) it immediately emits the best-so-far JSON,
so a number is recorded whatever the budget.  Set BENCH_BACKEND or
BENCH_BATCH to force a single direct measurement (no ladder, no child).

Keys for the full parameter set are generated once and cached in .cache/.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).parent / ".cache"


def _get_keys(params):
    from fhe_regex_tpu.crypto.keys import gen_keys
    from fhe_regex_tpu.crypto.csprng import Csprng

    CACHE.mkdir(exist_ok=True)
    path = CACHE / f"bench_keys_{params.name}.npz"
    if path.exists():
        z = np.load(path)
        from fhe_regex_tpu.crypto.keys import ClientKey, ServerKey
        ck = ClientKey(params=params, lwe_key=z["lwe_key"],
                       glwe_key=z["glwe_key"], rng=Csprng(0xBE7C4))
        sk = ServerKey(params=params, bsk=z["bsk"], ksk=z["ksk"])
        return ck, sk
    t0 = time.time()
    ck, sk = gen_keys(params, seed=0xBE7C4)
    print(f"# keygen {time.time() - t0:.1f}s", file=sys.stderr)
    np.savez(path, lwe_key=ck.lwe_key, glwe_key=ck.glwe_key,
             bsk=sk.bsk, ksk=sk.ksk)
    return ck, sk


def _resolve_params():
    import jax
    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2, TEST_PARAMS

    on_tpu = jax.default_backend() == "tpu"
    params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
    if "BENCH_PARAMS" in os.environ:
        from fhe_regex_tpu.params import get_params
        params = get_params(os.environ["BENCH_PARAMS"])
    return params, on_tpu


def _record(rate: float) -> dict:
    return {
        "metric": "pbs_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(rate / 100.0, 3),
    }


def _measure(params, ck, sk, backend: str, B: int, iters: int,
             prepared: "dict | None" = None) -> float:
    """One (backend, batch) point: compile, time, decrypt-gate.

    Returns pbs/s, or 0.0 on a correctness failure.  ``prepared`` (a dict
    keyed (backend, B)) memoizes the uploaded server key and encrypted
    inputs so a REPEATED ladder stage only re-times the kernel (~10 s)
    instead of re-paying key upload + B host encryptions."""
    import jax.numpy as jnp

    from fhe_regex_tpu.crypto import lwe
    from fhe_regex_tpu.crypto.golden import make_lut_poly
    from fhe_regex_tpu.ops.pbs import prepare_server_key, make_pbs_fn
    from fhe_regex_tpu.regex.executor import _limbs_to_np, _np_to_limbs

    state = None if prepared is None else prepared.get((backend, B))
    fresh = state is None
    if state is None:
        dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[
            os.environ.get("BENCH_MATMUL", "int8")]
        drop_limbs = int(os.environ.get("BENCH_DROP_LIMBS", "0"))
        dev_key = prepare_server_key(params, sk, backend, matmul_dtype=dtype,
                                     drop_limbs=drop_limbs)
        pbs = make_pbs_fn(dev_key)

        msgs = np.arange(B) % 16
        cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                        for m in msgs])
        luts = jnp.asarray(_np_to_limbs(
            np.stack([make_lut_poly(params, lambda x: (x * 3 + 1) % 16)]),
            params.torus_bits))
        lut_idx = jnp.zeros(B, jnp.int32)
        ctsj = jnp.asarray(_np_to_limbs(cts, params.torus_bits))
        state = (pbs, luts, lut_idx, ctsj, msgs)
        if prepared is not None:
            prepared[(backend, B)] = state
    pbs, luts, lut_idx, ctsj, msgs = state

    t0 = time.time()
    out = pbs(luts, lut_idx, ctsj)
    np.asarray(out)  # host transfer: axon block_until_ready can return early
    # on a memoized repeat stage this is a warm re-timed run, not a compile
    label = "compile+first run" if fresh else "warm rerun"
    print(f"# [{backend} B={B}] {label} {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    import contextlib
    import jax
    prof_dir = os.environ.get("BENCH_PROFILE")  # JAX trace dir
    prof = (jax.profiler.trace(prof_dir) if prof_dir
            else contextlib.nullcontext())
    t0 = time.time()
    with prof:
        for _ in range(iters):
            out = pbs(luts, lut_idx, ctsj)
        np.asarray(out)
    dt = time.time() - t0
    rate = iters * B / dt

    o = _limbs_to_np(np.asarray(out), params.torus_bits)
    got = np.array([lwe.decrypt_lwe(params, ck.lwe_key, o[i])
                    for i in range(B)])
    want = (msgs * 3 + 1) % 16
    n_bad = int((got != want).sum())
    if n_bad:
        print(f"# [{backend} B={B}] CORRECTNESS FAIL: {n_bad}/{B} wrong",
              file=sys.stderr, flush=True)
        return 0.0
    print(f"# [{backend} B={B}] {rate:.1f} pbs/s", file=sys.stderr,
          flush=True)
    return rate


def _ref64_stage(iters: int, primary_name: str) -> None:
    """Second driver metric (VERDICT r4 #5): the reference's EXACT
    parameter bundle (REF_MESSAGE_2_CARRY_2_64 — n=742, base 2^23, l=1,
    64-bit torus, ground-truth-verified against its client_key fixture)
    measured via pallas64-bg, emitted as `pbs_per_sec_per_chip_ref64` so
    the apples-to-apples figure is machine-captured in BENCH_r*.json
    rather than docs-only.  BENCH_REF64=0 disables; off-TPU it is opt-in
    (BENCH_REF64=1, optionally BENCH_REF64_PARAMS=TEST_PARAMS_64 — a CPU
    bootstrap at n=742 takes minutes)."""
    import jax

    if os.environ.get("BENCH_REF64", "") in ("0", "off"):
        return
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and "BENCH_REF64" not in os.environ:
        return
    from fhe_regex_tpu.params import get_params
    ref = get_params(os.environ.get("BENCH_REF64_PARAMS",
                                    "REF_MESSAGE_2_CARRY_2_64"))
    if ref.name == primary_name:
        return                      # already the primary metric
    os.environ.setdefault("FHE_REGEX_ALLOW_UNSAFE", "1")   # parity set
    old_drop = os.environ.get("FHE_REGEX_DROP64")
    if ref.name == "REF_MESSAGE_2_CARRY_2_64":
        # free at this point: the drop costs 0.007 sigma at n=742 — its
        # noise is dominated by the set's own keyswitch term
        # (docs/BENCHMARKS.md 64-bit section)
        os.environ["FHE_REGEX_DROP64"] = "2,2"
    try:
        ck, sk = _get_keys(ref)
        from fhe_regex_tpu.ops.pbs import resolve_backend
        backend = "pallas64-bg" if on_tpu else resolve_backend(None, ref)
        batches = (2048, 2048, 2048) if on_tpu else (
            int(os.environ.get("BENCH_BATCH", "8")),)
        prepared: dict = {}
        for B in batches:
            try:
                rate = _measure(ref, ck, sk, backend, B, iters, prepared)
            except Exception as e:
                print(f"# [ref64 {backend} B={B}] ERROR {e!r}",
                      file=sys.stderr, flush=True)
                continue
            if rate > 0:
                rec = _record(rate)
                rec["metric"] = "pbs_per_sec_per_chip_ref64"
                rec["params"] = ref.name
                rec["stage"] = f"ref64:{backend}:{B}"
                print(json.dumps(rec), flush=True)
    finally:
        if old_drop is None:
            os.environ.pop("FHE_REGEX_DROP64", None)
        else:
            os.environ["FHE_REGEX_DROP64"] = old_drop


def _default_ladder(params, on_tpu):
    """(backend, B) stages, cheapest-compile first.  The ladder reuses ONE
    backend so later shapes benefit from the remote compiler's in-process
    warm path (measured: 2nd executable of a process compiles ~13x faster
    than the 1st, benchmarks/r3_probe.py round 3)."""
    if not on_tpu:
        return [(os.environ.get("BENCH_BACKEND")
                 or ("jnp64" if params.torus_bits == 64 else "jnp"),
                 int(os.environ.get("BENCH_BATCH", "8")))]
    if params.torus_bits == 64:
        # batch-grid 64-bit kernel (round 4): ONE B-independent Mosaic
        # executable serves the whole ladder; B=2048/tb=512 measured best.
        # The raw bench is a classic-only workload, so it opts into the
        # deeper (2,2) key-limb drop (7.23 sigma, p<=2^-40); the
        # engine-wide default is the mv-compatible (1,2) — see
        # ops/pbs.py::default_drop64.
        os.environ.setdefault("FHE_REGEX_DROP64", "2,2")
        return [("pallas64-bg", 1024), ("pallas64-bg", 2048),
                ("pallas64-bg", 2048), ("pallas64-bg", 2048)]
    # Round 5: lead with the batch-grid kernel (block-major + interleave
    # default, 933-945 pbs/s measured) — its compile does not scale with B,
    # so a stage completes early whatever the compiler weather — then the
    # monolithic kernel (931.8-954.4 same-day samples; the two are within
    # ~1% jitter of each other).  Repeat stages absorb the ~2% relay
    # jitter; the parent takes the best per-shape MEDIAN.
    return [("pallas-bg", 1792), ("pallas-bg", 3584), ("pallas-bg", 3584),
            ("pallas-fused", 1792), ("pallas-fused", 1792),
            ("pallas-fused", 1792)]


def _parse_ladder(spec: str):
    out = []
    for part in spec.split(","):
        backend, b = part.rsplit(":", 1)
        out.append((backend, int(b)))
    return out


def worker():
    """Runs the ladder, printing one JSON record per completed stage."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(CACHE / "jax"))
    params, on_tpu = _resolve_params()
    iters = int(os.environ.get("BENCH_ITERS", "8" if on_tpu else "2"))
    ladder = (_parse_ladder(os.environ["BENCH_LADDER"])
              if "BENCH_LADDER" in os.environ
              else _default_ladder(params, on_tpu))
    print(f"# params={params.name} iters={iters} ladder={ladder}",
          file=sys.stderr, flush=True)
    ck, sk = _get_keys(params)
    prepared: dict = {}
    for backend, B in ladder:
        try:
            rate = _measure(params, ck, sk, backend, B, iters, prepared)
        except Exception as e:  # keep laddering: a failed stage prints 0
            print(f"# [{backend} B={B}] ERROR {e!r}", file=sys.stderr,
                  flush=True)
            continue
        if rate > 0:
            rec = _record(rate)
            rec["stage"] = f"{backend}:{B}"   # parent groups repeats by this
            print(json.dumps(rec), flush=True)
    # after the primary ladder (so a driver timeout still records the main
    # metric first): the reference-exact-set second metric
    _ref64_stage(iters, params.name)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(CACHE / "jax"))

    single = ("BENCH_BACKEND" in os.environ or "BENCH_BATCH" in os.environ
              ) and "BENCH_LADDER" not in os.environ
    if single:
        # direct mode: one measurement in-process, one JSON line
        params, on_tpu = _resolve_params()
        iters = int(os.environ.get("BENCH_ITERS", "8" if on_tpu else "2"))
        from fhe_regex_tpu.ops.pbs import resolve_backend
        backend = resolve_backend(os.environ.get("BENCH_BACKEND"), params)
        is64 = params.torus_bits == 64
        B = int(os.environ.get(
            "BENCH_BATCH", ("1024" if is64 else "1792") if on_tpu else "8"))
        ck, sk = _get_keys(params)
        print(json.dumps(_record(_measure(params, ck, sk, backend, B,
                                          iters))))
        return

    import jax  # noqa: F401  (resolves the platform before forking)
    params, on_tpu = _resolve_params()
    if not on_tpu and "BENCH_LADDER" not in os.environ:
        # CPU: single direct measurement (test/driver contract unchanged)
        iters = int(os.environ.get("BENCH_ITERS", "2"))
        backend = "jnp64" if params.torus_bits == 64 else "jnp"
        B = int(os.environ.get("BENCH_BATCH", "8"))
        ck, sk = _get_keys(params)
        print(json.dumps(_record(_measure(params, ck, sk, backend, B,
                                          iters))))
        _ref64_stage(iters, params.name)   # opt-in on CPU (BENCH_REF64=1)
        return

    # ladder mode: child runs the stages; parent records, per shape, the
    # MEDIAN of that shape's completed samples (repeat samples exist to
    # absorb ~2% relay jitter, not to cherry-pick the max — advisor r3),
    # takes the best shape PER METRIC (the primary line + the ref64
    # apples-to-apples line, VERDICT r4 #5), and prints them — immediately
    # on SIGTERM/SIGINT (driver timeout), else when the child finishes.
    samples: "dict[tuple, list[dict]]" = {}
    bests: "dict[str, dict]" = {}
    done = False
    PRIMARY = "pbs_per_sec_per_chip"

    def rebest():
        bests.clear()
        for (metric, _stage), recs in samples.items():
            vals = sorted(r["value"] for r in recs)
            med = vals[len(vals) // 2] if len(vals) % 2 else (
                (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2.0)
            rec = dict(recs[0], value=round(med, 2),
                       vs_baseline=round(med / 100.0, 3),
                       samples=len(vals))
            rec.pop("stage", None)
            cur = bests.get(metric)
            if cur is None or rec["value"] > cur["value"]:
                bests[metric] = rec

    def finish(*_):
        nonlocal done
        if done:
            return
        done = True
        if child.poll() is None:
            child.kill()       # SIGKILL: a TERM'd worker inside a native
                               # compile/exec call would linger on the chip
        if PRIMARY in bests:
            print(json.dumps(bests[PRIMARY]), flush=True)
            for metric in sorted(bests):
                if metric != PRIMARY:
                    print(json.dumps(bests[metric]), flush=True)
        else:
            print(f"# no stage completed", file=sys.stderr, flush=True)
        sys.stdout.flush()
        os._exit(0 if PRIMARY in bests else 1)

    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, text=True)
    signal.signal(signal.SIGTERM, finish)
    signal.signal(signal.SIGINT, finish)
    for line in child.stdout:
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in rec:
            samples.setdefault(
                (rec.get("metric", PRIMARY), rec.get("stage", "?")),
                []).append(rec)
            rebest()
        print(f"# stage result: {line}", file=sys.stderr, flush=True)
    child.wait()
    finish()


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
