"""Round-3 on-chip adjudication: batch-grid kernel + fixed FFT backend.

Measures, in ONE process (in-process compile caching, CLAUDE.md):
  1. pallas-bg   B=1792: compile time, correctness gate, pbs/s
  2. pallas-bg   B=3584: (HBM-resident acc -> larger batches now possible)
  3. fft (mixed) B=1792: compile time, correctness gate, pbs/s
  4. fft (8)     B=1792: same, exact-plan variant

Usage: python benchmarks/r3_probe.py [stage ...]  (default: all)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).parent.parent / ".cache" / "jax"))


def main():
    import jax
    import jax.numpy as jnp

    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2 as P
    from fhe_regex_tpu.crypto import lwe
    from fhe_regex_tpu.crypto.golden import make_lut_poly
    from fhe_regex_tpu.ops.pbs import prepare_server_key, make_pbs_fn
    from fhe_regex_tpu.regex.executor import _limbs_to_np, _np_to_limbs

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import bench as bench_mod

    stages = sys.argv[1:] or ["bg1792", "bg3584", "fftmixed", "fft8"]
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    print(f"# platform={jax.default_backend()} stages={stages}",
          file=sys.stderr, flush=True)
    ck, sk = bench_mod._get_keys(P)

    def run(tag, backend, B, **opts):
        t0 = time.time()
        dev = prepare_server_key(P, sk, backend, **opts)
        pbs = make_pbs_fn(dev)
        msgs = np.arange(B) % 16
        cts = np.stack([lwe.encrypt_lwe(P, ck.lwe_key, int(m), ck.rng)
                        for m in msgs])
        luts = jnp.asarray(_np_to_limbs(
            np.stack([make_lut_poly(P, lambda x: (x * 3 + 1) % 16)]), 32))
        idx = jnp.zeros(B, jnp.int32)
        ctsj = jnp.asarray(_np_to_limbs(cts, 32))
        print(f"# [{tag}] prep {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
        out = pbs(luts, idx, ctsj)
        np.asarray(out)
        print(f"# [{tag}] compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(iters):
            out = pbs(luts, idx, ctsj)
        np.asarray(out)
        dt = time.time() - t0
        o = _limbs_to_np(np.asarray(out), 32)
        got = np.array([lwe.decrypt_lwe(P, ck.lwe_key, o[i])
                        for i in range(B)])
        want = (msgs * 3 + 1) % 16
        n_bad = int((got != want).sum())
        rate = iters * B / dt
        print(f"# [{tag}] B={B} {rate:.1f} pbs/s  bad={n_bad}/{B}",
              file=sys.stderr, flush=True)
        return rate, n_bad

    results = {}
    if "bg1792" in stages:
        results["bg1792"] = run("bg1792", "pallas-bg", 1792)
    if "bg3584" in stages:
        results["bg3584"] = run("bg3584", "pallas-bg", 3584)
    if "fftmixed" in stages:
        results["fftmixed"] = run("fftmixed", "fft", 1792, fft_plan="mixed")
    if "fft8" in stages:
        results["fft8"] = run("fft8", "fft", 1792, fft_plan="8")
    print(results)


if __name__ == "__main__":
    main()
