"""Benchmark: bootstraps/sec/chip on the primary parameter set.

Prints ONE JSON line:
  {"metric": "pbs_per_sec_per_chip", "value": N, "unit": "bootstraps/s",
   "vs_baseline": N / 100}

Baseline: the reference's crypto stack (tfhe-rs 0.2 on CPU) runs a
PARAM_MESSAGE_2_CARRY_2 bootstrap in O(10 ms) single-thread (BASELINE.md —
the repo publishes no numbers; 100 bootstraps/s is the CPU baseline row).
Correctness is asserted in-run: the timed batch is decrypted and checked.

Keys for the full parameter set are generated once and cached in .cache/.
"""

from __future__ import annotations

import json
import os
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


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(CACHE / "jax"))
    import jax
    import jax.numpy as jnp

    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2, TEST_PARAMS
    from fhe_regex_tpu.crypto import lwe
    from fhe_regex_tpu.crypto.golden import make_lut_poly
    from fhe_regex_tpu.ops.pbs import prepare_server_key, make_pbs_fn

    on_tpu = jax.default_backend() == "tpu"
    params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
    if "BENCH_PARAMS" in os.environ:
        from fhe_regex_tpu.params import get_params
        params = get_params(os.environ["BENCH_PARAMS"])
    is64 = params.torus_bits == 64
    # VMEM-ceiling sweet spots for the fused kernels: B=1792 (32-bit,
    # 937.6 pbs/s at the 127M vmem cap; 2048 exceeds the 128M chip vmem)
    # and B=1024 (64-bit, 613.1)
    B = int(os.environ.get(
        "BENCH_BATCH", ("1024" if is64 else "1792") if on_tpu else "8"))
    iters = int(os.environ.get("BENCH_ITERS", "4" if on_tpu else "2"))
    backend = os.environ.get(
        "BENCH_BACKEND",
        ("pallas64" if is64 else "pallas-fused") if on_tpu
        else ("jnp64" if is64 else "jnp"))
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[
        os.environ.get("BENCH_MATMUL", "int8")]
    drop_limbs = int(os.environ.get("BENCH_DROP_LIMBS", "0"))

    print(f"# params={params.name} B={B} iters={iters} backend={backend} "
          f"platform={jax.default_backend()}", file=sys.stderr)
    ck, sk = _get_keys(params)
    dev_key = prepare_server_key(params, sk, backend, matmul_dtype=dtype,
                                 drop_limbs=drop_limbs)
    pbs = make_pbs_fn(dev_key)

    from fhe_regex_tpu.regex.executor import _limbs_to_np, _np_to_limbs

    msgs = np.arange(B) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts = jnp.asarray(_np_to_limbs(
        np.stack([make_lut_poly(params, lambda x: (x * 3 + 1) % 16)]),
        params.torus_bits))
    lut_idx = jnp.zeros(B, jnp.int32)
    ctsj = jnp.asarray(_np_to_limbs(cts, params.torus_bits))

    t0 = time.time()
    out = pbs(luts, lut_idx, ctsj)
    np.asarray(out)  # host transfer: axon block_until_ready can return early
    print(f"# compile+first run {time.time() - t0:.1f}s", file=sys.stderr)

    import contextlib
    prof_dir = os.environ.get("BENCH_PROFILE")  # JAX profiler trace dir
    prof = (jax.profiler.trace(prof_dir) if prof_dir
            else contextlib.nullcontext())
    t0 = time.time()
    with prof:
        for _ in range(iters):
            out = pbs(luts, lut_idx, ctsj)
        np.asarray(out)
    dt = time.time() - t0
    pbs_per_sec = iters * B / dt

    # correctness gate: the timed computation must decrypt right
    o = _limbs_to_np(np.asarray(out), params.torus_bits)
    got = np.array([lwe.decrypt_lwe(params, ck.lwe_key, o[i]) for i in range(B)])
    want = (msgs * 3 + 1) % 16
    n_bad = int((got != want).sum())
    if n_bad:
        print(f"# CORRECTNESS FAIL: {n_bad}/{B} wrong", file=sys.stderr)
        pbs_per_sec = 0.0

    print(json.dumps({
        "metric": "pbs_per_sec_per_chip",
        "value": round(pbs_per_sec, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(pbs_per_sec / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
