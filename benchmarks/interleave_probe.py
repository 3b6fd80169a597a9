"""A/B the software-interleaved bg schedules on hardware (decrypt-gated).

The interleaved schedule emits the MXU dots over already-decomposed digit
rows before the next component's stage-1, so Mosaic can run the VPU
rotate/decompose under the MXU dots (bit-exactness pinned by
tests/test_pbs_pallas.py).  This probe measures both schedules of both bg
kernels at their production shapes and prints pbs/s each.

Usage (TPU):  python benchmarks/interleave_probe.py [32|64|both]
Env: IL_B, IL_TB, IL_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent
                          / ".cache" / "jax"))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _get_keys
from fhe_regex_tpu.crypto import lwe
from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.pbs import prepare_server_key
from fhe_regex_tpu.params import (TEST_PARAMS, TEST_PARAMS_64,
                                  TPU64_MESSAGE_2_CARRY_2,
                                  TPU_MESSAGE_2_CARRY_2)
from fhe_regex_tpu.regex.executor import _limbs_to_np, _np_to_limbs


def run_width(width: int, iters: int) -> dict:
    on_tpu = jax.default_backend() == "tpu"
    if width == 64:
        params = TPU64_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS_64
        B = int(os.environ.get("IL_B", "2048" if on_tpu else "8"))
        tb = int(os.environ.get("IL_TB", "512" if on_tpu else "8"))
        backend = "pallas64-bg"
    else:
        params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
        B = int(os.environ.get("IL_B", "1792" if on_tpu else "8"))
        tb = int(os.environ.get("IL_TB", "896" if on_tpu else "8"))
        backend = "pallas-bg"
    ck, sk = _get_keys(params)
    dev = prepare_server_key(params, sk, backend)

    msgs = np.arange(B) % 16
    f = lambda x: (x * 3 + 1) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts = jnp.asarray(_np_to_limbs(
        np.stack([make_lut_poly(params, f)]), params.torus_bits))
    idx = jnp.zeros(B, jnp.int32)
    ctsj = jnp.asarray(_np_to_limbs(cts, params.torus_bits))

    if width == 64:
        from fhe_regex_tpu.ops.pbs64 import (key_switch64, mod_switch64,
                                             sample_extract64)
        from fhe_regex_tpu.ops.pbs_pallas import blind_rotate_fused64_bg

        def make(interleave):
            # key material as ARGUMENTS: a closed-over key embeds as an
            # HLO literal and overflows the remote-compile request limit
            @jax.jit
            def fn(bsk, ksk, c_lo, c_hi):
                ms = mod_switch64(params, c_lo, c_hi)
                alo, ahi = blind_rotate_fused64_bg(
                    params, bsk, luts[..., 0], luts[..., 1], idx,
                    ms, dev.drop64, tb=tb, interleave=interleave)
                blo, bhi = sample_extract64(params, alo, ahi)
                olo, ohi = key_switch64(params, ksk, blo, bhi)
                return jnp.stack([olo, ohi], axis=-1)
            return lambda: fn(dev.bsk_raw64, dev.ksk8,
                              ctsj[..., 0], ctsj[..., 1])
    else:
        from fhe_regex_tpu.ops.pbs import mod_switch, sample_extract
        from fhe_regex_tpu.ops.pbs_pallas import (blind_rotate_fused_bg,
                                                  key_switch_mxu)

        def make(interleave, block_major=False):
            # key material as ARGUMENTS (see 64-bit note)
            @jax.jit
            def fn(bsk, ksk, c):
                acc = blind_rotate_fused_bg(
                    params, bsk, luts, idx, mod_switch(params, c),
                    jnp.int8, (0, 1, 2, 3), tb=tb, interleave=interleave,
                    block_major=block_major)
                return key_switch_mxu(params, ksk,
                                      sample_extract(params, acc))
            return lambda: fn(dev.bsk_raw, dev.ksk_limbs, ctsj)

    res = {"params": params.name, "B": B, "tb": tb, "iters": iters}
    # IL_CONFIGS: comma list of serial|interleave|blockmajor|bm+il
    cfg_env = os.environ.get("IL_CONFIGS", "serial,interleave")
    configs = {
        "serial": (False, False), "interleave": (True, False),
        "blockmajor": (False, True), "bm+il": (True, True),
    }
    for label in cfg_env.split(","):
        interleave, block_major = configs[label]
        if block_major and width == 64:
            continue                 # 32-bit-only path for now
        thunk = (make(interleave, block_major) if width != 64
                 else make(interleave))
        t0 = time.time()
        out = thunk()
        np.asarray(out)
        print(f"# [{width}b {label}] compile+first {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        for _ in range(iters):
            out = thunk()
        np.asarray(out)
        dt = (time.time() - t0) / iters
        o = _limbs_to_np(np.asarray(out), params.torus_bits)
        got = np.array([lwe.decrypt_lwe(params, ck.lwe_key, o[i])
                        for i in range(B)])
        bad = int((got != (msgs * 3 + 1) % 16).sum())
        rate = B / dt if not bad else 0.0
        print(f"# [{width}b {label}] {rate:.1f} pbs/s "
              f"({dt*1e3:.0f} ms/launch, {bad}/{B} wrong)", flush=True)
        res[label] = {"pbs_per_sec": round(rate, 1),
                      "ms_per_launch": round(dt * 1e3, 1), "wrong": bad}
    return res


def run_mono(iters: int, schedules=("interleave",)) -> dict:
    """Monolithic fused kernel (the 32-bit headline) at B=1792,
    stack_rows + bank_split, serial vs interleaved schedule."""
    on_tpu = jax.default_backend() == "tpu"
    params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
    B = int(os.environ.get("IL_B", "1792" if on_tpu else "8"))
    ck, sk = _get_keys(params)
    dev = prepare_server_key(params, sk, "pallas-fused", stack_rows=True,
                             bank_split=True)
    from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused

    msgs = np.arange(B) % 16
    f = lambda x: (x * 3 + 1) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(B, jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))

    res = {"params": params.name, "B": B, "mode": "monolithic stack+split",
           "iters": iters}
    for label in schedules:
        interleave = label == "interleave"
        thunk = lambda: pbs_batch_fused(
            params, dev.bsk_fused, dev.ksk_limbs, luts, idx, jnp.int8,
            (0, 1, 2, 3), True, True, ctsj, interleave)
        t0 = time.time()
        np.asarray(thunk())
        print(f"# [mono {label}] compile+first {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        for _ in range(iters):
            out = thunk()
        np.asarray(out)
        dt = (time.time() - t0) / iters
        o = np.asarray(out).view(np.uint32)
        got = np.array([lwe.decrypt_lwe(params, ck.lwe_key, o[i])
                        for i in range(B)])
        bad = int((got != (msgs * 3 + 1) % 16).sum())
        rate = B / dt if not bad else 0.0
        print(f"# [mono {label}] {rate:.1f} pbs/s "
              f"({dt*1e3:.0f} ms/launch, {bad}/{B} wrong)", flush=True)
        res[label] = {"pbs_per_sec": round(rate, 1),
                      "ms_per_launch": round(dt * 1e3, 1), "wrong": bad}
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    iters = int(os.environ.get(
        "IL_ITERS", "6" if jax.default_backend() == "tpu" else "1"))
    out = []
    if which in ("32", "both"):
        out.append(run_width(32, iters))
    if which in ("64", "both"):
        out.append(run_width(64, iters))
    if which == "mono":
        scheds = os.environ.get("IL_SCHED", "interleave").split(",")
        out.append(run_mono(iters, tuple(scheds)))
    path = (Path(__file__).resolve().parent / "profiles"
            / ("interleave_probe_mono.json" if which == "mono"
               else "interleave_probe.json"))
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
