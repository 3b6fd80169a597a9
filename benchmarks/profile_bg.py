"""Stage-decompose a batch-grid blind-rotation launch by ablation.

VERDICT r4 next #1/#2: the non-MXU residual of both bg kernels is *named*
(stage-1 roll chains, bank peels, HBM accumulator round-trip) but was
never measured.  This probe compiles timing-only kernel variants with one
stage skipped each (`skip=` static param, see _fused_blindrot_bg_kernel)
and reports per-launch stage costs by difference:

    stage cost ~= t(full) - t(full minus stage)

plus the out-of-kernel glue (modswitch + sample extract + keyswitch) as
t(pbs_batch) - t(blind_rotate).  Ablated kernels produce garbage data by
design — timings only; the production path is decrypt-gated elsewhere.

Usage (TPU):
    python benchmarks/profile_bg.py             # 32-bit, B=1792 tb=896
    PROF_WIDTH=64 python benchmarks/profile_bg.py   # TPU64, B=2048 tb=512
Env: PROF_B, PROF_TB, PROF_ITERS, PROF_SKIPS (comma list to restrict).
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
from fhe_regex_tpu.ops.pbs import default_drop64, prepare_server_key
from fhe_regex_tpu.params import (TEST_PARAMS, TEST_PARAMS_64,
                                  TPU64_MESSAGE_2_CARRY_2,
                                  TPU_MESSAGE_2_CARRY_2)

SKIPS = [(), ("rot",), ("scatter",), ("stage1",), ("bank",), ("dots",),
         ("accdma",)]


def main():
    on_tpu = jax.default_backend() == "tpu"
    width = int(os.environ.get("PROF_WIDTH", "32"))
    if width == 64:
        params = TPU64_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS_64
        B = int(os.environ.get("PROF_B", "2048" if on_tpu else "8"))
        tb = int(os.environ.get("PROF_TB", "512" if on_tpu else "8"))
        backend = "pallas64-bg"
    else:
        params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
        B = int(os.environ.get("PROF_B", "1792" if on_tpu else "8"))
        tb = int(os.environ.get("PROF_TB", "896" if on_tpu else "8"))
        backend = "pallas-bg"
    iters = int(os.environ.get("PROF_ITERS", "4" if on_tpu else "1"))
    only = os.environ.get("PROF_SKIPS")
    skips = (SKIPS if only is None else
             [tuple(s.split("+")) if s else () for s in only.split(",")])

    ck, sk = _get_keys(params)
    dev = prepare_server_key(params, sk, backend)
    from fhe_regex_tpu.regex.executor import _np_to_limbs

    msgs = np.arange(B) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts_np = _np_to_limbs(
        np.stack([make_lut_poly(params, lambda x: (x * 3 + 1) % 16)]),
        params.torus_bits)
    luts = jnp.asarray(luts_np)
    idx = jnp.zeros(B, jnp.int32)
    ctsj = jnp.asarray(_np_to_limbs(cts, params.torus_bits))

    if width == 64:
        from fhe_regex_tpu.ops.pbs64 import mod_switch64
        from fhe_regex_tpu.ops.pbs_pallas import blind_rotate_fused64_bg
        drop = dev.drop64

        def rotate(skip):
            # key as ARGUMENT: a closed-over key embeds as an HLO literal
            # and can overflow the remote-compile request limit
            fn = jax.jit(lambda bsk, c_lo, c_hi: blind_rotate_fused64_bg(
                params, bsk, luts[..., 0], luts[..., 1], idx,
                mod_switch64(params, c_lo, c_hi), drop, tb=tb, skip=skip))
            return lambda: fn(dev.bsk_raw64, ctsj[..., 0], ctsj[..., 1])

        def full_pbs():
            from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused64_bg
            return lambda: pbs_batch_fused64_bg(
                params, dev.bsk_raw64, dev.ksk8, luts[..., 0], luts[..., 1],
                idx, drop, tb, ctsj[..., 0], ctsj[..., 1])
    else:
        from fhe_regex_tpu.ops.pbs import mod_switch
        from fhe_regex_tpu.ops.pbs_pallas import blind_rotate_fused_bg
        drop = None

        def rotate(skip):
            # key as ARGUMENT (see the 64-bit note)
            fn = jax.jit(lambda bsk, c: blind_rotate_fused_bg(
                params, bsk, luts, idx, mod_switch(params, c),
                jnp.int8, (0, 1, 2, 3), tb=tb, skip=skip))
            return lambda: fn(dev.bsk_raw, ctsj)

        def full_pbs():
            from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused_bg
            return lambda: pbs_batch_fused_bg(
                params, dev.bsk_raw, dev.ksk_limbs, luts, idx, jnp.int8,
                (0, 1, 2, 3), tb, ctsj)

    def timeit(thunk, label):
        out = thunk()
        jax.tree.map(lambda x: np.asarray(x), out)        # compile + warm
        t0 = time.time()
        for _ in range(iters):
            out = thunk()
        jax.tree.map(lambda x: np.asarray(x), out)
        dt = (time.time() - t0) / iters
        print(f"{label:>12s}: {dt*1e3:9.1f} ms/launch", flush=True)
        return dt

    print(f"# {params.name} backend={backend} B={B} tb={tb} iters={iters} "
          f"drop={drop}", flush=True)
    times = {}
    for skip in skips:
        label = "+".join(skip) if skip else "full"
        try:
            times[label] = timeit(rotate(skip), label)
        except Exception as e:
            print(f"{label:>12s}: ERROR {e!r}", flush=True)
    t_pbs = timeit(full_pbs(), "pbs(full)")

    full = times.get("full")
    table = {"params": params.name, "backend": backend, "B": B, "tb": tb,
             "iters": iters, "drop": list(drop) if drop else None,
             "launch_ms": {k: round(v * 1e3, 1) for k, v in times.items()},
             "pbs_ms": round(t_pbs * 1e3, 1)}
    if full:
        table["stage_cost_ms"] = {
            k: round((full - v) * 1e3, 1)
            for k, v in times.items() if k != "full"}
        table["glue_extract_ks_ms"] = round((t_pbs - full) * 1e3, 1)
        table["pbs_per_sec_full"] = round(B / t_pbs, 1)
        print("# stage costs (full - ablated), ms/launch:", flush=True)
        for k, v in table["stage_cost_ms"].items():
            print(f"#   {k:>8s}: {v:8.1f}", flush=True)
        print(f"#   extract+keyswitch glue: {table['glue_extract_ks_ms']:.1f}",
              flush=True)
    out_path = (Path(__file__).resolve().parent / "profiles"
                / f"bg{width}_stages.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(table, indent=2) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
