"""Decompose the fused-kernel time: MXU (limb matmuls) vs fixed overhead.

Times pbs_batch_fused with limbs=(0,), (0,1,2) and the full (0,1,2,3):
t(L) ~= fixed + slope*L separates stage-1/rotation/glue (fixed) from the
external-product MXU work (slope).  Timing-only probe — dropped limbs give
wrong decryptions by design.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent / ".cache" / "jax"))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _get_keys
from fhe_regex_tpu.crypto import lwe
from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.pbs import prepare_server_key
from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused
from fhe_regex_tpu.params import TEST_PARAMS, TPU_MESSAGE_2_CARRY_2


def main():
    on_tpu = jax.default_backend() == "tpu"
    params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
    B = int(os.environ.get("BENCH_BATCH", "1792" if on_tpu else "8"))
    ck, sk = _get_keys(params)
    dev = prepare_server_key(params, sk, "pallas-fused")

    msgs = np.arange(B) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts = jnp.asarray(
        np.stack([make_lut_poly(params, lambda x: x)]).view(np.int32))
    idx = jnp.zeros(B, jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))

    times = {}
    for limbs in [(0, 1, 2, 3), (0, 1, 2), (0,)]:
        out = pbs_batch_fused(params, dev.bsk_fused, dev.ksk_limbs, luts,
                              idx, jnp.int8, limbs, dev.stack_rows,
                              dev.bank_split, ctsj)
        np.asarray(out)
        t0 = time.time()
        for _ in range(3):
            out = pbs_batch_fused(params, dev.bsk_fused, dev.ksk_limbs, luts,
                                  idx, jnp.int8, limbs, dev.stack_rows,
                                  dev.bank_split, ctsj)
        np.asarray(out)
        dt = (time.time() - t0) / 3
        times[len(limbs)] = dt
        print(f"limbs={limbs}: {dt*1e3:9.1f} ms", flush=True)

    slope = (times[4] - times[1]) / 3
    fixed = times[4] - 4 * slope
    print(f"per-limb MXU time ~ {slope*1e3:.1f} ms; "
          f"fixed (stage1+glue+ks) ~ {fixed*1e3:.1f} ms of {times[4]*1e3:.1f} ms",
          flush=True)

    # Persist the decomposition: utils/metrics.py::TP_PROFILE records the
    # last adopted split, and tests/test_comm_model.py flags drift between
    # this artifact and that constant (VERDICT r4 weak #6).
    import json
    out_path = Path(__file__).resolve().parent / "profiles" / "fused_profile.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({
        "source": "benchmarks/profile_fused.py",
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "params": params.name,
        "batch": B,
        "per_limb_mxu_s": slope,
        "fixed_glue_s": fixed,
        "total_s": times[4],
    }, indent=2) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
