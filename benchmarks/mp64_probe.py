"""Diagnose the TPU64 multipattern run_many slowdown: time every packed
chunk launch of the joint circuit individually.

Env: SERVE_BATCH (contents, default 8), MP_LEN, FHE_REGEX_WIDE_BATCH.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parents[1]
                          / ".cache" / "jax"))

import numpy as np
import jax

from bench import _get_keys
from fhe_regex_tpu import _compile_multi, trivial_encrypt_str
from fhe_regex_tpu.ops.pbs import prepare_server_key
from fhe_regex_tpu.params import TEST_PARAMS_64, TPU64_MESSAGE_2_CARRY_2
from fhe_regex_tpu.regex.executor import Executor, compile_circuit

RULESET = ["/abc/", "/abd/", "/ab/", "/bcd/", "/a.c/", "/ab|cd/",
           "/^abc/", "/bc$/"]


def main():
    on_tpu = jax.default_backend() == "tpu"
    params = TPU64_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS_64
    C = int(os.environ.get("SERVE_BATCH", "8"))
    L = int(os.environ.get("MP_LEN", "16"))
    ck, sk = _get_keys(params)
    builder, roots = _compile_multi(params, L, RULESET, "tree", None, None)
    from fhe_regex_tpu.regex.executor import default_min_bucket
    circuit = compile_circuit(params, builder, roots,
                              min_bucket=default_min_bucket())
    print(f"# joint circuit: {circuit.pbs_count} pbs, "
          f"{len(circuit.levels)} levels, slots {circuit.num_slots}",
          flush=True)
    ex = Executor(params, prepare_server_key(params, sk))
    texts = ["xxxxxabcxxxxxxxx", "xxxxxabdxxxxxxxx", "xqxxxxxxxxxxxxcd",
             "xxxxxxxxxxxxxxxx"]
    cts = np.stack([trivial_encrypt_str(
        params, (texts[i % 4] * ((L + 15) // 16))[:L]) for i in range(C)])

    wide = os.environ.get("FHE_REGEX_WIDE_BATCH", "1") == "1"
    chunks = ex._device_chunks_many(circuit, C, wide)
    widths = [int(ch[3].shape[0]) for ch in chunks]
    print(f"# {len(chunks)} chunk launches, widths: {widths}", flush=True)

    t0 = time.time()
    out = ex.run_many(circuit, cts, wide_batch=wide)
    print(f"# warm run_many: {time.time()-t0:.1f}s", flush=True)

    # per-chunk timing on a fresh slab
    import jax.numpy as jnp
    n1 = params.lwe_dimension + 1
    S = circuit.num_slots
    slab = jnp.zeros((C * S, n1, 2), np.int32)
    luts = ex._device_luts(circuit)
    slab = ex._level_jit(ex._key_args, slab, luts, *chunks[0])
    np.asarray(slab[:1])
    for si, ch in enumerate(chunks):
        t0 = time.time()
        slab = ex._level_jit(ex._key_args, slab, luts, *ch)
        np.asarray(slab[:1])
        print(f"# chunk {si:2d} W={int(ch[3].shape[0]):5d}: "
              f"{time.time()-t0:6.2f}s", flush=True)
    t0 = time.time()
    out = ex.run_many(circuit, cts, wide_batch=wide)
    print(f"# steady run_many: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
