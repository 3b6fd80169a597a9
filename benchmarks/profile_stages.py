"""Per-stage profiling of the Pallas PBS pipeline.

Times, in one process (so Mosaic compiles amortize):
  1. full pbs_batch_pallas at B=1024 (the bench default),
  2. the stage-1 (rotate+decompose) scan alone,
  3. the external-product (MXU) scan alone,
  4. full pbs at B=2048 (batch-scaling probe).

Each stage-only scan keeps a sequential data dependency so XLA can't
dead-code or parallelize across steps.  Run on TPU:  python benchmarks/profile_stages.py
"""

from __future__ import annotations

import functools
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
from fhe_regex_tpu.ops import pbs_pallas as pp
from fhe_regex_tpu.ops.pbs import make_pbs_fn, mod_switch, prepare_server_key
from fhe_regex_tpu.params import TEST_PARAMS, TPU_MESSAGE_2_CARRY_2


def timeit(name, f, *a, iters=3):
    out = f(*a)
    np.asarray(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    np.asarray(out)
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


@functools.partial(jax.jit, static_argnums=0)
def stage1_scan(params, acc0, a_all):
    B, k1, N = acc0.shape

    def step(acc, a_i):
        d2 = pp.stage1_digits(params, acc, a_i)
        acc = acc + d2[:, : k1 * N].reshape(B, k1, N).astype(jnp.int32)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, a_all)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 4))
def ext_scan(params, digits, bsk_quad, acc0, matmul_dtype):
    def step(acc, quad_i):
        grp = pp._group_quad(params, quad_i)
        acc = pp.external_product_step(params, digits, grp, acc, matmul_dtype)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, bsk_quad)
    return acc


def make_inputs(params, ck, B):
    msgs = np.arange(B) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, int(m), ck.rng)
                    for m in msgs])
    luts = jnp.asarray(
        np.stack([make_lut_poly(params, lambda x: (x * 3 + 1) % 16)]).view(np.int32))
    return luts, jnp.zeros(B, jnp.int32), jnp.asarray(cts.view(np.int32))


def main():
    on_tpu = jax.default_backend() == "tpu"
    params = TPU_MESSAGE_2_CARRY_2 if on_tpu else TEST_PARAMS
    ck, sk = _get_keys(params)
    dev = prepare_server_key(params, sk, "pallas")
    pbs = make_pbs_fn(dev)
    n, k1, N = params.lwe_dimension, params.glwe_dimension + 1, params.polynomial_size
    rows = k1 * params.pbs_level

    B = 1024
    luts, lut_idx, cts = make_inputs(params, ck, B)
    t_full = timeit(f"full pbs B={B}", pbs, luts, lut_idx, cts)
    print(f"  -> {B / t_full:8.1f} bootstraps/s", flush=True)

    ms = jax.jit(mod_switch, static_argnums=0)(params, cts)
    a_all = jnp.asarray(np.asarray(ms)[:, :n].T)
    acc0 = jnp.zeros((B, k1, N), jnp.int32).at[:, k1 - 1, :].set(luts[lut_idx])
    t_s1 = timeit(f"stage1 scan B={B}", stage1_scan, params, acc0, a_all)

    d_dtype = jnp.int8
    rng = np.random.default_rng(0)
    digits = jnp.asarray(rng.integers(-64, 64, (B, rows * N), dtype=np.int8))
    t_ext = timeit(f"ext-product scan B={B}", ext_scan, params, digits,
                   dev.bsk_quad, acc0, dev.matmul_dtype)

    print(f"stage1+ext = {1e3 * (t_s1 + t_ext):.1f} ms of {1e3 * t_full:.1f} ms "
          f"(rest = modswitch + init rotate + ks + glue)", flush=True)

    for B2 in (2048,):
        try:
            luts2, lut_idx2, cts2 = make_inputs(params, ck, B2)
            t2 = timeit(f"full pbs B={B2}", pbs, luts2, lut_idx2, cts2)
            print(f"  -> {B2 / t2:8.1f} bootstraps/s", flush=True)
        except Exception as e:
            print(f"B={B2} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
