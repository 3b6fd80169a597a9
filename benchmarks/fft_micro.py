"""Microbenchmark: transform options for an FFT-based external product.

Decides HOW to compute the batched length-1024 complex FFT that an
FFT-formulation PBS needs per blind-rotation step (see docs/ROADMAP.md
"N^2 -> N log N"):

  A. jnp.fft.fft on complex64            (XLA FFT -> VPU)
  B. four-step matmul FFT (M1 x M2)      (MXU f32, scrambled output order)
  C. raw f32 / int8 matmul roofline points for reference

Per-step transform demand at B=1792, 16-bit key limbs: 6B forward +
2*2B inverse = 17920 transforms of length 1024.  The matmul external
product spends ~2.2 ms/step at B=1792 (938 pbs/s measured) — the FFT
formulation wins iff transforms + pointwise land well under that.

Run on TPU: python benchmarks/fft_micro.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def timeit_chained(fn, x, iters=20, warmup=3):
    """Feed the output back as the next input — device compute serializes,
    so async dispatch can't hide the per-call cost."""
    y = x
    for _ in range(warmup):
        y = fn(y)
    jax.block_until_ready(y)
    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def four_step_mats(M1, M2, inverse=False):
    # NOTE: returned as numpy so jitted closures embed them as literals —
    # closing over complex64 DEVICE arrays makes XLA fetch them back for
    # constant folding, which the axon TPU backend cannot do (UNIMPLEMENTED).
    M = M1 * M2
    sgn = 2j if inverse else -2j
    F1 = np.exp(sgn * np.pi * np.outer(np.arange(M1), np.arange(M1)) / M1)
    F2 = np.exp(sgn * np.pi * np.outer(np.arange(M2), np.arange(M2)) / M2)
    T = np.exp(sgn * np.pi * np.outer(np.arange(M1), np.arange(M2)) / M)
    return (F1.astype(np.complex64), T.astype(np.complex64),
            F2.astype(np.complex64))


def four_step(x, F1, T, F2, M1, M2, prec):
    # x [B, M] natural order -> [B, M1, M2] scrambled (k1, k2) order
    B = x.shape[0]
    x = x.reshape(B, M1, M2)
    y = jnp.einsum("bjm,jk->bkm", x, F1, precision=prec)
    y = y * T[None]
    return jnp.einsum("bkm,ml->bkl", y, F2, precision=prec)


def main():
    print(f"# backend={jax.default_backend()}")
    B = 8192
    M = 1024
    rng = np.random.default_rng(0)
    xc = jnp.asarray((rng.standard_normal((B, M)) * 100
                      + 1j * rng.standard_normal((B, M)) * 100
                      ).astype(np.complex64))

    # A. XLA FFT (chained: output feeds the next input, so compute
    # serializes on device and async dispatch can't hide the cost)
    f_fft = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))
    t = timeit_chained(f_fft, xc)
    print(f"jnp.fft.fft      [B={B}, {M}] c64: {t*1e3:8.3f} ms  "
          f"({B/t/1e6:7.2f} M transforms/s)")

    # B. four-step variants
    for (M1, M2) in ((32, 32), (64, 16), (16, 64), (128, 8), (8, 128)):
        F1, T, F2 = four_step_mats(M1, M2)
        for prec in ("highest", "default"):
            f = jax.jit(lambda v, M1=M1, M2=M2, p=prec:
                        four_step(v, F1, T, F2, M1, M2, p).reshape(v.shape))
            t = timeit_chained(f, xc)
            print(f"four-step {M1:3d}x{M2:<3d} {prec:7s}: {t*1e3:8.3f} ms  "
                  f"({B/t/1e6:7.2f} M transforms/s)")

    # C. matmul roofline reference points
    for dt, K in ((jnp.float32, 1024), (jnp.bfloat16, 1024), (jnp.int8, 1024)):
        a = jnp.asarray(rng.integers(-64, 64, (B, K))).astype(dt)
        bmat = jnp.asarray(rng.integers(-64, 64, (K, 1024))).astype(dt)
        acc = jnp.int32 if dt == jnp.int8 else jnp.float32
        for prec in (("highest",) if dt == jnp.float32 else ("default",)):
            f = jax.jit(lambda u, v, p=prec, acc=acc, dt=dt: jax.lax.dot(
                u, v, precision=p, preferred_element_type=acc).astype(dt))
            t = timeit_chained(lambda u, v=bmat, f=f: f(u, v), a)
            flops = 2 * B * K * 1024
            print(f"matmul {np.dtype(dt.dtype if hasattr(dt,'dtype') else dt).name:8s} "
                  f"{prec:7s} [B={B}]x[{K},1024]: {t*1e3:8.3f} ms "
                  f"({flops/t/1e12:7.2f} T(FL)OPS)")

    # D. pointwise contraction (r=6 rows x k1=2 comps, 2 limbs) on VPU
    d = jnp.asarray(rng.standard_normal((B, 6, M)).astype(np.float32))
    di = jnp.asarray(rng.standard_normal((B, 6, M)).astype(np.float32))
    kre = jnp.asarray(rng.standard_normal((6, 2, 2, M)).astype(np.float32))
    kim = jnp.asarray(rng.standard_normal((6, 2, 2, M)).astype(np.float32))

    def pointwise(dr, di, kr, ki):
        outr = jnp.einsum("brm,rclm->bclm", dr, kr) - jnp.einsum(
            "brm,rclm->bclm", di, ki)
        outi = jnp.einsum("brm,rclm->bclm", dr, ki) + jnp.einsum(
            "brm,rclm->bclm", di, kr)
        return outr, outi
    f = jax.jit(pointwise)
    t = timeit(f, d, di, kre, kim)
    print(f"pointwise 6x2x2lb [B={B}]: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
