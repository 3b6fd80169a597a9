"""Pallas TPU kernel for the PBS blind rotation — the perf centerpiece
(SURVEY.md §7 L3; replaces concrete-fft + the tfhe-rs CMUX loop, N9/N10).

Key idea: a negacyclic polynomial product with a *fixed* polynomial g is a
matrix product  d (*) g = d @ M(g)  with M(g)[t, m] = ±g[(m-t) mod N].  The
blind-rotation CMUX at step i multiplies the decomposed accumulator digits
(small: |digit| <= B/2 = 64) by the 12 GGSW polynomials of bsk[i] — shared
by every PBS instance in the batch.  So each step becomes a batched matmul

    digits [B, 6N]  x  W_i [6N, 2N]   (structured, never materialized)

mapped onto the MXU.  Exactness: torus coefficients are split into 4 signed
8-bit limbs (in [-128, 127]) and digits are |.| <= 64, so every
bf16 x bf16 -> f32 product is an exact integer and every 128-length K-tile
partial sum is < 2^21 < 2^24 — exact in f32 (int8 x int8 -> int32 is exact
outright).  Limb partials are recombined with shifts in int32, where
wraparound is exactly arithmetic mod 2^32.

W_i tiles are built inside the kernel from a 256-wide window of the
(doubled, limb-split) GGSW poly via 7 conditional log2 rolls — O(7) VPU ops
per 128x128 MXU tile, no HBM traffic for W.

Stage 1 of each step (per-instance negacyclic rotation by a~_i, gadget
decomposition) is plain XLA (gathers + bit ops on the VPU); the whole
742-step ladder runs under one lax.scan.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fhe_regex_tpu.ops.pbs import (
    decompose,
    mod_switch,
    negacyclic_rotate_batch,
    sample_extract,
)
from fhe_regex_tpu.params import Params

I32 = jnp.int32
TILE = 128
WIN = 2 * TILE  # tile construction window


# ---------------- host-side key preparation ----------------


def _limbs_int8(x: np.ndarray) -> np.ndarray:
    """int32 -> 4 signed 8-bit limbs in [-128, 127], last axis.

    Exact mod 2^32: balanced rounding can leave a +-1 carry of weight 2^32
    (e.g. 0x7FFFFFFF -> [-1,0,0,-128] + 1*2^32), which vanishes in the int32
    wraparound recombination — all downstream arithmetic is mod 2^32.
    """
    v = x.astype(np.int64)
    out = np.empty(x.shape + (4,), np.int8)
    for l in range(4):
        d = ((v + 128) & 255) - 128
        out[..., l] = d
        v = (v - d) >> 8
    assert np.all(np.abs(v) <= 1), "limb decomposition out of range"
    return out


def prepare_bsk_pallas(params: Params, bsk: np.ndarray) -> np.ndarray:
    """bsk [n, (k+1)l, k+1, N] uint32 -> doubled+wrapped int8 limbs
    [n, (k+1)l, k+1, 4, 2N + WIN]."""
    N = params.polynomial_size
    g = bsk.view(np.int32).astype(np.int64)
    doubled = np.concatenate([g, -g], axis=-1)                # [..., 2N]
    wrapped = np.concatenate([doubled, doubled[..., :WIN]], axis=-1)
    limbs = _limbs_int8((wrapped & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
    return np.moveaxis(limbs, -1, -2).copy()                  # [..., 4, 2N+WIN]


def prepare_ksk_limbs(params: Params, ksk: np.ndarray) -> np.ndarray:
    """ksk [kN, L, n+1] uint32 -> [4, kN*L, n+1] int8, contraction index
    (t, j) flattened row-major to match the keyswitch digit layout."""
    kN, L, n1 = ksk.shape
    return np.moveaxis(_limbs_int8(ksk.view(np.int32)).reshape(kN * L, n1, 4), -1, 0).copy()


# ---------------- the external-product kernel ----------------


def _ext_product_kernel(digits_ref, w0, w1, w2, w3, acc_prev_ref, out_ref,
                        acc_sc, *, matmul_dtype):
    """grid = (M_tiles, K_tiles); K innermost.

    All dynamic selection happens in BlockSpec index_maps (the axon Mosaic
    compiler rejects traced in-kernel ref indices): w0..w3 are (8, 256)
    replica blocks of the per-(poly, limb, offset) window bank; the kernel
    body itself is fully static.

    digits_ref  [B, TILE] int32 digit block (flattened (poly r, window t0))
    w0..w3      [8, 256] int32 — limb l window, rows identical
    acc_prev_ref/out_ref [B, TILE] int32 (flattened (poly c, m0))
    acc_sc      [B, TILE] int32 scratch, accumulates over the K grid dim
    """
    k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_sc[:, :] = jnp.zeros_like(acc_sc)

    d_blk = digits_ref[:, :].astype(matmul_dtype)              # [B, TILE]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 0)

    total = acc_sc[:, :]
    for l, w_ref in enumerate((w0, w1, w2, w3)):
        x = jnp.broadcast_to(w_ref[0:1, :], (TILE, WIN))
        for s in range(7):                                     # log2(TILE) rolls
            rolled = pltpu.roll(x, 1 << s, axis=1)
            x = jnp.where((row_ids >> s) & 1 == 1, rolled, x)
        # tile[t', m'] = base[TILE + m' - t'] = M(g)[t0 + t', m0 + m']
        tile = x[:, TILE:WIN].astype(matmul_dtype)             # [TILE, TILE]
        if matmul_dtype == jnp.int8:
            part = jax.lax.dot(d_blk, tile, preferred_element_type=I32)
        else:
            part = jax.lax.dot(d_blk, tile,
                               preferred_element_type=jnp.float32).astype(I32)
        total = total + (part << (8 * l))
    acc_sc[:, :] = total

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:, :] = acc_prev_ref[:, :] + acc_sc[:, :]


def _build_window_bank(params: Params, quad_i):
    """quad_i [(k+1)l, k+1, 4, 2N+WIN] int -> [R*8, 256] int32 bank.

    Row ((r*(k+1) + c)*4 + l)*n_blocks + a (x8 replicas) holds
    doubled_{r,c,limb l}[128a : 128a + 256]; the kernel's roll-build then
    reads M(g)[t0+t', m0+m'] = base[TILE + m' - t'] for
    a = (mu - tau - 1) mod n_blocks.
    """
    N = params.polynomial_size
    n_blocks = 2 * N // TILE
    idx = (TILE * jnp.arange(n_blocks))[:, None] + jnp.arange(WIN)[None, :]
    w = quad_i.astype(I32)[..., idx]            # [rows, k+1, 4, n_blocks, 256]
    bank = w.reshape(-1, WIN)
    return jnp.repeat(bank, 8, axis=0)


def external_product_step(params: Params, digits, bank, acc, matmul_dtype):
    """acc + GGSW_i (x) diff  for the whole batch.

    digits [B, (k+1)l, N] int, bank [R*8, 256] int32 (from
    _build_window_bank), acc [B, k+1, N] int32 -> [B, k+1, N] int32.
    """
    k1 = params.glwe_dimension + 1
    rows = params.pbs_level * k1
    N = params.polynomial_size
    tiles = N // TILE
    n_blocks = 2 * N // TILE
    B = acc.shape[0]

    def win_map(l):
        def f(m, k):
            r = k // tiles
            tau = k % tiles
            c = m // tiles
            mu = m % tiles
            a = (mu - tau - 1) % n_blocks
            return (((r * k1 + c) * 4 + l) * n_blocks + a, 0)
        return f

    digits2 = digits.astype(I32).reshape(B, rows * N)
    acc2 = acc.reshape(B, k1 * N)
    grid = (k1 * tiles, rows * tiles)
    win_spec = [pl.BlockSpec((8, WIN), win_map(l), memory_space=pltpu.VMEM)
                for l in range(4)]
    out = pl.pallas_call(
        functools.partial(_ext_product_kernel, matmul_dtype=matmul_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, TILE), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            *win_spec,
            pl.BlockSpec((B, TILE), lambda m, k: (0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TILE), lambda m, k: (0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k1 * N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, TILE), jnp.int32)],
        interpret=(jax.default_backend() != "tpu"),
    )(digits2, bank, bank, bank, bank, acc2)
    return out.reshape(B, k1, N)


# ---------------- full pipeline ----------------


def blind_rotate_pallas(params: Params, bsk_quad, luts, lut_idx, cts_ms,
                        matmul_dtype=jnp.bfloat16):
    k, N, n, l = (params.glwe_dimension, params.polynomial_size,
                  params.lwe_dimension, params.pbs_level)
    B = cts_ms.shape[0]

    lut = luts[lut_idx]
    acc0 = jnp.zeros((B, k + 1, N), dtype=I32)
    acc0 = acc0.at[:, k, :].set(lut)
    acc0 = negacyclic_rotate_batch(acc0, (2 * N - cts_ms[:, n]) & (2 * N - 1))

    def step(acc, xs):
        a_i, quad_i = xs
        rotated = negacyclic_rotate_batch(acc, a_i)
        diff = rotated - acc
        digits = decompose(diff, params.pbs_base_log, l)        # [l, B, k+1, N]
        d = jnp.transpose(digits, (1, 2, 0, 3)).reshape(B, (k + 1) * l, N)
        bank = _build_window_bank(params, quad_i)
        acc = external_product_step(params, d, bank, acc, matmul_dtype)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, (cts_ms[:, :n].T, bsk_quad))
    return acc


def key_switch_mxu(params: Params, ksk_limbs, big):
    """Keyswitch as 4 exact limb matmuls on the MXU.

    ksk_limbs [4, kN*L, n+1] bf16 (signed 8-bit limb values);
    digits |.| <= Bks/2 = 4, so f32-accumulated products stay < 2^23: exact.
    """
    kN, n = params.glwe_key_dim, params.lwe_dimension
    L = params.ks_level
    digits = decompose(big[:, :kN], params.ks_base_log, L)      # [L, B, kN]
    D = jnp.transpose(digits, (1, 2, 0)).reshape(big.shape[0], kN * L)
    D = D.astype(jnp.bfloat16)
    acc = None
    for l in range(4):
        dot = jnp.dot(D, ksk_limbs[l], preferred_element_type=jnp.float32)
        part = dot.astype(I32) << (8 * l)
        acc = part if acc is None else acc + part
    out = -acc
    out = out.at[:, n].add(big[:, kN])
    return out


@functools.partial(jax.jit, static_argnums=(0, 5))
def pbs_batch_pallas(params: Params, bsk_quad, ksk_limbs, luts, lut_idx, matmul_dtype, cts):
    ms = mod_switch(params, cts)
    acc = blind_rotate_pallas(params, bsk_quad, luts, lut_idx, ms, matmul_dtype)
    big = sample_extract(params, acc)
    return key_switch_mxu(params, ksk_limbs, big)
