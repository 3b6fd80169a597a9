"""Batched programmable bootstrapping in JAX (exact int32 torus arithmetic).

TPU-native replacement for the per-op PBS buried in tfhe-rs (SURVEY.md N9):
instead of one bootstrap at a time inside each radix "smart" op, the executor
batches *all PBS instances of a circuit level* into one launch — parallelism
across PBS instances (variants x positions x blocks), the main throughput
lever (SURVEY.md §2.3 "Batch parallelism within PBS").

Everything here operates on ``int32`` arrays whose bits are the uint32 torus
values; XLA defines integer overflow as two's-complement wraparound, so int32
add/sub/mul are exact arithmetic mod 2^32.

Shapes:
  cts      [B, n+1]               batch of LWE ciphertexts [a_0..a_{n-1}, b]
  bsk      [n, (k+1)*l, k+1, N]   bootstrap key (GGSW per secret bit)
  ksk      [kN, ks_level, n+1]    keyswitch key
  luts     [L, N]                 stacked test polynomials
  lut_idx  [B]                    which LUT each instance applies

The blind rotation here is the straightforward lax.scan/conv formulation —
correct everywhere (it is also the multi-chip dry-run path on CPU).  The
speed-of-light TPU kernel lives in ops/pbs_pallas.py and is selected by the
executor when running on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fhe_regex_tpu.params import Params

I32 = jnp.int32
U32 = jnp.uint32


# ---------------- small exact helpers ----------------


def mod_switch(params: Params, cts: jax.Array) -> jax.Array:
    """[B, n+1] torus -> [B, n+1] values in [0, 2N).  Wraparound in the +half
    add contributes a multiple of 2N, so it vanishes mod 2N."""
    N = params.polynomial_size
    shift = params.torus_bits - (N.bit_length() - 1) - 1
    u = cts.astype(U32)
    half = jnp.uint32(1 << (shift - 1))
    return ((u + half) >> shift).astype(I32) & (2 * N - 1)


def decompose(v: jax.Array, base_log: int, level: int, torus_bits: int = 32):
    """Balanced signed gadget decomposition (jnp port of glwe.decompose_balanced).

    v: int32 torus values.  Returns [level, ...] int32 digits in [-B/2, B/2],
    digit j has weight q / B^(j+1) (most significant first).
    """
    B = 1 << base_log
    half = B // 2
    shift = torus_bits - base_log * level
    u = v.astype(U32)
    rounded = ((u + jnp.uint32(1 << (shift - 1))) >> shift).astype(I32)
    digits = []
    state = rounded
    for _ in range(level):
        d = state & (B - 1)
        d = jnp.where(d >= half, d - B, d)
        state = (state - d) >> base_log
        digits.append(d)
    return jnp.stack(digits[::-1])  # most significant first


def negacyclic_rotate_batch(polys: jax.Array, r: jax.Array) -> jax.Array:
    """X^{r_b} * polys[b] for each batch element.

    polys: [B, C, N] int32; r: [B] int32 in [0, 2N).  Returns [B, C, N].

    Implemented as log2(2N) per-instance-conditional static negacyclic
    rolls (select on each bit of r) — static shifts map onto fast VPU
    shuffles, unlike a per-row gather which XLA:TPU lowers to a slow
    generic gather.
    """
    N = polys.shape[-1]
    x = polys
    for s in range(N.bit_length()):          # shifts 1, 2, ..., N
        k = 1 << s
        if k < N:
            rolled = jnp.roll(x, k, axis=-1)
            rolled = rolled.at[..., :k].multiply(-1)
        else:                                # shift by N == negate
            rolled = -x
        bit = ((r >> s) & 1).astype(bool)[:, None, None]
        x = jnp.where(bit, rolled, x)
    return x


def _negacyclic_matrix(g: jax.Array) -> jax.Array:
    """[..., N] poly -> [..., N, N] negacyclic matrix M with (d @ M) = d (*) g.

    M[i, j] = g[j-i] for j >= i, -g[N+j-i] for j < i.
    """
    N = g.shape[-1]
    doubled = jnp.concatenate([g, -g], axis=-1)                  # [..., 2N]
    i = jnp.arange(N)[:, None]
    j = jnp.arange(N)[None, :]
    idx = (j - i) & (2 * N - 1)
    return doubled[..., idx]


# ---------------- blind rotation (jnp reference path) ----------------


def blind_rotate(params: Params, bsk: jax.Array, luts: jax.Array,
                 lut_idx: jax.Array, cts_ms: jax.Array) -> jax.Array:
    """[B, n+1] mod-switched cts -> [B, k+1, N] accumulators."""
    k, N, n, l = (params.glwe_dimension, params.polynomial_size,
                  params.lwe_dimension, params.pbs_level)
    B = cts_ms.shape[0]

    lut = luts[lut_idx]                                          # [B, N]
    acc0 = jnp.zeros((B, k + 1, N), dtype=I32)
    acc0 = acc0.at[:, k, :].set(lut)
    # X^{-b~} * v
    acc = negacyclic_rotate_batch(acc0, (2 * N - cts_ms[:, n]) & (2 * N - 1))

    def step(acc, xs):
        a_i, ggsw_i = xs                                         # [B], [(k+1)l, k+1, N]
        rotated = negacyclic_rotate_batch(acc, a_i)
        diff = rotated - acc                                     # [B, k+1, N]
        # digits: [l, B, k+1, N] -> [B, (k+1)*l, N] row-ordered (comp, level)
        digits = decompose(diff, params.pbs_base_log, l)
        d = jnp.transpose(digits, (1, 2, 0, 3)).reshape(B, (k + 1) * l, N)
        # external product via negacyclic matrices of the 12 GGSW polys:
        #   out[b, c, :] = sum_r  d[b, r, :] @ M(ggsw_i[r, c])
        M = _negacyclic_matrix(ggsw_i)                           # [(k+1)l, k+1, N, N]
        out = jnp.einsum("brn,rcnm->bcm", d, M,
                         preferred_element_type=I32)
        return acc + out, None

    acc, _ = jax.lax.scan(step, acc, (cts_ms[:, :n].T, bsk))
    return acc


def sample_extract(params: Params, accs: jax.Array) -> jax.Array:
    """[B, k+1, N] -> [B, kN+1] big-LWE ciphertexts (coefficient 0)."""
    k, N = params.glwe_dimension, params.polynomial_size
    mask = accs[:, :k, :]                                        # [B, k, N]
    first = mask[:, :, :1]
    rest = -mask[:, :, :0:-1]
    ext = jnp.concatenate([first, rest], axis=-1).reshape(accs.shape[0], k * N)
    body = accs[:, k, :1]
    return jnp.concatenate([ext, body], axis=-1)


def key_switch(params: Params, ksk: jax.Array, big: jax.Array) -> jax.Array:
    """[B, kN+1] -> [B, n+1] under the small LWE key."""
    kN, n = params.glwe_key_dim, params.lwe_dimension
    digits = decompose(big[:, :kN], params.ks_base_log, params.ks_level)  # [l, B, kN]
    acc = jnp.zeros((big.shape[0], n + 1), dtype=I32)
    acc = acc.at[:, n].set(big[:, kN])
    for j in range(params.ks_level):
        acc = acc - jnp.matmul(digits[j], ksk[:, j, :], preferred_element_type=I32)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def pbs_batch(params: Params, bsk: jax.Array, ksk: jax.Array,
              luts: jax.Array, lut_idx: jax.Array, cts: jax.Array) -> jax.Array:
    """Full batched PBS: [B, n+1] -> [B, n+1] (jnp reference path)."""
    ms = mod_switch(params, cts)
    acc = blind_rotate(params, bsk, luts, lut_idx, ms)
    big = sample_extract(params, acc)
    return key_switch(params, ksk, big)


# ---------------- backend selection ----------------


class DeviceServerKey:
    """Server-key material uploaded in the layout a PBS backend wants.

    backend 'jnp': int32 bsk/ksk, the reference scan/einsum path.
    backend 'pallas': limb-split int8 bsk windows + bf16 ksk limbs for the
    MXU kernels (ops/pbs_pallas.py); matmul_dtype selects int8 or bf16 MXU
    tiles for the blind rotation.
    """

    def __init__(self, params: Params, backend: str, **arrays):
        self.params = params
        self.backend = backend
        for k, v in arrays.items():
            setattr(self, k, v)


def resolve_backend(backend: Optional[str],
                    params: Optional[Params] = None) -> str:
    if backend is None:
        if params is not None and params.torus_bits == 64:
            # pallas64-bg (round 4): +29% over the monolithic kernel at
            # TPU64 (margin-gated key-limb drop + batch-grid), compile
            # time independent of batch, validated through the full
            # executor path on hardware (7/7 driver configs decrypt)
            return ("pallas64-bg" if jax.default_backend() == "tpu"
                    else "jnp64")
        # pallas-fused: the whole blind rotation in ONE kernel launch
        # (measured 835 vs 709 bootstraps/s/chip for the per-step pipeline)
        return "pallas-fused" if jax.default_backend() == "tpu" else "jnp"
    return backend


def prepare_server_key(params: Params, server_key,
                       backend: Optional[str] = None,
                       matmul_dtype=None,
                       drop_limbs: int = 0,
                       drop_limbs64: "Optional[tuple]" = None,
                       stack_rows: Optional[bool] = None,
                       bank_split: Optional[bool] = None,
                       fft_plan=None,
                       fft_transform: Optional[str] = None) -> DeviceServerKey:
    """drop_limbs rounds the bootstrap key to skip its low 8-bit limbs — 25%
    fewer blind-rotation MACs per limb at a bounded extra-noise cost
    (flag-gated fast mode; see ops/pbs_pallas.prepare_bsk_pallas)."""
    backend = resolve_backend(backend, params)
    if backend == "jnp":
        return DeviceServerKey(
            params, backend,
            bsk=jnp.asarray(server_key.bsk.view(np.int32)),
            ksk=jnp.asarray(server_key.ksk.view(np.int32)),
        )
    if backend == "pallas":
        from fhe_regex_tpu.ops import pbs_pallas as pp
        # int8 MXU dots are exact (digits <= 64, limbs in [-128,127], int32
        # accumulation) and run at 2x the bf16 rate on v5e — the default.
        return DeviceServerKey(
            params, backend,
            bsk_quad=jnp.asarray(
                pp.prepare_bsk_pallas(params, server_key.bsk, drop_limbs)),
            ksk_limbs=jnp.asarray(pp.prepare_ksk_limbs(params, server_key.ksk))
            .astype(jnp.bfloat16),
            matmul_dtype=matmul_dtype or jnp.int8,
            limbs=tuple(range(drop_limbs, 4)),
        )
    if backend == "pallas-fused":
        import os
        from fhe_regex_tpu.ops import pbs_pallas as pp
        # single-launch blind rotation: the accumulator stays in VMEM across
        # all n CMUX steps (see pbs_pallas.blind_rotate_fused).  stack_rows
        # selects the deep-K (K = rows*128) external-product formulation.
        # deep-K stacked-row external product: measured 913.6 vs 835.1
        # bootstraps/s/chip at B=1024 on v5e — the default
        if stack_rows is None:
            stack_rows = os.environ.get("FHE_REGEX_STACK_ROWS", "1") == "1"
        if bank_split is None:
            bank_split = os.environ.get("FHE_REGEX_BANK_SPLIT", "0") == "1"
        if bank_split:
            stack_rows = True   # split banks only exist in the stacked layout
        prep = (pp.prepare_bsk_fused_raw if bank_split
                else pp.prepare_bsk_fused)
        return DeviceServerKey(
            params, backend,
            bsk_fused=jnp.asarray(prep(params, server_key.bsk, drop_limbs)),
            ksk_limbs=jnp.asarray(pp.prepare_ksk_limbs(params, server_key.ksk))
            .astype(jnp.bfloat16),
            matmul_dtype=matmul_dtype or jnp.int8,
            limbs=tuple(range(drop_limbs, 4)),
            stack_rows=bool(stack_rows),
            bank_split=bool(bank_split),
        )
    if backend == "pallas-bg":
        # batch-grid fused blind rotation: one B-INDEPENDENT Mosaic
        # executable (compile time no longer scales with B — the
        # monolithic kernel's 765-2460 s remote compile at B=1792);
        # needs B to factor into >= 2 blocks of <= 256
        from fhe_regex_tpu.ops import pbs_pallas as pp
        return DeviceServerKey(
            params, backend,
            bsk_raw=jnp.asarray(
                pp.prepare_bsk_fused_raw(params, server_key.bsk, drop_limbs)),
            ksk_limbs=jnp.asarray(pp.prepare_ksk_limbs(params, server_key.ksk))
            .astype(jnp.bfloat16),
            matmul_dtype=matmul_dtype or jnp.int8,
            limbs=tuple(range(drop_limbs, 4)),
        )
    if backend == "fft":
        import os
        from fhe_regex_tpu.ops import pbs_fft
        from fhe_regex_tpu.ops import pbs_pallas as pp
        # O(N log N) external products via split-complex f32 FFT
        # (ops/pbs_fft.py).  Plan '8' is exact-after-rounding; 'mixed'
        # (16,8,8) adds a bounded ~2^10 noise term (documented + asserted
        # in the budget) and saves 2 inverse transforms per step.
        plan = pbs_fft.resolve_plan(
            fft_plan if fft_plan is not None
            else os.environ.get("FHE_REGEX_FFT_LIMBS", "mixed"))
        transform = fft_transform or os.environ.get(
            "FHE_REGEX_FFT_TRANSFORM",
            "matmul" if jax.default_backend() == "tpu" else "xla")
        return DeviceServerKey(
            params, backend,
            bsk_spec=jnp.asarray(
                pbs_fft.prepare_bsk_fft(params, server_key.bsk,
                                        plan, transform)),
            ksk_limbs=jnp.asarray(pp.prepare_ksk_limbs(params, server_key.ksk))
            .astype(jnp.bfloat16),
            plan=plan,
            transform=transform,
        )
    if backend == "jnp64":
        # 64-bit torus (the reference width, SURVEY.md N1) as int32 limb
        # pairs; requires a 64-bit parameter set
        from fhe_regex_tpu.ops import pbs64
        if params.torus_bits != 64:
            raise ValueError("backend 'jnp64' needs a 64-bit parameter set")
        return DeviceServerKey(
            params, backend,
            bsk8=jnp.asarray(pbs64.prepare_bsk64(params, server_key.bsk)),
            ksk8=jnp.asarray(pbs64.prepare_ksk64(params, server_key.ksk)),
        )
    if backend == "pallas64":
        # fused single-launch 64-bit blind rotation (reference torus width
        # at TPU speed; see pbs_pallas.blind_rotate_fused64).  stack_rows
        # selects the weight-class deep-K kernel with split banks.
        import os
        from fhe_regex_tpu.ops import pbs64
        from fhe_regex_tpu.ops import pbs_pallas as pp
        if params.torus_bits != 64:
            raise ValueError("backend 'pallas64' needs a 64-bit parameter set")
        if stack_rows is None:
            stack_rows = os.environ.get("FHE_REGEX_STACK_ROWS", "1") == "1"
        prep = (pp.prepare_bsk_fused64_raw if stack_rows
                else pp.prepare_bsk_fused64)
        return DeviceServerKey(
            params, backend,
            bsk8f=jnp.asarray(prep(params, server_key.bsk)),
            ksk8=jnp.asarray(pbs64.prepare_ksk64(params, server_key.ksk)),
            stack_rows=bool(stack_rows),
        )
    if backend == "pallas64-bg":
        # batch-grid 64-bit blind rotation (VERDICT r3 #2): B-independent
        # Mosaic executable, HBM-resident accumulator, and margin-gated
        # key-limb dropping (default_drop64 — (2, 2) at TPU64 removes 6 of
        # 21 MAC pairs per component at 7.23 sigma).
        from fhe_regex_tpu.ops import pbs64
        from fhe_regex_tpu.ops import pbs_pallas as pp
        if params.torus_bits != 64:
            raise ValueError(
                "backend 'pallas64-bg' needs a 64-bit parameter set")
        drop = default_drop64(params) if drop_limbs64 is None else drop_limbs64
        _gate_drop64(params, drop)
        return DeviceServerKey(
            params, backend,
            bsk_raw64=jnp.asarray(
                pp.prepare_bsk_fused64_raw(params, server_key.bsk, drop)),
            ksk8=jnp.asarray(pbs64.prepare_ksk64(params, server_key.ksk)),
            drop64=tuple(drop),
        )
    raise ValueError(f"unknown backend {backend!r}")


# Largest ||u||^2 over the production LUT factors (ops/mv.py mv_weights;
# the gt/le combine factor) — the default drop must keep THIS margin >= 5
# sigma too, or multivalue circuits on the dropped key would be
# margin-rejected (advisor round 4: the r3 figure of 5.41 sigma for mv-12
# assumed an undropped key).
WORST_PRODUCTION_MV_NORM2 = 12


def default_drop64(params: Params) -> tuple:
    """Largest key-limb drop keeping (a) the classic >=5-sigma LUT margin
    AND p_fail <= 2^-40, and (b) >=5 sigma at the worst production
    multivalue factor norm — so the default key serves EVERY engine path.
    At TPU64 this picks (1, 2): the 2-limb MASK drop is what the mv norm
    amplifies (its rounding rides the N/2 key convolution), so (2, 2)
    would leave mv-12 at 4.95 sigma.  Classic-only deployments (and the
    raw bench) opt into (2, 2) via FHE_REGEX_DROP64=2,2 for ~9% more
    MXU saving."""
    import os

    env = os.environ.get("FHE_REGEX_DROP64")
    if env is not None:
        m, b = env.split(",")
        return (int(m), int(b))
    from fhe_regex_tpu.params import MIN_SIGMA_MARGIN
    if params.lwe_noise_std == 0.0 and params.glwe_noise_std == 0.0:
        return (0, 0)       # zero-noise test sets: keep bit-exactness
    for cand in ((2, 2), (1, 2), (1, 1)):
        rep = params.noise_budget_report(bsk_drop=cand)
        mv = params.noise_budget_report(
            bsk_drop=cand, mv_norm2=WORST_PRODUCTION_MV_NORM2)
        if (rep["sigma_margin"] >= MIN_SIGMA_MARGIN
                and rep["log2_p_fail_per_pbs"] <= -40.0
                and mv["sigma_margin"] >= MIN_SIGMA_MARGIN):
            return cand
    return (0, 0)


def _gate_drop64(params: Params, drop) -> None:
    """Refuse a limb drop that would break the noise contract on a set
    that otherwise meets it (unsafe sets keep their existing warning)."""
    from fhe_regex_tpu.params import MIN_SIGMA_MARGIN
    if tuple(drop) == (0, 0):
        return
    if params.lwe_noise_std == 0.0 and params.glwe_noise_std == 0.0:
        return              # deterministic test sets: error << delta/2
    base = params.noise_budget_report()["sigma_margin"]
    dropped = params.noise_budget_report(bsk_drop=tuple(drop))["sigma_margin"]
    if base >= MIN_SIGMA_MARGIN and dropped < MIN_SIGMA_MARGIN:
        raise ValueError(
            f"bsk limb drop {tuple(drop)} leaves {dropped:.2f} sigma "
            f"(< {MIN_SIGMA_MARGIN}) at {params.name}; see "
            f"Params.bsk_round_var")
    if dropped < 1.0:
        # even on sets that were already sub-5-sigma (bench/parity use),
        # a drop this deep produces certainly-wrong results, not risk
        raise ValueError(
            f"bsk limb drop {tuple(drop)} leaves {dropped:.2f} sigma at "
            f"{params.name} — results would be garbage, refusing")


def bg_interleave_default(torus_bits: int = 32) -> bool:
    """Default schedule for the batch-grid kernels: the software-
    interleaved order (stage-1 of the next GLWE component under the MXU
    dots of the previous) measured **+4.3 % at 32 bits** (886.8 -> 925.0
    pbs/s, benchmarks/interleave_probe.py, decrypt-gated, bit-exact by
    construction) and neutral at 64 bits (level=1 splits the deep-K dots
    too finely) — so it is ON for 32-bit bg, OFF for 64-bit bg.
    FHE_REGEX_INTERLEAVE=0|1 forces either way."""
    import os

    env = os.environ.get("FHE_REGEX_INTERLEAVE")
    if env is not None:
        return env == "1"
    return torus_bits == 32


def bg_block_major_default(torus_bits: int = 32) -> bool:
    """Block-major bg grid (batch blocks OUTER, accumulator VMEM-resident
    for all n steps, one HBM write per block): with the interleaved
    schedule it measured **933.3 pbs/s vs 925.0 row-major** at 32 bits
    (serial-vs-serial it is a wash: 890.1 vs 886.8 — the staged write
    already overlapped; the win composes with interleave).  OFF at 64
    bits: the per-cell bank rebuild (125 ms/launch x (NB-1)) dwarfs the
    64-bit kernel's 68 ms accdma.  FHE_REGEX_BLOCK_MAJOR=0|1 forces."""
    import os

    env = os.environ.get("FHE_REGEX_BLOCK_MAJOR")
    if env is not None:
        return env == "1"
    return torus_bits == 32


def make_pbs_fn(dev_key: DeviceServerKey):
    """Callable (luts, lut_idx, cts) -> cts_out for the prepared key."""
    params = dev_key.params
    if dev_key.backend == "jnp":
        return functools.partial(pbs_batch, params, dev_key.bsk, dev_key.ksk)
    if dev_key.backend == "pallas":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_pallas
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))

        def fn(luts, lut_idx, cts):
            return pbs_batch_pallas(params, dev_key.bsk_quad, dev_key.ksk_limbs,
                                    luts, lut_idx, dev_key.matmul_dtype, limbs,
                                    cts)
        return fn
    if dev_key.backend == "pallas-fused":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))
        stack = getattr(dev_key, "stack_rows", False)
        split = getattr(dev_key, "bank_split", False)

        def fn(luts, lut_idx, cts):
            return pbs_batch_fused(params, dev_key.bsk_fused, dev_key.ksk_limbs,
                                   luts, lut_idx, dev_key.matmul_dtype, limbs,
                                   stack, split, cts)
        return fn
    if dev_key.backend == "pallas-bg":
        import os
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused_bg
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))
        env_tb = os.environ.get("FHE_REGEX_BG_TB")
        tb = int(env_tb) if env_tb else None
        il = bg_interleave_default(32)
        bm = bg_block_major_default(32)

        def fn(luts, lut_idx, cts):
            return pbs_batch_fused_bg(params, dev_key.bsk_raw,
                                      dev_key.ksk_limbs, luts, lut_idx,
                                      dev_key.matmul_dtype, limbs, tb, cts,
                                      il, bm)
        return fn
    if dev_key.backend == "fft":
        from fhe_regex_tpu.ops.pbs_fft import pbs_batch_fft

        def fn(luts, lut_idx, cts):
            return pbs_batch_fft(params, dev_key.bsk_spec, dev_key.ksk_limbs,
                                 luts, lut_idx, dev_key.plan,
                                 dev_key.transform, cts)
        return fn
    if dev_key.backend == "jnp64":
        from fhe_regex_tpu.ops import pbs64

        def fn(luts, lut_idx, cts):
            # luts [L, N, 2] / cts [B, n+1, 2] int32 limb pairs
            out_lo, out_hi = pbs64.pbs_batch64(
                params, dev_key.bsk8, dev_key.ksk8,
                luts[..., 0], luts[..., 1], lut_idx,
                cts[..., 0], cts[..., 1])
            return jnp.stack([out_lo, out_hi], axis=-1)
        return fn
    if dev_key.backend == "pallas64-bg":
        import os
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused64_bg
        drop64 = getattr(dev_key, "drop64", (0, 0))
        env_tb = os.environ.get("FHE_REGEX_BG64_TB")
        tb = int(env_tb) if env_tb else None
        il = bg_interleave_default(64)

        def fn(luts, lut_idx, cts):
            out_lo, out_hi = pbs_batch_fused64_bg(
                params, dev_key.bsk_raw64, dev_key.ksk8,
                luts[..., 0], luts[..., 1], lut_idx, drop64, tb,
                cts[..., 0], cts[..., 1], il)
            return jnp.stack([out_lo, out_hi], axis=-1)
        return fn
    if dev_key.backend == "pallas64":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused64
        stack = getattr(dev_key, "stack_rows", False)

        def fn(luts, lut_idx, cts):
            out_lo, out_hi = pbs_batch_fused64(
                params, dev_key.bsk8f, dev_key.ksk8,
                luts[..., 0], luts[..., 1], lut_idx, stack,
                cts[..., 0], cts[..., 1])
            return jnp.stack([out_lo, out_hi], axis=-1)
        return fn
    raise ValueError(dev_key.backend)


def key_arrays(dev_key: DeviceServerKey) -> tuple:
    """The device arrays a PBS backend needs, as an explicit tuple.

    Callers that re-jit around the PBS (the level executor) MUST pass these
    as jit ARGUMENTS: a closed-over key becomes an embedded HLO constant,
    and a multi-hundred-MB literal overflows the remote compiler's request
    limit (observed HTTP 413 on axon at 362 MB)."""
    names = {
        "jnp": ("bsk", "ksk"),
        "pallas": ("bsk_quad", "ksk_limbs"),
        "pallas-fused": ("bsk_fused", "ksk_limbs"),
        "pallas-bg": ("bsk_raw", "ksk_limbs"),
        "fft": ("bsk_spec", "ksk_limbs"),
        "jnp64": ("bsk8", "ksk8"),
        "pallas64": ("bsk8f", "ksk8"),
        "pallas64-bg": ("bsk_raw64", "ksk8"),
    }[dev_key.backend]
    return tuple(getattr(dev_key, n) for n in names)


def make_pbs_core(dev_key: DeviceServerKey):
    """(key_args, luts, lut_idx, cts) -> cts_out with keys as arguments
    (see key_arrays).  Pair with ``key_arrays(dev_key)``."""
    params = dev_key.params
    backend = dev_key.backend
    if backend == "jnp":
        def core(key, luts, lut_idx, cts):
            return pbs_batch(params, key[0], key[1], luts, lut_idx, cts)
        return core
    if backend == "pallas":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_pallas
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))

        def core(key, luts, lut_idx, cts):
            return pbs_batch_pallas(params, key[0], key[1], luts, lut_idx,
                                    dev_key.matmul_dtype, limbs, cts)
        return core
    if backend == "pallas-fused":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))
        stack = getattr(dev_key, "stack_rows", False)
        split = getattr(dev_key, "bank_split", False)

        def core(key, luts, lut_idx, cts):
            return pbs_batch_fused(params, key[0], key[1], luts, lut_idx,
                                   dev_key.matmul_dtype, limbs, stack, split,
                                   cts)
        return core
    if backend == "pallas-bg":
        import os
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused_bg
        limbs = getattr(dev_key, "limbs", (0, 1, 2, 3))
        env_tb = os.environ.get("FHE_REGEX_BG_TB")
        tb = int(env_tb) if env_tb else None
        il = bg_interleave_default(32)
        bm = bg_block_major_default(32)

        def core(key, luts, lut_idx, cts):
            return pbs_batch_fused_bg(params, key[0], key[1], luts, lut_idx,
                                      dev_key.matmul_dtype, limbs, tb, cts,
                                      il, bm)
        return core
    if backend == "fft":
        from fhe_regex_tpu.ops.pbs_fft import pbs_batch_fft
        plan = dev_key.plan
        transform = dev_key.transform

        def core(key, luts, lut_idx, cts):
            return pbs_batch_fft(params, key[0], key[1], luts, lut_idx,
                                 plan, transform, cts)
        return core
    if backend == "jnp64":
        from fhe_regex_tpu.ops import pbs64

        def core(key, luts, lut_idx, cts):
            out_lo, out_hi = pbs64.pbs_batch64(
                params, key[0], key[1], luts[..., 0], luts[..., 1],
                lut_idx, cts[..., 0], cts[..., 1])
            return jnp.stack([out_lo, out_hi], axis=-1)
        return core
    if backend == "pallas64":
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused64
        stack = getattr(dev_key, "stack_rows", False)

        def core(key, luts, lut_idx, cts):
            out_lo, out_hi = pbs_batch_fused64(
                params, key[0], key[1], luts[..., 0], luts[..., 1],
                lut_idx, stack, cts[..., 0], cts[..., 1])
            return jnp.stack([out_lo, out_hi], axis=-1)
        return core
    if backend == "pallas64-bg":
        import os
        from fhe_regex_tpu.ops.pbs_pallas import pbs_batch_fused64_bg
        drop64 = getattr(dev_key, "drop64", (0, 0))
        env_tb = os.environ.get("FHE_REGEX_BG64_TB")
        tb = int(env_tb) if env_tb else None
        il = bg_interleave_default(64)

        def core(key, luts, lut_idx, cts):
            out_lo, out_hi = pbs_batch_fused64_bg(
                params, key[0], key[1], luts[..., 0], luts[..., 1],
                lut_idx, drop64, tb, cts[..., 0], cts[..., 1], il)
            return jnp.stack([out_lo, out_hi], axis=-1)
        return core
    raise ValueError(backend)


# -- legacy helpers (kept for the kernel unit tests) --


def get_pbs_fn(params: Params, backend: Optional[str] = None):
    """(bsk, ksk, luts, lut_idx, cts) -> cts_out on the jnp path."""
    return functools.partial(pbs_batch, params)


def server_key_device_arrays(server_key) -> tuple:
    """Upload server key material as int32 device arrays."""
    bsk = jnp.asarray(server_key.bsk.view(np.int32))
    ksk = jnp.asarray(server_key.ksk.view(np.int32))
    return bsk, ksk
