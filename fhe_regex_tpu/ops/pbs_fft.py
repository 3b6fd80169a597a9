"""FFT-formulation PBS blind rotation — O(N log N) external products.

The matmul formulation (ops/pbs_pallas.py) spends 4 x 12 x N^2 int8 MACs
per CMUX step and measures ~83% of the int8-MXU roofline, so the next
multiple over 938 bootstraps/s/chip cannot come from tuning — it must come
from the algorithm (VERDICT r1 #1; the reference's concrete-fft dependency
is O(N log N), SURVEY.md N10).  This backend replaces each negacyclic
product with a split-complex FFT:

  R[X]/(X^N+1)  ~=  C[X]/(X^M - i),   M = N/2,
  a  ->  u_j = (a_j + i a_{j+M}) * t_j,   t_j = e^{+i pi j / N},

so one length-M complex FFT evaluates a at all M roots of X^M = i; the
negacyclic product is a pointwise spectral multiply and one inverse FFT.

Exactness / noise envelope (validated in numpy, 300+ trials incl.
adversarial all-max digit vectors; see tests/test_pbs_fft.py):

  * digits |d| <= B/2 = 64 are exact in f32; GGSW key polys are split into
    signed balanced limbs per a LIMB PLAN — a low-to-high tuple of widths
    summing to 32, e.g. (8,8,8,8) / (16,8,8) / (16,16) (any +-1 top carry
    has weight 2^32 and vanishes in the mod-2^32 recombination);
  * 8-bit limbs: true per-limb conv values < 64*128*N = 2^24 and the
    measured worst f32 pipeline error is 0.25 < 0.5 — EXACT after rounding
    (bit-identical to the golden model, like the matmul kernels);
  * 16-bit limbs: measured worst f32 error ~48 = 2^5.6 per row product
    (std ~10).  CRITICALLY this error is multiplied by the limb's
    recombination weight, so a 16-bit limb is only admissible at weight
    2^0: plan (16,16) would put ~2^16 * 48 per step on the hi limb and
    accumulate to ~2^25.5 over n=866 steps — PAST the 2^25 margin at
    TPU_MESSAGE_2_CARRY_2.  prepare_bsk_fft rejects such plans.
  * plan (16,8,8) ("mixed", the default): hi limbs exact, lo limb noise
    sqrt(n * 6) * 10 ~ 2^10 total — 15 bits under the margin, folded into
    params.noise_budget_report(fft_plan=...) and test-asserted.  Saves 2
    of fft8's 8 inverse transforms per step (12 vs 14 transforms total).

Transforms run either as a four-step matmul FFT on the MXU in
"scrambled" (k1, k2) digit order — forward, pointwise multiply and
inverse all agree on the order, so no bit-reversal pass exists anywhere —
or as jnp.fft (XLA's native FFT).  The four-step factorisation
M = M1 x M2 turns each transform into two [*, 32] x [32, 32] complex
matmuls plus one twiddle, i.e. MXU work at f32 precision (HIGHEST), which
on TPU runs on the systolic array at ~1/6 the bf16 rate — still far above
the VPU.  Per step at B instances the formulation costs

  6B forward FFTs + 2LB inverse FFTs + 6*2*L*M*B pointwise cmuls

~= 2^21.6 B flops (L=2) against the matmul formulation's 48 B N^2 = 2^27.6 B
int8 MACs — a 64x algorithmic reduction at f32-vs-int8 rates of ~1/12.

Reference parity: replaces concrete-fft's f64 negacyclic FFT (the
reference's tfhe-rs 0.2 dependency) — same algorithm family, retargeted
at f32 + limb split because the TPU VPU/MXU has no native f64.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from fhe_regex_tpu.ops.pbs import (
    decompose,
    mod_switch,
    negacyclic_rotate_batch,
    sample_extract,
)
from fhe_regex_tpu.ops.pbs_pallas import key_switch_mxu
from fhe_regex_tpu.params import Params

I32 = jnp.int32
C64 = jnp.complex64


# ---------------- host-side key preparation ----------------


#: named limb plans (low-to-high widths; weights are cumulative sums)
LIMB_PLANS = {
    "8": (8, 8, 8, 8),        # exact after rounding (bit-exact vs golden)
    "mixed": (16, 8, 8),      # exact hi limbs + ~2^10 total lo-limb noise
    "16": (16, 16),           # REJECTED everywhere: noisy limb at weight 2^16
                              # fails the ulp-floor noise model (params.py)
}


def plan_weights(plan: tuple) -> tuple:
    """Cumulative bit weights of each limb in the plan."""
    w, out = 0, []
    for bits in plan:
        out.append(w)
        w += bits
    assert w == 32, f"limb plan {plan} must sum to 32 bits"
    return tuple(out)


def _limbs_signed(x: np.ndarray, plan) -> np.ndarray:
    """int32 torus values -> len(plan) balanced signed limbs (new leading
    axis), limb lb holding `plan[lb]` bits at weight 2^plan_weights[lb].

    Limbs lie in [-2^(bits-1), 2^(bits-1)]; the final +-1 carry has weight
    2^32 and vanishes mod 2^32 (same argument as pbs_pallas._limbs_int8).
    """
    if isinstance(plan, int):
        plan = tuple([plan] * (32 // plan))
    v = x.astype(np.int64)
    out = np.empty((len(plan),) + x.shape, np.int64)
    for lb, bits in enumerate(plan):
        half = 1 << (bits - 1)
        mask = (1 << bits) - 1
        d = ((v + half) & mask) - half
        out[lb] = d
        v = (v - d) >> bits
    assert np.all(np.abs(v) <= 1), "limb decomposition out of range"
    return out


def _twist(N: int) -> np.ndarray:
    M = N // 2
    return np.exp(1j * np.pi * np.arange(M) / N)


def negacyclic_fft_host(a: np.ndarray) -> np.ndarray:
    """[..., N] real -> [..., M] complex128 negacyclic spectrum (f64)."""
    N = a.shape[-1]
    M = N // 2
    t = _twist(N)
    u = (a[..., :M] + 1j * a[..., M:]) * t
    return np.fft.fft(u, axis=-1)


def _split_factors(M: int) -> tuple:
    """M = M1 * M2 with M1 >= M2, both powers of two, M1 minimal such."""
    lg = M.bit_length() - 1
    m2 = lg // 2
    return 1 << (lg - m2), 1 << m2


def _scramble(spec: np.ndarray, M1: int, M2: int) -> np.ndarray:
    """natural k = k1 + M1*k2 -> scrambled [..., M1, M2] layout, flattened
    back to [..., M] with k1-major order (matching the four-step output)."""
    s = spec.reshape(spec.shape[:-1] + (M2, M1))   # [..., k2, k1]
    s = np.swapaxes(s, -1, -2)                     # [..., k1, k2]
    return s.reshape(spec.shape)


def fft_noise_std(params: Params, plan: tuple) -> float:
    """Accumulated FFT-error std over a full blind rotation (torus units).
    Delegates to Params.fft_noise_std (kept there so the noise budget can
    fold it in without a circular import)."""
    return params.fft_noise_std(resolve_plan(plan))


def resolve_plan(plan) -> tuple:
    if isinstance(plan, str):
        plan = LIMB_PLANS[plan]
    if isinstance(plan, int):
        plan = tuple([plan] * (32 // plan))
    return tuple(plan)


def prepare_bsk_fft(params: Params, bsk: np.ndarray, plan="mixed",
                    transform: str = "matmul") -> np.ndarray:
    """bsk [n, (k+1)l, k+1, N] uint32 -> spectral key
    [n, (k+1)l, k+1, L, 2, M] float32 — (re, im) stacked on axis -2.

    The key (and everything else on device) is SPLIT-REAL f32, never
    complex64: the axon relay's host<->device transfer of complex64 is
    UNIMPLEMENTED (observed at batched_device_put), and split-real also
    gives explicit control of every matmul's precision.  (f64 host FFT,
    rounded once to f32.)

    Row order along axis 1 is (component, level) with the most-significant
    gadget digit first — the exact layout blind_rotate_fft's digit
    transpose produces (mirrors ops/pbs.blind_rotate).

    Rejects limb plans whose accumulated FFT error would eat into the LUT
    margin (> margin/32), e.g. (16,16) at production N — a 16-bit limb is
    only admissible at weight 2^0.
    """
    plan = resolve_plan(plan)
    s = fft_noise_std(params, plan)
    if s > params.delta / 2.0 / 32.0:
        raise ValueError(
            f"FFT limb plan {plan} accumulates ~2^{math.log2(max(s, 1)):.1f} "
            f"error vs margin 2^{math.log2(params.delta / 2):.1f} at "
            f"{params.name}; use '8' or 'mixed'")
    g = bsk.view(np.int32)
    limbs = _limbs_signed(g, plan)                       # [L, n, rows, k1, N]
    spec = negacyclic_fft_host(limbs.astype(np.float64))  # [L, ..., M]
    if transform == "matmul":
        M1, M2 = _split_factors(spec.shape[-1])
        spec = _scramble(spec, M1, M2)
    spec = np.moveaxis(spec, 0, 3)                       # [n, rows, k1, L, M]
    ri = np.stack([spec.real, spec.imag], axis=-2)       # [..., L, 2, M]
    return np.ascontiguousarray(ri.astype(np.float32))


# ---------------- device transforms ----------------


@functools.lru_cache(maxsize=None)
def _four_step_consts(M: int, inverse: bool):
    # Returned as NUMPY f32 (re, im) pairs so traced callers embed them as
    # HLO literals.  Everything stays split-real f32: complex64 is
    # unsupported at the axon transfer boundary, and a device-array
    # closure would need a host fetch for constant folding anyway.
    M1, M2 = _split_factors(M)
    sgn = 2j if inverse else -2j
    j1 = np.arange(M1)
    j2 = np.arange(M2)
    F1 = np.exp(sgn * np.pi * np.outer(j1, j1) / M1)
    F2 = np.exp(sgn * np.pi * np.outer(j2, j2) / M2)
    T = np.exp(sgn * np.pi * np.outer(j1, j2) / M)

    def ri(z):
        return z.real.astype(np.float32), z.imag.astype(np.float32)
    return ri(F1), ri(T), ri(F2)


def _cdot(xr, xi, F, sub: str, prec="highest"):
    """Complex matmul on split-real operands: 4 real einsums."""
    Fr, Fi = F
    yr = (jnp.einsum(sub, xr, Fr, precision=prec)
          - jnp.einsum(sub, xi, Fi, precision=prec))
    yi = (jnp.einsum(sub, xr, Fi, precision=prec)
          + jnp.einsum(sub, xi, Fr, precision=prec))
    return yr, yi


def _fft_fwd(ur, ui, transform: str):
    """[..., M] split-real -> [..., M] split-real spectrum (scrambled order
    for 'matmul', natural for 'xla')."""
    if transform == "xla":
        c = jnp.fft.fft(jax.lax.complex(ur, ui), axis=-1)
        return jnp.real(c), jnp.imag(c)
    M = ur.shape[-1]
    M1, M2 = _split_factors(M)
    F1, T, F2 = _four_step_consts(M, inverse=False)
    lead = ur.shape[:-1]
    xr = ur.reshape((-1, M1, M2))
    xi = ui.reshape((-1, M1, M2))
    yr, yi = _cdot(xr, xi, F1, "bjm,jk->bkm")
    Tr, Ti = T
    zr = yr * Tr[None] - yi * Ti[None]
    zi = yr * Ti[None] + yi * Tr[None]
    wr, wi = _cdot(zr, zi, F2, "bkm,ml->bkl")
    return wr.reshape(lead + (M,)), wi.reshape(lead + (M,))


def _fft_inv(cr, ci, transform: str):
    """[..., M] split-real spectrum -> [..., M] split-real values (/M)."""
    if transform == "xla":
        v = jnp.fft.ifft(jax.lax.complex(cr, ci), axis=-1)
        return jnp.real(v), jnp.imag(v)
    M = cr.shape[-1]
    M1, M2 = _split_factors(M)
    F1, T, F2 = _four_step_consts(M, inverse=True)
    lead = cr.shape[:-1]
    xr = cr.reshape((-1, M1, M2))
    xi = ci.reshape((-1, M1, M2))
    yr, yi = _cdot(xr, xi, F2, "bkl,lm->bkm")
    Tr, Ti = T
    zr = yr * Tr[None] - yi * Ti[None]
    zi = yr * Ti[None] + yi * Tr[None]
    wr, wi = _cdot(zr, zi, F1, "bkm,kj->bjm")
    s = jnp.float32(1.0 / M)
    return wr.reshape(lead + (M,)) * s, wi.reshape(lead + (M,)) * s


def _fwd_real(d: jax.Array, transform: str):
    """[..., N] real digit polys -> ([..., M], [..., M]) split-real
    spectra (twist e^{+i pi j/N} applied)."""
    N = d.shape[-1]
    M = N // 2
    tw = _twist(N)
    twr = tw.real.astype(np.float32)
    twi = tw.imag.astype(np.float32)
    a = d[..., :M].astype(jnp.float32)
    b = d[..., M:].astype(jnp.float32)
    ur = a * twr - b * twi
    ui = a * twi + b * twr
    return _fft_fwd(ur, ui, transform)


def _inv_real(cr, ci, transform: str) -> jax.Array:
    """split-real spectra -> [..., N] f32 coefficient values (untwisted)."""
    vr, vi = _fft_inv(cr, ci, transform)
    M = vr.shape[-1]
    tw = _twist(2 * M)
    twr = tw.real.astype(np.float32)
    twi = tw.imag.astype(np.float32)
    outr = vr * twr + vi * twi           # Re(v * conj(t))
    outi = vi * twr - vr * twi           # Im(v * conj(t))
    return jnp.concatenate([outr, outi], axis=-1)


def _round_mod32(x: jax.Array, needs_fold: bool) -> jax.Array:
    """f32 coefficient values -> int32 (exact nearest when the true values
    fit int32; folded mod 2^32 first when they can reach 2^32.4 — boundary
    saturation costs at most +-1 mod 2^32)."""
    if needs_fold:
        x = x - jnp.float32(2.0 ** 32) * jnp.rint(x * jnp.float32(2.0 ** -32))
    return jnp.rint(x).astype(I32)


# ---------------- blind rotation ----------------


def blind_rotate_fft(params: Params, bsk_spec: jax.Array, luts: jax.Array,
                     lut_idx: jax.Array, cts_ms: jax.Array, plan: tuple,
                     transform: str) -> jax.Array:
    k, N, n, l = (params.glwe_dimension, params.polynomial_size,
                  params.lwe_dimension, params.pbs_level)
    B = cts_ms.shape[0]

    lut = luts[lut_idx]                                          # [B, N]
    acc0 = jnp.zeros((B, k + 1, N), dtype=I32)
    acc0 = acc0.at[:, k, :].set(lut)
    acc = negacyclic_rotate_batch(acc0, (2 * N - cts_ms[:, n]) & (2 * N - 1))

    shifts = plan_weights(plan)
    lgN = N.bit_length() - 1
    # true per-limb conv values reach 64 * 2^(bits-1) * N — fold mod 2^32
    # before the int32 conversion when that exceeds int32 range
    folds = tuple(5 + bits + lgN >= 31 for bits in plan)

    def step(acc, xs):
        a_i, kspec_i = xs            # [B], [rows, k+1, L, 2, M] f32
        rotated = negacyclic_rotate_batch(acc, a_i)
        diff = rotated - acc
        digits = decompose(diff, params.pbs_base_log, l)   # [l, B, k+1, N]
        d = jnp.transpose(digits, (1, 2, 0, 3)).reshape(B, (k + 1) * l, N)
        dr, di = _fwd_real(d, transform)                   # [B, rows, M] x2
        # pointwise spectral contraction over the decomposition rows.
        # precision MUST be pinned: on TPU a default-precision f32 einsum
        # lowers to single-pass bf16 on the MXU, and with spectral
        # magnitudes ~2^20 that alone destroys the +-0.5 exact-rounding
        # contract (r2 on-chip failure: 1732/1792 wrong, bench_fft.err).
        kr = kspec_i[:, :, :, 0, :]
        ki = kspec_i[:, :, :, 1, :]
        hi = jax.lax.Precision.HIGHEST
        pr = (jnp.einsum("brm,rclm->bclm", dr, kr, precision=hi)
              - jnp.einsum("brm,rclm->bclm", di, ki, precision=hi))
        pi = (jnp.einsum("brm,rclm->bclm", dr, ki, precision=hi)
              + jnp.einsum("brm,rclm->bclm", di, kr, precision=hi))
        vals = _inv_real(pr, pi, transform)                # [B,k+1,L,N]
        out = None
        for lb in range(len(plan)):
            part = _round_mod32(vals[:, :, lb, :], folds[lb]) << shifts[lb]
            out = part if out is None else out + part
        return acc + out, None

    acc, _ = jax.lax.scan(step, acc, (cts_ms[:, :n].T, bsk_spec))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def pbs_batch_fft(params: Params, bsk_spec, ksk_limbs, luts, lut_idx,
                  plan, transform, cts):
    """Full batched PBS on the FFT formulation: [B, n+1] -> [B, n+1]."""
    ms = mod_switch(params, cts)
    acc = blind_rotate_fft(params, bsk_spec, luts, lut_idx, ms,
                           plan, transform)
    big = sample_extract(params, acc)
    return key_switch_mxu(params, ksk_limbs, big)
