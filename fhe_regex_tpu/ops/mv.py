"""Multi-value bootstrap runtime: one blind rotation, many LUT outputs.

Every test polynomial factors exactly as u (*) v over the negacyclic ring
(ops/luts.py ``mv_weights``; spec in crypto/golden.py), and blind rotation
commutes with multiplication by a fixed poly — so ops that share an input
share ONE rotation of the common v, and each op's LUT is applied at
sample-extract time as a cheap static-roll combination:

    big_j = sum_m  u_j[m] * sample_extract(X^{p_m} * acc_v)

The support positions p_m are STATIC (window boundaries), so the combine is
16 static negacyclic rolls + a weighted sum — pure VPU glue around the same
rotation kernels and keyswitch matmuls the classic path uses.  No Pallas
changes: the fused kernel already returns the accumulator
(ops/pbs_pallas.py ``blind_rotate_fused``).

Cost model: a rotation is ~78-83% of PBS kernel time (docs/BENCHMARKS.md),
so a level with R unique inputs among W ops does R/W of the rotation work.
Compiled regex circuits measure 20-43% shared rotations on class/alternation
patterns (docs/ROADMAP.md).

Noise: derived outputs amplify the blind-rotation noise component by
||u||_2^2 <= 12 (production LUTs); keyswitch + modswitch dominate at our
parameters, so the worst-case margin stays >= 5 sigma
(params.noise_budget_report(mv_norm2=...), asserted in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fhe_regex_tpu.crypto.golden import mv_testpoly
from fhe_regex_tpu.ops.luts import mv_support_positions
from fhe_regex_tpu.ops.pbs import (
    DeviceServerKey,
    blind_rotate,
    key_switch,
    mod_switch,
    sample_extract,
)
from fhe_regex_tpu.params import Params

I32 = jnp.int32

MV_BACKENDS = ("jnp", "pallas", "pallas-fused")


def mv_lut_table(params: Params) -> np.ndarray:
    """The 1-row LUT table every multi-value rotation uses (v)."""
    return mv_testpoly(params)[None]


def _rotate_acc(dev_key: DeviceServerKey, key, vlut, cts_ms):
    """Backend dispatch: mod-switched cts -> accumulators [R, k+1, N]."""
    params = dev_key.params
    backend = dev_key.backend
    idx = jnp.zeros(cts_ms.shape[0], I32)
    if backend == "jnp":
        return blind_rotate(params, key[0], vlut, idx, cts_ms)
    if backend == "pallas":
        from fhe_regex_tpu.ops.pbs_pallas import blind_rotate_pallas
        return blind_rotate_pallas(params, key[0], vlut, idx, cts_ms,
                                   dev_key.matmul_dtype,
                                   getattr(dev_key, "limbs", (0, 1, 2, 3)))
    if backend == "pallas-fused":
        from fhe_regex_tpu.ops.pbs_pallas import blind_rotate_fused
        return blind_rotate_fused(params, key[0], vlut, idx, cts_ms,
                                  dev_key.matmul_dtype,
                                  getattr(dev_key, "limbs", (0, 1, 2, 3)),
                                  getattr(dev_key, "stack_rows", False),
                                  getattr(dev_key, "bank_split", False))
    raise ValueError(f"multi-value bootstrap not supported on {backend!r}")


def _key_switch(dev_key: DeviceServerKey, key, big):
    params = dev_key.params
    if dev_key.backend == "jnp":
        return key_switch(params, key[1], big)
    from fhe_regex_tpu.ops.pbs_pallas import key_switch_mxu
    return key_switch_mxu(params, key[1], big)


def mv_extract(params: Params, accs, weights, leader):
    """Derived big-LWEs from shared accumulators.

    accs [R, k+1, N]; weights [W, S] int32 (S support positions);
    leader [W] int32 row of each op's rotation.  -> [W, kN+1] int32.
    """
    pos = mv_support_positions(params)
    big = None
    for m, p in enumerate(pos):
        w_m = weights[:, m]
        # X^{p} * acc: static negacyclic roll (sign flip on wraparound)
        rolled = jnp.roll(accs, int(p), axis=-1)
        rolled = rolled.at[..., :int(p)].multiply(-1)
        se = sample_extract(params, rolled)                  # [R, kN+1]
        term = w_m[:, None] * se[leader]                     # [W, kN+1]
        big = term if big is None else big + term
    return big


def _check_mv(dev_key: DeviceServerKey) -> None:
    if dev_key.params.torus_bits != 32:
        raise ValueError("multi-value bootstrap requires a 32-bit torus set")
    if dev_key.backend not in MV_BACKENDS:
        raise ValueError(
            f"multi-value bootstrap not supported on {dev_key.backend!r}")


def make_mv_rotate_core(dev_key: DeviceServerKey):
    """(key_args, vlut, rot_cts [R, n+1]) -> accumulators [R, k+1, N]."""
    _check_mv(dev_key)
    params = dev_key.params

    def core(key, vlut, rot_cts):
        return _rotate_acc(dev_key, key, vlut, mod_switch(params, rot_cts))

    return core


def make_mv_finish_core(dev_key: DeviceServerKey):
    """(key_args, accs, weights, leader) -> [W, n+1] derived outputs."""
    _check_mv(dev_key)
    params = dev_key.params

    def core(key, accs, weights, leader):
        big = mv_extract(params, accs, weights, leader)
        return _key_switch(dev_key, key, big)

    return core


def make_mv_core(dev_key: DeviceServerKey):
    """(key_args, vlut, weights, leader, rot_cts) -> [W, n+1] outputs.

    rot_cts [R, n+1]: the DEDUPED affine-combined inputs (one per unique
    rotation); every op's output is derived from its leader's accumulator.
    Pair with ops.pbs.key_arrays(dev_key), as make_pbs_core.
    """
    rotate = make_mv_rotate_core(dev_key)
    finish = make_mv_finish_core(dev_key)

    def core(key, vlut, weights, leader, rot_cts):
        return finish(key, rotate(key, vlut, rot_cts), weights, leader)

    return core


@functools.partial(jax.jit, static_argnums=0)
def mv_pbs_batch(params: Params, bsk, ksk, weights, leader, rot_cts):
    """jnp-path multi-value PBS (tests / reference)."""
    ms = mod_switch(params, rot_cts)
    vlut = jnp.asarray(mv_lut_table(params).view(np.int32))
    accs = blind_rotate(params, bsk, vlut, jnp.zeros(rot_cts.shape[0], I32), ms)
    big = mv_extract(params, accs, weights, leader)
    return key_switch(params, ksk, big)
