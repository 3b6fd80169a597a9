"""Cost model + run counters.

The reference's only observability is the ct_ops / cache_hits pair logged at
the end of a run (execution.rs:56-62, engine.rs:36-40).  We keep those
(emitted by has_match) and add the quantities that matter on TPU: bootstrap
counts, level counts, and an analytic FLOP model of the blind-rotation
kernel for roofline comparisons.
"""

from __future__ import annotations

import dataclasses

from fhe_regex_tpu.params import Params


@dataclasses.dataclass
class PbsCost:
    macs_per_pbs: float        # MXU multiply-accumulates per bootstrap
    hbm_bytes_per_pbs: float   # bootstrap-key traffic per bootstrap


def pbs_cost_model(params: Params, limbs: int = 4) -> PbsCost:
    """MXU/HBM cost of one programmable bootstrap in the matmul formulation.

    Per CMUX step: (k+1)*level digit polys each convolved into (k+1) output
    polys; each negacyclic polymul is an N x N matmul done `limbs` times for
    exactness.
    """
    n = params.lwe_dimension
    k1 = params.glwe_dimension + 1
    rows = k1 * params.pbs_level
    N = params.polynomial_size
    macs = float(n) * rows * k1 * limbs * N * N
    # bootstrap key bytes streamed once per *batch*, amortized over batch=1
    hbm = float(n) * rows * k1 * N * 4
    return PbsCost(macs_per_pbs=macs, hbm_bytes_per_pbs=hbm)


def speed_of_light_pbs_per_sec(params: Params, tflops: float = 197.0,
                               mxu_util: float = 1.0, batch: int = 256) -> float:
    """Upper bound on bootstraps/s/chip at the given bf16 TFLOPs."""
    cost = pbs_cost_model(params)
    flops = 2.0 * cost.macs_per_pbs
    return tflops * 1e12 * mxu_util / flops
