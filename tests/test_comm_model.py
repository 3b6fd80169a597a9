"""Pin the multi-chip communication model (utils/metrics.py::comm_model) —
the falsifiable predictions recorded in docs/ROADMAP.md."""

import json
from pathlib import Path

from fhe_regex_tpu.params import TPU64_MESSAGE_2_CARRY_2, TPU_MESSAGE_2_CARRY_2
from fhe_regex_tpu.utils import metrics
from fhe_regex_tpu.utils.metrics import comm_model


def test_batch_parallel_meets_the_baseline_target():
    """BASELINE's >=80% scaling target must hold in the model with wide
    margin — batch parallelism has no steady-state collective."""
    for D in (2, 4, 8, 16):
        m = comm_model(TPU_MESSAGE_2_CARRY_2, D, 1792)
        assert m["batch"]["steady_state_bytes"] == 0
        assert m["batch"]["efficiency"] > 0.95, D


def test_or_tree_is_pbs_dominated_and_log_depth():
    m4 = comm_model(TPU_MESSAGE_2_CARRY_2, 4, 1792)
    m8 = comm_model(TPU_MESSAGE_2_CARRY_2, 8, 1792)
    assert m4["or_tree"]["rounds"] == 2 and m8["or_tree"]["rounds"] == 3
    # each round's cost is ~1 bootstrap, not bandwidth
    assert m8["or_tree"]["seconds"] < 0.01
    # 64-bit doubles the ciphertext words
    m64 = comm_model(TPU64_MESSAGE_2_CARRY_2, 8, 1024)
    assert m64["or_tree"]["bytes_per_device"] > m8["or_tree"]["bytes_per_device"]


def test_tensor_parallel_predictions():
    """TP: modest ICI win, counterproductive over DCN — the prediction the
    parallel/ layout is built on (keep TP inside a host)."""
    ici = comm_model(TPU_MESSAGE_2_CARRY_2, 8, 1792, hosts=1)
    dcn = comm_model(TPU_MESSAGE_2_CARRY_2, 8, 1792, hosts=2)
    assert 1.0 < ici["tensor"]["speedup_at_D"] < 2.0
    assert dcn["tensor"]["speedup_at_D"] < 1.0
    # the psum volume is the real number to check on hardware: ~44 GB/chip
    assert 30e9 < ici["tensor"]["bytes_per_chip_per_batched_pbs"] < 60e9


def test_tp_split_constant_has_provenance_and_no_drift():
    """The 0.85/0.15-class TP stage split must trace to a MEASURED fused
    -launch decomposition, and a fresh profile_fused.py run that shifts
    the split materially must fail here until TP_PROFILE is re-derived
    (VERDICT r4 weak #6)."""
    prof = metrics.TP_PROFILE
    # internal consistency of the recorded decomposition: 4 limb slopes +
    # the fixed glue must reproduce the recorded launch total within 5%
    recon = 4 * prof["per_limb_mxu_s"] + prof["fixed_glue_s"]
    assert abs(recon - prof["total_s"]) / prof["total_s"] < 0.05
    # the model constant IS the recorded profile's glue fraction
    assert metrics.TP_GLUE_FRACTION == (
        prof["fixed_glue_s"] / prof["total_s"])
    assert 0.05 < metrics.TP_GLUE_FRACTION < 0.5
    # drift guard: if a newer on-disk profile exists (written by every
    # profile_fused.py run on TPU at the production set), its derived glue
    # fraction must match the adopted constant within 5 points
    art = (Path(__file__).resolve().parent.parent / "benchmarks"
           / "profiles" / "fused_profile.json")
    if not art.exists():
        return
    j = json.loads(art.read_text())
    if j.get("backend") != "tpu" or j.get("params") != prof["measured"].split(", ")[-1]:
        return   # CPU/interpret or off-set probes don't gate the constant
    fresh = j["fixed_glue_s"] / j["total_s"]
    assert abs(fresh - metrics.TP_GLUE_FRACTION) < 0.05, (
        f"TP stage-split drift: fresh profile gives glue fraction "
        f"{fresh:.3f} vs adopted {metrics.TP_GLUE_FRACTION:.3f} — "
        f"re-derive TP_PROFILE in fhe_regex_tpu/utils/metrics.py from "
        f"{art}")
