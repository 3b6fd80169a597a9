"""Pin the multi-chip communication model (utils/metrics.py::comm_model) —
the falsifiable predictions recorded in docs/ROADMAP.md."""

from fhe_regex_tpu.params import TPU64_MESSAGE_2_CARRY_2, TPU_MESSAGE_2_CARRY_2
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
