"""Dispatch watchdog (VERDICT r3 #8): the round-3 1694-s anomaly must
self-diagnose if it recurs.  Unit tests on the EMA detector plus the
integration fact that Executor.run feeds it."""

import logging

import numpy as np
import pytest

from fhe_regex_tpu.utils.watchdog import LaunchWatchdog


def test_warmup_observations_never_alarm():
    wd = LaunchWatchdog(ratio=10.0, floor_seconds=5.0, warmup=1)
    # cold compile: 1800 s — expected, discarded
    assert wd.observe(("fused", 1000, 50, False), 1800.0) is None
    # first warm run seeds the EMA
    assert wd.observe(("fused", 1000, 50, False), 4.0) is None


def test_anomaly_fires_and_does_not_poison_the_ema():
    wd = LaunchWatchdog(ratio=10.0, floor_seconds=5.0, warmup=0)
    key = ("fused", 1000, 50, False)
    assert wd.observe(key, 4.0) is None          # seed
    assert wd.observe(key, 4.2) is None          # steady state
    w = wd.observe(key, 1694.0)                  # the artificial stall
    assert w is not None and "anomalous launch" in w and "1694.0s" in w
    # the stall did NOT enter the EMA: a second stall still fires
    assert wd.observe(key, 1694.0) is not None
    # and normal runs resume silently
    assert wd.observe(key, 4.1) is None


def test_floor_suppresses_cheap_launch_noise():
    wd = LaunchWatchdog(ratio=10.0, floor_seconds=5.0, warmup=0)
    key = ("levels", 10, 20, False)
    assert wd.observe(key, 0.01) is None
    # 100x blowup but under the absolute floor: no alarm
    assert wd.observe(key, 1.0) is None


def test_warning_is_logged(caplog):
    wd = LaunchWatchdog(ratio=10.0, floor_seconds=5.0, warmup=0)
    key = ("fused", 1, 2, True)
    wd.observe(key, 1.0)
    with caplog.at_level(logging.WARNING, logger="fhe_regex_tpu.watchdog"):
        wd.observe(key, 100.0)
    assert any("anomalous launch" in r.message for r in caplog.records)


def test_executor_feeds_the_watchdog(keys):
    """An Executor.run updates the per-shape EMA (integration smoke)."""
    from fhe_regex_tpu import compile_circuit, executor_for, trivial_encrypt_str
    from fhe_regex_tpu.params import TEST_PARAMS
    from fhe_regex_tpu.regex.engine import compile_match

    ck, sk = keys
    ex = executor_for(sk)
    b, r = compile_match(3, "/ab/")
    circ = compile_circuit(TEST_PARAMS, b, r)
    ex.watchdog._seen.clear(); ex.watchdog._ema.clear()
    ex.run(circ, trivial_encrypt_str(TEST_PARAMS, "abc"))
    ex.run(circ, trivial_encrypt_str(TEST_PARAMS, "abc"))
    assert len(ex.watchdog._seen) == 1
    key = next(iter(ex.watchdog._seen))
    assert ex.watchdog._seen[key] == 2 and key[1] == circ.pbs_count
