"""Measured same-machine CPU baseline: single-thread f64-FFT PBS.

Runs native/pbs_fft.cpp (the reference's compute recipe — tfhe-rs 0.2 +
concrete-fft split-complex f64 negacyclic FFT — re-implemented in C++) at
the reference's exact parameter point, with bsk/ksk derived from the
reference's OWN secret key fixture (crypto/refkey.py), decrypt-gated, and
reports bootstraps/s.  This converts BASELINE.md's weakest leg (the citable
100 pbs/s figure from public-era data) into a measurement on this machine.

Usage:  python benchmarks/cpu_baseline.py [--iters N]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    import numpy as np
    from fhe_regex_tpu.crypto import golden, lwe as L
    from fhe_regex_tpu.crypto.keys import ServerKey, server_key_from_client
    from fhe_regex_tpu.crypto.native_fft import NativeFftPbs, available
    from fhe_regex_tpu.crypto.refkey import client_key_from_fixture

    if not available():
        print(json.dumps({"error": "native/libpbsfft.so not built"}))
        return 1

    ck, _ = client_key_from_fixture(seed=424242)
    params = ck.params
    cache = Path(__file__).resolve().parents[1] / ".cache" / "refkey_server.npz"
    cache.parent.mkdir(exist_ok=True)
    if cache.exists():
        z = np.load(cache)
        sk = ServerKey(params=params, bsk=z["bsk"], ksk=z["ksk"])
    else:
        sk = server_key_from_client(ck)
        np.savez(cache, bsk=sk.bsk, ksk=sk.ksk)

    eng = NativeFftPbs(params, sk.bsk, sk.ksk)
    f = lambda m: (5 * m + 2) % 16
    lut = golden.make_lut_poly(params, f)
    msgs = [0, 1, 2, 5, 7, 11, 15, 8, 3, 12]
    cts = [L.encrypt_lwe(params, ck.lwe_key, m, ck.rng) for m in msgs]

    # decrypt gate under the reference's own secret key
    bad = sum(L.decrypt_lwe(params, ck.lwe_key, eng.pbs(c, lut)) != f(m)
              for c, m in zip(cts, msgs))
    if bad:
        print(json.dumps({"error": f"decrypt gate failed on {bad} of "
                                   f"{len(msgs)} bootstraps"}))
        return 1

    t0 = time.time()
    for i in range(args.iters):
        eng.pbs(cts[i % len(cts)], lut)
    dt = time.time() - t0

    print(json.dumps({
        "metric": "cpu_fft_pbs_per_sec_single_thread",
        "value": round(args.iters / dt, 2),
        "unit": "bootstraps/s",
        "ms_per_pbs": round(1000 * dt / args.iters, 1),
        "params": params.name,
        "keys": "reference client_key fixture",
        "decrypt_gated": True,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
