"""End-to-end encrypted-match latency over the 5 driver configs
(BASELINE.json "configs"), on whatever platform JAX finds.

Usage:  python benchmarks/e2e.py [--params NAME] [--fold tree|reference]
Writes one JSON line per config; intended for BENCH_r*.json-style records
and round-over-round tracking (the headline bench.py metric stays
bootstraps/s/chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(Path(__file__).resolve().parents[1] / ".cache" / "jax"))
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None)
    ap.add_argument("--fold", default="tree")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--trivial", action="store_true",
                    help="trivial content encryption (deterministic fast path)")
    ap.add_argument("--repeat", type=int, default=0,
                    help="extra warm runs per config (reports warm min)")
    args = ap.parse_args()

    import jax
    import numpy as np
    from fhe_regex_tpu import (decrypt, encrypt_str, has_match, get_params,
                               trivial_encrypt_str)
    from fhe_regex_tpu.models.patterns import DRIVER_CONFIGS
    from bench import _get_keys

    on_tpu = jax.default_backend() == "tpu"
    params = get_params(args.params or
                        ("TPU_MESSAGE_2_CARRY_2" if on_tpu else "TEST_PARAMS"))
    ck, sk = _get_keys(params)

    # contents chosen so configs 1,3 match and the rest don't (both paths hit)
    # note the dialect quirks: [a-d] has an exclusive lower bound (Q1) so
    # 'b' is the smallest match, and a trailing e? epsilon-variant at
    # end-of-content is pruned (engine.rs:69-71), so content must end 'e'
    contents = {
        "exact_literal": "abc",
        "contains_anchors": "xxxxxabcxxxxxxxx",
        "case_insensitive_classes": "bq",
        "quantifiers": "xabbcccdddddxxxxxxxxxxxxxxxxxxxx",
        "alternation_combo": "cdqrstuv" + "x" * 55 + "e",
    }
    expected = {"exact_literal": 1, "contains_anchors": 1,
                "case_insensitive_classes": 1, "quantifiers": 0,
                "alternation_combo": 1}

    configs = DRIVER_CONFIGS + [
        # BASELINE.json north-star: /^a[b-d]{2,4}e$/i over 64 encrypted chars
        # (fully anchored, so no 64-char content can match: expected 0 — the
        # bit-exactness claim is that we agree with the reference on that)
        {"name": "north_star_64", "pattern": "/^a[b-d]{2,4}e$/i", "content_len": 64},
        # and the same pattern on content it CAN match ([b-d] excludes 'b'
        # by Q1, so the repeats must be c/d)
        {"name": "north_star_hit", "pattern": "/^a[b-d]{2,4}e$/i", "content_len": 5},
    ]
    contents["north_star_64"] = "a" + "c" * 62 + "e"
    contents["north_star_hit"] = "Acdde"
    expected["north_star_64"] = 0
    expected["north_star_hit"] = 1

    for cfg in configs:
        name = cfg["name"]
        content = contents[name]
        assert len(content) == cfg["content_len"], (name, len(content))
        ct = (trivial_encrypt_str(params, content) if args.trivial
              else encrypt_str(ck, content))
        t0 = time.time()
        res = has_match(sk, ct, cfg["pattern"], backend=args.backend,
                        fold=args.fold)
        got = decrypt(ck, res)
        dt = time.time() - t0
        warm = None
        for _ in range(args.repeat):
            t0 = time.time()
            res = has_match(sk, ct, cfg["pattern"], backend=args.backend,
                            fold=args.fold)
            w = time.time() - t0
            warm = w if warm is None else min(warm, w)
            assert decrypt(ck, res) == got
        rec = {
            "config": name, "pattern": cfg["pattern"],
            "content_len": cfg["content_len"],
            "latency_s": round(dt, 3), "result": got,
            "expected": expected[name], "ok": got == expected[name],
            "fold": args.fold, "params": params.name,
        }
        if warm is not None:
            rec["warm_s"] = round(warm, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
