"""Serving daemon: warm-process HTTP match service (fhe_regex_tpu/serve.py).

The server holds only the server key; the test client encrypts/decrypts
with the client key — the reference's trust split over a real socket.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from fhe_regex_tpu import decrypt, trivial_encrypt_str
from fhe_regex_tpu.params import TEST_PARAMS
from fhe_regex_tpu.serve import (
    MatchService,
    decode_array,
    encode_array,
    make_server,
)


@pytest.fixture(scope="module")
def server(keys):
    _, sk = keys
    srv = make_server(MatchService(sk, backend="jnp"), port=0)  # ephemeral
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(url + path, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"
    assert out["params"] == TEST_PARAMS.name


def test_compile_prewarm(server):
    out = _post(server, "/compile", {"pattern": "/ab?c/", "content_len": 3})
    assert out["bootstraps"] > 0 and out["levels"] > 0


def test_warmup_manifest(keys):
    """serve --warmup: each manifest entry compiles AND executes its
    shapes before the port opens; a post-warmup match reuses the cached
    program (VERDICT r4 weak #4)."""
    _, sk = keys
    svc = MatchService(sk, backend="jnp")
    report = svc.warmup([
        {"pattern": "/ab?c/", "content_len": 3, "many": 2},
        {"patterns": ["/ab/", "/bc$/"], "content_len": 3},
    ])
    assert len(report) == 2
    assert report[0]["seconds"] >= 0 and report[0]["many"] == 2
    # the programs are compiled and cached — a subsequent match finds them
    assert len(svc._programs) == 2
    ck, _ = keys
    out = svc.match("/ab?c/", trivial_encrypt_str(TEST_PARAMS, "abc"))
    assert decrypt(ck, out) == 1


def test_match_roundtrip(server, keys):
    ck, _ = keys
    for content, want in [("abc", 1), ("axc", 0)]:
        ct = trivial_encrypt_str(TEST_PARAMS, content)
        out = _post(server, "/match",
                    {"pattern": "/ab?c/", "ct": encode_array(ct)})
        res = decode_array(out["ct"])
        assert decrypt(ck, res) == want, content


def test_match_many_roundtrip(server, keys):
    ck, _ = keys
    contents = ["abcx", "xxxx", "xabc"]
    cts = np.stack([trivial_encrypt_str(TEST_PARAMS, c) for c in contents])
    out = _post(server, "/match_many",
                {"pattern": "/abc/", "ct": encode_array(cts)})
    res = decode_array(out["ct"])
    assert [decrypt(ck, res[i]) for i in range(3)] == [1, 0, 1]


def test_bad_pattern_is_clean_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/match", {"pattern": "/[0-9]/",
                                 "ct": encode_array(
                                     trivial_encrypt_str(TEST_PARAMS, "a"))})
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_budget_surfaces_as_400(server):
    ct = trivial_encrypt_str(TEST_PARAMS, "aaabc")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/match", {"pattern": "/a*bc/", "ct": encode_array(ct),
                                 "branch_budget": 1})
    assert ei.value.code == 400


def test_match_patterns_roundtrip(server, keys):
    """"patterns" list -> one multi-root circuit, leading P axis."""
    ck, _ = keys
    pats = ["/ab?c/", "/^x/", "/./"]
    ct = trivial_encrypt_str(TEST_PARAMS, "abc")
    out = _post(server, "/match", {"patterns": pats, "ct": encode_array(ct)})
    res = decode_array(out["ct"])
    assert res.shape[0] == len(pats)
    assert [decrypt(ck, r) for r in res] == [1, 0, 1]


def test_match_many_patterns_roundtrip(server, keys):
    ck, _ = keys
    contents = ["abcx", "xxxx"]
    pats = ["/abc/", "/x{2}/"]
    cts = np.stack([trivial_encrypt_str(TEST_PARAMS, c) for c in contents])
    out = _post(server, "/match_many",
                {"patterns": pats, "ct": encode_array(cts)})
    res = decode_array(out["ct"])
    assert res.shape[:2] == (2, 2)
    assert [[decrypt(ck, res[c, p]) for p in range(2)]
            for c in range(2)] == [[1, 0], [0, 1]]


def test_compile_patterns_stats(server):
    out = _post(server, "/compile",
                {"patterns": ["/abc/", "/abd/"], "content_len": 4})
    assert out["patterns"] == 2 and out["bootstraps"] > 0


def test_match_positions_over_http(server, keys):
    """"positions": true -> one encrypted bit per start offset."""
    ck, _ = keys
    ct = trivial_encrypt_str(TEST_PARAMS, "abcabc")
    out = _post(server, "/match", {"pattern": "/abc/", "positions": True,
                                   "ct": encode_array(ct)})
    res = decode_array(out["ct"])
    assert [decrypt(ck, res[i]) for i in range(6)] == [1, 0, 0, 1, 0, 0]
    out = _post(server, "/compile", {"pattern": "/abc/", "positions": True,
                                     "content_len": 6})
    assert out["positions"] == 6


def test_match_many_positions_over_http(server, keys):
    ck, _ = keys
    contents = ["abcx", "xabc"]
    cts = np.stack([trivial_encrypt_str(TEST_PARAMS, c) for c in contents])
    out = _post(server, "/match_many",
                {"pattern": "/abc/", "positions": True,
                 "ct": encode_array(cts)})
    res = decode_array(out["ct"])
    assert res.shape[:2] == (2, 4)
    assert [[decrypt(ck, res[c, i]) for i in range(4)] for c in range(2)] \
        == [[1, 0, 0, 0], [0, 1, 0, 0]]


def test_match_long_over_http(server, keys):
    ck, _ = keys
    ct = trivial_encrypt_str(TEST_PARAMS, "xxxxxxxxxxxxabcxxxxx")
    out = _post(server, "/match_long",
                {"pattern": "/abc/", "window": 6, "ct": encode_array(ct)})
    assert decrypt(ck, decode_array(out["ct"])) == 1
    out = _post(server, "/match_long",
                {"pattern": "/abd/", "window": 6, "ct": encode_array(ct)})
    assert decrypt(ck, decode_array(out["ct"])) == 0


def test_count_over_http(server, keys):
    from fhe_regex_tpu import decrypt_count

    ck, _ = keys
    ct = trivial_encrypt_str(TEST_PARAMS, "abcabcxabc")
    out = _post(server, "/count", {"pattern": "/abc/",
                                   "ct": encode_array(ct)})
    assert decrypt_count(ck, decode_array(out["ct"])) == 3


def test_stats_endpoint(server, keys):
    ck, _ = keys
    ct = trivial_encrypt_str(TEST_PARAMS, "abc")
    out = _post(server, "/match", {"pattern": "/ab/",
                                   "ct": encode_array(ct),
                                   "profile": True})
    assert decrypt(ck, decode_array(out["ct"])) == 1
    with urllib.request.urlopen(server + "/stats") as r:
        stats = json.loads(r.read())
    assert stats["requests"]["/match"]["count"] >= 1
    assert stats["requests"]["/match"]["seconds"] > 0
    prog = next(p for p in stats["programs"] if p["pattern"] == "/ab/")
    row = prog["lengths"]["3"]
    assert row["bootstraps"] > 0 and row["rotations"] > 0
    prof = stats["last_profile"]
    assert prof["pattern"] == "/ab/" and prof["content_len"] == 3
    assert len(prof["levels"]) > 0
    assert all("seconds" in lv and "width" in lv for lv in prof["levels"])
    # failure-probability contract + watchdog observability (round 4)
    assert 0.0 <= row["p_fail_circuit"] <= 1.0
    assert prof["p_fail"] is None or prof["p_fail"]["pbs_count"] > 0
    assert isinstance(stats["launch_ema_s"], dict)  # fed after 2+ runs
