"""CLI conformance (reference src/main.rs).

The reference binary takes argv[1]=content, argv[2]=pattern, pre-parses the
pattern for an early error (main.rs:17-20), then runs the full
keygen -> encrypt -> has_match -> decrypt flow and prints the decrypted
result (mod.rs:16-18).  Our CLI mirrors that surface; these tests drive
``fhe_regex_tpu.cli.main`` in-process on the CPU test parameters.
"""

import pytest

from fhe_regex_tpu.cli import main


def run_cli(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


@pytest.mark.parametrize("content,pattern,expected", [
    ("abc", "/abc/", 1),
    ("abc", "/^c$/", 0),
    ("aBc", "/^ab?c$/i", 1),
])
def test_cli_end_to_end(capsys, content, pattern, expected):
    rc, out, _ = run_cli(capsys, content, pattern,
                         "--params", "TEST_PARAMS", "--trivial",
                         "--seed", "7")
    assert rc == 0
    assert f"res: {expected}" in out


def test_cli_real_encryption(capsys):
    # without --trivial the content is really encrypted (mod.rs:13)
    rc, out, _ = run_cli(capsys, "ab", "/^ab$/",
                         "--params", "TEST_PARAMS_NOISY", "--seed", "9")
    assert rc == 0
    assert "res: 1" in out


def test_cli_parse_error_is_early(capsys):
    # bad pattern fails BEFORE keygen/encrypt (main.rs:17-20); distinct exit
    # code replaces the reference's panic (SURVEY.md Q13: don't crash-replicate)
    rc, _, err = run_cli(capsys, "abc", "/a1/")   # bare digit: Q5
    assert rc == 2
    assert "failed to parse" in err


def test_cli_non_ascii_content_error(capsys):
    # non-ASCII content is a proper error (ciphertext.rs:33-35)
    rc, _, err = run_cli(capsys, "café", "/a/",
                         "--params", "TEST_PARAMS", "--trivial")
    assert rc == 2
    assert "non-ascii" in err


def test_cli_branch_budget_exit_code(capsys):
    rc, _, err = run_cli(capsys, "aaaaaaaaaaaaaaaa", "/(a*)*b/",
                         "--params", "TEST_PARAMS", "--trivial",
                         "--branch-budget", "10")
    assert rc == 3
    assert "error" in err


def test_cli_count_positions_long(capsys):
    from fhe_regex_tpu.cli import main

    base = ["--params", "TEST_PARAMS", "--trivial", "--backend", "jnp",
            "--seed", "1"]
    assert main(["abcabc", "/abc/", "--count"] + base) == 0
    assert "count: 2" in capsys.readouterr().out
    assert main(["abcabc", "/abc/", "--positions"] + base) == 0
    assert "positions: 100100" in capsys.readouterr().out
    assert main(["xxxxxabcxx", "/abc/", "--long"] + base) == 0
    assert "res: 1" in capsys.readouterr().out
