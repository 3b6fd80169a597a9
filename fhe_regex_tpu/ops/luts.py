"""LUT definitions for the regex engine's micro-ops.

Each logical radix op (eq/gt/le/and/or; SURVEY.md N5-N8) lowers to bootstraps
whose LUTs live here.  A ``LutKey`` is a hashable identity; ``lut_fn`` maps it
to the plaintext function evaluated over the padded 4-bit message+carry
domain (values 0..15).  Device test polynomials are built per parameter set
with ``crypto.golden.make_lut_poly``.

Input conventions (affine combines produced by regex/circuit.py):
  nibble LUTs:  x = b_lo + 4*b_hi            in 0..15 (one content nibble)
  AND2 / OR2:   w = a + 2*b                  in 0..3  (two bits)
  OR_AND3:      z = p + 2*q + 4*r            in 0..7  -> p | (q & r)
                (lexicographic byte compare combine: gt = gt_hi | (eq_hi &
                gt_lo); le = lt_hi | (eq_hi & le_lo) — same table, shared)
"""

from __future__ import annotations

from typing import Callable, Tuple

LutKey = Tuple


def LUT_EQ(c: int) -> LutKey:
    return ("eq", c)


def LUT_GT(c: int) -> LutKey:
    return ("gt", c)


def LUT_LT(c: int) -> LutKey:
    return ("lt", c)


def LUT_LE(c: int) -> LutKey:
    return ("le", c)


LUT_AND2: LutKey = ("and2",)
LUT_OR2: LutKey = ("or2",)
LUT_AND3: LutKey = ("and3",)   # w = x + 2y + 4z -> x & y & z
LUT_OR3: LutKey = ("or3",)     # w = x + 2y + 4z -> x | y | z
# gt-combine and le-combine share one table: p | (q & r)
LUT_GT_COMBINE: LutKey = ("or_and3",)
LUT_LE_COMBINE: LutKey = ("or_and3",)


def lut_fn(key: LutKey) -> Callable[[int], int]:
    kind = key[0]
    if kind == "eq":
        return lambda x, c=key[1]: 1 if x == c else 0
    if kind == "gt":
        return lambda x, c=key[1]: 1 if x > c else 0
    if kind == "lt":
        return lambda x, c=key[1]: 1 if x < c else 0
    if kind == "le":
        return lambda x, c=key[1]: 1 if x <= c else 0
    if kind == "and2":
        return lambda w: 1 if w == 3 else 0
    if kind == "or2":
        return lambda w: 1 if w in (1, 2, 3) else 0
    if kind == "and3":
        return lambda w: 1 if w == 7 else 0
    if kind == "or3":
        return lambda w: 1 if 1 <= w <= 7 else 0
    if kind == "or_and3":
        return lambda z: 1 if (z & 1) or ((z >> 1) & 1 and (z >> 2) & 1) else 0
    raise KeyError(key)
