"""Cross-engine-exact math primitives.

Motivation (measured, round 7): Spark's ``ln`` (JVM ``Math.log``) and
DuckDB's ``ln`` (libm) disagree in the last ulp on **78,696 of the
first 10M integers** — libm transcendentals are faithfully rounded,
not correctly rounded, so each engine's result is implementation-
defined. Any oracle-checked value derived from ``ln`` therefore
hash-mismatches nondeterministically (the same lesson that produced
BM25's rational idf).

:func:`portable_ln` sidesteps libm entirely: it computes ``ln(x)``
for positive integer-valued inputs from primitives that ARE
IEEE-754-correctly-rounded in every engine (+, −, ×, ÷, integer bit
ops, decimal-literal parsing), evaluated with a FIXED expression
tree:

    e  = floor(log2(x))            -- exact: length(bin(x)) - 1
    m  = x / 2^e                   -- exact-rounded division, m ∈ [1,2)
    t  = (m−1)/(m+1),  u = t²      -- atanh substitution, t ∈ [0,1/3]
    ln(m) ≈ 2t·(1 + u·(1/3 + u·(1/5 + … + u·(1/15))))   -- Horner
    ln(x) = e·LN2 + ln(m)

Two engines evaluating this tree produce BIT-IDENTICAL doubles, so a
DuckDB twin built by :func:`duck_portable_ln_sql` (in
``__spark_entry__``) matches Spark exactly — fixed-point
quantizations like ``floor(ln·1e9 + 0.5)`` are then safe to emit.
Truncation error vs true ln is ≤ 2·(1/3)¹⁷/17 ≈ 9e-10 relative —
irrelevant for ranking/weighting uses, and identical on both sides.

Coefficients are Python-computed doubles embedded via ``repr`` (which
round-trips): decimal→double parsing is correctly rounded in Python,
Java, and DuckDB, so all three hold the same bit pattern.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: repr strings round-trip to identical doubles in every engine.
LN2 = math.log(2.0)
#: atanh-series coefficients 1/(2k+1), innermost first (k = 7 … 1).
_COEFFS = [1.0 / k for k in (15, 13, 11, 9, 7, 5, 3)]


def portable_ln(x: Column) -> Column:
    """ln(x) for a positive integral-valued column (LONG-safe range),
    bit-identical across engines — see the module docstring. The
    DuckDB twin is ``duck_portable_ln_sql`` in ``__spark_entry__``;
    the two MUST be edited together (pinned identical by
    ``tests/test_llm_ops.py::test_portable_ln_cross_engine_exact``).
    """
    xl = x.cast("long")
    e = (F.length(F.bin(xl)) - F.lit(1)).cast("int")
    # the python shiftleft wrapper only takes a literal shift — call the
    # SQL function directly for a column exponent (exact 2^e as LONG)
    two_e = F.call_function(
        "shiftleft", F.lit(1).cast("long"), e
    ).cast("double")
    m = xl.cast("double") / two_e
    t = (m - F.lit(1.0)) / (m + F.lit(1.0))
    u = t * t
    poly = F.lit(_COEFFS[0])
    for c in _COEFFS[1:]:
        poly = F.lit(c) + u * poly
    ln_m = F.lit(2.0) * t * (F.lit(1.0) + u * poly)
    return e.cast("double") * F.lit(LN2) + ln_m
