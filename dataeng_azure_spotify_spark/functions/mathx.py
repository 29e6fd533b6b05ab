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

#: Cody–Waite split of ln2 (the fdlibm constants): ``LN2_HI`` carries
#: only the top 33 significant bits, so ``n·LN2_HI`` is EXACT for
#: |n| < 2^20 and the range reduction ``r = (x − n·LN2_HI) − n·LN2_LO``
#: loses no precision to cancellation.
LN2_HI = 6.93147180369123816490e-01
LN2_LO = 1.90821492927058770002e-10
INV_LN2 = 1.0 / LN2
#: Taylor coefficients 1/k! for exp, innermost first (k = 15 … 2);
#: truncation ≤ r^16/16! ≈ 2e-21 for |r| ≤ ln2/2.
_EXP_COEFFS = [1.0 / math.factorial(k) for k in range(15, 1, -1)]


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


def portable_exp(x: Column) -> Column:
    """exp(x) for a DOUBLE column, bit-identical across engines (libm
    ``exp`` is faithfully-, not correctly-, rounded — same divergence
    class as ``ln``, module docstring). Fixed IEEE tree:

        n = ⌊x/ln2 + ½⌋                       -- nearest power of two
        r = (x − n·LN2_HI) − n·LN2_LO         -- Cody–Waite, |r| ≤ ln2/2
        exp(r) ≈ 1 + r + r²·Horner(1/2! … 1/15!)
        exp(x) = 2ⁿ · exp(r)                  -- 2ⁿ exact via bit shift

    Every step is a correctly-rounded IEEE op (+, −, ×, ÷, floor,
    shiftleft), so two engines evaluating this tree agree bit-for-bit;
    the DuckDB twin is ``duck_portable_exp_sql`` in ``__spark_entry__``
    (edit together — pinned by ``test_portable_pow_cross_engine_exact``).
    Truncation ≈ 2e-21 relative. Domain: |x| ≤ 40 (|n| ≤ 58, so the
    2ⁿ shift never overflows a LONG). Out-of-domain inputs FAIL LOUDLY
    (``raise_error`` at |n| > 58, where the shift would wrap to a
    silently wrong-signed result); the guard sits on ``n`` — one extra
    branch over an already-materialized small subtree — rather than on
    ``x``, whose subtree the exp tree replicates ~20×, so it adds no
    Catalyst planning weight (the ``portable_pow`` staging hazard,
    see that docstring).
    """
    n = F.floor(x * F.lit(INV_LN2) + F.lit(0.5)).cast("int")
    nd = n.cast("double")
    r = (x - nd * F.lit(LN2_HI)) - nd * F.lit(LN2_LO)
    poly = F.lit(_EXP_COEFFS[0])
    for c in _EXP_COEFFS[1:]:
        poly = F.lit(c) + r * poly
    exp_r = F.lit(1.0) + r + r * r * poly
    # both shift amounts are clamped non-negative so neither branch of
    # the CASE can fault under vectorized whole-column evaluation
    shift_pos = F.greatest(n, F.lit(0))
    shift_neg = F.greatest(-n, F.lit(0))
    one = F.lit(1).cast("long")
    two_n = (
        F.when(
            F.abs(n) > F.lit(58),
            F.raise_error(
                F.concat(
                    F.lit(
                        "portable_exp: |x| > 40 is outside the exact "
                        "domain (the 2^n long shift would wrap); got x="
                    ),
                    x.cast("string"),
                )
            ).cast("double"),
        )
        .when(
            n >= 0, F.call_function("shiftleft", one, shift_pos).cast("double")
        )
        .otherwise(
            F.lit(1.0)
            / F.call_function("shiftleft", one, shift_neg).cast("double")
        )
    )
    return two_n * exp_r


def portable_pow(c: Column, alpha: float) -> Column:
    """``c^alpha`` for a positive integral-valued column and a Python
    float exponent, bit-identical across engines: composes the two
    portable primitives as ``exp(alpha · ln(c))`` — the general power
    libm computes the same way, but here both legs are fixed IEEE
    trees (and ``alpha`` is embedded as a repr literal, which parses to
    the identical double everywhere). Relative error ~1e-9 (inherited
    from ``portable_ln``) — irrelevant for weighting/ranking, and
    IDENTICAL on both sides, which is the property that matters.
    DuckDB twin: ``duck_portable_pow_sql``. Domain: ``c ≥ 1`` and
    ``c^alpha ≲ 2^58`` (the ``portable_exp`` shift bound).

    PLANNING caveat: this composes the two trees in ONE Column
    expression — the exp tree references its argument ~50 times, and
    Column trees have no let-binding, so the whole ln subtree inlines
    into every reference; Catalyst re-expands the shared DAG on every
    transform and re-optimizes per action (measured r8: ~5s of
    driver-side planning PER action, at any data size). Fine for
    one-off scalar/test use; in an operator, STAGE the ln leg into its
    own projection and call ``portable_exp`` on the attribute — see
    ``operators/curation.py::temperature_mix``."""
    return portable_exp(F.lit(float(alpha)) * portable_ln(c))
