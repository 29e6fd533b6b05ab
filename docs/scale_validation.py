"""Empirical 10x/100x scale validation of the heavy dedup family — CLI.

The 100 TB story for the candidate-generation operators is argued in
docstrings and pinned in plan shape; this script MEASURES it over
:func:`...sources.docgen.near_dup_corpus` corpora (50k-word synthetic
vocabulary, 1-in-10 near-dup mutations plus fixed-length mutation
chains) at 1x/10x/100x the sf0.01 fixture's 500 documents. Column
meanings, the committed table, and its reading live in
``docs/BENCH_NOTES.md``; the measurement itself is
:func:`dataeng_azure_spotify_spark.validation.scale_measure`, shared
with the slow-marked assertions in ``tests/test_scale_stress.py``.

Usage::

    python docs/scale_validation.py [n1,n2,...]   # default 500,5000,50000
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from dataeng_azure_spotify_spark.session import get_spark  # noqa: E402
from dataeng_azure_spotify_spark.validation import scale_measure  # noqa: E402


def main() -> None:
    scales = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "500,5000,50000").split(",")
    ]
    spark = get_spark(app_name="scale-validation")
    rows = [scale_measure(spark, n) for n in scales]
    cols = [
        ("corpus docs", "n_docs"),
        ("true pairs (J≥0.5)", "true_pairs"),
        ("PPJoin candidates", "jac_candidates"),
        ("MinHash-LSH candidates", "mh_candidates"),
        ("containment pairs (C≥0.8)", "cont_pairs"),
        ("containment candidates", "cont_candidates"),
        ("SimHash pairs (H≤6)", "sim_pairs"),
        ("SimHash raw compares", "sim_raw"),
        ("raw model Σ C(n,2)/2^bits", "sim_raw_model"),
        ("components", "n_components"),
        ("CC rounds", "cc_rounds"),
        ("CC budget ⌈log₂n⌉²", "cc_budget"),
        ("MG candidate tokens", "hh_candidates"),
        ("MG certified", "hh_certified"),
        ("sec", "sec"),
    ]
    print("| metric | " + " | ".join(str(r["n_base"]) for r in rows) + " |")
    print("|---|" + "---|" * len(rows))
    for title, key in cols:
        print(f"| {title} | " + " | ".join(str(r[key]) for r in rows) + " |")
    print()
    print(json.dumps({"scales": rows}))


if __name__ == "__main__":
    main()
