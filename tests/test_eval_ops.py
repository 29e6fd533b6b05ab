"""Calibration + gate operators: nb_threshold_sweep
(operators/quality_nb.py) and blocklist_filter
(operators/curation.py) — exact confusion/ppm accounting on crafted
inputs, including the degenerate denominators."""

from __future__ import annotations

from dataeng_azure_spotify_spark.operators.curation import blocklist_filter
from dataeng_azure_spotify_spark.operators.quality_nb import (
    nb_threshold_sweep,
)


def test_nb_threshold_sweep_exact_confusion(spark):
    """Hand-checked confusion counts and ppm ratios at three cutoffs,
    including the all-negative-prediction row (precision denominator
    0 → 0 by convention, recall 0)."""
    scored = spark.createDataFrame(
        [
            (1, 10, True),
            (2, 5, True),
            (3, -5, True),
            (4, 8, False),
            (5, -10, False),
        ],
        "doc_id long, score_nano long, label_hq boolean",
    )
    rows = {
        r["thr_nano"]: r
        for r in nb_threshold_sweep(scored, [0, 7, 100]).collect()
    }
    assert set(rows) == {0, 7, 100}
    r0 = rows[0]  # pred+: docs 1,2,4 -> tp=2 fp=1 fn=1 tn=1
    assert (r0["tp"], r0["fp"], r0["fn"], r0["tn"]) == (2, 1, 1, 1)
    assert r0["n_docs"] == 5 and r0["n_pred_pos"] == 3
    assert r0["precision_ppm"] == 666666  # floor(2e6/3)
    assert r0["recall_ppm"] == 666666  # floor(2e6/3)
    assert r0["f1_ppm"] == 666666  # floor(4e6/6)
    r7 = rows[7]  # pred+: docs 1,4 -> tp=1 fp=1 fn=2 tn=1
    assert (r7["tp"], r7["fp"], r7["fn"], r7["tn"]) == (1, 1, 2, 1)
    assert r7["precision_ppm"] == 500000
    assert r7["recall_ppm"] == 333333
    assert r7["f1_ppm"] == 400000  # 2/(2+1+2)
    r100 = rows[100]  # nothing predicted positive
    assert (r100["tp"], r100["fp"], r100["n_pred_pos"]) == (0, 0, 0)
    assert r100["precision_ppm"] == 0 and r100["recall_ppm"] == 0
    assert r100["f1_ppm"] == 0


def test_blocklist_filter_ppm_and_keep(spark):
    """Any-hit drop at max_blocked_ppm=0; ratio mode keeps a doc at
    exactly the budget; blank text is 0 tokens → 0 ppm → kept."""
    docs = spark.createDataFrame(
        [
            (1, "bad word bad"),  # 2/3 blocked -> 666666 ppm
            (2, "all clean text here"),  # 0 ppm
            (3, "bad"),  # 1000000 ppm
            (4, "  "),  # blank -> 0 tokens
            (5, "one bad in twenty " + "ok " * 16),  # 1/20 = 50000 ppm
        ],
        "doc_id long, text string",
    )
    strict = {
        r["doc_id"]: r
        for r in blocklist_filter(docs, ["bad"], max_blocked_ppm=0).collect()
    }
    assert strict[1]["n_blocked"] == 2 and strict[1]["blocked_ppm"] == 666666
    assert not strict[1]["keep"] and not strict[3]["keep"]
    assert strict[2]["keep"] and strict[4]["keep"]
    assert strict[4]["n_tokens"] == 0 and strict[4]["blocked_ppm"] == 0
    assert not strict[5]["keep"]

    ratio = {
        r["doc_id"]: r
        for r in blocklist_filter(
            docs, ["bad"], max_blocked_ppm=50000
        ).collect()
    }
    assert ratio[5]["blocked_ppm"] == 50000 and ratio[5]["keep"]
    assert not ratio[1]["keep"]

    # duplicate blocklist entries collapse; multiple distinct words sum
    multi = {
        r["doc_id"]: r
        for r in blocklist_filter(
            docs, ["bad", "bad", "clean"], max_blocked_ppm=0
        ).collect()
    }
    assert multi[2]["n_blocked"] == 1 and not multi[2]["keep"]


def test_blocklist_filter_exact_keep_and_null_text(spark):
    """keep compares EXACT integers (n_blocked·1e6 ≤ max·n_tokens),
    never the floored ppm: 1/3 blocked at max 333333 is DROPPED
    (1e6 > 999999) even though the floored report reads exactly
    333333 ppm. NULL text is 0 tokens → kept, never -1/fabricated
    ppm."""
    from dataeng_azure_spotify_spark.operators.curation import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [(1, "bad ok ok"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in blocklist_filter(
            docs, ["bad"], max_blocked_ppm=333333
        ).collect()
    }
    assert got[1]["blocked_ppm"] == 333333  # floored report
    assert not got[1]["keep"]  # exact 1/3 > 333333/1e6
    assert (got[2]["n_tokens"], got[2]["n_blocked"]) == (0, 0)
    assert got[2]["blocked_ppm"] == 0 and got[2]["keep"]


def test_nb_threshold_sweep_empty_input_all_zero_rows(spark):
    """An empty scored slice sweeps to one ALL-ZERO row per threshold
    (never NULL confusion counts — SUM over zero rows is NULL without
    the coalesce), matching the oracle's LEFT-JOIN convention."""
    empty = spark.createDataFrame(
        [], "doc_id long, score_nano long, label_hq boolean"
    )
    rows = nb_threshold_sweep(empty, [0, 5]).collect()
    assert len(rows) == 2
    for r in rows:
        assert (
            r["n_docs"],
            r["n_pred_pos"],
            r["tp"],
            r["fp"],
            r["fn"],
            r["tn"],
            r["precision_ppm"],
            r["recall_ppm"],
            r["f1_ppm"],
        ) == (0, 0, 0, 0, 0, 0, 0, 0, 0)


def test_blocklist_admitter_stateless_gate(spark):
    """BlocklistAdmitter follows the admitter contract: admits exactly
    blocklist_filter's keep set, returns original batch rows, and is
    replay-deterministic (stateless)."""
    from dataeng_azure_spotify_spark.operators.curation import (
        BlocklistAdmitter,
    )

    docs = spark.createDataFrame(
        [(1, "bad word bad"), (2, "clean text"), (3, "one bad " + "ok " * 18)],
        "doc_id long, text string",
    )
    adm = BlocklistAdmitter(["bad"], max_blocked_ppm=50000)
    got = {r["doc_id"] for r in adm.admit(docs, run_id="e0").collect()}
    assert got == {2, 3}  # doc 3: 1/20 tokens = 50000 ppm, at budget
    again = {r["doc_id"] for r in adm.admit(docs, run_id="e0").collect()}
    assert got == again
    # original columns survive (left-semi against the gate)
    row = adm.admit(docs).filter("doc_id = 2").collect()[0]
    assert row["text"] == "clean text"


def test_blocklist_oracle_quote_escape_and_empty_list(spark, tmp_path):
    """The DuckDB blocklist oracle must match the Spark operator on
    the inputs only the operator used to survive: blocklist words
    containing single quotes (SQL-escaped by '' doubling) and an
    EMPTY blocklist (``x IN ()`` is a DuckDB parse error — the oracle
    renders a constant-FALSE membership, matching ``isin([])``)."""
    import os

    import duckdb

    import __spark_entry__ as entrymod

    docs = spark.createDataFrame(
        [
            (1, "it's a don't day it's"),
            (2, "plain words only"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    pq = os.path.join(str(tmp_path), "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    sdocs = spark.read.parquet(pq)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    for words in (["it's", "don't"], []):
        got = sorted(
            tuple(r)
            for r in blocklist_filter(
                sdocs, words, max_blocked_ppm=400000
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                entrymod._blocklist_filter_oracle(words, max_ppm=400000)
            ).fetchall()
        )
        assert got == want, f"oracle diverged for words={words}"
    # the quoted words really were counted (3/5 tokens blocked on doc 1)
    row = blocklist_filter(
        sdocs, ["it's", "don't"], max_blocked_ppm=400000
    ).filter("doc_id = 1").collect()[0]
    assert row["n_blocked"] == 3 and not row["keep"]
