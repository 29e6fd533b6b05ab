"""Sentence segmentation: a codegen'd fast path and a Python UDTF twin.

Two implementations of the same contract — split a document on
terminal punctuation runs (``[.!?]+``), trim, drop empties, number the
survivors 0..n-1, and count whitespace tokens per sentence:

- :func:`split_sentences` — pure ``pyspark.sql.functions`` array
  algebra (``split`` → ``transform`` → ``filter`` → ``posexplode``).
  Whole-stage-codegen, no Python in the loop: this is the hot path and
  the one the driver query uses.
- :class:`SentenceSplitUDTF` — the same semantics as a Spark 4 Python
  UDTF (one input row → N output rows via ``eval`` yields), registered
  for ``LATERAL`` joins. UDTFs are the escape hatch for segmentation
  logic that outgrows regex (abbreviation handling, language-specific
  rules, model-based splitters); shipping the trivial splitter through
  it pins the plumbing — schema, registration, lateral-join shape —
  while the pytest asserts it stays row-identical to the fast path.

Like every Python-row surface in this repo, the UDTF is quarantined
from the hot path (cf. the email row-UDF baseline,
``functions/email.py``): 100 TB segmentation runs the codegen version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: terminal-punctuation run that ends a sentence
_BOUNDARY = "[.!?]+"


def sentences_col(text: Column | str) -> Column:
    """Array of trimmed, non-empty sentences of ``text``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(c, _BOUNDARY), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per sentence: ``(id, sentence_idx int, sentence string,
    n_tokens long)``. Shuffle-free — a generate over the scan."""
    from dataeng_azure_spotify_spark.functions.text import token_count

    return df.select(
        F.col(id_col),
        F.posexplode(sentences_col(text_col)).alias("sentence_idx", "sentence"),
    ).select(
        id_col,
        F.col("sentence_idx").cast("int"),
        "sentence",
        token_count("sentence").alias("n_tokens"),
    )


def make_sentence_split_udtf():
    """Build (lazily — the decorator needs an active Spark context on
    some codepaths) the UDTF class implementing the same contract.

    Usage::

        udtf_cls = make_sentence_split_udtf()
        spark.udtf.register("sentence_split", udtf_cls)
        spark.sql(
            "SELECT d.doc_id, s.* FROM docs d, "
            "LATERAL sentence_split(d.text) s"
        )
    """
    import re

    from pyspark.sql.functions import udtf

    boundary = re.compile(_BOUNDARY)
    ws = re.compile(r"\s+")

    @udtf(returnType="sentence_idx int, sentence string, n_tokens bigint")
    class SentenceSplitUDTF:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            idx = 0
            for raw in boundary.split(text):
                s = raw.strip()
                if not s:
                    continue
                yield idx, s, len(ws.split(s))
                idx += 1

    return SentenceSplitUDTF
