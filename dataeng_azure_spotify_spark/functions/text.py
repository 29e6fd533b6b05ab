"""Text-analysis functions for LLM training-data pipelines
(beyond-reference surface; SURVEY.md §7 M5 / BASELINE.json north star).

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every function has an exact DuckDB
SQL twin (see ``__spark_entry__.oracle_sql``), built on the shared
primitives:

- tokens: whitespace split of trimmed text (empty text → 0 tokens)
- deterministic 60-bit hash: first 15 hex chars of md5 → BIGINT, which
  Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
  (``('0x'||substr(md5(x),1,15))::BIGINT``) compute identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny multilingual stopword lists for ratio scoring and language ID.
#: Deliberately small + explicit so the DuckDB oracle can mirror them.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "it")
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": STOPWORDS_EN,
    "es": ("el", "la", "de", "y", "que", "en", "los", "se"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}
#: Deterministic tie order for language ID (first match wins on ties).
LANG_PRIORITY = ("en", "es", "de", "fr", "zh")

PUNCT_CLASS = r"[.,!?;:]"


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty/blank text → empty array."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("long")


#: BPE-style pre-tokenizer classes: word runs, digit runs, punctuation
#: runs (the GPT-2 pattern's shape, minus lookaheads so every regex
#: engine agrees). A token-budget estimator, not a real BPE vocabulary.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Subword-ish token count from the BPE pre-tokenizer classes —
    the cheap cross-engine estimator of LLM token budgets (whitespace
    tokens undercount ~1.3-1.5× vs BPE on prose)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("long")


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(c).cast("double")
    )


def stopword_ratio(
    text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN
) -> Column:
    """Stopword tokens / total tokens (0 for empty text)."""
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Composite heuristic document-quality score in [0, 1].

    0.5·min(1, tokens/64) + 0.25·(1 − punct_ratio) + 0.25·min(1, 4·stop_ratio)
    — length says substance, low punctuation density says prose (not
    markup), presence of stopwords says natural language. The exact
    weights are a policy choice; determinism across engines is what the
    oracle checks.
    """
    toks = token_count(text).cast("double")
    len_term = F.least(F.lit(1.0), toks / F.lit(64.0))
    punct_term = F.lit(1.0) - punct_ratio(text)
    stop_term = F.least(F.lit(1.0), F.lit(4.0) * stopword_ratio(text))
    return (
        F.lit(0.5) * len_term + F.lit(0.25) * punct_term + F.lit(0.25) * stop_term
    )


def lang_id(text: Column | str) -> Column:
    """N-gram-free language ID: argmax of per-language stopword hits.

    Ties (including the all-zero case) resolve by ``LANG_PRIORITY`` order
    — a strict-greater scan keeps the choice deterministic in both
    engines. Returns the language code as a string.
    """
    toks = tokens_col(text)

    def hit_counter(sw: tuple[str, ...]):
        # NB: a plain `lambda t, sw=sw:` would be seen by Spark as a
        # two-argument lambda (element, index) — close over sw instead.
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    hits = {lang: hit_counter(sw) for lang, sw in LANG_STOPWORDS.items()}
    best_lang = F.lit(LANG_PRIORITY[0])
    best_hits = hits[LANG_PRIORITY[0]]
    for lang in LANG_PRIORITY[1:]:
        cond = hits[lang] > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return best_lang


def normalize_text(text: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def hash60(col: Column, salt: Column | str | None = None) -> Column:
    """60-bit positive BIGINT hash from md5 — identical in DuckDB via
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``. A Column salt is
    concatenated per row; anything else stringifies once (str(salt)
    on a Column would silently salt with its repr)."""
    if salt is None:
        x = col
    elif isinstance(salt, Column):
        x = F.concat(salt, F.lit("|"), col)
    else:
        x = F.concat(F.lit(str(salt)), F.lit("|"), col)
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def kgram_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mod_p: int = 8,
) -> DataFrame:
    """Content-defined document fingerprints: char k-gram hashes with
    0-mod-p selection.

    Every character k-gram of the normalized text is hashed; the
    fingerprint set is the grams whose hash ≡ 0 (mod p) — the classic
    content-defined selection (Rabin/Broder style): position-independent,
    so edits perturb only nearby fingerprints, and expected density is
    1/p regardless of document length. Output is one row per doc:
    gram counts plus an order-independent digest (min/xor of selected
    hashes) usable as a compact near-dup prefilter.

    The per-gram hash is the engine-wide md5-based ``hash60`` rather than
    a rolling polynomial — same selection semantics, deterministic across
    engines (the DuckDB oracle mirrors it exactly); at scale the hash is
    one md5 per gram either way, embarrassingly parallel.
    """
    norm = normalize_text(text_col)
    base = df.select(
        F.col(id_col), norm.alias("__norm"), F.length(norm).alias("__len")
    )
    idx = F.sequence(F.lit(1), F.col("__len") - k + 1)
    pos = base.filter(F.col("__len") >= k).select(
        id_col, F.explode(idx).alias("p"), F.col("__norm")
    )
    hashed = pos.select(
        id_col,
        hash60(F.expr(f"substr(__norm, p, {k})")).alias("h"),
    )
    agg = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count(F.when(F.col("h") % mod_p == 0, 1)).cast("long").alias("n_fp"),
        F.min(F.when(F.col("h") % mod_p == 0, F.col("h"))).alias("fp_min"),
        F.expr(f"bit_xor(CASE WHEN h % {mod_p} = 0 THEN h END)").alias("fp_xor"),
    )
    # docs shorter than k grams still get a row (empty fingerprint set)
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_fp", F.lit(0)).cast("long").alias("n_fp"),
            "fp_min",
            "fp_xor",
        )
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 40,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style repetition-free quality gate (Rae et al. 2021,
    "Scaling Language Models", Table A1 heuristics) — the canonical
    pretraining document filter, as one JVM-expression projection.

    Per document: word count bounds, mean word length bounds,
    symbol-to-word ratio ('#' and '...' occurrences per word),
    alphabetic-word ratio (words containing a letter), and a minimum
    stopword-hit count; ``gopher_pass`` conjoins all five. Everything is
    array-expression algebra over the whitespace tokens — no UDF, no
    shuffle, whole-stage codegen; at 100 TB this pass is scan-bound.
    Thresholds are the paper's defaults scaled to this corpus's short
    synthetic docs (``min_words`` 40 vs the paper's 50).
    """
    m = _gopher_metrics(text_col)
    checks = gopher_pass_col(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        min_stop_hits=min_stop_hits,
    )
    return df.select(
        F.col(id_col),
        m["n_words"].cast("long").alias("n_words"),
        F.round(m["mean_word_len"], 8).alias("mean_word_len"),
        F.round(m["symbol_ratio"], 8).alias("symbol_word_ratio"),
        F.round(m["alpha_ratio"], 8).alias("alpha_word_ratio"),
        m["stop_hits"].cast("long").alias("stop_hits"),
        checks.alias("gopher_pass"),
    )


def _gopher_metrics(text_col: str) -> dict:
    """The five Gopher per-document metrics as Column expressions
    (shared by :func:`gopher_quality` and :func:`gopher_pass_col` so
    the projection form and the label-column form cannot drift).
    Duplicated subtrees across callers are CSE'd at codegen."""
    c = F.col(text_col)
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    # total token chars == trimmed text minus ALL whitespace: tokens are
    # exactly the non-whitespace runs (length-0 edge tokens add 0), so
    # this equals the old aggregate(transform(toks, length)) fold value
    # for every input incl. NULL/empty — but with no lambda HOFs. Two
    # nested lambda expressions here (duplicated again by the
    # mean-word-len double comparison in gopher_pass_col) dominated
    # Catalyst analysis/optimization of every consumer plan: the NB
    # label's localCheckpoint wrap alone measured 1.4-3.6 s of pure
    # driver planning at r13 (guide §7.3 driver thread dumps showed
    # UnresolvedNamedLambdaVariable/TreeNode.containsChild hot).
    sum_len = F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("long")
    mean_word_len = F.when(n_words > 0, sum_len.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    n_hash = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(c, F.lit("[.][.][.]"), F.lit(0)))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0, n_alpha.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_ratio": alpha_ratio,
        "stop_hits": stop_hits,
    }


def gopher_pass_col(
    text_col: str = "text",
    min_words: int = 40,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The :func:`gopher_quality` pass flag as a single boolean Column
    — the weak-label form consumed by the trained quality classifier
    (``operators/quality_nb.py``): heuristic labels in, generalizing
    classifier out, the GPT-3/CCNet quality-filter recipe."""
    m = _gopher_metrics(text_col)
    return (
        (m["n_words"] >= min_words)
        & (m["n_words"] <= max_words)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
        & (m["symbol_ratio"] <= max_symbol_word_ratio)
        & (m["alpha_ratio"] >= min_alpha_word_ratio)
        & (m["stop_hits"] >= min_stop_hits)
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats projection used by the quality/filter stage."""
    return df.select(
        F.col(id_col),
        char_count(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        quality_score(text_col).alias("quality_score"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the "too compressible"
    quality signal (boilerplate/templated/repetitive text compresses
    far below natural prose; corpus-filtering recipes cut the low
    tail). Returns ``(id, n_bytes, n_compressed, compression_ratio)``
    with ratio = compressed/raw bytes (NULL for empty/NULL text).

    Arrow-batched pandas UDF (zlib is C-speed; the per-row Python cost
    is the .map dispatch, amortized over Arrow batches). Deterministic
    for a fixed zlib level and version — no cross-engine SQL oracle
    exists (DuckDB ships no zlib), so this is pytest-pinned rather
    than driver-oracled.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _zlib_fn(s):
        import zlib

        def one(t):
            if t is None:
                return (None, None)
            b = t.encode("utf-8")
            return (len(b), len(zlib.compress(b, level)))

        pairs = s.map(one)
        return pd.DataFrame(
            {"n_bytes": pairs.str[0], "n_compressed": pairs.str[1]}
        ).astype({"n_bytes": "Int64", "n_compressed": "Int64"})

    # real type objects, not strings: this module runs under
    # `from __future__ import annotations`, which would stringify inline
    # hints and break pandas_udf's Series→DataFrame eval-type inference
    _zlib_fn.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    _zlib = pandas_udf(_zlib_fn, "struct<n_bytes: long, n_compressed: long>")

    z = F.col("__z")
    return (
        df.withColumn("__z", _zlib(F.col(text_col)))
        .select(
            F.col(id_col),
            z["n_bytes"].alias("n_bytes"),
            z["n_compressed"].alias("n_compressed"),
            F.when(
                z["n_bytes"] > 0,
                z["n_compressed"].cast("double") / z["n_bytes"].cast("double"),
            ).alias("compression_ratio"),
        )
    )
