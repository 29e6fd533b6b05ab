"""Deterministic synthetic-corpus generator as a Spark 4 Python
DataSource (``spark.read.format("docgen")``).

Scale testing the curation tier needs corpora far bigger than any
fixture worth storing: this source materializes documents
executor-side — no files, no driver loop — with each input partition
generating its own id range, so ``.option("n", 10**9)`` is just 10⁹
rows of work spread over ``parts`` tasks. Content is a pure function
of ``(seed, doc_id)`` (splitmix64-style mixing, no RNG state), so any
two reads — any cluster, any partitioning — produce the SAME corpus:
dedup/sampling tests can assert exact results against a re-read.

Registration is per-session::

    from dataeng_azure_spotify_spark.sources.docgen import register
    register(spark)
    docs = (spark.read.format("docgen")
            .option("n", 100_000).option("parts", 32).load())

Arrow note: rows stream back as plain tuples (the portable baseline of
the DataSource API); generation itself is vectorized per partition.
A million-row partition yields in ~1s — the scan parallelism, not the
Python row loop, is the knob that matters at size.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

#: tiny vocabulary mirroring the fixture corpus's shape
_WORDS = (
    "scan column window order sort join hash row batch table value part "
    "key agg slow fast merge spark line query data small big stream group "
    "filter vector customer the a"
).split()
_LANGS = ("en", "de", "fr", "es")
_SOURCES = ("web", "wiki", "code", "news")


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic 64-bit avalanche."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _doc(seed: int, doc_id: int, vocab: int = 0) -> tuple:
    h = _mix(seed ^ _mix(doc_id))
    n_words = 20 + (h & 63)
    words = []
    w = h
    if vocab:
        # synthetic N-word vocabulary ("w0".."w<N-1>"): with vocab sizes
        # ≫ the 29 builtin words, unrelated documents share almost no
        # tokens — the regime where fingerprint/shingle methods behave
        # like they do on real corpora (the builtin vocabulary makes
        # every doc look alike in token space, which is useful for
        # heavy-hitter stress but pathological for near-dup candidates)
        for _ in range(n_words):
            w = _mix(w)
            words.append("w%d" % (w % vocab))
    else:
        for _ in range(n_words):
            w = _mix(w)
            words.append(_WORDS[w % len(_WORDS)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[(h >> 8) % len(_LANGS)],
        _SOURCES[(h >> 16) % len(_SOURCES)],
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int, vocab: int) -> None:
        self.start, self.end, self.seed = start, end, seed
        self.vocab = vocab


class _DocGenReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.seed = int(options.get("seed", 7))
        self.vocab = int(options.get("vocab", 0))
        if self.n < 0 or self.parts <= 0:
            raise ValueError("docgen: need n >= 0 and parts > 0")

    def partitions(self) -> Sequence[InputPartition]:
        if self.n == 0:
            return [_RangePartition(0, 0, self.seed, self.vocab)]
        step = -(-self.n // self.parts)  # ceil-div: ranges cover [0, n)
        return [
            _RangePartition(lo, min(lo + step, self.n), self.seed, self.vocab)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(partition.seed, doc_id, partition.vocab)


class DocGenDataSource(DataSource):
    """``format("docgen")`` — options: n, parts, seed, vocab."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _DocGenReader:
        return _DocGenReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(DocGenDataSource)


def near_dup_corpus(
    spark,
    n: int,
    vocab: int = 50_000,
    dup_every: int = 10,
    chain_every: int = 50,
    chain_len: int = 4,
    seed: int = 11,
    parts: int = 16,
):
    """Corpus with KNOWN near-duplicate structure, at any scale.

    ``n`` base docs from the docgen source (``vocab``-word synthetic
    vocabulary so unrelated docs share ~no tokens — the realistic
    regime for shingle/fingerprint candidate generation), plus:

    - one light mutation (one appended token) of every ``dup_every``-th
      doc at id offset 10⁸ → ``n / dup_every`` guaranteed near-dup
      pairs, linear in n;
    - a mutation CHAIN of length ``chain_len`` off every
      ``chain_every``-th doc (k appended tokens at offset (2+k)·10⁸) →
      connected components whose diameter is fixed by ``chain_len``,
      NOT by corpus size — the structure that separates "CC rounds grow
      with graph diameter" from "CC rounds grow with n".

    Deterministic for fixed arguments. Used by tests/test_scale_stress.py
    and docs/scale_validation.py to validate the dedup tier's candidate
    and convergence growth claims empirically at 10-100× fixture scale.
    """
    from pyspark.sql import functions as F

    register(spark)
    base = (
        spark.read.format("docgen")
        .option("n", n)
        .option("parts", parts)
        .option("seed", seed)
        .option("vocab", vocab)
        .load()
    )
    out = [base]
    out.append(
        base.filter(F.col("doc_id") % dup_every == 0)
        .withColumn("doc_id", F.col("doc_id") + 100_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" w0")))
    )
    for k in range(1, chain_len + 1):
        out.append(
            base.filter(F.col("doc_id") % chain_every == 0)
            .withColumn("doc_id", F.col("doc_id") + (2 + k) * 100_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" w0" * k)))
        )
    df = out[0]
    for d in out[1:]:
        df = df.unionByName(d)
    return df
