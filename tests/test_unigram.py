"""Unigram-LM tokenizer training (operators/unigram.py): the
distributed hard-EM trainer must match a straightforward single-node
reference implementation piece-for-piece (seeding, the cap cut, every
E/M round, nano scores), and tokenize() must reproduce final-round
E-step segmentations on the training corpus."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from dataeng_azure_spotify_spark.functions.mathx import _COEFFS, LN2
from dataeng_azure_spotify_spark.operators.unigram import (
    SEP,
    UNK_NANO,
    UnigramTokenizer,
    _viterbi,
    unigram_train,
)

# slow tier (r14): EM trainer sweeps — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow


def _pln(x: int) -> float:
    """Independent Python replay of the portable_ln fixed IEEE tree
    (Python floats are IEEE doubles with correctly-rounded + − × ÷,
    so this is bit-equal to both engines)."""
    e = int(x).bit_length() - 1
    m = x / (1 << e)
    t = (m - 1.0) / (m + 1.0)
    u = t * t
    poly = _COEFFS[0]
    for c in _COEFFS[1:]:
        poly = c + u * poly
    return e * LN2 + 2.0 * t * (1.0 + u * poly)


def _nano(c: int, tot: int) -> int:
    return int(math.floor((_pln(c) - _pln(tot)) * 1e9 + 0.5))


def _ref_viterbi(word: str, scores: dict, max_len: int) -> list[str]:
    """Independent best-segmentation DP: max score sum, ties to the
    lexicographically smallest SEP-joined path."""
    n = len(word)
    best: list = [None] * (n + 1)
    best[0] = (0, "")
    for i in range(n):
        if best[i] is None:
            continue
        s0, p0 = best[i]
        matched = False
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i : i + ln]
            if piece not in scores:
                continue
            matched = True
            cand = (s0 + scores[piece], (p0 + SEP + piece) if p0 else piece)
            j = i + ln
            if (
                best[j] is None
                or cand[0] > best[j][0]
                or (cand[0] == best[j][0] and cand[1] < best[j][1])
            ):
                best[j] = cand
        if not matched:
            cand = (s0 + UNK_NANO, (p0 + SEP + word[i]) if p0 else word[i])
            if (
                best[i + 1] is None
                or cand[0] > best[i + 1][0]
                or (cand[0] == best[i + 1][0] and cand[1] < best[i + 1][1])
            ):
                best[i + 1] = cand
    return best[n][1].split(SEP)


def _ref_unigram(
    texts, n_iters=2, max_piece_len=4, min_count=2, max_pieces=200
):
    """Single-node reference hard-EM unigram trainer (module docstring
    of operators/unigram.py, re-derived independently)."""
    wf = Counter(w for t in texts for w in t.split())
    subs: Counter = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                subs[w[i : i + ln]] += f
    vocab = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2 and c >= min_count),
        key=lambda pc: (-pc[1], pc[0]),
    )[:max_pieces]
    vocab.update(dict(multi))
    for _ in range(n_iters):
        tot = sum(vocab.values())
        scores = {p: _nano(c, tot) for p, c in vocab.items()}
        usage: Counter = Counter()
        for w, f in wf.items():
            for p in _ref_viterbi(w, scores, max_piece_len):
                usage[p] += f
        vocab = {
            p: (usage[p] if usage[p] > 0 else 1)
            for p in vocab
            if usage[p] > 0 or len(p) == 1
        }
    tot = sum(vocab.values())
    return {p: (c, _nano(c, tot)) for p, c in vocab.items()}, wf


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the the the the a a an an",
    "aaaa aaa aa aaaa",  # overlap chains exercise seeding + Viterbi
]


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )


def test_unigram_train_matches_reference(spark):
    """Piece-for-piece equality (vocab membership, integer counts,
    nano scores) with the single-node reference at 1 and 3 EM rounds,
    with and without a binding cap."""
    df = _df(spark)
    for n_iters, cap in ((1, 10), (3, 200)):
        got = {
            r["piece"]: (r["count"], r["score_nano"])
            for r in unigram_train(
                df, n_iters=n_iters, max_pieces=cap
            ).collect()
        }
        want, _ = _ref_unigram(CORPUS, n_iters=n_iters, max_pieces=cap)
        assert got == want, f"n_iters={n_iters} cap={cap}"


def test_unigram_determinism_and_char_floor(spark):
    """Repeated runs are identical (all tie-breaks total); every
    character of every training word survives every M-step (the
    segmentability floor)."""
    df = _df(spark)
    a = sorted(map(tuple, unigram_train(df, n_iters=2).collect()))
    b = sorted(map(tuple, unigram_train(df, n_iters=2).collect()))
    assert a == b and len(a) > 0
    pieces = {p for p, _, _ in a}
    chars = {c for t in CORPUS for w in t.split() for c in w}
    assert chars <= pieces


def test_viterbi_tie_breaks_on_path_order():
    """An exact score tie between segmentations resolves to the
    lexicographically smallest SEP-joined path: 'a'+'b' (path
    'a\\x1fb') beats 'ab' because SEP sorts below every printable
    char — the same comparison the DuckDB twin's ORDER BY performs.
    The result travels as a piece LIST (the joined string exists only
    inside the comparison)."""
    scores = {"ab": -2, "a": -1, "b": -1}
    assert _viterbi("ab", scores, 2) == ["a", "b"]
    # ... and a genuinely better single piece still wins
    assert _viterbi("ab", {"ab": -1, "a": -1, "b": -1}, 2) == ["ab"]


def test_unigram_sep_containing_words_excluded_not_corrupting(
    spark, tmp_path
):
    """U+001F is NOT whitespace, so a word CAN contain the tie-break
    separator. Such words are excluded from vocabulary learning (both
    engines — binary junk by contract), and tokenize handles them via
    UNK singletons with exact piece accounting (pieces travel as
    lists, so a separator inside a piece cannot fragment the
    protocol)."""
    weird = f"x{SEP}y"
    df = spark.createDataFrame(
        [(0, f"{weird} low low low low"), (1, "low lower")],
        "doc_id long, text string",
    )
    final = unigram_train(df, n_iters=2).collect()
    assert all(SEP not in r["piece"] for r in final)
    # the trainer saw only 'low'/'lower': 'x'/'y' never entered the vocab
    pieces = {r["piece"] for r in final}
    assert "x" not in pieces and "y" not in pieces

    tok = UnigramTokenizer.fit(df, str(tmp_path / "m"), n_iters=1)
    out = {r["doc_id"]: r for r in tok.tokenize(df).collect()}
    got = out[0]["pieces"].split(" ")
    # the weird word's 3 chars all fall back to UNK singletons
    # (including the separator char itself, intact as a piece)
    assert got[:3] == ["x", SEP, "y"]
    assert out[0]["n_pieces"] == len(got)


def test_unigram_artifact_and_replay(spark, tmp_path):
    """(a) tokenize() on the training corpus reproduces the reference
    trainer's final-scores Viterbi per word; (b) unseen characters
    fall back to singleton pieces (UNK) without crashing; (c) NULL
    text yields 0 pieces; (d) meta is the commit marker."""
    import shutil

    df = _df(spark)
    path = str(tmp_path / "uni")
    tok = UnigramTokenizer.fit(df, path, n_iters=2)

    final, wf = _ref_unigram(CORPUS, n_iters=2)
    scores = {p: s for p, (_, s) in final.items()}
    got = {r["doc_id"]: r for r in tok.tokenize(df).collect()}
    for i, t in enumerate(CORPUS):
        want = [p for w in t.split() for p in _ref_viterbi(w, scores, 4)]
        assert got[i]["pieces"].split(" ") == want, f"doc {i}"
        assert got[i]["n_pieces"] == len(want)

    novel = spark.createDataFrame(
        [(99, "low Zq low"), (100, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in UnigramTokenizer.load(spark, path)
        .tokenize(novel)
        .collect()
    }
    # 'Z' and 'q'... 'q' may be unseen; both unseen chars surface as
    # singleton pieces and the known words segment normally
    assert rows[99]["n_pieces"] >= 4
    assert "Z" in rows[99]["pieces"].split(" ")
    assert rows[100]["n_pieces"] == 0 and rows[100]["pieces"] == ""

    shutil.rmtree(tok._meta_path)
    assert not UnigramTokenizer(spark, path).exists()
    with pytest.raises(FileNotFoundError):
        UnigramTokenizer.load(spark, path)


def test_unigram_degenerate_corpora(spark, tmp_path):
    """Empty / all-NULL / blank corpora fit to an EMPTY piece table
    without error, and the resulting tokenizer segments everything as
    UNK singletons (no crash, exact counts)."""
    empty = spark.createDataFrame(
        [(1, None), (2, "   ")], "doc_id long, text string"
    )
    assert unigram_train(empty, n_iters=2).count() == 0
    tok = UnigramTokenizer.fit(empty, str(tmp_path / "e"), n_iters=1)
    out = {
        r["doc_id"]: r
        for r in tok.tokenize(
            spark.createDataFrame([(7, "ab c")], "doc_id long, text string")
        ).collect()
    }
    assert out[7]["n_pieces"] == 3  # a, b, c — all UNK singletons
    assert out[7]["pieces"] == "a b c"


def test_viterbi_equals_bruteforce_on_random_vocabs():
    """Property: the DP equals brute-force enumeration of ALL
    segmentations under the documented total order (score DESC,
    SEP-joined path ASC) — including exact ties and UNK fallback
    positions. This is the composition claim the DuckDB twin's window
    argmax relies on, attacked with random small vocabularies."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "abc"

    def all_segmentations(word, scores, max_len):
        if not word:
            return [(0, "", [])]
        out = []
        n = len(word)
        for ln in range(1, min(max_len, n) + 1):
            piece = word[:ln]
            sc = scores.get(piece)
            if sc is None:
                continue
            for s, p, l in all_segmentations(word[ln:], scores, max_len):
                out.append(
                    (sc + s, piece + (SEP + p if p else ""), [piece] + l)
                )
        if not out and word:
            # UNK fallback fires only when nothing matches at pos 0
            piece = word[0]
            for s, p, l in all_segmentations(word[1:], scores, max_len):
                out.append(
                    (
                        UNK_NANO + s,
                        piece + (SEP + p if p else ""),
                        [piece] + l,
                    )
                )
        return out

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet=alphabet, min_size=1, max_size=7),
        pieces=st.dictionaries(
            st.text(alphabet=alphabet, min_size=1, max_size=3),
            st.integers(min_value=-10, max_value=-1),
            min_size=0,
            max_size=8,
        ),
    )
    def check(word, pieces):
        got = _viterbi(word, pieces, 3)
        cands = all_segmentations(word, pieces, 3)
        assert cands, "every word has at least the UNK chain"
        best = min(cands, key=lambda t: (-t[0], t[1]))
        assert got == best[2], (word, pieces, got, best)

    check()


def test_unigram_tokenize_oracle_covers_unk_and_sep_words(
    spark, tmp_path
):
    """The DuckDB tokenize twin must reproduce the operator on the
    inputs the trainer EXCLUDES: separator-containing words, unseen
    characters, NULL and blank text — via its UNK edge (one char,
    UNK_NANO, exactly where no vocabulary piece matches) and the
    recursion-carried piece count/display (splitting the tie-break
    path would miscount when a piece IS the separator)."""
    import os

    import duckdb

    import __spark_entry__ as entrymod

    rows = [
        (0, f"x{SEP}y low low low low lower Zq"),
        (1, "low lower lowest wide wider"),
        (2, None),
        (3, "  "),
    ]
    d = str(tmp_path)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pq = os.path.join(d, "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)

    params = dict(n_iters=2, max_piece_len=4, min_count=2, max_pieces=120)
    tok = UnigramTokenizer.fit(
        spark.read.parquet(pq), os.path.join(d, "model"), **params
    )
    got = sorted(
        tuple(r) for r in tok.tokenize(spark.read.parquet(pq)).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrymod._unigram_tokenize_oracle(**params)
        ).fetchall()
    )
    assert got == want


def test_unigram_oracle_long_word_guard_raises(spark, tmp_path):
    """The recursive-CTE twins enumerate ~1.93^len paths per word, so
    one long unbroken token (a URL, a hash) would silently blow the
    parity sweep up. Words over UNIGRAM_ORACLE_MAX_WORD_LEN must raise
    a loud DuckDB error NAMING the word; words at the limit pass."""
    import os

    import duckdb
    import pytest

    import __spark_entry__ as entrymod

    n = entrymod.UNIGRAM_ORACLE_MAX_WORD_LEN
    ok_word = "a" * n
    bad_word = "b" * (n + 1)
    params = dict(n_iters=1, max_piece_len=4, min_count=2, max_pieces=20)

    def corpus_con(text):
        d = os.path.join(str(tmp_path), text[:2])
        docs = spark.createDataFrame(
            [(0, text), (1, "low lower low")], "doc_id long, text string"
        )
        pq = os.path.join(d, "documents.parquet")
        docs.coalesce(1).write.mode("overwrite").parquet(pq)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{pq}/*.parquet')"
        )
        return con

    con = corpus_con(ok_word)
    assert con.execute(entrymod._unigram_vocab_oracle(**params)).fetchall()
    assert con.execute(
        entrymod._unigram_tokenize_oracle(**params)
    ).fetchall()

    con = corpus_con(bad_word)
    with pytest.raises(duckdb.Error, match=bad_word):
        con.execute(entrymod._unigram_vocab_oracle(**params)).fetchall()
    with pytest.raises(duckdb.Error, match=bad_word):
        con.execute(entrymod._unigram_tokenize_oracle(**params)).fetchall()


#: Multi-script corpora for the Unicode parity harness (the r9 verdict
#: item: U+001F and UNK edges were caught by review, not by a harness —
#: pin non-Latin structure explicitly). Each corpus repeats words so
#: the trainer learns real multi-char pieces; all words <= 16 chars
#: (code points). Python string ops are code-point based, so pieces MAY
#: split inside a grapheme cluster (combining marks, ZWJ emoji) — the
#: invariants below are structural (reconstruction + artifact-replay
#: determinism), not grapheme-aware.
UNICODE_CORPORA = {
    "latin_marks": [  # combining acute/diaeresis (NFD-style)
        "café café naïve résumé",
        "cafés naïve naïveté café",
        "résumé résumés café",
    ],
    "cjk": [
        "深度学习 模型训练 语料清洗 去重",
        "深度学习 语料清洗 模型训练 模型训练",
        "去重 深度学习 语料 清洗 训练",
    ],
    "emoji_zwj": [  # ZWJ sequences + skin-tone modifiers
        "\U0001f642\U0001f642 \U0001f44d\U0001f3fd \U0001f469‍\U0001f52c",
        "\U0001f680\U0001f680\U0001f680 \U0001f469‍\U0001f52c \U0001f642\U0001f642",
        "\U0001f44d\U0001f3fd \U0001f44d \U0001f680\U0001f680\U0001f680",
    ],
    "cyrillic_arabic": [  # incl. RTL text
        "данные очистка данные مرحبا",
        "مرحبا بك очистка данные",
        "очистка بك بك данные",
    ],
}


@pytest.mark.parametrize("script", sorted(UNICODE_CORPORA))
def test_unigram_unicode_scripts_reconstruction_and_replay(
    spark, tmp_path, script
):
    """Unicode structural pins per script: (a) every document's pieces
    concatenate back to its whitespace-normalized text (no piece ever
    drops/duplicates a code point, in any script); (b) n_pieces equals
    the piece count; (c) tokenize through the RELOADED stored artifact
    is row-identical to the fitted instance (engine-internal
    determinism — the stored score table reproduces the in-memory
    one); (d) the vocabulary contains at least one multi-char piece
    (the trainer actually learned something beyond char fallback)."""
    corpus = UNICODE_CORPORA[script]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    path = str(tmp_path / f"uni_{script}")
    tok = UnigramTokenizer.fit(
        df, path, n_iters=2, max_piece_len=4, min_count=2, max_pieces=64
    )
    got = sorted(map(tuple, tok.tokenize(df).collect()))
    replay = sorted(
        map(tuple, UnigramTokenizer.load(spark, path).tokenize(df).collect())
    )
    assert got == replay, f"{script}: stored-artifact replay diverged"
    by_id = {t[0]: t for t in got}
    for i, text in enumerate(corpus):
        _id, n_pieces, pieces = by_id[i]
        plist = pieces.split(" ") if pieces else []
        assert n_pieces == len(plist)
        assert "".join(plist) == "".join(text.split()), (
            f"{script} doc {i}: reconstruction failed"
        )
    assert any(
        len(r["piece"]) >= 2 for r in tok.pieces().collect()
    ), f"{script}: no multi-char piece learned"
