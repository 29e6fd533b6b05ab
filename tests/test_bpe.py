"""BPE tokenizer training (operators/bpe.py): the distributed trainer
must match a straightforward single-node reference implementation
merge-for-merge (counts, tie-breaks, early stop), and tokenize() must
reproduce end-of-training symbol states on the training corpus."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators.bpe import (
    END_OF_WORD,
    BpeTokenizer,
    bpe_train,
)


def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Single-node reference BPE (Sennrich alg. 1): word-freq table,
    per round count adjacent pairs, merge the (count desc, pair asc)
    best greedily left-to-right non-overlapping."""
    wf = Counter(w for t in texts for w in t.split())
    words = {w: tuple(list(w) + [END_OF_WORD]) for w in wf}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, a + b, cnt))
        new_words = {}
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_words[w] = tuple(out)
        words = new_words
    return merges, words, wf


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the the the the a a an an",
    "aaaa aaa aa aaaa",  # overlap chains exercise the greedy fold
]


def test_bpe_train_matches_reference(spark):
    """Merge-for-merge equality with the single-node reference on a
    corpus with ties and overlapping-pair chains, at two budgets."""
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])
    for k in (5, 30):
        got = [
            tuple(r)
            for r in bpe_train(df, num_merges=k).orderBy("rank").collect()
        ]
        want, _, _ = _ref_bpe(CORPUS, k)
        assert got == want, f"k={k}: {got} != {want}"


def test_bpe_train_early_stop_and_determinism(spark):
    """No pair reaches min_pair_count twice -> training stops early;
    repeated runs are identical (lexicographic tie-breaks)."""
    df = spark.createDataFrame([Row(doc_id=0, text="ab cd ef")])
    # every pair occurs once -> zero merges at the default threshold
    assert bpe_train(df, num_merges=10).count() == 0
    big = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )
    a = [tuple(r) for r in bpe_train(big, num_merges=12).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_train(big, num_merges=12).orderBy("rank").collect()]
    assert a == b and len(a) > 0


def test_bpe_tokenizer_artifact_and_replay(spark, tmp_path):
    """(a) tokenize() on the training corpus reproduces the reference
    trainer's end-of-training symbol state per word; (b) unseen words
    segment deterministically under the frozen merges; (c) meta is the
    commit marker (crash discipline)."""
    import shutil

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])
    path = str(tmp_path / "bpe")
    tok = BpeTokenizer.fit(df, path, num_merges=20)

    _, ref_words, _ = _ref_bpe(CORPUS, 20)
    got = {
        r.doc_id: r.tokens.split(" ")
        for r in tok.tokenize(df).collect()
    }
    for i, t in enumerate(CORPUS):
        want = [s for w in t.split() for s in ref_words[w]]
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"

    novel = spark.createDataFrame(
        [(99, "lowly newfangled"), (100, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in tok.tokenize(novel).collect()}
    n2 = {
        r.doc_id: r
        for r in BpeTokenizer.load(spark, path).tokenize(novel).collect()
    }
    n1 = rows[99]
    assert (n1.n_tokens, n1.tokens) == (n2[99].n_tokens, n2[99].tokens)
    assert n1.tokens.endswith(END_OF_WORD)
    # NULL text segments to zero tokens (the trainer's tokens_col
    # convention), never the literal "None"
    assert rows[100].n_tokens == 0 and rows[100].tokens == ""

    shutil.rmtree(tok._meta_path)
    assert not BpeTokenizer(spark, path).exists()
    with pytest.raises(FileNotFoundError):
        BpeTokenizer.load(spark, path)


def test_bpe_merge_fold_overlap_semantics(spark):
    """The JVM fold implements greedy left-to-right NON-overlapping
    replacement: (a,a) over 'aaaa' gives 'aa aa', over 'aaa' gives
    'aa a' (never the overlapping 'a aa' / 'aaa')."""
    from dataeng_azure_spotify_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame(
        [(list("aaaa"),), (list("aaa"),), (list("aba"),)], "syms array<string>"
    )
    got = [
        r.m
        for r in df.select(
            _merge_fold(F.col("syms"), "a", "a", "aa").alias("m")
        ).collect()
    ]
    assert got == [["aa", "aa"], ["aa", "a"], ["a", "b", "a"]]


def test_bpe_whitespace_edge_semantics(spark, tmp_path):
    """(a) text with leading/trailing newlines/tabs (which tokens_col's
    ASCII trim does not strip) trains NO merges involving the empty
    string; (b) tokenize splits words exactly like the trainer — ASCII
    whitespace only, so an NBSP-joined word stays one word on both
    sides; (c) a loaded tokenizer defaults to the text column it was
    fit on (persisted meta)."""
    texts = ["low low low\n", "\tlow lower\n", "low joined low joined"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, body string"
    )
    path = str(tmp_path / "bpe_ws")
    tok = BpeTokenizer.fit(df, path, num_merges=10, text_col="body")
    merges = tok.merges().collect()
    assert merges, "expected at least one merge"
    assert all(r["left"] != "" and r["right"] != "" for r in merges)

    # (b)+(c): tokenize picks up text_col='body' from meta; the NBSP
    # word is segmented as ONE trained word (char-split + </w>), not two
    out = {r.doc_id: r for r in BpeTokenizer.load(spark, path).tokenize(df).collect()}
    nb = out[2].tokens.split(" ")
    # 'low joined' was a training word: its symbols contain the
    # NBSP inside, and the word count is 2 (not 4)
    assert sum(1 for s in nb if s.endswith(END_OF_WORD) or s == END_OF_WORD) >= 1
    assert " " in out[2].tokens


from tests.test_unigram import UNICODE_CORPORA


@pytest.mark.parametrize("script", sorted(UNICODE_CORPORA))
def test_bpe_unicode_scripts_reconstruction_and_replay(
    spark, tmp_path, script
):
    """The BPE twin of the unigram Unicode harness (same shared
    multi-script corpora): (a) per-document tokens concatenate — with
    the </w> markers stripped — back to the whitespace-normalized
    text; (b) n_tokens equals the token count; (c) tokenize through
    the RELOADED stored merge table is row-identical to the fitted
    instance; (d) at least one learned merge is multi-char (beyond
    the char+marker base)."""
    corpus = UNICODE_CORPORA[script]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    path = str(tmp_path / f"bpe_{script}")
    tok = BpeTokenizer.fit(df, path, num_merges=12, min_pair_count=2)
    got = sorted(map(tuple, tok.tokenize(df).collect()))
    replay = sorted(
        map(tuple, BpeTokenizer.load(spark, path).tokenize(df).collect())
    )
    assert got == replay, f"{script}: stored-artifact replay diverged"
    by_id = {t[0]: t for t in got}
    for i, text in enumerate(corpus):
        _id, n_tokens, tokens = by_id[i]
        tlist = tokens.split(" ") if tokens else []
        assert n_tokens == len(tlist)
        rebuilt = "".join(tlist).replace(END_OF_WORD, "")
        assert rebuilt == "".join(text.split()), (
            f"{script} doc {i}: reconstruction failed"
        )
    merged = [r for r in tok.merges().collect()]
    assert merged, f"{script}: no merges learned"
