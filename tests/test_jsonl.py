import os
def test_jsonl_rescue(spark, tmp_path):
    from dataeng_azure_spotify_spark.sources.jsonl import jsonl_documents, read_jsonl, split_rescued
    p = str(tmp_path / "corpus.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n')
        f.write('{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "wiki", "n_chars": 7}\n')
        f.write('this is not json at all\n')
        f.write('{"doc_id": "NOT_A_NUMBER", "text": "bad id"}\n')
        f.write('{"doc_id": 3, "text": "extra field ok", "lang": "en", "source": "web", "unknown_field": 42}\n')
    clean, quarantine = jsonl_documents(spark, p)
    c = {r.doc_id: r for r in clean.collect()}
    assert set(c) == {1, 2, 3}
    assert c[1].n_chars == 11      # filled from text
    assert c[2].n_chars == 7       # source-provided value kept
    q = [r.raw for r in quarantine.collect()]
    assert len(q) == 2
    assert "not json" in q[0] or any("not json" in x for x in q)
    assert any("NOT_A_NUMBER" in x for x in q)
