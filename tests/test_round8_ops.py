"""Planted-math tests for round-8 operators and fixes: known inputs
with hand-computable answers, independent of the DuckDB differential
(which checks Spark==DuckDB but not Spark==math)."""

from __future__ import annotations


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_tokenizer_fertility_planted_two_languages(spark, tmp_path):
    """Hand-computable fertility: 'en' has 2 docs, 3 tokens, 10 bytes
    ("ab cd" = 2 tok / 5 bytes, "efghi" = 1 tok / 5 bytes) =>
    fertility_milli = 3000 div 10 = 300, bytes_per_tok_milli = 10000
    div 3 = 3333.  'zz' is a single whitespace-only doc (1 byte, 0
    tokens): n_tok = 0 must yield NULL ratios, not a division error
    (ADVICE r7)."""
    rows = [
        (1, "ab cd", "en", "s1", 5),
        (2, "efghi", "en", "s1", 5),
        (3, " ", "zz", "s1", 1),
        (4, "", "en", "s1", 0),  # empty text: excluded by the length(>0) filter
    ]
    _write_documents(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.text import text_tokenizer_fertility

    out = {r["lang"]: r for r in text_tokenizer_fertility(spark, str(tmp_path)).collect()}
    assert set(out) == {"en", "zz"}
    en = out["en"]
    assert (en.n_docs, en.n_tok, en.n_bytes) == (2, 3, 10)
    assert en.fertility_milli == 300
    assert en.bytes_per_tok_milli == 3333
    zz = out["zz"]
    assert (zz.n_docs, zz.n_tok, zz.n_bytes) == (1, 0, 1)
    assert zz.fertility_milli == 0  # 0 tokens / 1 byte
    assert zz.bytes_per_tok_milli is None  # div-by-zero guarded to NULL


def test_pagerank_bucketed_matches_checkpointed(spark, sf_dir):
    """graph_pagerank_bucketed must return bit-identical ranks to
    graph_pagerank — same integer rank-mass recurrence, different
    physical storage of the round-invariant edge relation."""
    from oracle_parquet_dumper_spark.plans import REGISTRY

    a = [tuple(r) for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()]
    b = [
        tuple(r)
        for r in REGISTRY["graph_pagerank_bucketed"].fn(spark, sf_dir).collect()
    ]
    assert a == b and len(a) > 0
