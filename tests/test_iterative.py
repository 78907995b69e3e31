"""Semantics pins for the iterative-algorithm queries (rows-only in the
driver, so the hard checks live here): BPE merges against an
independent pure-Python reference, k-means against its invariants."""

from __future__ import annotations

from collections import Counter

from oracle_parquet_dumper_spark.operators.iterative import (
    END_MARK,
    K_CLUSTERS,
    KMEANS_INIT_IDS,
    KMEANS_ITERS,
    N_BPE_MERGES,
    emb_kmeans_lloyd,
    text_bpe_merges,
)
from oracle_parquet_dumper_spark.sources import load_table


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE trainer (Sennrich et al. 2016, alg. 1) — plain
    Python, shares no code with the Spark implementation."""
    vocab = {tuple(w) + (END_MARK,): f for w, f in word_freqs.items()}
    merges = []
    for step in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, then lexicographically smallest "left right" string
        # (the Spark side orders by the space-joined pair).
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (left, right), cnt = best
        merges.append((step, left, right, left + right, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_pure_python_reference(spark, smoke_sf_dir):
    docs = load_table(spark, smoke_sf_dir, "documents")
    freqs: Counter = Counter()
    for r in docs.select("text").collect():
        if r.text:
            for w in r.text.lower().split(" "):
                if w:
                    freqs[w] += 1

    expect = _reference_bpe(dict(freqs), N_BPE_MERGES)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in text_bpe_merges(spark, smoke_sf_dir).orderBy("step").collect()
    ]
    assert got == expect
    assert len(got) == N_BPE_MERGES


def test_kmeans_invariants(spark, smoke_sf_dir):
    out = emb_kmeans_lloyd(spark, smoke_sf_dir).collect()
    n_vecs = load_table(spark, smoke_sf_dir, "embeddings").count()
    assert sum(r.n_members for r in out) == n_vecs
    assert {r.cluster for r in out} <= set(range(K_CLUSTERS))
    assert all(r.wcss >= 0 for r in out)
    # Deterministic: a second run returns the identical table.
    again = emb_kmeans_lloyd(spark, smoke_sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_kmeans_wcss_monotone(spark, smoke_sf_dir):
    """Lloyd's algorithm never increases WCSS round over round — run the
    loop manually at 1..KMEANS_ITERS iterations and check the total WCSS
    sequence is non-increasing."""
    import oracle_parquet_dumper_spark.operators.iterative as it

    totals = []
    orig = it.KMEANS_ITERS
    try:
        for iters in range(1, orig + 1):
            it.KMEANS_ITERS = iters
            rows = emb_kmeans_lloyd(spark, smoke_sf_dir).collect()
            totals.append(sum(r.wcss for r in rows))
    finally:
        it.KMEANS_ITERS = orig
    assert all(a >= b - 1e-9 for a, b in zip(totals, totals[1:])), totals
    assert KMEANS_INIT_IDS == (0, 1, 2, 3)


def test_pagerank_mass_conserved(spark, smoke_sf_dir):
    """Sum of ranks over ALL nodes stays ~1 every round (symmetric
    edges -> no dangling mass leaks)."""
    from oracle_parquet_dumper_spark.operators.graph import pagerank, supplier_edges
    from pyspark.sql import functions as F

    ranks = pagerank(supplier_edges(spark, smoke_sf_dir), iters=3)
    total = ranks.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6


def test_pagerank_uniform_on_complete_graph(spark):
    """On a complete graph every node's rank is the uniform 1/n fixed
    point from round 0, so iteration must preserve it exactly."""
    from oracle_parquet_dumper_spark.operators.graph import pagerank

    n = 5
    edges = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(n) if i != j], "src long, dst long"
    )
    got = {r.node: r.pr for r in pagerank(edges, iters=4).collect()}
    assert len(got) == n
    for v in got.values():
        assert abs(v - 1.0 / n) < 1e-9


def test_pagerank_star_center_dominates(spark):
    """Star graph (hub <-> leaves): the hub's rank must exceed every
    leaf's, and leaves are symmetric (equal ranks)."""
    from oracle_parquet_dumper_spark.operators.graph import pagerank

    leaves = range(1, 7)
    sym = [(0, i) for i in leaves] + [(i, 0) for i in leaves]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {r.node: r.pr for r in pagerank(edges, iters=6).collect()}
    hub, leaf_ranks = got[0], [got[i] for i in leaves]
    assert all(hub > l for l in leaf_ranks)
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12
