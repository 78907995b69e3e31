"""Tests for scripts/gen_sf.py — the key-shifted replication generator
behind the >sf0.1 scale-proofing runs.  If the generator broke FK
integrity or schema fidelity, every sweep/bench number taken on its
output would be measuring a different workload."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("gen") / "sf2x")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_sf.py"),
         "--src", SRC, "--dst", dst, "--mult", "2"],
        check=True, capture_output=True,
    )
    return dst


def test_row_counts_and_schema(gen_dir):
    con = duckdb.connect()
    for t in TABLES:
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')").fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{gen_dir}/{t}.parquet')").fetchone()[0]
        mult = 1 if t in ("region", "nation") else 2
        assert n_dst == mult * n_src, t
        t_src = con.execute(f"DESCRIBE FROM read_parquet('{SRC}/{t}.parquet')").fetchall()
        t_dst = con.execute(f"DESCRIBE FROM read_parquet('{gen_dir}/{t}.parquet')").fetchall()
        assert [(c[0], c[1]) for c in t_src] == [(c[0], c[1]) for c in t_dst], t


def test_fk_integrity(gen_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{gen_dir}/{t}.parquet')")
    for sql in (
        "SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
        "SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
        "SELECT count(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL",
        "SELECT count(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL",
        "SELECT count(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL",
    ):
        assert con.execute(sql).fetchone()[0] == 0, sql


def test_keys_disjoint_and_text_rewritten(gen_dir):
    con = duckdb.connect()
    # copy keys are shifted into a disjoint range
    lo, hi = con.execute(
        f"SELECT min(doc_id), max(doc_id) FROM read_parquet('{gen_dir}/documents.parquet')"
    ).fetchone()
    assert lo >= 0 and hi >= 100_000_000
    # primary keys stay unique
    for t, k in (("documents", "doc_id"), ("orders", "o_orderkey"),
                 ("customer", "c_custkey"), ("embeddings", "vec_id")):
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {k}) FROM read_parquet('{gen_dir}/{t}.parquet')"
        ).fetchone()
        assert n == d, t
    # copy-i text shares no tokens with the original (suffixed), so the
    # near-dup workload grows linearly, not quadratically
    n_shared = con.execute(f"""
        WITH d AS (SELECT doc_id, text FROM read_parquet('{gen_dir}/documents.parquet')),
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM d)
        SELECT count(*) FROM toks a JOIN toks b
        ON a.t = b.t AND a.doc_id + 100000000 = b.doc_id
        WHERE length(a.t) > 0
    """).fetchone()[0]
    assert n_shared == 0
    # n_chars recomputed to match rewritten text
    bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{gen_dir}/documents.parquet') "
        "WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_embedding_rotation_preserves_norm(gen_dir):
    con = duckdb.connect()
    drift = con.execute(f"""
        WITH e AS (SELECT vec_id, embedding FROM read_parquet('{gen_dir}/embeddings.parquet'))
        SELECT max(abs(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     - sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))))
        FROM e a JOIN e b ON a.vec_id + 100000000 = b.vec_id
    """).fetchone()[0]
    assert drift < 1e-9


def test_deterministic(gen_dir, tmp_path):
    dst2 = str(tmp_path / "again")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_sf.py"),
         "--src", SRC, "--dst", dst2, "--mult", "2"],
        check=True, capture_output=True,
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem"):
        diff = con.execute(f"""
            SELECT count(*) FROM (
              (FROM read_parquet('{gen_dir}/{t}.parquet') EXCEPT FROM read_parquet('{dst2}/{t}.parquet'))
              UNION ALL
              (FROM read_parquet('{dst2}/{t}.parquet') EXCEPT FROM read_parquet('{gen_dir}/{t}.parquet'))
            )
        """).fetchone()[0]
        assert diff == 0, t
