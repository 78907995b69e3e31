"""Deterministic scale-up fixture generator: sf0.1 -> sfN by key-shifted
replication.

The driver ships fixtures only up to sf0.1 (~17 MB); scale-proofing the
flagship path (VERDICT r3 "Next round" #4) needs at least one decade more.
This script replicates a source fixture M times with disjoint key ranges so
every FK keeps resolving (copy i shifts every entity key by i*OFFSET, and
every referencing column shifts by the same amount), then writes one parquet
file per table in the same layout the driver uses — so `bench.py`,
`scripts/cross_sf_sweep.py`, and the whole registry run on it unchanged via
`SPARK_GRAFT_SF_DIR`.

Two columns get more than a key shift, both to keep the scaled workload
HONEST rather than degenerate:

- `documents.text`: copy i suffixes every whitespace token with a letter
  (`chr('a'+i)`), so copies share no tokens/shingles with the original.
  Naive replication would make every doc a 10-way exact duplicate and the
  LSH/near-dup candidate pair count would grow ~M^2 within each clone group
  — a quadratic workload by construction, not a property of the engine
  under test.  Token-suffixing replicates the ORIGINAL near-dup structure
  once per copy instead (linear growth), which is what a 10x bigger corpus
  actually looks like.  `n_chars` is recomputed.
- `customer.c_name` / `supplier.s_name` / `part.p_name`: copy i gets a
  letter suffix, for the same reason as documents.text — name-identical
  clones would make every name-LSH bucket a 10-way exact-duplicate
  group and the fuzzy-name dedup pair count quadratic by construction
  (at sf1 that was a >1 GiB pair result; with suffixes it grows
  linearly like a real 10x corpus).
- `embeddings.embedding`: copy i rotates the vector by i positions
  (norm-preserving), so brute-force / LSH top-k at sfN doesn't collapse
  into M-way cosine ties that only stress the tie-break, not the search.

region/nation stay fixed-size, like TPC-H dimensions.

Usage:
    python scripts/gen_sf.py [--src /root/testdata/sf0.1] \
        [--dst .localdata/sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# One offset for every entity key space: far above any key in the shipped
# fixtures (max o_orderkey at sf0.1 is ~6e5), so copies never collide even
# at --mult 1000.
OFFSET = 100_000_000

COPY_SQL = {
    "region": "SELECT * FROM src ORDER BY r_regionkey",
    "nation": "SELECT * FROM src ORDER BY n_nationkey",
    "customer": """
        SELECT c_custkey + i*{off} AS c_custkey,
               CASE WHEN i = 0 THEN c_name
                    ELSE c_name || '-' || chr(97 + (i % 26)::INT) END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, c_custkey
    """,
    "supplier": """
        SELECT s_suppkey + i*{off} AS s_suppkey,
               CASE WHEN i = 0 THEN s_name
                    ELSE s_name || '-' || chr(97 + (i % 26)::INT) END AS s_name,
               s_nationkey, s_acctbal
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, s_suppkey
    """,
    "part": """
        SELECT p_partkey + i*{off} AS p_partkey,
               CASE WHEN i = 0 THEN p_name
                    ELSE p_name || '-' || chr(97 + (i % 26)::INT) END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, p_partkey
    """,
    "orders": """
        SELECT o_orderkey + i*{off} AS o_orderkey,
               o_custkey + i*{off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, o_orderkey
    """,
    "lineitem": """
        SELECT l_orderkey + i*{off} AS l_orderkey,
               l_partkey + i*{off} AS l_partkey,
               l_suppkey + i*{off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, l_orderkey, l_linenumber
    """,
    "events": """
        SELECT event_id + i*{off} AS event_id, ts,
               user_id + i*{off} AS user_id, event_type, value, props
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, event_id
    """,
    "documents": r"""
        SELECT doc_id + i*{off} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\S+)',
                                        '\1' || chr(97 + (i % 26)::INT), 'g')
               END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '(\S+)',
                                '\1' || chr(97 + (i % 26)::INT), 'g'))::BIGINT
               END AS n_chars
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, doc_id
    """,
    "embeddings": """
        SELECT vec_id + i*{off} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_concat(
                        embedding[(i % len(embedding)) + 1 :],
                        embedding[1 : (i % len(embedding))])
               END::FLOAT[] AS embedding,
               label
        FROM src CROSS JOIN range({m}) r(i) ORDER BY i, vec_id
    """,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for table, sql in COPY_SQL.items():
        src = os.path.join(args.src, f"{table}.parquet")
        dst = os.path.join(args.dst, f"{table}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW src AS FROM read_parquet('{src}')")
        q = sql.format(m=args.mult, off=OFFSET)
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n_src = con.execute("SELECT count(*) FROM src").fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        # Schema must survive the rewrite bit-exactly or Spark/DuckDB
        # twins would diverge on types, not data.
        t_src = con.execute(f"DESCRIBE FROM read_parquet('{src}')").fetchall()
        t_dst = con.execute(f"DESCRIBE FROM read_parquet('{dst}')").fetchall()
        assert [(c[0], c[1]) for c in t_src] == [(c[0], c[1]) for c in t_dst], (
            table, t_src, t_dst)
        print(f"{table}: {n_src} -> {n_dst} rows")


if __name__ == "__main__":
    main()
