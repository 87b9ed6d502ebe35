"""Generate a deterministic sf1 (10x sf0.1) dataset for local scale
benchmarking, into .localdata/sf1/ (the driver's /root/testdata is
read-only and ships no sf1).

Construction: 10 key-shifted copies of every scaling sf0.1 table, with
offsets consistent per key domain so all join relationships hold in
every copy (copy i of lineitem references copy i of orders/part/
supplier). region/nation stay fixed (dimension tables).

Copies must NOT be near-duplicates of each other, or every pair-family
query (ngram_jaccard, minhash/simhash bands, embedding candidates)
degenerates into 10x-sized cliques and measures data-design blowup
instead of plan scaling — pair OUTPUT is quadratic in clique size, so
correlated copies turn a 10x corpus into a 100x workload. Document
copies therefore bijectively RENAME every token with a per-copy suffix
(original word order kept): each copy is an independent corpus with
the base's exact within-copy df/Jaccard/simhash structure and zero
cross-copy shingle OR token-set collisions. Copies of embeddings get
independent hash-derived pseudo-random vectors with the same component
magnitude profile (cross-copy cosine concentrates near 0; the residual
tail above the 0.4 pair threshold is the iid-background rate the BASE
vectors already exhibit — see SCALE.md's sf1 notes).

Deterministic: pure SQL over the seed=42 driver tables, no randomness.
"""

from __future__ import annotations

import os

import sys

import duckdb

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# usage: make_sf1.py [copies] [name] — e.g. `make_sf1.py 100 sf10`
# builds copies x sf0.1 into .localdata/<name> (defaults: 10, sf1)
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = os.path.join(_REPO, ".localdata", sys.argv[2] if len(sys.argv) > 2 else "sf1")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    # per-domain offsets (max+1 of the base table)
    off = {
        k: con.sql(q).fetchone()[0] + 1
        for k, q in {
            "cust": "SELECT max(c_custkey) FROM customer",
            "supp": "SELECT max(s_suppkey) FROM supplier",
            "part": "SELECT max(p_partkey) FROM part",
            "order": "SELECT max(o_orderkey) FROM orders",
            "event": "SELECT max(event_id) FROM events",
            "user": "SELECT max(user_id) FROM events",
            "doc": "SELECT max(doc_id) FROM documents",
            "vec": "SELECT max(vec_id) FROM embeddings",
        }.items()
    }
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

    def emit(name: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit(
        "customer",
        f"SELECT c_custkey + i*{off['cust']} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM customer CROSS JOIN copies",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + i*{off['supp']} AS s_suppkey, s_name, s_nationkey,"
        " s_acctbal FROM supplier CROSS JOIN copies",
    )
    emit(
        "part",
        f"SELECT p_partkey + i*{off['part']} AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice FROM part CROSS JOIN copies",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + i*{off['order']} AS o_orderkey,"
        f" o_custkey + i*{off['cust']} AS o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority FROM orders CROSS JOIN copies",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + i*{off['order']} AS l_orderkey,"
        f" l_partkey + i*{off['part']} AS l_partkey,"
        f" l_suppkey + i*{off['supp']} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM lineitem CROSS JOIN copies",
    )
    emit(
        "events",
        f"SELECT event_id + i*{off['event']} AS event_id, ts,"
        f" user_id + i*{off['user']} AS user_id, event_type, value, props"
        " FROM events CROSS JOIN copies",
    )
    # Bijectively rename every token with a per-copy suffix, keeping the
    # original word order (copy 0 stays untouched).  A first attempt
    # hash-SHUFFLED word order: that decorrelates 3-gram shingles but
    # NOT unigram token sets, so order-independent signatures (simhash
    # signs the distinct-token set) were byte-identical across copies —
    # the base corpus's 248-doc identical-token-set groups became
    # 2,480-doc exact-collision cliques and simhash_near_pairs inflated
    # 149x (pair OUTPUT is quadratic in clique size).  Renaming makes
    # each copy an independent corpus with the base's exact within-copy
    # df/Jaccard/simhash structure and zero cross-copy collisions:
    # shingle pair-space (sum of df^2) scales 10x instead of 90x.
    emit(
        "documents",
        f"""
SELECT doc_id, text, lang, source,
  CASE WHEN i = 0 THEN n_chars ELSE length(text) END AS n_chars
FROM (
  SELECT doc_id + i*{off['doc']} AS doc_id, i,
    CASE WHEN i = 0 THEN text
         ELSE array_to_string(
           list_transform(string_split(text, ' '), w -> w || '~' || i), ' ')
    END AS text,
    lang, source, n_chars
  FROM documents CROSS JOIN copies
)
""",
    )
    # copy 0 keeps the real vectors; copies 1..9 get independent
    # hash-derived uniform vectors in [-0.2, 0.2] (the base components
    # average |x| ~= 0.1), so cross-copy cosine stays ~0.1
    emit(
        "embeddings",
        f"""
SELECT vec_id + i*{off['vec']} AS vec_id,
  CASE WHEN i = 0 THEN embedding
       ELSE list_transform(embedding, (x, j) ->
         CAST(((hash((vec_id + i*{off['vec']}) * 64 + j) % 4001) / 4000.0 - 0.5) * 0.4
              AS FLOAT))
  END AS embedding,
  label
FROM embeddings CROSS JOIN copies
""",
    )


if __name__ == "__main__":
    main()
