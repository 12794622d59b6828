"""Generate larger scale factors from the driver's sf0.1 testdata for
scale-evidence benchmarking (BASELINE.md "sf1" section).

NOT a replacement for the driver data (which is read-only and
authoritative for correctness) — this produces timing-only corpora:

- TPC-H-ish tables: K replicas of sf0.1 with key offsets, preserving
  FK validity and per-key fan-out (so join/shuffle behavior scales
  honestly; dimension tables nation/region stay fixed size).
- documents: fresh vocab-sampled texts per replica (seeded DuckDB
  random), NOT copies — replicating texts verbatim would plant 10x
  cross-replica exact dups and quadratically distort the LSH join.
- embeddings: fresh seeded 64-dim vectors over the same label space.

Usage: python tools/gen_scale.py [K] [out_dir]   (default 10 tmp/sf1)

--zipf mode (BASELINE.md skew section): same corpus, but lineitem's
join key is Zipf-skewed — 50% of line rows are remapped onto 8 real hot
orderkeys with a power-law weight (the hottest key carries ~38% of the
whole table). FK validity is preserved (hot keys are existing orders).
This is the corpus that makes a skew-blind shuffle join degrade to a
straggler task, so the AQE-skew / salted claims are measured, not
argued.  Usage: python tools/gen_scale.py --zipf [K] [out_dir]
(default 10 tmp/sfskew)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

VOCAB = ("batch part spark line column order small sort fast value scan "
         "a hash slow group agg filter query big key window row table "
         "stream merge data join scale plan stage task shuffle disk "
         "memory code node core rack file block page").split()


def gen_vectors_only(k: int, out: str, dims: int = 64) -> None:
    """--vecs mode (round 9, r8 verdict ask #6): an embeddings-ONLY
    corpus for stressing the ANN auto-band knob at vector counts the
    full-table generator would pay 17 GB of unrelated tables for.
    Same seeded-random recipe as the main path. --vecs-hd (round 12)
    generates production-width 768-dim vectors for the int8-verify
    crossover measurement (dims >~ 370 is where the quantized twin's
    exchange cut pays)."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")
    n_vec, n_lab = con.execute(
        f"SELECT count(*), count(DISTINCT label) FROM "
        f"read_parquet('{SRC}/embeddings.parquet')").fetchone()
    con.execute(f"""
        COPY (
          SELECT v.i AS vec_id,
                 list_transform(range({dims}),
                   x -> CAST(random() * 2 - 1 AS FLOAT)) AS embedding,
                 CAST(v.i % {n_lab} AS INT) AS label
          FROM range({n_vec * k}) AS v(i))
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM "
                    f"read_parquet('{out}/embeddings.parquet')"
                    ).fetchone()[0]
    print(f"embeddings: {n} rows x {dims} dims")


def main() -> None:
    # --tables=a,b,c limits generation to those payload tables (the
    # sf30 evidence runs need only events/documents/embeddings; the
    # TPC-H fact tables would pay ~10x the disk for nothing)
    only = None
    for a in list(sys.argv[1:]):
        if a.startswith("--tables="):
            only = set(a.split("=", 1)[1].split(","))
            sys.argv.remove(a)
    args = [a for a in sys.argv[1:]
            if a not in ("--zipf", "--vecs", "--vecs-hd")]
    zipf = "--zipf" in sys.argv[1:]

    def want(t: str) -> bool:
        return only is None or t in only
    if "--vecs" in sys.argv[1:]:
        gen_vectors_only(int(args[0]), args[1])
        return
    if "--vecs-hd" in sys.argv[1:]:
        gen_vectors_only(int(args[0]), args[1],
                         dims=int(args[2]) if len(args) > 2 else 768)
        return
    k = int(args[0]) if args else 10
    out = args[1] if len(args) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tmp",
            "sfskew" if zipf else "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    # fixed-size dimensions: straight copies
    for t in ("nation", "region"):
        if want(t):
            con.execute(f"COPY (SELECT * FROM {src(t)}) TO "
                        f"'{out}/{t}.parquet' (FORMAT PARQUET)")

    # offsets sized to the source key ranges
    n_cust, n_ord, n_part, n_supp = [
        con.execute(f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]
        for t, c in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                     ("part", "p_partkey"), ("supplier", "s_suppkey")]]

    rep = f"range({k}) AS r(i)"
    if want('customer'):
        con.execute(f"""
            COPY (SELECT c_custkey + i * {n_cust} AS c_custkey, c_name,
                         c_nationkey, c_acctbal, c_mktsegment
                  FROM {src('customer')}, {rep})
            TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    if want('supplier'):
        con.execute(f"""
            COPY (SELECT s_suppkey + i * {n_supp} AS s_suppkey, s_name,
                         s_nationkey, s_acctbal
                  FROM {src('supplier')}, {rep})
            TO '{out}/supplier.parquet' (FORMAT PARQUET)""")
    if want('part'):
        con.execute(f"""
            COPY (SELECT p_partkey + i * {n_part} AS p_partkey, p_name,
                         p_brand, p_type, p_size, p_retailprice
                  FROM {src('part')}, {rep})
            TO '{out}/part.parquet' (FORMAT PARQUET)""")
    if want('orders'):
        con.execute(f"""
            COPY (SELECT o_orderkey + i * {n_ord} AS o_orderkey,
                         o_custkey + i * {n_cust} AS o_custkey,
                         o_orderstatus, o_totalprice, o_orderdate,
                         o_orderpriority
                  FROM {src('orders')}, {rep})
            TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    if want('lineitem'):
        if zipf:
            # 8 REAL orderkeys as hot targets (FK validity), power-law
            # weighted: index ~ floor(8 * random^8) puts ~77% of
            # remapped rows on hot_keys[1] (~38% of the whole table on
            # one key)
            hot = [r[0] for r in con.execute(
                f"SELECT o_orderkey FROM {src('orders')} "
                f"ORDER BY o_orderkey LIMIT 8").fetchall()]
            hot_sql = "[" + ", ".join(str(h) for h in hot) + "]"
            key_expr = (
                f"CASE WHEN random() < 0.5 THEN {hot_sql}["
                f"1 + CAST(floor(power(random(), 8) * 8) AS INT)] "
                f"ELSE l_orderkey + i * {n_ord} END")
        else:
            key_expr = f"l_orderkey + i * {n_ord}"
        con.execute(f"""
            COPY (SELECT {key_expr} AS l_orderkey,
                         l_partkey + i * {n_part} AS l_partkey,
                         l_suppkey + i * {n_supp} AS l_suppkey,
                         l_linenumber, l_quantity, l_extendedprice,
                         l_discount, l_tax, l_returnflag, l_linestatus,
                         l_shipdate
                  FROM {src('lineitem')}, {rep})
            TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    if want('documents'):
        # documents: fresh seeded texts, same doc count per replica
        n_docs = con.execute(
            f"SELECT count(*) FROM {src('documents')}").fetchone()[0]
        vocab_sql = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
        con.execute(f"""
            COPY (
              WITH t AS (
                SELECT d.i AS doc_id,
                       list_transform(
                         range(40 + CAST(floor(random() * 21) AS INT)),
                         x -> {vocab_sql}[
                           1 + CAST(floor(random() * {len(VOCAB)})
                               AS INT)])
                         AS words
                FROM range({n_docs * k}) AS d(i))
              SELECT doc_id,
                     list_aggregate(words, 'string_agg', ' ') AS text,
                     ['en','de','fr','zh','he'][1 + doc_id % 5] AS lang,
                     'src' || (doc_id % 7) AS source,
                     len(list_aggregate(words, 'string_agg', ' '))
                       AS n_chars
              FROM t)
            TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    if want('embeddings'):
        # embeddings: fresh seeded vectors, same label space
        n_vec, n_lab = con.execute(
            f"SELECT count(*), count(DISTINCT label) FROM "
            f"{src('embeddings')}").fetchone()
        con.execute(f"""
            COPY (
              SELECT v.i AS vec_id,
                     list_transform(range(64),
                       x -> CAST(random() * 2 - 1 AS FLOAT))
                       AS embedding,
                     CAST(v.i % {n_lab} AS INT) AS label
              FROM range({n_vec * k}) AS v(i))
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    if want('events'):
        # events: replicate with shifted ids. ts is written as
        # epoch-nanos BIGINT — the engine's loader reads the driver's
        # TIMESTAMP(NANOS) files as long (nanosAsLong) and divides by
        # 1000, so a plain INT64 nanos column goes down the identical
        # code path.
        n_ev = con.execute(
            f"SELECT max(event_id) + 1 FROM {src('events')}"
        ).fetchone()[0]
        con.execute(f"""
            COPY (SELECT event_id + i * {n_ev} AS event_id,
                         epoch_ns(ts) AS ts,
                         user_id + i * {n_cust} AS user_id,
                         event_type, value, props
                  FROM {src('events')}, {rep})
            TO '{out}/events.parquet' (FORMAT PARQUET)""")

    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "documents", "embeddings", "events", "nation", "region"):
        if not want(t):
            continue
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
