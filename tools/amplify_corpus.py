#!/usr/bin/env python3
"""Amplify the sf0.1 corpus ~10x into target/scaledata/sf1 (driver-side
tooling, like local_verify.py — the engine never depends on this).

Scaling-measurement requirement: the amplified corpus must preserve the
per-replica data DISTRIBUTION while multiplying n, so per-query growth
curves measure the OPERATOR, not an artificially densified workload.
Naive replication fails that: identical text replicas would turn every
document into a 10-member exact-dup cluster and explode candidate pairs
quadratically. Instead each replica k is made content-disjoint:

- documents: ids shifted; text alphabet-ROTATED by k (a 1:1 character
  substitution preserves length, gram-frequency shape, and every
  within-replica dup/near-dup relation, while making cross-replica texts
  dissimilar).
- embeddings: ids shifted; dimensions ROTATED by k (preserves norms and
  within-replica cosines; cross-replica cosines decorrelate).
- events / lineitem: ids (user/order/part/supp) shifted into disjoint
  ranges — 10 disjoint interaction/co-purchase graphs.

Usage: python3 tools/amplify_corpus.py [src] [dst] [replicas]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/scaledata/sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def rot(k: int) -> str:
    k %= 26
    return ALPHA[k:] + ALPHA[:k]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def copy(name: str, selects: list) -> None:
        q = " UNION ALL ".join(selects)
        con.sql(f"COPY ({q}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"[amplify] {name}: {n} rows")

    # shifts precomputed in Python: DuckDB folds `3 * 1000000000` in INT32
    # and overflows before widening
    copy("documents", [
        f"""SELECT doc_id + {k * 100000000} AS doc_id,
              translate(text, '{ALPHA}{ALPHA.upper()}', '{rot(k)}{rot(k).upper()}') AS text,
              lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet')"""
        for k in range(REPS)])

    copy("embeddings", [
        f"""SELECT vec_id + {k * 100000000} AS vec_id,
              CAST(list_concat(embedding[1 + ({k} % len(embedding)):],
                               embedding[1:({k} % len(embedding))]) AS REAL[]) AS embedding,
              label
            FROM read_parquet('{SRC}/embeddings.parquet')"""
        for k in range(REPS)])

    copy("events", [
        f"""SELECT event_id + {k * 1000000000000} AS event_id, ts,
              user_id + {k * 10000000} AS user_id, event_type, value, props
            FROM read_parquet('{SRC}/events.parquet')"""
        for k in range(REPS)])

    copy("lineitem", [
        f"""SELECT l_orderkey + {k * 1000000000} AS l_orderkey,
              l_partkey + {k * 100000000} AS l_partkey,
              l_suppkey + {k * 10000000} AS l_suppkey,
              l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
              l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')"""
        for k in range(REPS)])

    # customer amplified too (round-7 curves: q146 derives its PNG-asset
    # corpus from c_custkey, q141 its name table from c_name): keys shifted
    # into disjoint ranges; the name's digit tail is what carries identity,
    # so replica names translate digits 0-9 -> rotated digits, preserving
    # within-replica edit-distance structure while making replicas disjoint
    DIG = "0123456789"
    copy("customer", [
        f"""SELECT c_custkey + {k * 10000000} AS c_custkey,
              translate(c_name, '{DIG}', '{DIG[k % 10:] + DIG[:k % 10]}') AS c_name,
              c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet')"""
        for k in range(REPS)])

    # small dims copied verbatim so any query that joins them still runs
    for t in ("region", "nation", "supplier", "part", "orders"):
        con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print("[amplify] dims copied verbatim")


if __name__ == "__main__":
    main()
