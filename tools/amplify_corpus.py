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

REPS > 26 (e.g. 100 for sf0.1 -> sf10): plain rotations collide (k and
k+26 share one, turning cross-replica pairs into exact dups and breaking
every dedup measurement), so replica transforms generalize while keeping
the same invariants (1:1 substitution; length, gram-frequency shape, and
within-replica relations preserved exactly):
- text: DISTINCT seeded permutations of the alphabet (k=0 identity;
  rotations for k<26 so sf1 regenerates byte-identical).
- embeddings: dimension rotation COMPOSED with a seeded per-replica sign
  flip (flipping a fixed dim set multiplies both vectors' coordinates,
  so within-replica dot products and norms are bit-preserved; the flip
  pattern disambiguates k and k+dim).
- customer names: DISTINCT seeded digit permutations (same scheme).
"""
import os
import random
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/scaledata/sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _distinct_perms(symbols: str, n: int, seed: int, rotations: int) -> list:
    """n distinct 1:1 substitution targets for `symbols`: rotations first
    (identity at k=0, matching the historical sf1 output), then seeded
    shuffles, deduplicated deterministically."""
    perms, seen = [], set()
    for k in range(min(n, rotations)):
        p = symbols[k:] + symbols[:k]
        perms.append(p)
        seen.add(p)
    rng = random.Random(seed)
    while len(perms) < n:
        p = "".join(rng.sample(symbols, len(symbols)))
        if p not in seen:
            perms.append(p)
            seen.add(p)
    return perms


def rot(k: int) -> str:
    return TEXT_PERMS[k]


TEXT_PERMS = _distinct_perms(ALPHA, REPS, seed=9001, rotations=26)
DIGIT_PERMS = _distinct_perms("0123456789", REPS, seed=9002, rotations=10)


def sign_flips(k: int, dim: int) -> list:
    """±1 per dimension; identity for k < dim (rotation alone is already
    collision-free there, and sf1's historical output stays byte-stable)."""
    if k < dim:
        return [1.0] * dim
    rng = random.Random(7001 + k)
    return [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]


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

    dim = con.sql(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]

    def emb_select(k: int) -> str:
        rotated = (f"list_concat(embedding[1 + ({k} % len(embedding)):], "
                   f"embedding[1:({k} % len(embedding))])")
        flips = sign_flips(k, dim)
        if all(f == 1.0 for f in flips):
            vec = rotated
        else:
            lit = "[" + ", ".join(f"{f:.1f}" for f in flips) + "]"
            vec = (f"list_transform(list_zip({rotated}, {lit}), "
                   f"s -> s[1] * s[2])")
        return (f"SELECT vec_id + {k * 100000000} AS vec_id, "
                f"CAST({vec} AS REAL[]) AS embedding, label "
                f"FROM read_parquet('{SRC}/embeddings.parquet')")

    copy("embeddings", [emb_select(k) for k in range(REPS)])

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
              translate(c_name, '{DIG}', '{DIGIT_PERMS[k]}') AS c_name,
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
