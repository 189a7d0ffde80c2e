#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the parquet dumped by graft.Verify.
Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"RESULT MISSING: {e}"
            continue
        expected = expected.reindex(sorted(expected.columns), axis=1)
        actual = actual.reindex(sorted(actual.columns), axis=1)
        if list(expected.columns) != list(actual.columns):
            results[name] = f"COLUMNS: oracle={list(expected.columns)} vs spark={list(actual.columns)}"
            continue
        if len(expected) != len(actual):
            results[name] = f"ROWS: oracle={len(expected)} vs spark={len(actual)}"
            continue
        mismatches = []
        for c in expected.columns:
            ev, av = expected[c], actual[c]
            try:
                eq = (ev.values == av.values) | (ev.isna().values & av.isna().values)
            except Exception as e:
                mismatches.append(f"{c}: compare error {e}")
                continue
            bad = (~eq).nonzero()[0]
            if len(bad):
                i = bad[0]
                mismatches.append(
                    f"{c}: {len(bad)} cells differ; first row {i}: oracle={ev.iloc[i]!r} spark={av.iloc[i]!r}")
        results[name] = "OK" if not mismatches else "; ".join(mismatches)
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} oracled queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
