#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the same
tables, sorts columns by name and rows by all columns, and compares
values exactly. Dev-tool only — NOT part of the library.
"""
import sys, glob, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Driver-faithful: sort columns by name, then rows via pandas
    # sort_values over ALL columns. No stringify fallback — an
    # unsortable column (e.g. array<double>) raises, exactly like the
    # driver's checker (lexsort_indexer → Categorical → unhashable
    # ndarray), and the query reads FAIL.
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def dtype_kind_ok(a, b) -> bool:
    # Driver-faithful typed compare: the driver hashes typed values
    # post-parquet, so an int64 Spark column against a float64 oracle
    # column (DuckDB HUGEINT → pandas float64) must FAIL even when the
    # values are numerically identical. Width differences within one
    # kind (int32 vs int64) still hash the same values, so allow those.
    ka, kb = a.kind, b.kind
    ints = {"i", "u"}
    if ka in ints and kb in ints:
        return True
    return ka == kb


def cell_eq(a, b) -> bool:
    # arrays first: pd.isna on an ndarray returns an ndarray and would
    # make the truthiness check below raise
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not (hasattr(b, "__len__") and not isinstance(b, str)):
            return False
        return list(a) == list(b)
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, float) != isinstance(b, float):
        # no float coercion: int-vs-float is a typed-hash mismatch
        return False
    return a == b


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = norm(pd.concat([pd.read_parquet(f) for f in files]))
            ddf = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1
            continue
        kind_bad = [c for c in sdf.columns
                    if not dtype_kind_ok(sdf[c].dtype, ddf[c].dtype)]
        if kind_bad:
            print(f"FAIL {name}: dtype mismatch "
                  + ", ".join(f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                              for c in kind_bad[:4]))
            n_fail += 1
            continue
        bad = []
        for c in sdf.columns:
            sv, dv = sdf[c].tolist(), ddf[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cell_eq(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
