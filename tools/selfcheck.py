#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

For each query directory under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables = the
sf parquet files), sort columns by name and rows by all columns, and
compare. Reports per-query row/schema/value match.
"""
import json, math, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    ok_all = True
    seen = set()
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if only and name not in only:
            continue
        seen.add(name)
        parts = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not parts:
            # dir exists but holds no data files (e.g. a write died before
            # both the result AND the sentinel landed) — report, don't
            # crash the whole report on pd.concat([])
            print(f"{name}: ERROR no parquet files in output dir")
            ok_all = False
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in parts],
                             ignore_index=True)
        if list(spark_df.columns) == ["_error"]:
            # Verify's failed-query sentinel: the query raised instead of
            # producing rows — report it as an ERROR row, never silence it
            msg = spark_df["_error"].iloc[0] if len(spark_df) else "?"
            print(f"{name}: ERROR {msg}")
            ok_all = False
            continue
        if name not in oracle:
            print(f"{name}: NO-ORACLE rows={len(spark_df)}")
            continue
        duck_df = con.execute(oracle[name]).fetchdf()
        s, d = canon(spark_df), canon(duck_df)
        schema_ok = list(s.columns) == list(d.columns)
        rows_ok = len(s) == len(d)
        val_ok = False
        detail = ""
        if schema_ok and rows_ok:
            val_ok = True
            for c in s.columns:
                sa, da = s[c].to_list(), d[c].to_list()
                bad = [i for i in range(len(sa))
                       if not values_equal(sa[i], da[i])]
                if bad:
                    val_ok = False
                    i = bad[0]
                    detail += (f" col={c} ndiff={len(bad)} first@{i}: "
                               f"spark={sa[i]!r} duck={da[i]!r}")
                    if len(detail) > 300:
                        break
        else:
            detail = (f" schema spark={list(s.columns)} duck={list(d.columns)}"
                      if not schema_ok else f" rows spark={len(s)} duck={len(d)}")
        status = "OK" if (schema_ok and rows_ok and val_ok) else "FAIL"
        if status == "FAIL":
            ok_all = False
        print(f"{name}: {status} rows={len(s)}{detail}")
    for name in sorted(set(oracle) - seen):
        if only and name not in only:
            continue
        print(f"{name}: MISSING (no output directory)")
        ok_all = False
    sys.exit(0 if ok_all else 1)

main()
