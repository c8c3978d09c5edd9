#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify
parquet dump, run its oracle SQL in DuckDB over the same sf dir, and
compare row counts, schemas (loosely), and values (sorted by column
name). Usage: check.py <sfDir> <verifyOutDir>"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            rel = con.sql(oracle[name])
            # dtype-strict guard: DuckDB silently widens sum(BIGINT) to
            # HUGEINT (and may emit DECIMAL); the driver's hash sees the
            # widened type even when the values match, so any such column
            # in the ORACLE OUTPUT is a guaranteed hash-red. Force the
            # oracle author to CAST explicitly.
            widened = [
                (c, str(t)) for c, t in zip(rel.columns, rel.types)
                if any(w in str(t).upper() for w in ("HUGEINT", "DECIMAL"))
            ]
            if widened:
                print(f"FAIL {name}: oracle emits widened dtypes {widened} "
                      f"— wrap in CAST(... AS BIGINT/DOUBLE)")
                failures += 1
                continue
            duck_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(s)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            failures += 1
    # rows-only queries
    for name in sorted(set(f.split('/')[-1] for f in glob.glob(f"{out_dir}/q*")) - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        print(f"ROWS {name}: {n}")
        if n <= 0:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
