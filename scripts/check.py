#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet in <sfDir>
as a DuckDB view named by file stem, runs each oracle SQL, and compares
with the Spark result parquet at <verifyOutDir>/<name>/ — columns sorted
by name, rows sorted by all columns, exact value equality (with a
reported max-abs-diff for floats when not exact).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC for comparability
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: spark output missing"); n_fail += 1; continue
        try:
            want = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got = normalize(con.sql(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1; continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1; continue
        bad = []
        for c in want.columns:
            w, g = want[c], got[c]
            # dtype-strict: DuckDB HUGEINT/DECIMAL widenings land as float64
            # in pandas while Spark writes int64 — values compare equal here
            # but the driver's hash sees "0.0" vs "0". Flag int-vs-float
            # mismatches as hard failures so local verify predicts the driver.
            def dclass(s):
                if pd.api.types.is_bool_dtype(s): return "bool"
                if pd.api.types.is_integer_dtype(s): return "int"
                if pd.api.types.is_float_dtype(s): return "float"
                return "other"
            wc, gc = dclass(w), dclass(g)
            # bool/int/float are three DISTINCT classes: the driver hash
            # renders True vs 1 vs 1.0 differently even though pandas
            # compares them equal
            if wc != gc and "other" not in (wc, gc):
                bad.append(f"{c} (DTYPE oracle={w.dtype} vs spark={g.dtype}: "
                           "driver hash will mismatch — cast the oracle)")
                continue
            if pd.api.types.is_float_dtype(w) or pd.api.types.is_float_dtype(g):
                w = w.astype(float); g = g.astype(float)
                eq = (w.values == g.values) | (w.isna().values & g.isna().values)
                if not eq.all():
                    d = np.nanmax(np.abs(w.values - g.values))
                    bad.append(f"{c} (maxdiff={d:.3e}, n={int((~eq).sum())})")
            else:
                eq = (w.astype(object).where(w.notna(), None).values ==
                      g.astype(object).where(g.notna(), None).values)
                if not np.all(eq):
                    i = int(np.argmin(eq))
                    bad.append(f"{c} (first diff row {i}: {w.iloc[i]!r} vs {g.iloc[i]!r})")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad)}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
