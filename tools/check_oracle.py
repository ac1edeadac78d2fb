#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over the sfDir parquet
tables, sorts columns by name, and compares row counts, schemas and a
value hash. Exit nonzero on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
        want = norm(con.execute(sql).fetchdf())
        status = []
        if len(got) != len(want):
            status.append(f"rows {len(got)} vs {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} vs {list(want.columns)}")
        elif [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            status.append(f"dtypes {list(got.dtypes)} vs {list(want.dtypes)}")
        if not status:
            eq = True
            for c in got.columns:
                a, b = got[c].values, want[c].values
                if pd.api.types.is_float_dtype(got[c]):
                    same = np.array_equal(a, b, equal_nan=True)
                else:
                    same = (pd.Series(a).fillna("\0").values ==
                            pd.Series(b).fillna("\0").values).all()
                if not same:
                    bad = np.where(a != b)[0][:3] if len(a) == len(b) else []
                    status.append(f"values differ in col {c} at rows {list(bad)}")
                    for i in list(bad)[:3]:
                        status.append(f"    row {i}: spark={a[i]!r} duck={b[i]!r}")
                    eq = False
            if eq:
                print(f"OK   {name}: {len(got)} rows")
                continue
        print(f"FAIL {name}: " + "; ".join(status))
        failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
