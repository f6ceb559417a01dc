#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers the fixture parquet files as DuckDB views (raw, no casts — the
oracle SQL itself must handle e.g. events.ts ns->us truncation), runs each
query's oracle SQL, loads the Spark-written result parquet, sorts columns
by name and rows by all values, and compares cell-by-cell.

NOT part of the shipped library — driver-side python tooling only.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    # STRICT float equality — the driver hash-compares exact values, so a
    # near-miss here is a real driver failure. Near misses are reported
    # separately by the caller for diagnosis.
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        # column-type compare (both described by DuckDB for consistent names)
        stypes = dict(con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet'))").fetchall())
        dtypes = dict(con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE {sql})").fetchall())
        tdiff = {c: (stypes.get(c), dtypes.get(c)) for c in stypes
                 if stypes.get(c) != dtypes.get(c)}
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for col in spark_df.columns:
            sa, da = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (x, y) in enumerate(zip(sa, da)):
                if not cells_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
