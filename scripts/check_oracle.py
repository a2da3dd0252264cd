#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (driver-side python
is available in this container; this script is dev tooling only, not part
of the Scala library).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir> [names]

Optional [names] is a comma-separated query subset — the dev loop for
checking a subset Verify run without 280 spurious "no spark result"
lines.

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name and rows by all columns, and compares.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b


def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"COLS spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWS spark={len(spark_df)} oracle={len(oracle_df)}"
    s, o = canon(spark_df), canon(oracle_df)
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        for i, (a, b) in enumerate(zip(sv, ov)):
            if (a is None or (isinstance(a, float) and math.isnan(a))) and \
               (b is None or (isinstance(b, float) and math.isnan(b))):
                continue
            if not values_equal(a, b):
                return f"VAL col={col} row={i} spark={a!r} oracle={b!r}"
    return None


def record(spark_df, oracle_df):
    """Driver-shaped per-query record (the CORRECTNESS_r*.json schema):
    rows/schema/hash flags computed independently so a partial failure
    still reports what DID match."""
    rec = {"rows_match": len(spark_df) == len(oracle_df),
           "schema_match":
               sorted(spark_df.columns) == sorted(oracle_df.columns),
           "hash_match": False,
           "spark_rows": len(spark_df), "oracle_rows": len(oracle_df),
           "err": None}
    if rec["rows_match"] and rec["schema_match"]:
        err = compare("", spark_df, oracle_df)
        rec["hash_match"] = err is None
        if err:
            rec["err"] = err
    return rec


def main(out_dir, sf_dir, names=None, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleUp soak dirs are
        # Spark-written DIRECTORIES of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    records = {}
    if names:
        keep = {n.strip() for n in names.split(",") if n.strip()}
        unknown = keep - set(oracle_sql)
        if unknown:
            # a typo'd name must not read as "subset passed"
            print(f"FAIL unknown query name(s): {sorted(unknown)} "
                  f"(rows-only queries have no oracle entry)")
            fail += len(unknown)
        oracle_sql = {k: v for k, v in oracle_sql.items() if k in keep}
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: no spark result ({str(ex)[:100]})")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": -1,
                             "oracle_rows": -1,
                             "err": f"no spark result: {str(ex)[:100]}"}
            fail += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {str(ex)[:200]}")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False,
                             "spark_rows": len(spark_df), "oracle_rows": -1,
                             "err": f"oracle error: {str(ex)[:200]}"}
            fail += 1
            continue
        # dtype reconciliation: float-coerce ONLY when one side is already
        # float (the nullable-int promotion case); two integer dtypes of
        # different widths compare exactly as int64 — float64 would mask
        # real differences above 2**53 (e.g. 60-bit hash values).
        for c in spark_df.columns:
            if c in oracle_df.columns:
                try:
                    ds, do = str(spark_df[c].dtype), str(oracle_df[c].dtype)
                    if ds != do:
                        if "float" in ds or "float" in do:
                            spark_df[c] = spark_df[c].astype("float64")
                            oracle_df[c] = oracle_df[c].astype("float64")
                        else:
                            spark_df[c] = spark_df[c].astype("int64")
                            oracle_df[c] = oracle_df[c].astype("int64")
                except (TypeError, ValueError):
                    pass
        rec = record(spark_df, oracle_df)
        records[name] = rec
        if not (rec["rows_match"] and rec["schema_match"]
                and rec["hash_match"]):
            print(f"FAIL {name}: {rec['err'] or 'rows/schema mismatch'}")
            fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
    return 1 if fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sys.exit(main(args[0], args[1],
                  args[2] if len(args) > 2 else None, json_out))
