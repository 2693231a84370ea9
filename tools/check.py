#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares row-by-row (columns sorted by name, rows sorted). Prints one
line per query: MATCH / MISMATCH / ERROR.

Tooling only — never shipped in the engine (driver-side python).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))
            else:
                rr.append((type(v).__name__, str(v)))
        out.append(tuple(rr))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"ERROR    {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        # Driver-comparator parity: the driver sorts the pandas frame by
        # ALL columns; array/struct cells crash pandas sort_values
        # (unhashable ndarray — the r05 q116 red row). Fail loudly here
        # so no registered query ever ships a non-scalar output column.
        try:
            spark_df.sort_values(by=list(spark_df.columns))
        except Exception as e:
            print(f"UNSORTABLE {name}: driver comparator would crash: {e}")
            n_bad += 1
            continue
        s_cols = sorted(spark_df.columns)
        o_cols = sorted(oracle_df.columns)
        if s_cols != o_cols:
            print(f"MISMATCH {name}: columns spark={s_cols} oracle={o_cols}")
            n_bad += 1
            continue
        s_rows = sorted(norm(spark_df[s_cols].itertuples(index=False)))
        o_rows = sorted(norm(oracle_df[o_cols].itertuples(index=False)))
        if len(s_rows) != len(o_rows):
            print(f"MISMATCH {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_bad += 1
            continue
        diff = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
        if diff:
            i = diff[0]
            print(f"MISMATCH {name}: {len(diff)}/{len(s_rows)} rows differ; "
                  f"first@{i}:\n  spark : {s_rows[i]}\n  oracle: {o_rows[i]}")
            n_bad += 1
        else:
            print(f"MATCH    {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} match, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
