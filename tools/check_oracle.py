#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads the parquet dumps produced by `graft.Verify <sfDir> <outDir>` plus
oracle_sql.json, runs each oracle SQL in DuckDB over the same testdata
tables, and compares row count, column names (sorted), dtypes, and values
cell-by-cell (exact — stricter than any hash).

Dev-only tooling: the deliverable Scala library has no dependency on this.
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)]

def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — the bar the driver holds us to
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        # dtype gate: the driver's hash is type-sensitive ACROSS kinds (a
        # DuckDB HUGEINT lands as float64/object vs Spark's int64 and
        # hash-mismatches on identical values — bit us in round 1 on
        # q_doc_exact_dedup/q_json_extract) but NOT across widths (int32 vs
        # int64 hash the same — round-1 rn/int columns passed the driver).
        # So compare by kind: all ints alike, all floats alike, datetimes
        # alike (parquet→pandas and duckdb→pandas pick different
        # resolutions for the same instant).
        def norm_dtype(dt):
            return {"i": "int", "u": "int", "f": "float", "M": "datetime"}.get(
                dt.kind, str(dt))
        dtbad = [(c, got[c].dtype, exp[c].dtype) for c in got.columns
                 if norm_dtype(got[c].dtype) != norm_dtype(exp[c].dtype)]
        if dtbad:
            c, g, e = dtbad[0]
            print(f"FAIL {name}: dtype mismatch col={c}: spark={g} duckdb={e}")
            failures += 1
            continue
        bad = None
        for ci, c in enumerate(got.columns):
            gv, ev = got[c].tolist(), exp[c].tolist()
            for ri in range(len(gv)):
                if not cmp_cell(gv[ri], ev[ri]):
                    bad = (c, ri, gv[ri], ev[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, g, e = bad
            print(f"FAIL {name}: value mismatch col={c} row={ri}: spark={g!r} duckdb={e!r}"
                  f" (dtypes spark={got[c].dtype} duckdb={exp[c].dtype})")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
