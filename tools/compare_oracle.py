#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL in DuckDB over the sf tables, sort columns
by name, sort rows, and compare values exactly. Prints PASS/FAIL per
query with a diff preview on mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB result types the driver's hasher encodes identically to the
# Spark parquet output. Everything else (HUGEINT from sum(BIGINT),
# DECIMAL from numeric literals / avg, UHUGEINT, ...) hashes differently
# even when the VALUES are equal — r4 shipped two red rows exactly this
# way because check_dtype=False hid the drift locally. Nested types are
# checked on their element type.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
              "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}


def unsafe_cols(con, sql):
    """Columns of the oracle result whose DuckDB type the driver's
    hasher may encode differently than the Spark parquet value."""
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = []
    for name, t in zip(rel.columns, [str(t) for t in rel.types]):
        base = t
        while base.endswith("[]"):
            base = base[:-2]
        if base not in SAFE_TYPES:
            bad.append((name, t))
    return bad


def nested_cols(df: pd.DataFrame):
    """Top-level array/struct columns in the SPARK result. The DRIVER's
    comparator sorts the raw pandas frame (no tuple canonicalisation),
    so any such column crashes it with 'unhashable type' — r6 shipped
    jl_project red exactly this way while this tool's canon() hid it.
    Oracle-checked queries must emit scalar columns only (explode)."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            v = df[c].dropna()
            if len(v) and (hasattr(v.iloc[0], "tolist")
                           or isinstance(v.iloc[0], (list, dict, tuple))):
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # normalize timestamps to ns-naive for comparison
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # arrays → tuples so rows are sortable/hashable
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, list) else v))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        # Query results are DIRECTORIES of parquet parts; skip loose
        # files (oracle_sql.json, any future sidecar artifacts).
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        raw = pd.read_parquet(f"{out_dir}/{name}")
        got = canon(raw)
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            n_skip += 1
            continue
        nest = nested_cols(raw)
        if nest:
            n_fail += 1
            print(f"FAIL {name}: driver-unsafe top-level array/struct "
                  f"column(s) {nest} — explode to scalar rows")
            continue
        bad = unsafe_cols(con, oracle[name])
        if bad:
            n_fail += 1
            print(f"FAIL {name}: oracle emits non-hasher-safe types {bad}")
            continue
        want = canon(con.sql(oracle[name]).df())
        status, detail = None, ""
        if list(got.columns) != list(want.columns):
            status = "FAIL"
            detail = f"columns spark={list(got.columns)} oracle={list(want.columns)}"
        elif len(got) != len(want):
            status = "FAIL"
            detail = f"rows spark={len(got)} oracle={len(want)}"
        else:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
                status = "PASS"
            except AssertionError as e:
                status = "FAIL"
                detail = str(e).splitlines()[0]
                for c in g.columns:
                    if not g[c].equals(w[c]):
                        detail += f"; first col diff: {c}"
                        mism = g[c] != w[c]
                        detail += f" ({int(mism.sum())} cells)"
                        ex = g[mism].head(2)[[c]].to_dict() , w[mism].head(2)[[c]].to_dict()
                        detail += f" ex: {ex}"
                        break
        if status == "PASS":
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail[:500]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
