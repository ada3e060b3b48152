#!/usr/bin/env python3
"""Measure sketch-query vs oracle survivor sets across SFs.

For each of the three sketch-sharing rows (clean_corpus_sketch,
clean_corpus_full, dedup_incremental_sketch), compare the engine's
survivor doc_id set (Spark parquet dump from graft.Verify) against the
exact-baseline oracle in two variants:
  capped   — the 128-doc block cap (current shipping oracle)
  uncapped — same length-block structure, no cap
Prints the symdiff sizes per (query, SF, variant).

Usage: python3 tools/sketch_oracle_sweep.py /tmp/sk_sf0.001 /tmp/sk_sf0.01 ...
       (each dir must be a Verify dump for the matching testdata SF,
        named so the SF can be parsed from the path suffix)
"""
import sys
import glob

import duckdb
import pandas as pd

PAIR_CTE = """
  t AS (
    SELECT doc_id, n_chars,
           list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
    FROM {src}),
  s AS (
    SELECT doc_id,
           CAST(floor(n_chars / 16) AS BIGINT) AS bucket0,
           list_distinct(list_transform(
             range(1, greatest(len(w) - 2, 1) + 1),
             i -> array_to_string(w[i:i+2], ' '))) AS sh
    FROM t
    {cap}),
"""

CAP = """QUALIFY row_number() OVER (
      PARTITION BY CAST(floor(n_chars / 16) AS BIGINT)
      ORDER BY doc_id) <= 128"""

CLEAN_SURVIVORS = PAIR_CTE + """
  b AS (SELECT doc_id, sh, unnest([bucket0, bucket0 + 1]) AS bucket FROM s),
  victims AS (
    SELECT DISTINCT c.doc_id
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
    WHERE CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) /
            len(list_distinct(list_concat(a.sh, c.sh))) >= 0.5)
  SELECT doc_id FROM {src}
  WHERE doc_id NOT IN (SELECT doc_id FROM victims)"""

INCR_SURVIVORS = PAIR_CTE + """
  fb AS (
    SELECT doc_id, sh, unnest([bucket0 - 1, bucket0, bucket0 + 1]) AS bucket
    FROM s WHERE doc_id >= 250),
  victims AS (
    SELECT DISTINCT b.doc_id
    FROM s a JOIN fb b ON a.bucket0 = b.bucket AND a.doc_id < b.doc_id
    WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(list_distinct(list_concat(a.sh, b.sh)))) >= 0.5)
  SELECT doc_id FROM {src}
  WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id FROM victims)"""

DECONTAM = """
  docs_dc AS (
    SELECT d.* FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM documents b
      WHERE b.doc_id < 5 AND contains(d.text, substr(b.text, 1, 40))))"""


def survivors_sql(query, capped):
    cap = CAP if capped else ""
    if query == "clean_corpus_sketch":
        return "WITH " + CLEAN_SURVIVORS.format(src="documents", cap=cap)
    if query == "clean_corpus_full":
        # decontaminate first, then the same chain over docs_dc
        return ("WITH " + DECONTAM + "," +
                CLEAN_SURVIVORS.format(src="docs_dc", cap=cap))
    if query == "dedup_incremental_sketch":
        return "WITH " + INCR_SURVIVORS.format(src="documents", cap=cap)
    raise ValueError(query)


def main():
    for out_dir in sys.argv[1:]:
        sf = out_dir.rsplit("sf", 1)[-1]
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS "
                f"SELECT * FROM '/root/testdata/sf{sf}/documents.parquet'")
        for q in ("clean_corpus_sketch", "clean_corpus_full",
                  "dedup_incremental_sketch"):
            files = glob.glob(f"{out_dir}/{q}/*.parquet")
            if not files:
                print(f"sf{sf} {q}: NO DUMP")
                continue
            eng = set(pd.read_parquet(files[0])["doc_id"])
            # NOTE: engine result is post-quality-floor for clean_corpus*;
            # oracle variants here stop at the dedup stage, so compare
            # via the dedup-stage survivor sets with the quality floor
            # applied identically on both sides is needed for clean_*.
            # Simpler: quality floor is dedup-independent per doc, so
            # symdiff(engine, oracle_full_chain) == symdiff restricted
            # to quality-passing docs; we apply the floor in SQL too.
            for capped in (True, False):
                sql = survivors_sql(q, capped)
                ora = set(r[0] for r in con.sql(sql).fetchall())
                if q.startswith("clean_corpus"):
                    # apply the n_tokens >= 30 floor to the oracle side
                    toks = con.sql(
                        "SELECT doc_id FROM documents WHERE len(list_filter("
                        "string_split_regex(trim(text), '\\s+'), x -> x <> ''))"
                        " >= 30").fetchall()
                    ora &= set(r[0] for r in toks)
                d1 = eng - ora
                d2 = ora - eng
                tag = "capped" if capped else "uncapped"
                print(f"sf{sf} {q} [{tag}]: engine={len(eng)} oracle={len(ora)} "
                      f"eng-only={len(d1)} ora-only={len(d2)} "
                      f"{'OK' if not d1 and not d2 else 'DIVERGE'}")
        con.close()


if __name__ == "__main__":
    main()
