#!/usr/bin/env python3
"""SF-robustness sweep for oracle pins (r9, per the r8 verdict).

The driver regenerated testdata between r6 and r8 with different row
counts (embeddings 5000 -> 2000 at sf0.1), so any pin that silently
assumed a count would break on the NEXT regeneration. This sweep
re-verifies engine == DuckDB-oracle on synthetic RE-SCALES of the
driver tables:

  half : every table row with (id % 2 == 0) — ~50% of the corpus
  x2   : the corpus plus an id-shifted copy (ids + 10_000_000)

Usage: python3 tools/pin_robustness_sweep.py [query ...]
Defaults to the r8-new pins: prototype_prune quantiles_mergeable
dsir_select_by_lang gopher_quality_filter.

Builds /tmp/pinsweep/{half,x2} (symlinking untouched tables from
sf0.01), runs graft.Verify there, then compare_oracle.py. Exit 0 iff
every (scale, query) passes.
"""
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
ROOT = "/tmp/pinsweep"
# tables the swept queries read, with their id column; everything else
# is symlinked unchanged
RESCALED = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}
ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
SHIFT = 10_000_000

DEFAULT_QUERIES = ["prototype_prune", "quantiles_mergeable",
                   "dsir_select_by_lang", "gopher_quality_filter"]

# Empirical-floor columns: these pin MEASURED recall at the driver SFs
# (the fixture's near-threshold pairs make recall legitimately
# scale-dependent); a re-scale dipping under the floor is expected
# fixture-dependence, not a portability bug — downgraded to WARN.
# Structural columns of the same rows (false-positive counts,
# self-recall) still FAIL the sweep.
EMPIRICAL_FLOORS = {
    ("embedding_near_recall", "recall_floor_met"),
    ("ann_lsh_recall", "twin_recall_floor_met"),
    ("ann_recall", "recall_floor_met"),
    ("ann_int8_recall", "recall_floor_met"),
    ("ann_pq_recall", "recall_floor_met"),
}


def build(scale):
    out = os.path.join(ROOT, scale)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ALL_TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t not in RESCALED:
            os.symlink(src, dst)
            continue
        tab = pq.read_table(src)
        idcol = RESCALED[t]
        ids = tab[idcol]
        if scale == "half":
            import pyarrow.compute as pc
            keep = pc.equal(pc.bit_wise_and(ids, pa.scalar(1, ids.type)),
                            pa.scalar(0, ids.type))
            tab2 = tab.filter(keep)
        else:  # x2
            import pyarrow.compute as pc
            shifted = tab.set_column(
                tab.schema.get_field_index(idcol), idcol,
                pc.add(ids, pa.scalar(SHIFT, ids.type)))
            tab2 = pa.concat_tables([tab, shifted])
        # preserve the source's physical schema exactly (the loader
        # branches on dtype — see FixturesSpec)
        pq.write_table(tab2, dst, use_deprecated_int96_timestamps=False)
    return out


def main():
    queries = sys.argv[1:] or DEFAULT_QUERIES
    failures = []
    for scale in ["half", "x2"]:
        sf_dir = build(scale)
        out_dir = f"{ROOT}/verify_{scale}"
        shutil.rmtree(out_dir, ignore_errors=True)
        print(f"== {scale}: Verify {queries} on {sf_dir}", flush=True)
        r = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {sf_dir} {out_dir} " + " ".join(queries)],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            failures.append((scale, "<verify>", "sbt exit != 0"))
            continue
        cmp = subprocess.run(
            [sys.executable, "tools/compare_oracle.py", sf_dir, out_dir],
            capture_output=True, text=True, cwd="/root/repo")
        print(cmp.stdout.strip(), flush=True)
        for line in cmp.stdout.splitlines():
            if line.startswith("FAIL"):
                qname = line.split()[1].rstrip(":")
                col = (line.split('column name="')[1].split('"')[0]
                       if 'column name="' in line else "")
                if (qname, col) in EMPIRICAL_FLOORS:
                    print(f"WARN (empirical floor, expected off-SF): {line}")
                else:
                    failures.append((scale, qname, line))
    if failures:
        print(f"\nSWEEP FAILED: {failures}")
        sys.exit(1)
    print("\nSWEEP OK: every (scale, query) oracle-green")


if __name__ == "__main__":
    main()
