#!/usr/bin/env python3
"""Empirical wall-vs-N scaling curves for the heavy operators (r10,
per the r9 verdict item 5).

The plan audits prove SHAPE (no cartesian products, skinny shuffles,
staged artifacts); this measures it: each selected query runs at x1 /
x2 / x4 / x8 synthetic re-scales of sf0.01 and the log2(wall)/log2(N)
slope is reported. An exponent well above 1 on a claimed-linear
operator means something in the plan secretly does super-linear work
and would ambush a real 100x scale-up.

Re-scale construction — the part that's easy to get wrong: a plain
id-shifted copy (the pin_robustness_sweep `x2` recipe) makes every
document an EXACT duplicate of its k-1 copies, so pair-generating
operators (minhash bands, components, semantic cells) see duplicate
GROUPS densify with the copy factor and their work grows ~k^2 even
when the operator is linear in corpus size at constant dup rate.
Here each copy k perturbs content deterministically so cross-copy
rows are NOT near-dups, while the within-copy planted duplicate
structure replicates unchanged — i.e. the corpus grows with a
CONSTANT duplicate rate, which is the scaling story a production
corpus actually follows:

  documents : caesar-shift letters by k (lengths, whitespace, token
              boundaries, and per-copy dup structure all preserved;
              shingles/ngrams across copies all distinct)
  embeddings: rotate the vector by k positions (norm preserved;
              direction across copies effectively random)

Timing reuses the Bench harness verbatim (noop sink, warm-up, reps,
settle barrier) via SPARK_GRAFT_ONLY, one JVM per scale so no scale
inherits another's JIT/GC state.

Usage: python3 tools/scale_curve.py [query ...]
Writes per-scale medians + fitted exponents to stdout; copy the table
into BASELINE.md. Exit 1 if any CLAIMED_LINEAR query's tail exponent
(x2..x8 fit) exceeds 1.3.
"""
import json
import math
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_CURVE_SRC", "/root/testdata/sf0.01")
ROOT = "/tmp/scalecurve"
SHIFT = 10_000_000
ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
# SCALE_CURVE_SCALES=2,4 gives the in-round SMOKE: one doubling in the
# auto-nlist-active region, two JVMs, fails a gross super-linear
# regression without the full 4-scale sweep. The tail fit (scales
# >= 2) works from two points. x1 stays out of the smoke deliberately:
# below ~1k vectors the auto-nlist floor (min 16 cells) makes the
# cell-blocked ops honestly quadratic over x1->x2, which the full
# curve shows and the tail fit ignores.
SCALES = [int(s) for s in
          os.environ.get("SCALE_CURVE_SCALES", "1,2,4,8").split(",")]

# Heavy operators with the scaling contract each one DOCUMENTS.
# "linear" = wall should grow ~N (tail exponent <= 1.3 enforced).
# r11: knn_graph/semantic_dedup moved INTO the gated-linear set — the
# r10 measurement showed tail 1.62 at fixed nlist=16, and the fix
# (Similarity.autoNlist: nlist = max(16, ceil(N/64)), replayed by the
# oracle from its own window count) pins the per-cell depth so
# Sigma|cell|^2 ~ 64N. The r11 list also covers the other heavy
# families the r10 verdict named: packing (bin-covering first-fit and
# harmonic), incremental clustering, containment pair generation, the
# IVF-PQ search path, and one real multi-batch streaming replay.
CLAIMED_LINEAR = ["dedup_exact", "dedup_minhash_pairs", "dedup_clusters",
                  "span_dedup_clean", "bpe_encode",
                  "knn_graph", "semantic_dedup",
                  "pack_bins_grouped", "pack_harmonic",
                  "dedup_clusters_incremental", "containment_pairs",
                  "ann_ivfpq_topk", "streaming_dedup",
                  # r12 CowTable merge-cost rows: fixed_batch should be
                  # ~FLAT (commit cost follows the touched set, not the
                  # table — slope well under 1 is the claim; <=1.3 is
                  # just the shared gate), scaled_batch ~linear (the
                  # batch is a constant corpus fraction), and the
                  # merge-on-read delete (sidecar write, no rewrite)
                  # should be ~flat like fixed_batch.
                  "cow_merge_fixed_batch", "cow_merge_scaled_batch",
                  "cow_delete_mor_batch",
                  # r13 retrieval: postings build is one scan + one agg
                  # (linear); scoring touches only query-term postings.
                  # compression_ratio is a pure row-local pass.
                  "bm25_topk", "bm25_incremental", "compression_ratio",
                  # r17 lossless prefix-join family: candidates are
                  # information-bounded (rarest-first prefixes + the
                  # positional filter), and the caesar re-scale keeps
                  # the duplicate RATE constant, so pair volume and
                  # wall should track N. dedup_index_fixed_batch is
                  # the cow_merge_fixed_batch analog: a CONSTANT
                  # 50-doc batch against a persisted store whose size
                  # scales — per-batch cost should stay near-flat
                  # (residual term: one sequential pass over the
                  # skinny standing postings). streaming_dedup_exact
                  # is a real 2-batch replay over the store (create +
                  # two batch dedups — create is the linear term).
                  "jaccard_prefix_pairs", "dedup_incremental_exact",
                  "dedup_index_fixed_batch", "streaming_dedup_exact"]
CELL_QUADRATIC = []
DEFAULT_QUERIES = CLAIMED_LINEAR + CELL_QUADRATIC


def caesar(col, k):
    """Shift a-z/A-Z by k, leave everything else — pure Python row map
    (500-row base table; cost irrelevant)."""
    import string
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    tr = str.maketrans(
        lower + upper,
        lower[k % 26:] + lower[:k % 26] + upper[k % 26:] + upper[:k % 26])
    return pa.array([None if v is None else v.translate(tr)
                     for v in col.to_pylist()], type=col.type)


def build(scale):
    out = os.path.join(ROOT, f"x{scale}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ALL_TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t not in ("documents", "embeddings"):
            os.symlink(src, dst)
            continue
        base = pq.read_table(src)
        parts = []
        for k in range(scale):
            tab = base
            idcol = "doc_id" if t == "documents" else "vec_id"
            if k > 0:
                import pyarrow.compute as pc
                ids = tab[idcol]
                tab = tab.set_column(
                    tab.schema.get_field_index(idcol), idcol,
                    pc.add(ids, pa.scalar(k * SHIFT, ids.type)))
                if t == "documents":
                    i = tab.schema.get_field_index("text")
                    tab = tab.set_column(i, "text", caesar(tab["text"], k))
                else:
                    i = tab.schema.get_field_index("embedding")
                    vecs = tab["embedding"].to_pylist()
                    rot = [None if v is None else v[k % len(v):] + v[:k % len(v)]
                           for v in vecs]
                    tab = tab.set_column(
                        i, "embedding", pa.array(rot, type=tab["embedding"].type))
            parts.append(tab)
        # Bounded row groups: pyarrow's default writes ONE row group,
        # and Spark can only split a parquet file at row-group
        # boundaries — a single-group file makes every scan stage one
        # task, which SERIALIZES the per-row work and fakes adverse
        # slopes (measured: bpe_encode read 1.55 before this, with
        # visible "(0+1)/1" scan stages). Real corpora arrive in many
        # files/groups; 2500-row groups give x8 sixteen-way scans.
        pq.write_table(pa.concat_tables(parts), dst,
                       row_group_size=2500,
                       use_deprecated_int96_timestamps=False)
    return out


def env_mem():
    return os.environ.get("SCALE_CURVE_MEM", "24g")


def run_bench(sf_dir, queries, reps):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_REPS=str(reps),
               # Ample heap: on a real cluster 8x data means 8x
               # executors at CONSTANT memory per core; in one JVM the
               # default 8g heap turns x8 into a GC-ceiling measurement
               # (observed: bpe_encode 20s at x4 under 8g vs 6.9s under
               # 16g, identical plan). Measure the operator, not the
               # heap wall.
               SPARK_DRIVER_MEM=env_mem())
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, cwd="/root/repo",
                       env=env)
    for line in r.stdout.splitlines():
        # sbt prefixes the line with "[info] "
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    print(r.stdout[-3000:])
    print(r.stderr[-2000:])
    raise SystemExit(f"bench produced no JSON line on {sf_dir}")


def fit_slope(xs, ys):
    """OLS slope of log2(y) on log2(x)."""
    lx = [math.log2(x) for x in xs]
    ly = [math.log2(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main():
    queries = sys.argv[1:] or DEFAULT_QUERIES
    reps = int(os.environ.get("SCALE_CURVE_REPS", "3"))
    walls = {q: {} for q in queries}
    for scale in SCALES:
        sf_dir = build(scale)
        print(f"== x{scale}: bench {len(queries)} queries on {sf_dir}",
              flush=True)
        out = run_bench(sf_dir, queries, reps)
        # keep the full artifact (spread, load, start offsets) so an
        # odd-looking exponent can be adjudicated without a re-run
        with open(f"{ROOT}/bench_x{scale}.json", "w") as fh:
            json.dump(out, fh)
        if out.get("failed"):
            raise SystemExit(f"x{scale} failures: {out['failed']}")
        for q in queries:
            # (median, trimmed-min): the exponent fit uses the MIN —
            # ambient load and cross-query JVM interference are
            # ADDITIVE noise on a shared box (see BASELINE.md's
            # adjudication ledgers), so the per-scale minimum tracks
            # the true cost while a loaded run's median can inflate
            # one scale 3x and fake (or mask) an exponent. Medians
            # stay in the table for the noise picture.
            walls[q][scale] = (out["queries"][q], out["spread"][q][0])
        print("   " + " ".join(f"{q}={out['queries'][q]:.2f}s"
                               for q in queries), flush=True)

    scale_hdr = " | ".join(f"x{s}" for s in SCALES)
    print(f"\n| query | {scale_hdr} (median/min) | slope-min(all) |"
          f" slope-min(tail) | contract |")
    print("|" + "---|" * (len(SCALES) + 4))
    bad = []
    for q in queries:
        w = walls[q]
        s_all = fit_slope(SCALES, [w[s][1] for s in SCALES])
        tail = [s for s in SCALES if s >= 2]
        if len(tail) < 2:
            tail = SCALES  # degenerate scale set: fall back to the full fit
        s_tail = fit_slope(tail, [w[s][1] for s in tail])
        contract = "linear" if q in CLAIMED_LINEAR else "ungated"
        print(f"| {q} | " +
              " | ".join(f"{w[s][0]:.2f}/{w[s][1]:.2f}" for s in SCALES) +
              f" | {s_all:.2f} | {s_tail:.2f} | {contract} |")
        if q in CLAIMED_LINEAR and s_tail > 1.3:
            bad.append((q, s_tail))
    if bad:
        print(f"\nSCALE CURVE FAILED (claimed-linear op super-linear): {bad}")
        sys.exit(1)
    print("\nSCALE CURVE OK: every claimed-linear op's tail exponent <= 1.3")


if __name__ == "__main__":
    main()
