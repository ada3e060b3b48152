#!/usr/bin/env python3
"""8-vs-32-core scaling proof at a SF where the data actually binds
(r18, per the r17 verdict item 2: at sf0.1 the 8-core full bench BEAT
the 32-core run — every query is fixed-overhead-bound at that scale,
so the per-query parallelism claim was unproven in either direction).

Build: the scale_curve.py x-scale construction (caesar-perturbed
copies — constant duplicate rate, so pair-generating operators scale
like a real corpus), but seeded from sf0.1 instead of sf0.01: x8 of
sf0.1 is a 40k-doc / 16k-vector corpus (~sf0.8).

Measure: the heavy data-bound family at SPARK_GRAFT_CPUS=8 and =32,
one JVM per core count (identical Bench harness: noop sink, warm-up,
reps, settle). Report per-query medians and the low/high ratio: a
ratio near 1 means the row is still overhead-bound even at x8; a
ratio approaching 4 (the core ratio) means the data path parallelizes.

Usage: python3 tools/core_scaling.py [query ...]
Env: CORE_SCALING_SCALE (default 8), CORE_SCALING_REPS (default 2).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SCALE_CURVE_SRC", "/root/testdata/sf0.1")
import scale_curve  # noqa: E402  (reuses build(); SRC env above)

# The heavy data-bound rows (r18 before-bench top of the non-streaming
# list + the families whose scaling story matters at 100 TB).
DEFAULT_QUERIES = [
    "ngram_jaccard_pairs", "containment_pairs", "jaccard_prefix_pairs",
    "dedup_incremental_exact", "dedup_clusters", "dedup_clusters_incremental",
    "clean_corpus", "clean_corpus_v2", "hashing_tfidf", "bpe_encode",
    "chunk_pack_pipeline", "sdm_topk", "nb_quality_scores_bigram",
    "multimodal_keyframe_stats", "embedding_whiten_check", "knn_pagerank",
]


def run_bench(sf_dir, queries, reps, cpus):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_REPS=str(reps),
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_DRIVER_MEM=os.environ.get("SCALE_CURVE_MEM", "24g"))
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, cwd="/root/repo",
                       env=env)
    for line in r.stdout.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    print(r.stdout[-3000:])
    print(r.stderr[-2000:])
    raise SystemExit(f"bench produced no JSON line (cpus={cpus})")


def main():
    queries = sys.argv[1:] or DEFAULT_QUERIES
    scale = int(os.environ.get("CORE_SCALING_SCALE", "8"))
    reps = int(os.environ.get("CORE_SCALING_REPS", "2"))
    sf_dir = scale_curve.build(scale)
    print(f"== built x{scale} of {os.environ['SCALE_CURVE_SRC']} at {sf_dir}",
          flush=True)
    out = {}
    for cpus in (8, 32):
        print(f"== bench {len(queries)} queries at local[{cpus}]", flush=True)
        out[cpus] = run_bench(sf_dir, queries, reps, cpus)
        with open(f"/tmp/core_scaling_c{cpus}.json", "w") as fh:
            json.dump(out[cpus], fh)
    # Medians AND trimmed minima: on a shared box ambient load and JVM
    # pressure are ADDITIVE noise (the scale_curve.py rationale), and
    # at 32 resident task threads one GC-pressured rep can be 5x — the
    # per-count MINIMUM tracks the true cost of the shape.
    print(f"{'query':38s} {'c8':>8s} {'c32':>8s} {'med8/32':>8s} "
          f"{'min8':>8s} {'min32':>8s} {'min8/32':>8s}")
    rows = []
    for q in queries:
        a = out[8]["queries"].get(q)
        b = out[32]["queries"].get(q)
        ma = out[8]["spread"].get(q, [None])[0]
        mb = out[32]["spread"].get(q, [None])[0]
        r = (a / b) if a and b else None
        rm = (ma / mb) if ma and mb else None
        rows.append((q, a, b, r, ma, mb, rm))
        print(f"{q:38s} {a or float('nan'):8.2f} {b or float('nan'):8.2f} "
              f"{r or float('nan'):8.2f} {ma or float('nan'):8.2f} "
              f"{mb or float('nan'):8.2f} {rm or float('nan'):8.2f}")
    with open("/tmp/core_scaling_summary.json", "w") as fh:
        json.dump([{"query": q, "c8": a, "c32": b, "ratio": r,
                    "min8": ma, "min32": mb, "min_ratio": rm}
                   for q, a, b, r, ma, mb, rm in rows], fh, indent=1)


if __name__ == "__main__":
    main()
