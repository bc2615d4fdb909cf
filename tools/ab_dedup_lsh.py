"""Interleaved A/B: fused doc_sketches scan (r05 default) vs the r04 shape
(separate JVM fingerprints + minhash-only kernel) for the STANDALONE
lsh_candidate_pairs query bench.py measures.

Usage: python tools/ab_dedup_lsh.py [n_rounds]   (fresh subprocess per trial,
alternating variants so window drift hits both sides equally; prints one
line per trial plus a summary).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def one(variant: str) -> dict:
    from qs_spark import textops as X
    from qs_spark.cachereg import release_caches
    from qs_spark.session import get_spark

    spark = get_spark(f"ab_{variant}", cores=32)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wdocs = docs.limit(64).cache()
    # warmup: same plan shape as the timed run for this variant
    if variant == "fused":
        X.lsh_candidate_pairs(wdocs).count()
        release_caches()
        t0 = time.time()
        n = X.lsh_candidate_pairs(docs).count()
    else:
        from qs_spark.cachereg import scoped_cache

        def r04_shape(d):
            sigs = scoped_cache(X.minhash_signatures(d))
            fps = X.doc_fingerprints(d)
            return X.lsh_candidate_pairs(d, fps=fps, sigs=sigs)

        r04_shape(wdocs).count()
        release_caches()
        t0 = time.time()
        n = r04_shape(docs).count()
    dt = time.time() - t0
    spark.stop()
    return {"variant": variant, "sec": round(dt, 3), "pairs": n}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    res = {"fused": [], "r04shape": []}
    for _ in range(rounds):
        for v in ("fused", "r04shape"):
            r = subprocess.run(
                [sys.executable, __file__, "--one", v],
                capture_output=True, text=True, timeout=600,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
            d = json.loads(line)
            res[v].append(d["sec"])
            print(d)
    import statistics

    for v, secs in res.items():
        print(v, "median", statistics.median(secs), "min", min(secs), secs)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print(json.dumps(one(sys.argv[2])))
    else:
        main()
