"""Training-data ops: dedup family, ANN, text analysis — semantic checks
(the value-level parity vs DuckDB runs in tools/check_oracle.py and the
driver harness)."""

import math

from pyspark.sql import functions as F

from qs_spark import textops as X

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup_partitions_docs(spark):
    d = _docs(spark)
    out = X.dedup_exact(d).toPandas()
    assert out["n_dups"].sum() == d.count()  # every doc in exactly one group


def test_minhash_lsh_finds_true_duplicates(spark):
    d = _docs(spark)
    first = d.orderBy("doc_id").first()
    # plant an exact copy (collapses into the original's exact-dup cluster)
    # and a near-duplicate (one appended token — survives dedup, must be
    # found by the banding)
    exact = d.limit(1).select(
        F.lit(900001).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = d.limit(1).select(
        F.lit(900002).alias("doc_id"),
        F.concat("text", F.lit(" zzzextra")).alias("text"),
        "lang", "source", "n_chars",
    )
    planted = d.unionByName(exact.unionByName(near))
    pairs = X.lsh_candidate_pairs(planted).toPandas()
    # exact copy never appears (represented by the original doc upstream)
    assert not ((pairs.doc_a == 900001) | (pairs.doc_b == 900001)).any()
    # near-dup pair (original, 900002) found by the banding
    assert ((pairs.doc_a == first.doc_id) & (pairs.doc_b == 900002)).any()
    # the exact cluster is still visible where it belongs: dedup_exact
    dd = X.dedup_exact(planted).toPandas()
    assert (dd[dd.keep_doc_id == first.doc_id].n_dups == 2).all()


def test_minhash_similar_docs_share_signature_bits(spark):
    d = _docs(spark)
    sigs = X.minhash_signatures(d.limit(20)).toPandas()
    assert len(sigs) == 20
    assert sigs.filter(like="mh").notna().all().all()


def test_simhash_identical_texts_equal(spark):
    d = _docs(spark).limit(5)
    a = X.simhash(d).toPandas().set_index("doc_id")["simhash"]
    b = X.simhash(d).toPandas().set_index("doc_id")["simhash"]
    assert (a == b).all()
    assert (a >= 0).all() and (a < (1 << X.SIMHASH_BITS)).all()


def test_jaccard_bounds_and_symmetric_blocking(spark):
    d = _docs(spark).filter(F.col("source") == "src0")
    out = X.ngram_jaccard_pairs(d).toPandas()
    if len(out):
        assert ((out.jaccard > 0) & (out.jaccard <= 1)).all()
        assert (out.doc_a < out.doc_b).all()


def test_ann_bruteforce_top1_is_query_itself(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    top = X.ann_bruteforce(ed, qvec, k=5).toPandas()
    assert top.iloc[0].vec_id == 0  # cosine(q, q) = 1
    assert abs(top.iloc[0].cosine - 1.0) < 1e-6
    assert top.cosine.is_monotonic_decreasing


def test_ann_lsh_subset_of_bruteforce_ordering(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    lsh = X.ann_lsh(ed, qvec, k=5).toPandas()
    assert len(lsh) > 0
    assert lsh.iloc[0].vec_id == 0  # query's own bucket contains itself
    # every LSH result's cosine must equal the exact cosine (same formula)
    bf = X.ann_bruteforce(ed, qvec, k=2000).toPandas().set_index("vec_id")["cosine"]
    for _, r in lsh.iterrows():
        assert abs(bf[r.vec_id] - r.cosine) < 1e-9


def test_quality_and_langid_ranges(spark):
    d = _docs(spark)
    q = X.text_quality(d).toPandas()
    assert ((q.quality >= 0) & (q.quality <= 1)).all()
    li = X.lang_id(d).toPandas()
    assert set(li.lang_pred.unique()) <= set(X._LANG_MARKERS) | {"other"}
    # multi-language markers: planted non-English docs classify correctly
    from qs_spark.session import get_spark

    planted = get_spark("t", cores=8).createDataFrame(
        [
            (1, "el que la de los se una con por y el que"),
            (2, "le les des et une du est dans qui pour"),
            (3, "der die und das ein zu ist den von nicht"),
            (4, "zzz qqq www"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.lang_pred for r in X.lang_id(planted).collect()}
    assert got == {1: "es", 2: "fr", 3: "de", 4: "other"}


def test_compute_score_reference_constants():
    # F10 column expr == reference compute_score (utils/util.py:165-192)
    from qs_spark.search import compute_score_col

    ref = min(0.7 + 0.3 * math.log(1 + 7) / math.log(1 + 40), 0.9995)
    from qs_spark.session import get_spark

    spark = get_spark("t", cores=8)
    got = spark.range(1).select(
        compute_score_col(F.lit(7.0), F.lit(40.0)).alias("s")
    ).first().s
    assert abs(got - round(ref, 6)) < 1e-9


def test_simhash_banded_equals_bruteforce(spark):
    """The pigeonhole band join must be LOSSLESS for hamming <= k: result
    set == brute-force all-pairs (the r01 group-blocked version was a scale
    hazard; this one must also be exactly right)."""
    import itertools

    d = _docs(spark).limit(80)
    got = X.simhash_near_dup_pairs(d, max_hamming=4).toPandas()
    sims = X.simhash(d).toPandas().set_index("doc_id")["simhash"]
    expect = {
        (a, b)
        for a, b in itertools.combinations(sorted(sims.index), 2)
        if bin(int(sims[a]) ^ int(sims[b])).count("1") <= 4
    }
    assert set(zip(got.doc_a, got.doc_b)) == expect
    assert (got.hamming <= 4).all()


def test_simhash_banded_plan_has_no_cartesian(spark):
    d = _docs(spark).limit(50)
    plan = (
        X.simhash_near_dup_pairs(d, max_hamming=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_pairs_are_lsh_candidates(spark):
    """ngram_jaccard_pairs is LSH-prefiltered: every returned pair must be an
    LSH candidate, and jaccard values are exact (0, 1]."""
    d = _docs(spark).filter(F.col("source") == "src0")
    pairs = X.ngram_jaccard_pairs(d).toPandas()
    cand = X.lsh_candidate_pairs(d).toPandas()
    cset = set(zip(cand.doc_a, cand.doc_b))
    assert set(zip(pairs.doc_a, pairs.doc_b)) <= cset
    if len(pairs):
        assert ((pairs.jaccard > 0) & (pairs.jaccard <= 1)).all()
        assert (pairs.doc_a < pairs.doc_b).all()


def test_ann_multiprobe_recall_dominates_single_probe(spark):
    """Multiprobe scans the single-probe bucket plus margin-ordered neighbor
    buckets: its top-k must be at least as good rank-for-rank, and its
    candidate set contains the single-probe results."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    one = X.ann_lsh(ed, qvec, k=10, n_probes=1).toPandas()
    multi = X.ann_lsh(ed, qvec, k=10, n_probes=4).toPandas()
    assert multi.iloc[0].vec_id == 0
    for r in range(min(len(one), len(multi))):
        assert multi.iloc[r].cosine >= one.iloc[r].cosine - 1e-12


def test_ann_ivf_probe_contains_query_and_exact_cosines(spark):
    """IVF: the query vector's own cell is always the nearest-centroid probe,
    so vec 0 (the query) must rank first; all returned cosines must equal the
    brute-force values (same formula, subset scan)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    assigned, centers = X.ivf_index(ed, nlist=8)
    got = X.ann_ivf_search(assigned, centers, qvec, k=10, nprobe=2).toPandas()
    assert got.iloc[0].vec_id == 0 and abs(got.iloc[0].cosine - 1.0) < 1e-6
    bf = X.ann_bruteforce(ed, qvec, k=2000).toPandas().set_index("vec_id")["cosine"]
    for _, r in got.iterrows():
        assert abs(bf[r.vec_id] - r.cosine) < 1e-9
    # more probes -> recall (top-k quality) never degrades
    wide = X.ann_ivf_search(assigned, centers, qvec, k=10, nprobe=8).toPandas()
    for r in range(min(len(got), len(wide))):
        assert wide.iloc[r].cosine >= got.iloc[r].cosine - 1e-12


def test_embedding_near_dup_lsh_precision_exact(spark):
    """LSH-bucketed embedding near-dup: every returned pair must be a TRUE
    pair (cosine >= threshold, verified against direct computation); with a
    planted exact duplicate, the dup pair must be found (identical vectors
    share every signature)."""
    import numpy as np

    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    dup = ed.filter(F.col("vec_id") == 3).select(
        F.lit(900001).alias("vec_id"), "label", "embedding"
    )
    planted = ed.select("vec_id", "label", "embedding").unionByName(dup)
    got = X.embedding_near_dup_lsh(planted, threshold=0.9).toPandas()
    assert ((got.vec_a == 3) & (got.vec_b == 900001)).any()
    vecs = {r.vec_id: np.array(r.embedding) for r in planted.collect()}
    for _, r in got.iterrows():
        a, b = vecs[r.vec_a], vecs[r.vec_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r.cosine) < 1e-5 and cos >= 0.9 - 1e-9


def test_winnow_fingerprint_stable_under_local_edit(spark):
    """Winnowing guarantees: identical docs -> identical fingerprint sets;
    a doc sharing a long substring shares a large fraction of fingerprints;
    disjoint text shares (almost) none."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base),
        (2, base),  # exact duplicate
        (3, "PREFIX EDIT " + base + " SUFFIX EDIT"),  # local edits
        (4, "zxqv " * 80),  # unrelated
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    fp = {r.doc_id: set(r.fingerprints) for r in X.winnow_fingerprint(d).collect()}
    assert fp[1] == fp[2]
    inter = len(fp[1] & fp[3]) / len(fp[1] | fp[3])
    assert inter > 0.5
    assert len(fp[1] & fp[4]) / len(fp[1]) < 0.05


def test_sketch_stats_within_tolerance_of_exact(spark):
    """The 100 TB sketch paths (approx_percentile t-digest, HLL++ distinct)
    must track their exact counterparts within documented error bounds."""
    d = _docs(spark)
    pe = X.percentiles_per_group(d, "source", "n_chars", exact=True).toPandas().set_index("source")
    pa = X.percentiles_per_group(d, "source", "n_chars", exact=False).toPandas().set_index("source")
    for src in pe.index:
        for c in ("p50", "p95"):
            assert abs(pe.loc[src, c] - pa.loc[src, c]) <= 0.1 * max(pe.loc[src, c], 1)
    ve = X.vocab_per_group(d, "source", exact=True).toPandas().set_index("source")
    va = X.vocab_per_group(d, "source", exact=False).toPandas().set_index("source")
    for src in ve.index:
        assert abs(ve.loc[src, "vocab_size"] - va.loc[src, "vocab_size"]) <= 0.1 * ve.loc[src, "vocab_size"]


def test_lsh_degenerate_dup_corpus_stays_linear(spark):
    """r02 weak spot: 10k copies of one doc share every band bucket; the
    naive bucket self-join emits ~50M pairs.  With exact-dedup upstream the
    cluster collapses to ONE representative — output stays small and no pair
    links two members of the duplicate cluster."""
    base = _docs(spark).limit(50).select("doc_id", "text")
    dup = spark.range(10_000).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.lit("aaa bbb ccc ddd eee fff ggg hhh").alias("text"),
    )
    pairs = X.lsh_candidate_pairs(base.unionByName(dup)).toPandas()
    assert len(pairs) < 5_000  # not ~50M
    # only the representative (min doc_id = 100000) survives from the cluster
    assert not ((pairs.doc_a > 100_000) | (pairs.doc_b > 100_000)).any()


def test_lsh_bucket_cap_emits_star_not_quadratic(spark):
    """Near-identical family (shared 200-token text + unique suffix) is NOT
    collapsed by exact dedup; the bucket cap must turn its all-pairs output
    into a connectivity-preserving star."""
    base_text = " ".join(f"w{i}" for i in range(200))
    docs = spark.range(40).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit(base_text + " u"), F.col("id").cast("string")).alias("text"),
    )
    capped = X.lsh_candidate_pairs(docs, max_bucket_size=8).toPandas()
    uncapped = X.lsh_candidate_pairs(docs, max_bucket_size=10_000).toPandas()
    assert len(uncapped) > 600  # the family really is all-pairs-dense
    assert len(capped) < len(uncapped) / 3  # star output is O(m), not m^2/2
    # connectivity: every member still reachable (appears in some pair)
    assert set(capped.doc_a) | set(capped.doc_b) == set(range(40))


def test_embedding_near_dup_cap_keeps_verified_star(spark):
    """Embedding hot-bucket cap: identical vectors land in one bucket per
    table; over the cap, only rep-star pairs come out — all cosine=1 — and
    every member stays connected to the representative."""
    e = spark.range(30).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[F.lit(float(v)) for v in (1.0, 2.0, 3.0, 4.0)]).alias("embedding"),
    )
    capped = X.embedding_near_dup_lsh(e, threshold=0.99, max_bucket_size=8).toPandas()
    assert (capped.vec_a == 0).all()  # star to the min vec_id
    assert set(capped.vec_b) == set(range(1, 30))
    assert (capped.cosine >= 0.999999).all()
    uncapped = X.embedding_near_dup_lsh(e, threshold=0.99).toPandas()
    assert len(uncapped) == 30 * 29 // 2


def test_ann_indexed_equals_scan_and_prunes(spark, tmp_path):
    """write_ann_index + ann_lsh_indexed must return exactly the scan-form
    ann_lsh result, with the plan pruned to the probed sig partitions."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    path = str(tmp_path / "ann")
    X.write_ann_index(ed, path)
    scan = X.ann_lsh(ed, qvec, k=10, n_probes=8).toPandas()
    idx = X.ann_lsh_indexed(spark, path, qvec, k=10, n_probes=8)
    assert idx.toPandas().values.tolist() == scan.values.tolist()
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "sig" in plan.split("PartitionFilters", 1)[1][:200]


def test_ann_probe_seq_margin_order(spark):
    """Probe sequence: starts at the query's own bucket (flip score 0),
    distinct buckets, covers the whole space when n_probes = 2^planes."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    probes = X.ann_probe_seq(qvec, 6, 64)
    assert len(probes) == 64 and len(set(probes)) == 64
    p1 = X.ann_probe_seq(qvec, 6, 1)
    assert probes[0] == p1[0]  # own bucket first
    assert X.ann_probe_seq(qvec, 6, 8) == probes[:8]  # prefix-stable


def test_minhash_kernel_matches_jvm_exprs(spark):
    """The Arrow-batched minhash kernel must produce EXACTLY the column-
    expression form's signatures (same md5 double-hashing math — this
    equality is what keeps the DuckDB oracles valid)."""
    d = _docs(spark).limit(100)
    a = X.minhash_signatures(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        X.minhash_signatures_expr(d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_minhash_kernel_matches_jvm_exprs_non_ascii(spark):
    """r04 VERDICT #5: normalization now happens JVM-side for BOTH forms, so
    kernel == expr must hold on planted non-ASCII text too — Turkish dotted
    İ (str.lower() vs UTF8String divergence class), NBSP/ideographic-space
    separators (\\s-class divergence class), sharp s, combining accents."""
    rows = [
        (1, "İstanbul ŞEHİR Pİ yazı İİİ metin İçerik uzun"),
        (2, "données françaises straße GROßE text mit mehr"),
        (3, "a\xa0b\xa0c d　e f g h i j"),  # NBSP + ideographic space
        (4, "ΣΊΣΥΦΟΣ ΑΘΗΝΑ ελληνικά κείμενο με περισσότερες λέξεις"),
        (5, "plain ascii control row with enough words to shingle"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    a = X.minhash_signatures(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        X.minhash_signatures_expr(d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_doc_sketches_matches_jvm_parts(spark):
    """doc_sketches (r05 fused scan) must equal doc_fingerprints (JVM
    F.md5(norm_text())) on fp — including null-text rows, which it KEEPS —
    and minhash_signatures_expr on the signature columns, including planted
    non-ASCII (the fp hashes the same UTF-8 bytes the JVM md5 hashes)."""
    rows = [
        (1, "İstanbul ŞEHİR Pİ yazı İİİ metin İçerik uzun"),
        (2, "données françaises straße GROßE text mit mehr"),
        (3, "a\xa0b\xa0c d　e f g h i j"),  # NBSP + ideographic space
        (4, "plain ascii control row with enough words to shingle"),
        (5, "plain ascii control row with enough words to shingle"),  # dup
        (6, None),  # null text: kept, fp/mh* null
        (7, ""),  # empty text: non-null, hashes like the JVM form
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    sk = X.doc_sketches(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    fp = (
        X.doc_fingerprints(d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(sk["doc_id"]) == list(fp["doc_id"])  # null rows kept
    assert list(sk["fp"]) == list(fp["fp"])
    mh = (
        X.minhash_signatures_expr(d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = sk[sk["mh0"].notna()].reset_index(drop=True)
    mh_cols = [c for c in mh.columns if c.startswith("mh")]
    assert list(got["doc_id"]) == list(mh["doc_id"])
    for c in mh_cols:
        assert [int(x) for x in got[c]] == [int(x) for x in mh[c]], c


def test_salted_join_salt_is_content_derived(spark):
    """r04 VERDICT #7: the big-side salt must be a function of row CONTENT,
    not partition layout — identical (row -> salt) mapping and identical
    join output under different input partitionings (what a task retry or a
    different scan split produces)."""
    big = spark.range(0, 400).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k long, v string")

    def salts(df):
        s = df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8)).cast("int"),
        )
        return {(r.k, r.payload): r._salt for r in s.collect()}

    assert salts(big.repartition(1)) == salts(big.repartition(13, "payload"))
    out1 = X.salted_join(big.repartition(1), small, "k").toPandas()
    out2 = X.salted_join(big.repartition(13, "payload"), small, "k").toPandas()
    key = ["k", "payload"]
    assert out1.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )
    assert len(out1) == 400  # every big row joined exactly once


def test_ivf_tiny_sample_falls_back_to_full_training(spark):
    """r04 ADVICE: a hash sample smaller than ~10*nlist rows must not reach
    KMeans (degenerate/failing fit on small tables or tiny fractions) — the
    index falls back to full-table training and still assigns every row."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    assigned, centers = X.ivf_index(ed, nlist=8, train_fraction=0.001)
    assert len(centers) == 8
    assert assigned.filter(F.col("_cell").isNull()).count() == 0
    assert assigned.count() == 40


def test_connected_components_min_label(spark):
    """Known graph: {1,2,3} and {5,6} plus a diameter-8 chain — labels must
    be the component minimum for every node."""
    edges = [(1, 2), (2, 3), (5, 6)] + [(10 + i, 11 + i) for i in range(8)]
    pairs = spark.createDataFrame(edges, "doc_a int, doc_b int")
    got = {r.node: r.cluster for r in X.connected_components(pairs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6] == 5
    assert all(got[10 + i] == 10 for i in range(9))


def test_connected_components_tiers_identical(spark):
    """r05: the three execution tiers — driver-local union-find (tiny
    graphs), broadcast-join rounds (small), shuffle-join rounds (the 100 TB
    plan) — must produce IDENTICAL labels.  Mixed topology: clique + long
    chain + star + singletons-in-pairs."""
    edges = (
        [(1, 2), (2, 3), (1, 3)]
        + [(10 + i, 11 + i) for i in range(12)]
        + [(100, 100 + i) for i in range(1, 9)]
        + [(500, 501)]
    )
    pairs = spark.createDataFrame(edges, "doc_a int, doc_b int")

    def run(**kw):
        return (
            X.connected_components(pairs, **kw)
            .toPandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    via_local = run()
    via_broadcast = run(local_below=0)
    via_shuffle = run(local_below=0, broadcast_below=0)
    assert via_local.equals(via_broadcast)
    assert via_local.equals(via_shuffle)
    assert set(via_local.cluster) == {1, 10, 100, 500}


def test_near_dup_clusters_drop_duplicates(spark):
    """End-to-end dedup: exact copy + near copy cluster with the original;
    keeping representatives drops exactly the duplicates."""
    d = _docs(spark).limit(40).select("doc_id", "text")
    first = d.orderBy("doc_id").first()
    exact = d.limit(1).select(F.lit(900001).alias("doc_id"), "text")
    near = d.limit(1).select(
        F.lit(900002).alias("doc_id"), F.concat("text", F.lit(" zzz")).alias("text")
    )
    planted = d.unionByName(exact).unionByName(near)
    cl = X.near_dup_clusters(planted, jaccard_threshold=0.5).toPandas()
    assert len(cl) == 42
    byid = cl.set_index("doc_id")
    assert byid.loc[900001, "cluster"] == first.doc_id
    assert byid.loc[900002, "cluster"] == first.doc_id
    assert bool(byid.loc[first.doc_id, "is_representative"])
    assert not bool(byid.loc[900001, "is_representative"])
    assert not bool(byid.loc[900002, "is_representative"])
    # exactly one representative per cluster; at least the two planted
    # duplicates are dropped (organic near-dups in the sample may add more)
    per_cluster = cl.groupby("cluster").is_representative.sum()
    assert (per_cluster == 1).all()
    assert int(cl.is_representative.sum()) <= 40


def test_ivf_indexed_equals_memory_and_prunes(spark, tmp_path):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    assigned, centers = X.ivf_index(ed, nlist=8)
    path = str(tmp_path / "ivf")
    X.write_ivf_index(assigned, path)
    mem = X.ann_ivf_search(assigned, centers, qvec, k=10, nprobe=2).toPandas()
    idx = X.ann_ivf_indexed(spark, path, centers, qvec, k=10, nprobe=2)
    assert idx.toPandas().values.tolist() == mem.values.tolist()
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_pack_sequences_budget_and_determinism(spark):
    """Sequence packing: every non-oversize pack's token sum <= budget,
    oversize docs sit alone, pack ids are globally unique per doc, and the
    assignment is identical across input partitionings (content-derived
    sharding + ordering)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", (F.col("n_chars") / 4).cast("long").alias("n_tokens")
    )
    budget = 60
    packed = X.pack_sequences(docs, budget, n_shards=8).toPandas()
    assert len(packed) == docs.count()
    sums = packed.groupby("pack_id").n_tokens.sum()
    oversize_packs = set(packed[packed.oversize].pack_id)
    for pid, s in sums.items():
        if pid in oversize_packs:
            assert len(packed[packed.pack_id == pid]) == 1  # solo
        else:
            assert s <= budget, (pid, s)
    # determinism across partitionings
    again = X.pack_sequences(docs.repartition(17), budget, n_shards=8).toPandas()
    a = packed.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert (a.pack_id.values == b.pack_id.values).all()
    # utilization rollup sane
    u = X.pack_utilization(
        X.pack_sequences(docs, budget, n_shards=8), budget
    ).first()
    assert u.n_packs == packed.pack_id.nunique()
    assert 0 < u.mean_fill <= 1.0


def test_pack_sequences_oversize_and_edge(spark):
    d = spark.createDataFrame(
        [(1, 4), (2, 15), (3, 3), (4, 7), (5, 10)], "doc_id long, n_tokens long"
    )
    out = X.pack_sequences(d, budget=10, n_shards=1).toPandas().set_index("doc_id")
    assert bool(out.loc[2, "oversize"]) and not bool(out.loc[1, "oversize"])
    # doc 2 is alone in its pack
    p2 = out.loc[2, "pack_id"]
    assert (out.pack_id == p2).sum() == 1
    sums = out.groupby("pack_id").n_tokens.sum()
    for pid, s in sums.items():
        assert s <= 10 or pid == p2


def test_pack_sequences_string_id_collation(spark):
    """r05 VERDICT #6: the in-shard fill order is pandas sort_values —
    CODEPOINT order for string doc_ids.  Python's sorted() is the same
    order, and DuckDB's default collation for the oracle's ORDER BY is
    binary (also codepoint for UTF-8), so all three agree; this pins the
    contract with mixed-case + non-ASCII ids (where codepoint order differs
    visibly from any locale collation: 'Zebra' < 'apple' < 'Ärmel')."""
    ids = ["apple", "Apple", "Zebra", "zebra", "Ärmel", "éclair", "ABC1", "_x"]
    toks = [4, 7, 3, 9, 2, 6, 5, 8]
    docs = spark.createDataFrame(
        [(i, t, 0) for i, t in zip(ids, toks)],
        "doc_id string, n_tokens long, shard int",
    ).repartition(5)
    budget = 10
    out = (
        X.pack_sequences(docs, budget, shard_col="shard")
        .toPandas()
        .set_index("doc_id")
    )
    # reference greedy fill over Python sorted() (codepoint) order
    tok_of = dict(zip(ids, toks))
    expect, cur, pack = {}, 0, 0
    first = True
    for i in sorted(ids):
        t = tok_of[i]
        if not first and cur + t > budget:
            pack, cur = pack + 1, 0
        expect[i] = pack
        cur += t
        first = False
        if t > budget:
            pack, cur, first = pack + 1, 0, True
    got = {i: int(out.loc[i, "pack_id"]) for i in ids}
    assert got == expect, (got, expect)
    # codepoint order is visibly non-locale here: uppercase before lowercase
    assert sorted(ids)[:3] == ["ABC1", "Apple", "Zebra"]


def test_ivf_sampled_training_keeps_recall(spark):
    """r03 VERDICT #5: train_fraction fits KMeans on a SAMPLE (the 100 TB
    shape — k-means is multi-pass, assignment is one pass) and must keep the
    probe-recall contract: the query's own cell is still its nearest-centroid
    probe (vec 0 ranks first at cosine 1.0), returned cosines stay exact, and
    every row is assigned to a cell."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    ed = e.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    assigned, centers = X.ivf_index(ed, nlist=8, train_fraction=0.2)
    assert assigned.filter(F.col("_cell").isNull()).count() == 0
    assert assigned.count() == ed.count()
    got = X.ann_ivf_search(assigned, centers, qvec, k=10, nprobe=2).toPandas()
    assert got.iloc[0].vec_id == 0 and abs(got.iloc[0].cosine - 1.0) < 1e-6
    bf = X.ann_bruteforce(ed, qvec, k=2000).toPandas().set_index("vec_id")["cosine"]
    for _, r in got.iterrows():
        assert abs(bf[r.vec_id] - r.cosine) < 1e-9
    # recall gate vs brute force: >= 5 of the true top-10 in the probed result
    top10 = set(bf.sort_values(ascending=False).head(10).index)
    assert len(top10 & set(got.vec_id)) >= 5


def test_corpus_filter_single_reason_precedence(spark):
    """C4-style cleaning: every dropped doc gets exactly one reason in the
    documented precedence; keep == no reason; planted cases hit each rule."""
    rows = [
        (1, "short doc"),                                         # too_short
        (2, "!!! ??? ... " * 20),                                 # punctuation
        (3, "el que la de que los se una con por y el que la de"),  # language (es)
        (4, "the a of and to in is it that for " * 5),            # clean en
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = X.corpus_filter(d).toPandas().set_index("doc_id")
    assert out.loc[1, "drop_reason"] == "too_short" and not out.loc[1, "keep"]
    assert out.loc[2, "drop_reason"] == "punctuation"
    assert out.loc[3, "drop_reason"] == "language"
    assert out.loc[4, "drop_reason"] is None and bool(out.loc[4, "keep"])


def test_new_ops_hostile_edges(spark):
    """Empty/degenerate inputs must not crash the new operators."""
    empty_pairs = spark.createDataFrame([], "doc_a int, doc_b int")
    assert X.connected_components(empty_pairs).count() == 0
    one_doc = spark.createDataFrame([(1, "only doc here")], "doc_id int, text string")
    cl = X.near_dup_clusters(one_doc).toPandas()
    assert len(cl) == 1 and bool(cl.iloc[0].is_representative)
    # null text flows through corpus_filter without crashing
    nulls = spark.createDataFrame(
        [(1, None), (2, "the a of and to in is it that for " * 3)],
        "doc_id int, text string",
    )
    out = X.corpus_filter(nulls).toPandas().set_index("doc_id")
    assert not bool(out.loc[1, "keep"])  # null text never survives cleaning
    assert bool(out.loc[2, "keep"])
