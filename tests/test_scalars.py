"""Scalar/util operators (F6/F7/P8/S12) + preview_docs page flow (W3/O3/A5)."""

from pyspark.sql import functions as F

from qs_spark.scalars import (
    assign_index_ids,
    file_extension,
    realm_key_diff,
    sha256_checksum,
    url_to_filename,
)


def test_url_to_filename_f6(spark):
    # reference: unquote(os.path.split(url.split("?")[0])[-1]) (extractor.py:73)
    df = spark.createDataFrame(
        [("https://b.s3.amazonaws.com/x/My%20Report.pdf?X-Amz-Signature=s",)], ["url"]
    )
    row = df.select(
        url_to_filename(F.col("url")).alias("fn"),
        file_extension(url_to_filename(F.col("url"))).alias("ext"),
    ).first()
    assert row.fn == "My Report.pdf"
    assert row.ext == ".pdf"


def test_file_extension_edge_cases(spark):
    df = spark.createDataFrame([("a.tar.gz",), ("noext",), (".hidden",)], ["f"])
    got = {r.f: r.ext for r in df.select("f", file_extension(F.col("f")).alias("ext")).collect()}
    # os.path.splitext parity: last-dot suffix; ".hidden" has NO extension
    assert got == {"a.tar.gz": ".gz", "noext": "", ".hidden": ""}


def test_sha256_matches_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([("hello world",)], ["t"])
    got = df.select(sha256_checksum(F.col("t")).alias("c")).first().c
    assert got == hashlib.sha256(b"hello world").hexdigest()


def test_realm_key_diff_p8(spark):
    df = spark.createDataFrame([(["lang", "tier"],)], ["presented"])
    missing, extra = realm_key_diff(F.col("presented"), ["lang", "region"])
    row = df.select(missing.alias("m"), extra.alias("e")).first()
    assert row.m == ["region"] and row.e == ["tier"]


def test_assign_index_ids_monotonic_resume(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["doc_id"])
    out = {r.doc_id: r.index_id for r in assign_index_ids(df, last_index_id=100).collect()}
    assert out == {"a": 101, "b": 102, "c": 103}  # resumes from checkpoint id


def test_preview_docs_pages_sorted(spark):
    from qs_spark.corpus import corpus_parquet
    from qs_spark.extract import extract_spans
    from qs_spark.previews import preview_count, preview_docs
    from qs_spark.store import build_store

    store = build_store(extract_spans(corpus_parquet(spark, 120)))
    ids = [f"doc{i:08d}" for i in range(60)]
    out = preview_docs(store, "table", ids).toPandas()
    assert len(out) > 0
    assert out["previews"].map(len).min() >= 1
    # O3: pages sorted within each doc
    for _, g in out.groupby("document_id"):
        assert list(g.page_no) == sorted(g.page_no)
    # A5
    spark_out = preview_docs(store, "table", ids)
    cnt = preview_count(spark_out).first().preview_count
    assert cnt == int(out["previews"].map(len).sum())


def test_assign_index_ids_bucketed_matches_global_order(spark):
    """Numeric keys take the per-bucket-range path; ids must still equal the
    global rank (bucket ranges are order-aligned), resuming from the offset."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    got = (
        assign_index_ids(d, last_index_id=1000, n_buckets=16)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.index_id) == [1001 + i for i in range(len(got))]


def test_assign_index_ids_no_global_window_for_numeric(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    plan = (
        assign_index_ids(d, n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window must be partitioned (by _b), not a single global sort
    assert "SinglePartition" not in plan


def test_assign_index_ids_string_keys_no_global_window(spark):
    """r04 VERDICT #4: non-numeric keys must take the range-partitioned path
    (repartitionByRange + per-partition offsets), not a single global window
    — same provable equality to the global rank as the numeric path."""
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.concat(F.lit("s"), F.col("doc_id").cast("string")).alias("sid"))
    )
    out = assign_index_ids(d, last_index_id=500, order_cols=("sid",), n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    got = out.toPandas().sort_values("sid").reset_index(drop=True)
    assert list(got.index_id) == [501 + i for i in range(len(got))]
    # determinism across executions of the (sampled) range exchange
    again = (
        assign_index_ids(d, last_index_id=500, order_cols=("sid",), n_buckets=8)
        .toPandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    assert got.equals(again)
    # null string keys sort first (NULLS FIRST, like the global default)
    rows = [(None,), ("b",), (None,), ("a",)]
    nd = spark.createDataFrame(rows, "sid string")
    nout = assign_index_ids(nd, order_cols=("sid",), n_buckets=4).toPandas()
    assert sorted(nout.index_id) == [1, 2, 3, 4]
    assert set(nout[nout.sid.isna()].index_id) == {1, 2}
    assert nout.set_index("sid").loc["a", "index_id"] == 3
    assert nout.set_index("sid").loc["b", "index_id"] == 4


def test_assign_index_ids_null_keys_bucket_zero(spark):
    """r02 ADVICE: width_bucket(null) is null — null order keys must get a
    dedicated first bucket (NULLS FIRST, matching the global-window default)
    and never produce null ids."""
    from qs_spark.scalars import assign_index_ids

    rows = [(None,), (5,), (None,), (1,), (9,), (3,)] + [(i,) for i in range(10, 40)]
    df = spark.createDataFrame(rows, "k int")
    out = assign_index_ids(df, last_index_id=100, order_cols=("k",), n_buckets=4).toPandas()
    assert out.index_id.notna().all()
    assert sorted(out.index_id) == list(range(101, 101 + len(rows)))
    # nulls take the first ids; non-null keys follow in key order
    nulls = out[out.k.isna()]
    assert set(nulls.index_id) == {101, 102}
    nn = out[out.k.notna()].sort_values("k")
    assert nn.index_id.is_monotonic_increasing
