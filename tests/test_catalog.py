"""ParquetCatalog: the Iceberg-equivalent MERGE/DELETE/overwrite surface the
checkpoint + registry modules rely on."""

from pyspark.sql import functions as F

from qs_spark.catalog import ParquetCatalog


def _cat(tmp_path):
    return ParquetCatalog(str(tmp_path / "wh"))


def test_merge_by_key_upserts(spark, tmp_path):
    cat = _cat(tmp_path)
    cat.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), "t")
    cat.merge_by_key(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), "t", ["k"])
    got = {r.k: r.v for r in cat.read(spark, "t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_delete_where(spark, tmp_path):
    cat = _cat(tmp_path)
    cat.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), "t")
    cat.delete_where(spark, "t", F.col("k") == 1)
    assert [r.k for r in cat.read(spark, "t").collect()] == [2]


def test_overwrite_partitions_dynamic(spark, tmp_path):
    cat = _cat(tmp_path)
    df = spark.createDataFrame([(0, "a"), (1, "b")], "bucket int, v string")
    cat.overwrite(df, "t", partition_by=["bucket"])
    # replace ONLY bucket 1; bucket 0 must survive
    cat.overwrite_partitions(
        spark.createDataFrame([(1, "B2"), (1, "B3")], "bucket int, v string"), "t", ["bucket"]
    )
    got = sorted((r.bucket, r.v) for r in cat.read(spark, "t").collect())
    assert got == [(0, "a"), (1, "B2"), (1, "B3")]


def test_compact_preserves_rows(spark, tmp_path):
    cat = _cat(tmp_path)
    df = spark.range(1000).withColumnRenamed("id", "k").repartition(16)
    cat.overwrite(df, "t")
    cat.compact(spark, "t", target_files=2)
    assert cat.read(spark, "t").count() == 1000
    import os

    files = [f for f in os.listdir(cat.path("t")) if f.endswith(".parquet")]
    assert len(files) <= 2


def test_rewrite_crash_recovery(spark, tmp_path):
    # a crash between rename(final->backup) and rename(stage->final) must not
    # make the table invisible to a resumed run
    import os

    from qs_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path))
    cat.overwrite(spark.range(5).toDF("id"), "t")
    os.rename(cat.path("t"), cat.path("t") + ".__old__")  # simulated crash
    assert cat.exists("t")  # recovery restored the backup
    assert cat.read(spark, "t").count() == 5
    assert not os.path.isdir(cat.path("t") + ".__old__")
