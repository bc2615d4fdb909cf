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


# --- Iceberg path -----------------------------------------------------------
# The sandbox ships no iceberg-spark-runtime jar, so the runtime round trip
# auto-skips; what MUST hold everywhere is (a) the SQL the catalog emits,
# (b) the constructor refusing a session with no registered catalog (so a
# misconfigured cluster fails loudly, not by writing parquet somewhere), and
# (c) Column->SQL predicate rendering on a classic session.

import pytest

from qs_spark.catalog import (
    IcebergCatalog,
    condition_to_sql,
    delete_where_sql,
    expire_snapshots_sql,
    get_catalog,
    merge_into_sql,
    qualified_name,
    rewrite_data_files_sql,
)


def test_merge_into_sql_shape():
    sql = merge_into_sql("`lake`.`qs`.`ckpt`", "`src`", ["bucket"], ["bucket", "state", "n"])
    assert sql == (
        "MERGE INTO `lake`.`qs`.`ckpt` t USING `src` s ON t.`bucket` = s.`bucket` "
        "WHEN MATCHED THEN UPDATE SET t.`state` = s.`state`, t.`n` = s.`n` "
        "WHEN NOT MATCHED THEN INSERT (`bucket`, `state`, `n`) "
        "VALUES (s.`bucket`, s.`state`, s.`n`)"
    )


def test_merge_into_sql_all_key_columns_has_no_update_clause():
    sql = merge_into_sql("t1", "s1", ["k"], ["k"])
    assert "WHEN MATCHED" not in sql and "WHEN NOT MATCHED THEN INSERT (`k`)" in sql


def test_maintenance_sql_shapes():
    assert delete_where_sql("`lake`.`qs`.`t`", "(__uid = 'u1')") == (
        "DELETE FROM `lake`.`qs`.`t` WHERE (__uid = 'u1')"
    )
    assert rewrite_data_files_sql("lake", "qs", "postings", 134217728) == (
        "CALL `lake`.system.rewrite_data_files(table => 'qs.postings'"
        ", options => map('target-file-size-bytes', '134217728'))"
    )
    assert expire_snapshots_sql("lake", "qs", "spans", retain_last=3) == (
        "CALL `lake`.system.expire_snapshots(table => 'qs.spans', retain_last => 3)"
    )
    assert qualified_name("lake", "qs", "we`ird") == "`lake`.`qs`.`we``ird`"


def test_condition_to_sql_renders_classic_column(spark):
    df = spark.createDataFrame([("u1", 1)], "__uid string, n int")
    got = condition_to_sql((F.col("__uid") == "u1") & (F.col("n") > 0), df)
    assert got == "((__uid = 'u1') AND (n > 0))"
    assert condition_to_sql("__uid = 'u1'") == "__uid = 'u1'"
    with pytest.raises(TypeError, match="target DataFrame"):
        condition_to_sql(F.col("n") > 0)


def test_iceberg_catalog_refuses_unregistered_catalog(spark):
    with pytest.raises(RuntimeError, match="no Spark catalog 'lake'"):
        IcebergCatalog(spark, "lake", "qs")


def test_get_catalog_factory(spark, tmp_path):
    assert isinstance(get_catalog(spark, str(tmp_path / "wh")), ParquetCatalog)
    with pytest.raises(RuntimeError):  # iceberg spec without the runtime
        get_catalog(spark, "iceberg://lake/qs")


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return bool(spark.conf.get("spark.sql.catalog.lake", None))
    except Exception:
        return False


def test_iceberg_roundtrip_when_runtime_present(spark, tmp_path):
    """Full surface parity check — runs only on a cluster with the Iceberg
    jar + a 'lake' catalog registered (sandbox: auto-skip)."""
    if not _iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar / catalog conf in this env")
    cat = IcebergCatalog(spark, "lake", "qs_test")
    cat.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), "t")
    cat.merge_by_key(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), "t", ["k"])
    assert {r.k: r.v for r in cat.read(spark, "t").collect()} == {1: "a", 2: "B", 3: "c"}
    cat.delete_where(spark, "t", F.col("k") == 1)
    assert sorted(r.k for r in cat.read(spark, "t").collect()) == [2, 3]
    cat.compact(spark, "t")
    assert cat.read(spark, "t").count() == 2


def test_identifier_quoting_property():
    """Any identifier (incl. embedded backticks) survives quoting: the SQL
    builders must never emit an unquoted or half-quoted name."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.text(min_size=1, max_size=20).filter(lambda s: "\x00" not in s))
    def check(name):
        q = qualified_name("c", "n", name)
        inner = q.split(".", 2)[2]
        assert inner.startswith("`") and inner.endswith("`")
        # unescaped backtick count inside must be even (all doubled)
        body = inner[1:-1]
        assert body.replace("``", "") == name.replace("`", "")

    check()
