"""Table IO abstraction.

The sandbox has no Iceberg runtime jar (offline pip), so this provides a
local parquet-directory catalog with the same call surface the Iceberg path
would use (append / dynamic-partition overwrite / merge-by-key / delete-where).
On a real cluster you'd swap `ParquetCatalog` for an Iceberg catalog and the
MERGE/DELETE bodies become `MERGE INTO` / `DELETE FROM` SQL — signatures and
semantics are identical (SURVEY.md §7.3-3).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _recover(self, table: str) -> None:
        """Crash recovery for _rewrite's two-rename swap: a crash between
        rename(final->backup) and rename(stage->final) leaves the table dir
        missing with a .__old__ (and possibly .__stage__) beside it.  Without
        this, a resumed run would see exists()==False and silently redo work
        (correct output via idempotent overwrite, but lineage lost).  Restore
        the backup when final is absent; drop any leftover stage."""
        final = self.path(table)
        backup, stage = final + ".__old__", final + ".__stage__"
        if not os.path.isdir(final) and os.path.isdir(backup):
            os.rename(backup, final)
        for leftover in (stage, backup):
            if os.path.isdir(leftover) and os.path.isdir(final):
                shutil.rmtree(leftover)

    def exists(self, table: str) -> bool:
        self._recover(table)
        p = self.path(table)
        # data files directly in the root, or any Hive-layout partition dir
        # (key=value) — covers every partition column, not a hardcoded list
        return os.path.isdir(p) and any(
            f.endswith(".parquet")
            or f.startswith("part-")
            or ("=" in f and os.path.isdir(os.path.join(p, f)))
            for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        self._recover(table)
        return spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def overwrite_partitions(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str],
        files_per_partition: int = 1,
    ):
        """Dynamic partition overwrite: only partitions present in df are
        replaced (Iceberg: overwritePartitions / INSERT OVERWRITE dynamic).

        The write is CO-LOCATED on the partition columns first (the
        write.distribution-mode=hash analog, same reasoning as
        search.write_postings): without it every upstream task writes a
        sliver file into every partition directory it touches, and both the
        write and every later scan pay per-file overhead.  A partition too
        big for one writer task can be spread with files_per_partition > 1
        (deterministic salt from the first non-partition column)."""
        spark = df.sparkSession
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            salt_src = next(
                (c for c in df.columns if c not in partition_by), None
            )
            salt = (
                F.pmod(F.xxhash64(salt_src), F.lit(files_per_partition))
                if salt_src
                else F.lit(0)
            )
            out = (
                df.withColumn("_fsalt", salt)
                .repartition(*(cols + [F.col("_fsalt")]))
                .drop("_fsalt")
            )
        else:
            out = df.repartition(*cols)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy(*partition_by).parquet(self.path(table))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def merge_by_key(self, df: DataFrame, table: str, keys: list[str]):
        """Upsert rows by key (Iceberg: MERGE INTO ... WHEN MATCHED UPDATE /
        WHEN NOT MATCHED INSERT). Parquet fallback: read-modify-overwrite via
        a staging dir + atomic-ish swap."""
        spark = df.sparkSession
        if not self.exists(table):
            self.overwrite(df, table)
            return
        cur = self.read(spark, table)
        merged = cur.join(df.select(*keys).distinct(), keys, "left_anti").unionByName(df)
        self._rewrite(merged, table)

    def delete_where(
        self, spark: SparkSession, table: str, condition,
        partition_by: list[str] | None = None,
    ):
        """Iceberg: DELETE FROM table WHERE cond.  Pass partition_by to
        preserve a partitioned table's layout across the parquet-fallback
        rewrite (Iceberg keeps it implicitly; a plain rewrite would flatten
        the dirs and lose partition pruning for later reads)."""
        if not self.exists(table):
            return
        cur = self.read(spark, table)
        self._rewrite(cur.filter(~condition), table, partition_by)

    def _rewrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        stage = self.path(table) + ".__stage__"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(stage)
        self._swap_stage(table)

    def _swap_stage(self, table: str) -> None:
        """Atomic-ish publish of a staged rewrite (two renames; _recover
        handles a crash between them)."""
        final = self.path(table)
        backup = final + ".__old__"
        if os.path.isdir(backup):
            shutil.rmtree(backup)
        os.rename(final, backup)
        os.rename(final + ".__stage__", final)
        shutil.rmtree(backup)

    def compact(self, spark: SparkSession, table: str, target_files: int = 8):
        """Iceberg rewrite_data_files analog — the reference's periodic
        index 'optimize' (file_upload.py:441-442)."""
        df = self.read(spark, table).coalesce(target_files)
        self._rewrite(df, table)
