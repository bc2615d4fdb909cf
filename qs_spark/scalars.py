"""Scalar / utility column functions from the reference's util layer.

F6  url -> filename      (quanta-search-consumer/core/extractor.py:73;
                          unquote(os.path.split(url.split("?")[0])[-1]))
F7  SHA-256 checksum     (quanta-search-consumer/utils/aws_s3.py:55-61)
P8  realm-key validation (quanta-search-api/utils/util.py:102-125: symmetric
                          difference of presented vs registered key sets)
S12 monotonic index ids  (quanta-search-consumer/core/file_upload.py:417-420:
                          ids assigned last_id + idx + 1 over the doc list)
A3  total-doc counter    (file_upload.py:248-296)
A4  max index id         (file_upload.py:395-396)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def url_to_filename(url_col):
    """F6: strip query string, take the last path segment, percent-decode."""
    path = F.split(url_col, r"\?").getItem(0)
    last = F.element_at(F.split(path, "/"), -1)
    return F.url_decode(last)


def file_extension(filename_col):
    """os.path.splitext semantics: text after the LAST dot, with the dot;
    no dot (or leading-dot-only) -> empty string."""
    return F.when(
        filename_col.rlike(r"..*\.[^.]*$"), F.regexp_extract(filename_col, r"(\.[^.]*)$", 1)
    ).otherwise(F.lit(""))


def sha256_checksum(col):
    """F7: hex SHA-256 of the payload (reference streams 128 KiB chunks into
    hashlib; one column expr on the whole value is the columnar equivalent)."""
    return F.sha2(col, 256)


def realm_key_diff(presented_keys_col, registered_keys: list[str]):
    """P8/U2: (missing, extra) key arrays — the symmetric difference the
    reference computes with set ops (api utils/util.py:123)."""
    reg = F.array(*[F.lit(k) for k in registered_keys])
    missing = F.array_except(reg, presented_keys_col)
    extra = F.array_except(presented_keys_col, reg)
    return missing, extra


def assign_index_ids(
    df: DataFrame, last_index_id: int = 0, order_cols=("doc_id",), n_buckets: int = 64
) -> DataFrame:
    """S12: monotonically increasing ids ordered by order_cols, resuming from
    a stored offset (the checkpoint's last_index_id, T3).

    Scale path (no single-partition window): the primary order key is range-
    bucketed into n_buckets equal-width buckets (one min/max scan), per-bucket
    counts turn into prefix-sum offsets (n_buckets driver rows), and each
    bucket assigns bucket_offset + local row_number in parallel.  Because the
    buckets are VALUE ranges of the order key, concatenating them in bucket
    order reproduces the exact global ordering — result is identical to a
    global row_number, but the widest window is one bucket.  Skewed key
    distributions only unbalance bucket sizes (perf, not correctness).

    Non-numeric (or constant / all-null) keys take the RANGE-partitioned
    path (r04 VERDICT #4 — the old code fell back to a single global window
    there, the one silent single-partition plan in the repo):
    repartitionByRange(order_cols) assigns ascending key ranges to ascending
    partition ids, so stamping spark_partition_id() as the bucket gives the
    same per-bucket count -> prefix-sum offset -> bucket-local row_number
    construction; nulls sort into partition 0 (asc_nulls_first on both the
    range exchange and the window), matching the global window's NULLS FIRST
    default.  The bucket-stamped frame is localCheckpoint-ed because the
    counts job and the id job would otherwise re-run the (sampled) range
    exchange independently.

    Null order keys get dedicated bucket 0 (width_bucket(null) is null, which
    would otherwise null the offset map lookup and emit null ids): real
    buckets are 1..n_buckets (lo = the non-null min, so width_bucket never
    returns 0 itself), and bucket 0 sorting first reproduces the global
    window's NULLS FIRST default ordering exactly.
    """
    key = order_cols[0]
    mm = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    lo, hi = mm["lo"], mm["hi"]  # min/max skip nulls; all-null -> lo is None
    numeric = isinstance(lo, (int, float)) and not isinstance(lo, bool)
    if not numeric or lo is None or lo == hi or n_buckets < 2:
        keys = [F.col(c) for c in order_cols]
        bdf = (
            df.repartitionByRange(max(2, n_buckets), *keys)
            .withColumn("_b", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
        return _offset_ids(bdf, order_cols, last_index_id)

    bucket = F.width_bucket(F.col(key), F.lit(lo), F.lit(hi), F.lit(n_buckets))
    bdf = df.withColumn(
        "_b",
        F.when(F.col(key).isNull(), F.lit(0))
        .otherwise(F.least(bucket, F.lit(n_buckets)))  # hi lands in n_buckets+1
        .cast("int"),
    )
    return _offset_ids(bdf, order_cols, last_index_id)


def _offset_ids(bdf: DataFrame, order_cols, last_index_id: int) -> DataFrame:
    """Shared tail of both bucketing strategies: per-bucket counts (n_buckets
    driver rows) -> prefix-sum offsets in bucket order -> bucket-local
    row_number + offset.  Identical to a global row_number because bucket
    order follows key order, but the widest window is one bucket."""
    counts = {r["_b"]: r["c"] for r in bdf.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, last_index_id
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    return (
        bdf.withColumn("index_id", F.row_number().over(w) + off_map[F.col("_b")])
        .drop("_b")
    )
