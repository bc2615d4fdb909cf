"""Store builder: extracted spans -> the searchable row store.

Reproduces the reference's metadata-enrich + sink normalization chain:
  F1 filename prepend  "File Name : {file_name}\\n\\n\\n{text}"
      (quanta-search-consumer/utils/util.py:64-66) — applied to EVERY unit,
      including empty ones, which is why the sink's empty-text guard
      (core/file_upload.py:330) never fires post-F1.
  F2 store normalization  text.lower().replace("\\n", " ")
      (core/file_upload.py:336)
  page_no = order + 1 (add_metadata enumeration)
  row key: deterministic (doc_id, order) instead of the reference's uuid4 —
  idempotent re-runs produce identical stores (the resume contract, T5).

The store is the Spark analog of the Mongo vector_store collection; the
postings table built in search.py is the analog of the fast_inverted_index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qs_spark.kernels.dispatch import EXT_BY_FMT


def file_name_col(doc_id="doc_id", fmt="fmt"):
    ext_map = F.create_map(*[F.lit(x) for kv in EXT_BY_FMT.items() for x in kv])
    return F.concat(F.col(doc_id), ext_map[F.col(fmt)])


def failed_docs(spans: DataFrame) -> DataFrame:
    """Docs whose extraction failed (safe_extract_doc error spans) — feeds
    the Processing->Failed status write-back (registry.resolve_status, T2)."""
    return spans.filter(F.col("kind") == "error").select(
        "doc_id", F.col("text").alias("error"), F.lit("Failed").alias("outcome")
    )


def build_store(
    spans: DataFrame,
    state: str = "Publish",
    version_id: int = 1,
    uid: str = "u0",
    realm: dict[str, str] | None = None,
) -> DataFrame:
    """spans (doc_id, order, kind, text, media_ref, fmt) -> store rows.
    Error spans are excluded (the reference stores nothing for a Failed doc);
    null text coalesces to '' before F1, like the reference's
    `text if text else \"\"` (consumer utils/util.py:63-64).

    Multi-tenancy (P4): every row carries the owning `uid` and a `realm`
    key->value tag map, mirroring the reference's per-document metadata
    (quanta-search-api/schemas/schema.py:33-41,137-147); retrieval filters on
    them via search.filter_tenant (file_searcher.py:236,258,265)."""
    fn = file_name_col()
    f1 = F.concat(
        F.lit("File Name : "), fn, F.lit("\n\n\n"), F.coalesce(F.col("text"), F.lit(""))
    )
    f2 = F.replace(F.lower(f1), F.lit("\n"), F.lit(" "))
    realm = realm or {}
    realm_col = (
        F.create_map(*[F.lit(x) for kv in realm.items() for x in kv])
        if realm
        else F.create_map().cast("map<string,string>")
    )

    def project(df: DataFrame) -> DataFrame:
        return df.filter(F.col("kind") != "error").select(
            F.concat_ws("#", "doc_id", "order").alias("row_id"),
            F.col("doc_id").alias("document_id"),
            fn.alias("document_name"),
            (F.col("order") + 1).alias("page_no"),
            f2.alias("text"),
            "kind",
            "media_ref",
            "fmt",
            F.lit(state).alias("state"),
            F.lit(version_id).alias("version_id"),
            F.lit(uid).alias("uid"),
            realm_col.alias("realm"),
        )

    # propagate extraction-branch annotation (see write_store): the same
    # projection applied per branch is row-identical to projecting the
    # union, so the union output is REBUILT from the projected branches —
    # one analyzer pass per branch instead of branches + union
    branches = getattr(spans, "_qs_store_branches", None)
    if branches:
        projected = [(project(b), w) for b, w in branches]
        out = projected[0][0]
        for b, _ in projected[1:]:
            out = out.unionByName(b)
        out._qs_store_branches = projected
        return out
    return project(spans)


def write_store(
    store: DataFrame,
    path: str,
    est_bytes: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int | None = None,
) -> None:
    """Materialize the store with a REBALANCE exchange before the write —
    the Iceberg `write.distribution-mode` analog.

    Without it every upstream extraction task writes its own sliver file
    (measured: 399 x ~220 KB files for an 86 MB store at sf0.1; the write
    paid 399 parquet-writer setups and every later scan paid 399 file opens
    — write 21 s -> 12 s and scan-path search 5.6 s -> 1.8 s after the
    rebalance).  Extraction parallelism upstream is untouched; the exchange
    moves the finished rows once.

    File-count sizing: est_bytes/target_file_bytes (pass table-stats bytes
    at scale — at 100 TB that is ~800k x 128 MB files), floored at
    min_files (default shuffle.partitions/4) so the writer stage keeps
    enough parallelism on small inputs.  AQE's REBALANCE hint was tried and
    rejected: it sizes by in-memory estimates and left 64 files where 16
    were right."""
    spark = store.sparkSession
    if min_files is None:
        min_files = max(
            1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4
        )
    n = int(max(min_files, (est_bytes or 0) // target_file_bytes))
    # Row-group sizing was A/B'd and rejected (r06): shrinking
    # parquet.block.size so each ~4 MB store file splits into several row
    # groups raised the scan's task count (16 -> 60+ splits) but search read
    # medians were FLAT-to-worse (2.22 base vs 2.27 s, 3 interleaved
    # extract+search pairs) — the scan is decode-bound, not
    # parallelism-bound, and small row groups add per-group overhead.  The
    # default (one ~row-group per small file) stands.
    branches = getattr(store, "_qs_store_branches", None)
    if branches:
        # Per-branch rebalance (r06, guide §2.6): a single repartition above
        # the extraction union fuses both branches into one map stage, which
        # cannot start until the mega branch's stitch shuffle lands — the
        # wide native-kernel wave idles behind a 10-task pipeline (~1.3 s at
        # sf0.1, event-log audit).  Rebalancing each branch separately keeps
        # the total file count at n (byte-weighted split, every branch >= 1
        # file) while the branches' exchanges materialize CONCURRENTLY.
        # Row content is identical: union-then-repartition and
        # repartition-then-union write the same rows.
        total_w = sum(w for _, w in branches)
        parts = [max(1, round(n * w / total_w)) for _, w in branches]
        # trim overshoot from the largest branch so sum(parts) stays ~n
        while sum(parts) > max(n, len(parts)):
            i = parts.index(max(parts))
            parts[i] -= 1
        df = None
        for (b, _), p in zip(branches, parts):
            rb = b.repartition(p)
            df = rb if df is None else df.unionByName(rb)
        df.write.mode("overwrite").parquet(path)
        return
    store.repartition(n).write.mode("overwrite").parquet(path)
