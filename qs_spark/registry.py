"""Document registry: version state machine + delete cascade.

Reference semantics (quanta-search-consumer/core/file_upload.py):
  T1 publish transition (:298-302): when version V of a doc is published,
     every other version not in {0, V} flips to state 'inter'; version 0 is
     the draft and keeps state 'Draft'.
  P3 version-exists skip (:85-95): an incoming (doc_id, version_id) already in
     the registry is skipped — a left-anti join.
  J5 upload-date backfill (:205-215): the earliest stored uploaded_date per
     doc wins.
  T4 delete cascade (:481-651): deleting (doc_id, version) removes spans +
     registry rows; version_id NULL means all versions; a doc with no
     remaining versions disappears from the registry entirely.

All expressed as DataFrame ops + catalog MERGE/DELETE so they run as Iceberg
MERGE INTO / DELETE FROM on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def publish_transition(registry: DataFrame, doc_id: str, version_id: int | None) -> DataFrame:
    """T1: publish `version_id` of `doc_id`; other non-draft versions -> 'inter'.

    version_id=None is the REVERT transition (reference
    quanta-search-api/core/file_searcher.py:150-177: `latest_version=None`):
    every non-zero version of the doc flips to 'inter' and no version is
    published; version 0 stays Draft.  Pair with with_current_version for the
    current_version write-back the reference performs alongside."""
    is_doc = F.col("doc_id") == doc_id
    published = (
        F.lit(False) if version_id is None else is_doc & (F.col("version_id") == version_id)
    )
    return registry.withColumn(
        "state",
        F.when(published, F.lit("Publish"))
        .when(is_doc & (F.col("version_id") == 0), F.lit("Draft"))
        .when(is_doc, F.lit("inter"))
        .otherwise(F.col("state")),
    )


def with_current_version(registry: DataFrame) -> DataFrame:
    """T1 write-back companion: per-doc current_version = the published
    version (null when none is published, e.g. after a revert) — the
    reference's `current_version` field update (file_searcher.py:163-177)."""
    cur = registry.groupBy("doc_id").agg(
        F.max(F.when(F.col("state") == "Publish", F.col("version_id"))).alias(
            "current_version"
        )
    )
    return registry.join(F.broadcast(cur), "doc_id", "left")


def skip_existing_versions(incoming: DataFrame, registry: DataFrame) -> DataFrame:
    """P3/J2: drop uploads whose (doc_id, version_id) already exists."""
    return incoming.join(
        registry.select("doc_id", "version_id"), ["doc_id", "version_id"], "left_anti"
    )


def backfill_uploaded_date(registry: DataFrame) -> DataFrame:
    """J5: per-doc earliest uploaded_date joined back to every version row."""
    first = registry.groupBy("doc_id").agg(F.min("uploaded_date").alias("first_uploaded"))
    return registry.join(F.broadcast(first), "doc_id")


def delete_versions(
    registry: DataFrame,
    spans: DataFrame,
    doc_id: str,
    version_id: int | None,
    postings: DataFrame | None = None,
) -> tuple[DataFrame, ...]:
    """T4: remove a version (or all, when version_id is None) from registry +
    spans + (when given) the postings/index table, matching the reference's
    full cascade — delete removes the index entries too
    (quanta-search-consumer/core/file_upload.py:481-651, index removal
    ~:535-576).  A deleted doc must not remain retrievable via the inverted
    index.  Returns the surviving (registry, spans[, postings]).

    The postings table keys rows by document_id (+ version_id when present);
    tables without a version column cascade on doc alone.

    Workflow-layer companion: the reference's delete flow ends with
    cache.delete_one(uid) (file_upload.py:642) — callers holding a
    qcache result-cache should follow this cascade with
    qcache.cache_invalidate(spark, cat, uid), same as the reference keeps
    the Redis delete outside the DB mutation itself.  Even a missed
    invalidation self-heals on the next lookup via the __td total-docs
    guard (test_qcache integration test pins both layers)."""
    if version_id is None:
        cond = F.col("doc_id") != doc_id
    else:
        cond = (F.col("doc_id") != doc_id) | (F.col("version_id") != version_id)
    reg_keep = registry.filter(cond)
    spans_keep = spans.filter(cond)
    if postings is None:
        return reg_keep, spans_keep
    pdoc = F.col("document_id") if "document_id" in postings.columns else F.col("doc_id")
    if version_id is None or "version_id" not in postings.columns:
        pcond = pdoc != doc_id
    else:
        pcond = (pdoc != doc_id) | (F.col("version_id") != version_id)
    return reg_keep, spans_keep, postings.filter(pcond)


def get_file_status(registry: DataFrame, uid: str, doc_id: str) -> str:
    """T2 status-check route (quanta-search-api/router/api.py:537-586 ->
    utils/util.py:147-163): per-(uid, doc) processing status, 'Not Found'
    when the doc is absent.  A point lookup — on a real table this prunes to
    one partition; here it is one filtered head()."""
    cond = F.col("doc_id") == doc_id
    if "uid" in registry.columns:
        cond = cond & (F.col("uid") == uid)
    row = registry.filter(cond).select("status").head()
    return row["status"] if row and row["status"] is not None else "Not Found"


def resolve_status(registry: DataFrame, results: DataFrame) -> DataFrame:
    """T2/J3: Processing -> Success/Failed write-back by doc_id equi-join."""
    return registry.join(
        results.select("doc_id", F.col("outcome").alias("_outcome")), "doc_id", "left"
    ).withColumn(
        "status", F.coalesce(F.col("_outcome"), F.col("status"))
    ).drop("_outcome")
