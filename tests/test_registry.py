"""Registry state machine (T1), version skip (P3), delete cascade (T4),
status resolve (T2) — reference: quanta-search-consumer/core/file_upload.py.
"""

from pyspark.sql import functions as F

from qs_spark.registry import (
    backfill_uploaded_date,
    delete_versions,
    publish_transition,
    resolve_status,
    skip_existing_versions,
)


def _registry(spark):
    rows = [
        ("d1", 0, "Draft", "Success", "2026-01-01"),
        ("d1", 1, "Publish", "Success", "2026-01-02"),
        ("d1", 2, "Publish", "Success", "2026-01-03"),
        ("d2", 0, "Draft", "Processing", "2026-01-04"),
        ("d2", 1, "Publish", "Success", "2026-01-05"),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, version_id int, state string, status string, uploaded_date string"
    )


def test_publish_transition_t1(spark):
    # publish v2 of d1: v1 -> inter, v0 stays Draft, other docs untouched
    out = publish_transition(_registry(spark), "d1", 2).toPandas().set_index(["doc_id", "version_id"])
    assert out.loc[("d1", 2), "state"] == "Publish"
    assert out.loc[("d1", 1), "state"] == "inter"
    assert out.loc[("d1", 0), "state"] == "Draft"
    assert out.loc[("d2", 1), "state"] == "Publish"


def test_version_skip_p3(spark):
    reg = _registry(spark)
    incoming = spark.createDataFrame(
        [("d1", 1), ("d1", 3), ("d3", 0)], "doc_id string, version_id int"
    )
    out = skip_existing_versions(incoming, reg).toPandas()
    assert set(map(tuple, out.values)) == {("d1", 3), ("d3", 0)}


def test_delete_cascade_t4(spark):
    reg = _registry(spark)
    spans = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 1, "c")],
        "doc_id string, version_id int, text string",
    )
    r1, s1 = delete_versions(reg, spans, "d1", 2)
    assert r1.filter("doc_id='d1' and version_id=2").count() == 0
    assert s1.filter("doc_id='d1' and version_id=2").count() == 0
    assert s1.count() == 2
    # version_id None -> all versions, registry row disappears entirely
    r2, s2 = delete_versions(reg, spans, "d1", None)
    assert r2.filter("doc_id='d1'").count() == 0
    assert s2.filter("doc_id='d1'").count() == 0


def test_backfill_earliest_date_j5(spark):
    out = backfill_uploaded_date(_registry(spark)).toPandas()
    assert (out[out.doc_id == "d1"]["first_uploaded"] == "2026-01-01").all()


def test_status_writeback_t2(spark):
    reg = _registry(spark)
    results = spark.createDataFrame([("d2", "Success")], "doc_id string, outcome string")
    out = resolve_status(reg, results).toPandas()
    assert (out[out.doc_id == "d2"]["status"] == "Success").all()
    assert (out[out.doc_id == "d1"]["status"] == "Success").all()


def test_revert_transition_t1(spark):
    # version_id=None (reference file_searcher.py:150-177): all non-zero
    # versions -> 'inter', nothing published, draft stays
    from qs_spark.registry import with_current_version

    out = (
        publish_transition(_registry(spark), "d1", None)
        .toPandas()
        .set_index(["doc_id", "version_id"])
    )
    assert out.loc[("d1", 1), "state"] == "inter"
    assert out.loc[("d1", 2), "state"] == "inter"
    assert out.loc[("d1", 0), "state"] == "Draft"
    assert out.loc[("d2", 1), "state"] == "Publish"  # other docs untouched
    # current_version write-back: NULL after revert, published version else
    cur = with_current_version(publish_transition(_registry(spark), "d1", None)).toPandas()
    assert cur[cur.doc_id == "d1"]["current_version"].isna().all()
    assert (cur[cur.doc_id == "d2"]["current_version"] == 1).all()


def test_delete_cascade_includes_postings_t4(spark):
    # file_upload.py:481-651: delete removes index entries too — a deleted
    # doc must not remain retrievable via the postings table
    reg = _registry(spark)
    spans = spark.createDataFrame(
        [("d1", 1, "a"), ("d2", 1, "c")], "doc_id string, version_id int, text string"
    )
    postings = spark.createDataFrame(
        [("d1", "alpha", 2), ("d1", "beta", 1), ("d2", "alpha", 1)],
        "doc_id string, term string, tf int",
    )
    r, s, p = delete_versions(reg, spans, "d1", None, postings=postings)
    assert p.filter("doc_id='d1'").count() == 0
    assert p.count() == 1
    # document_id-named postings (build_postings output shape) cascade too
    postings2 = spark.createDataFrame(
        [("d1", "alpha"), ("d2", "beta")], "document_id string, term string"
    )
    _, _, p2 = delete_versions(reg, spans, "d1", None, postings=postings2)
    assert p2.filter("document_id='d1'").count() == 0 and p2.count() == 1


def test_version_scoped_delete_keeps_other_versions_postings(spark):
    """r02 ADVICE: build_postings must carry version_id so deleting ONE
    version removes only that version's index entries — surviving versions
    stay retrievable via the postings path."""
    from qs_spark.registry import delete_versions
    from qs_spark.search import build_postings

    store = spark.createDataFrame(
        [
            ("d1#0", "d1", "d1.txt", 1, "alpha beta", 1),
            ("d1#1", "d1", "d1.txt", 1, "alpha gamma", 2),
            ("d2#0", "d2", "d2.txt", 1, "delta", 1),
        ],
        "row_id string, document_id string, document_name string,"
        " page_no int, text string, version_id int",
    )
    postings = build_postings(store)
    assert "version_id" in postings.columns
    reg = spark.createDataFrame(
        [("d1", 1, "Publish"), ("d1", 2, "Publish"), ("d2", 1, "Publish")],
        "doc_id string, version_id int, state string",
    )
    spans = store.selectExpr("document_id AS doc_id", "version_id", "text")
    _, _, keep = delete_versions(reg, spans, "d1", 1, postings=postings)
    left = keep.toPandas()
    assert set(left[left.document_id == "d1"].version_id) == {2}
    assert set(left[left.document_id == "d1"].term) == {"alpha", "gamma"}
    assert (left[left.document_id == "d2"].version_id == 1).all()


def test_get_file_status_point_lookup(spark):
    """status_check route parity: per-(uid, doc) status, 'Not Found' when
    absent (reference utils/util.py:147-163)."""
    from qs_spark.registry import get_file_status

    reg = spark.createDataFrame(
        [("u1", "d1", "Processing"), ("u1", "d2", "Success"), ("u2", "d3", "Failed")],
        "uid string, doc_id string, status string",
    )
    assert get_file_status(reg, "u1", "d1") == "Processing"
    assert get_file_status(reg, "u2", "d3") == "Failed"
    assert get_file_status(reg, "u1", "d3") == "Not Found"  # other tenant's doc
    assert get_file_status(reg, "u1", "nope") == "Not Found"
