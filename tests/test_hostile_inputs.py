"""Hostile/null inputs: a 100 TB table WILL contain nulls, empty arrays,
unknown kinds, and unicode — none of them may crash or silently drop work
they shouldn't."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from qs_spark.extract import extract_spans
from qs_spark.kernels.dispatch import extract_doc

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def test_null_and_empty_spans_survive(spark):
    rows = [
        ("d_null_spans", None),
        ("d_empty_spans", []),
        ("d_null_fields", [{"kind": None, "text": None, "media_ref": None, "offset": None}]),
        ("d_null_elem", [None, {"kind": "md", "text": "ok", "media_ref": "", "offset": 0}]),
        ("d_unknown_kind", [{"kind": "weird", "text": "x", "media_ref": "", "offset": 0}]),
        ("d_good", [{"kind": "md", "text": "fine", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = extract_spans(df).toPandas()
    # nothing crashed; the good docs' spans are present
    assert set(out[out.doc_id == "d_good"]["text"]) == {"fine"}
    assert "ok" in set(out[out.doc_id == "d_null_elem"]["text"])
    # null fields treated as empty md passthrough -> one empty 'raw' span
    assert (out[out.doc_id == "d_null_fields"]["kind"] == "raw").all()


def test_unicode_and_long_tokens(spark):
    text = "héllo wörld éè " + "x" * 5000 + ". End."
    units = extract_doc([{"kind": "txt", "text": text, "media_ref": "", "offset": 0}], "txt")
    assert units and units[0]["text"] == text  # single chunk identity holds

    html = "<body><p>café &amp; crème</p></body>"
    units = extract_doc([{"kind": "html", "text": html, "media_ref": "", "offset": 0}], "html")
    assert units[0]["text"] == "café & crème"


def test_broken_html_tolerated(spark):
    html = "<body><p>unclosed <div>nested <p>second</body "
    units = extract_doc([{"kind": "html", "text": html, "media_ref": "", "offset": 0}], "html")
    # html.parser is tolerant: no crash; some text recovered
    assert isinstance(units, list)


def test_per_doc_error_isolation(spark):
    """A malformed file yields an error span; the job and sibling docs are
    unaffected (reference: per-file Failed status, consumer.py:322-344)."""
    bad_csv = ",,\n"  # all-Unnamed with nothing after the retry -> EmptyDataError
    rows = [
        ("d_bad", [{"kind": "csv_rows", "text": bad_csv, "media_ref": "", "offset": 0}]),
        ("d_ok", [{"kind": "md", "text": "fine", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from qs_spark.extract import extract_spans
    from qs_spark.store import build_store, failed_docs

    spans = extract_spans(df)
    out = spans.toPandas()
    assert set(out[out.doc_id == "d_ok"]["text"]) == {"fine"}
    bad = out[out.doc_id == "d_bad"]
    assert len(bad) == 1 and bad.iloc[0]["kind"] == "error"
    assert "EmptyDataError" in bad.iloc[0]["text"]
    # failed docs feed status write-back; the store excludes them
    assert {r.doc_id for r in failed_docs(spans).collect()} == {"d_bad"}
    assert build_store(spans).filter(F.col("document_id") == "d_bad").count() == 0


def test_unknown_first_kind_matches_oracle(spark):
    """fmt derivation must scan for the first KNOWN kind like the oracle."""
    rows = [
        (
            "d_mixed",
            [
                {"kind": "bogus", "text": "junk", "media_ref": "", "offset": 0},
                {"kind": "pdf_text", "text": "real page", "media_ref": "", "offset": 1},
            ],
        )
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from qs_spark.extract import extract_spans
    from qs_spark.kernels.dispatch import extract_doc

    got = extract_spans(df).toPandas().sort_values("order").reset_index(drop=True)
    want = extract_doc(
        [dict(kind="bogus", text="junk", media_ref="", offset=0),
         dict(kind="pdf_text", text="real page", media_ref="", offset=1)]
    )
    assert list(got["kind"]) == [u["kind"] for u in want] == ["pdf_text"]
    assert list(got["text"]) == ["real page"]


def test_all_empty_bucket_still_commits(spark, tmp_path):
    """Buckets whose docs all gate out must still checkpoint (else every
    resume re-extracts them), even when NO spans were ever written."""
    from qs_spark.catalog import ParquetCatalog
    from qs_spark.checkpoint import committed_buckets, run_extract_checkpointed

    rows = [(f"e{i}", [{"kind": "txt", "text": "", "media_ref": "", "offset": 0}]) for i in range(12)]
    df = spark.createDataFrame(rows, SCHEMA)
    cat = ParquetCatalog(str(tmp_path / "wh"))
    out = run_extract_checkpointed(spark, df, cat, run_id="empty", n_buckets=4, buckets_per_wave=2)
    assert out.count() == 0
    assert committed_buckets(spark, cat) == {0, 1, 2, 3}


def test_csv_with_quotes_and_commas(spark):
    csv = 'a,b\n"x, with comma","quo""te"\nplain,2'
    units = extract_doc([{"kind": "csv_rows", "text": csv, "media_ref": "", "offset": 0}], "csv")
    assert units and "x, with comma" in units[0]["text"]
