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


def test_csv_with_quotes_and_commas(spark):
    csv = 'a,b\n"x, with comma","quo""te"\nplain,2'
    units = extract_doc([{"kind": "csv_rows", "text": csv, "media_ref": "", "offset": 0}], "csv")
    assert units and "x, with comma" in units[0]["text"]
