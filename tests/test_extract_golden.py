"""Golden end-to-end: distributed extraction == single-threaded oracle, on the
synthetic interleaved corpus, under (kind, text, media_ref, order) equality
(the north-rule invariant).  chunk_size is lowered so sheet chunk boundaries
are exercised in-corpus.
"""

import pandas as pd

from qs_spark.corpus import corpus_df, gen_doc
from qs_spark.extract import extract_spans, oracle_extract

N_DOCS = 400
CHUNK = 1500  # small budget -> multi-chunk sheets in the corpus

KEY = ["doc_id", "order", "kind", "text", "media_ref"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[KEY].sort_values(["doc_id", "order"], kind="mergesort").reset_index(drop=True)
    out["order"] = out["order"].astype("int64")
    return out


def test_golden_span_equality(spark):
    got = _canon(extract_spans(corpus_df(spark, N_DOCS), chunk_size=CHUNK).toPandas())
    want = _canon(oracle_extract([gen_doc(i) for i in range(N_DOCS)], chunk_size=CHUNK))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)


def test_mega_doc_split_stitch(spark):
    # doc 175 is a mega-doc (400 pages) in the first 2000 — force the split
    # path with a tiny threshold and verify the re-stitched ordering
    idxs = [170, 175, 180]
    import pyspark.sql.types as T

    from qs_spark.corpus import gen_batch

    schema = T.StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "doc_id", "type": "string", "nullable": True, "metadata": {}},
                {
                    "name": "spans",
                    "nullable": True,
                    "metadata": {},
                    "type": {
                        "type": "array",
                        "containsNull": True,
                        "elementType": {
                            "type": "struct",
                            "fields": [
                                {"name": "kind", "type": "string", "nullable": True, "metadata": {}},
                                {"name": "text", "type": "string", "nullable": True, "metadata": {}},
                                {"name": "media_ref", "type": "string", "nullable": True, "metadata": {}},
                                {"name": "offset", "type": "integer", "nullable": True, "metadata": {}},
                            ],
                        },
                    },
                },
            ],
        }
    )
    df = spark.createDataFrame(gen_batch(idxs), schema=schema)
    got = _canon(extract_spans(df, split_threshold=16).toPandas())
    want = _canon(oracle_extract([gen_doc(i) for i in idxs]))
    assert (got["doc_id"] == "doc00000175").sum() > 100  # mega actually extracted
    pd.testing.assert_frame_equal(got, want)


def test_mega_parts_distribute_across_partitions(spark):
    # skew-split parallelism: the 25 parts of a 400-page mega doc hash to
    # MANY distinct shuffle partitions — one straggler task can never own the
    # whole doc
    from pyspark.sql import functions as F

    n = (
        spark.range(25)
        .select(F.pmod(F.xxhash64(F.lit("doc00000175"), "id"), F.lit(64)).alias("p"))
        .distinct()
        .count()
    )
    assert n >= 15


def test_determinism_across_partitionings(spark):
    # §5-5: identical output under different parallelism (8 vs 64 partitions)
    df = corpus_df(spark, 120)
    a = _canon(extract_spans(df, num_partitions=4).toPandas())
    b = _canon(extract_spans(df, num_partitions=64).toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_serial_reference_matches_kernels():
    """r03 VERDICT #3: the golden generator's extraction walk must be
    INDEPENDENT of qs_spark.kernels.  tools/serial_reference.py re-implements
    the whole walk (regex-tokenizer HTML machine, O(rows^2) to_string sheet
    chunker, inline OCR spec); this test pins kernel == independent-reference
    over a corpus slice that covers every format incl. a mega doc, plus
    hostile inputs."""
    import importlib.util
    import os
    import sys

    tool_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    sys.path.insert(0, tool_dir)
    try:
        import serial_reference as sr
    finally:
        sys.path.remove(tool_dir)
    # independence: the module must not IMPORT from qs_spark.kernels
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(sr))
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            assert not any(a.name.startswith("qs_spark") for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            assert not (node.module or "").startswith("qs_spark")

    from qs_spark.corpus import gen_doc
    from qs_spark.kernels.dispatch import fmt_of_spans, safe_extract_doc

    for i in list(range(500)) + [1000, 1500]:  # 0/1000/1500 include megas; 500 = the golden scale
        did, spans = gen_doc(i)
        assert fmt_of_spans(spans) == sr.ref_fmt_of_spans(spans)
        assert safe_extract_doc(spans, None) == sr.ref_safe_extract_doc(spans, None), did
    # hostile inputs take the same error/empty paths
    for spans in ([], [{"kind": "txt", "text": None, "media_ref": "", "offset": 0}],
                  [{"kind": "csv_rows", "text": "", "media_ref": "", "offset": 0}],
                  [{"kind": "html", "text": "<p>a<table><tr><td>x</td></table>b</p>",
                    "media_ref": "", "offset": 0}]):
        assert safe_extract_doc(spans, None) == sr.ref_safe_extract_doc(spans, None)
    # pathological markup: the kernel's regex tokenizer and the oracle's
    # html.parser must agree outside the well-formed corpus domain too
    from qs_spark.kernels.html_kernel import extract_main

    for c in (
        "<p>a<div", "<p>a < b</p>", "<p>a<b</p>", "<p class='x>y'>z</p>",
        "<p>a&amp;b &lt;tag&gt;</p>", "<P>UPPER</P>",
        "<p>a<!-- <p>hidden</p> -->b</p>", "<p>one<p/>two</p>",
        "<p>a&nbsp;b</p>", "<p>broken &amp no-semi</p>",
        "<table><tr><td>a<td>b</table>", "<p >attr space</p>",
        "<p\nnewline>nl</p>", "<p>5 < 6 and 7 > 4</p>",
        '<p data-x="a>b">gt-in-attr</p>', "<li>a</LI>", "<p>&#65;&#x42;</p>",
        "<p>tail</p>trailing<p>next</p>",
    ):
        assert extract_main(c) == sr.ref_extract_main(c), c


def test_size_class_partitioned_table_routes_identically(spark, tmp_path):
    """The size_class partition column (Iceberg hidden-partitioning analog,
    written by corpus_parquet) must be a pure routing optimization: output
    identical to the derived-filter path, with BOTH branches exercised, and
    the branch filters pruned to partition directories (PartitionFilters in
    the scan, not a post-decode size() predicate)."""
    from qs_spark.corpus import corpus_parquet
    from qs_spark.extract import SIZE_CLASS_COL

    path = str(tmp_path / "sc_corpus.parquet")
    table = corpus_parquet(spark, 600, path=path)
    assert SIZE_CLASS_COL in table.columns
    # both partitions materialized (doc 175 is a 400-page mega)
    assert table.filter(f"{SIZE_CLASS_COL} = 'mega'").count() > 0
    got = _canon(extract_spans(table, repartition_input=False).toPandas())
    want = _canon(
        extract_spans(table.drop(SIZE_CLASS_COL)).toPandas()
    )  # derived-filter path
    pd.testing.assert_frame_equal(got, want)
    # partition pruning is visible in the physical plan of each branch
    plan = (
        table.filter(f"{SIZE_CLASS_COL} = 'mega'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "size_class" in plan
