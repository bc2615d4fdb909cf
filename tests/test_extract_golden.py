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
    the whole walk (html.parser-callback HTML machine, O(rows^2) to_string
    sheet chunker, inline OCR spec); this test pins kernel ==
    independent-reference over a corpus slice that covers every format incl.
    a mega doc, plus hostile inputs."""
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
        # r04 ADVICE divergences: custom-element names must not truncate at
        # '-' (<p-card> is NOT <p>), and an unquoted attribute value ending
        # in '/' is NOT self-closing (a_depth must not reset, so link text
        # stays subject to the link-density filter)
        "<p-card>inside custom</p-card>",
        "<p>keep</p><p-card>x</p-card><p>end</p>",
        "<p><a href=http://x.com/>all link text here</a></p>",
        "<p><a href=http://x.com/>link</a> plus much longer plain text</p>",
        # html.parser leniencies the round-5 tokenizer port covers
        "<li>a</ li>", "<p>a</p x>b", "</\"<p>a", "<p a=b\"c>d\">e",
        "<script>var s='<p>not a block</p>';</script><p>t</p>",
        "<script>a</header>b<p>HIDDEN</p></script><p>t</p>",
        "<!-- a -- >b--><p>c</p>", "<![if x]><p>y</p><![endif]>",
        "<p attr/>x", "<p attr=/>y", "<tag attr='v'/>z<p>w</p>",
        "<p a=\"1\"/x>y</p>", "</>x<p>y</p>", "<p ==junk\">q</p>",
    ):
        assert extract_main(c) == sr.ref_extract_main(c), c
    # the stdlib marked-section exceptions surface identically through the
    # doc-level error isolation (same exception text -> same error span)
    for c in ("<![xyz]>y", "<![ if]>y"):
        spans = [{"kind": "html", "text": c, "media_ref": "", "offset": 0}]
        assert safe_extract_doc(spans, None) == sr.ref_safe_extract_doc(spans, None)
        assert safe_extract_doc(spans, None)[0]["kind"] == "error"


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


def test_size_class_custom_threshold_not_misrouted(spark, tmp_path):
    """r04 ADVICE: a table whose size_class was derived with a CUSTOM
    split_threshold must not be trusted by a job running a different
    threshold.  with_size_class records the threshold as column metadata
    (parquet round-trips it); extract_spans verifies it and falls back to
    derived filters on mismatch — output identical to the no-column path in
    every combination."""
    from qs_spark.corpus import corpus_df
    from qs_spark.extract import SIZE_CLASS_COL, with_size_class

    path = str(tmp_path / "custom_sc.parquet")
    with_size_class(corpus_df(spark, 200), split_threshold=8).write.parquet(path)
    table = spark.read.parquet(path)
    # the derivation threshold survives the parquet round trip
    assert table.schema[SIZE_CLASS_COL].metadata.get("split_threshold") == 8

    def _routing_plan(df, threshold):
        return (
            extract_spans(df, split_threshold=threshold, repartition_input=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # matching threshold: the stored column IS the routing (filters on it)
    assert f"{SIZE_CLASS_COL}#" in _routing_plan(table, 8).replace(" ", "")
    # mismatched threshold: stored column ignored, filters re-derived
    mismatch_plan = _routing_plan(table, 64)
    assert "size(spans" in mismatch_plan
    # and the mismatch output equals the no-column ground truth
    got = _canon(
        extract_spans(table, split_threshold=64, repartition_input=False).toPandas()
    )
    want = _canon(
        extract_spans(table.drop(SIZE_CLASS_COL), split_threshold=64).toPandas()
    )
    pd.testing.assert_frame_equal(got, want)
