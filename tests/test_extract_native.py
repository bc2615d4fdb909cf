"""Native-scan extraction path (extract.extract_spans_native).

The native path must be row-identical to the JVM-scan path on every input
it accepts, fall back to the JVM path when the table layout can't be
trusted, and plan splits/bins that cover the input exactly once.  The
equality tests are the contract that lets bench/jobs swap the scan path
without touching correctness entries (x33/q61 keep oracling the JVM path).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F, types as T

from qs_spark.corpus import corpus_parquet
from qs_spark.extract import (
    DEFAULT_SPLIT_THRESHOLD,
    SIZE_CLASS_COL,
    _make_native_reader_fn,
    _pack_splits_lpt,
    _plan_native_splits,
    extract_spans,
    extract_spans_native,
    with_size_class,
)

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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_sc_table(df, path: str, threshold: int = DEFAULT_SPLIT_THRESHOLD):
    """Write the hive size_class layout corpus_parquet produces."""
    base = with_size_class(df, threshold)
    for cls in ("small", "mega"):
        (
            base.filter(F.col(SIZE_CLASS_COL) == cls)
            .drop(SIZE_CLASS_COL, "fmt")
            .repartition(2, F.xxhash64("doc_id"))
            .write.mode("overwrite")
            .parquet(os.path.join(path, f"{SIZE_CLASS_COL}={cls}"))
        )


def test_native_matches_jvm_path_on_corpus(spark):
    # 1500 docs includes the mega tail (assert it, so the stitch branch is
    # genuinely exercised through the native entry point)
    df = corpus_parquet(spark, 1500)
    path = [f for f in df.inputFiles() if "size_class=mega" in f]
    assert path, "corpus must contain mega docs for this test to mean anything"
    table = df.inputFiles()[0].split("/size_class=")[0]
    table = table[7:] if table.startswith("file://") else table
    jvm = _rows(extract_spans(df, repartition_input=False))
    nat = _rows(extract_spans_native(spark, table))
    assert len(nat) > 0
    assert nat == jvm


def test_native_falls_back_on_untrusted_threshold(spark, tmp_path):
    docs = [
        (
            "d_big",
            [
                {"kind": "pdf_text", "text": f"page {i}", "media_ref": "", "offset": i}
                for i in range(30)
            ],
        ),
        ("d_small", [{"kind": "md", "text": "tiny", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    path = str(tmp_path / "custom_thresh.parquet")
    _write_sc_table(df, path, threshold=8)  # d_big is MEGA under 8
    # default-threshold native call must NOT trust the stored routing
    # (under 64 nothing is mega) — the fallback's derived filters re-route
    out = _rows(extract_spans_native(spark, path))
    ref = _rows(extract_spans(df, repartition_input=False))
    assert out == ref
    # matching threshold takes the native path and agrees too
    out8 = _rows(extract_spans_native(spark, path, split_threshold=8))
    ref8 = _rows(extract_spans(df, split_threshold=8, repartition_input=False))
    assert out8 == ref8


def test_native_hostile_table(spark, tmp_path):
    rows = [
        ("d_null_spans", None),
        ("d_empty_spans", []),
        (
            "d_null_fields",
            [{"kind": None, "text": None, "media_ref": None, "offset": None}],
        ),
        (
            "d_null_elem",
            [None, {"kind": "md", "text": "ok", "media_ref": "", "offset": 0}],
        ),
        ("d_unknown_kind", [{"kind": "weird", "text": "x", "media_ref": "", "offset": 0}]),
        ("d_good", [{"kind": "md", "text": "fine", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "hostile.parquet")
    _write_sc_table(df, path)
    out = _rows(extract_spans_native(spark, path))
    ref = _rows(extract_spans(df, repartition_input=False))
    assert out == ref


def test_pack_splits_lpt_covers_exactly_once():
    splits = [(f"f{i}", 0, -1) for i in range(17)]
    sizes = [(i * 37) % 101 + 1 for i in range(17)]
    bins = _pack_splits_lpt(splits, sizes, n_bins=5)
    assert len(bins) <= 5
    flat = [s for b in bins for s in b]
    assert sorted(flat) == sorted(splits)
    # LPT: heaviest bins within 2x of lightest (loose sanity bound)
    weight = dict(zip(splits, sizes))
    loads = sorted(sum(weight[s] for s in b) for b in bins)
    assert loads[-1] <= 2 * max(loads[0], 1) + max(sizes)


def test_plan_native_splits_row_group_ranges(tmp_path):
    # a file with 7 row groups split at a target that forces ranges
    t = pa.table({"doc_id": [str(i) for i in range(70)], "v": list(range(70))})
    f = str(tmp_path / "rg.parquet")
    pq.write_table(t, f, row_group_size=10)
    meta = pq.ParquetFile(f).metadata
    assert meta.num_row_groups == 7
    target = meta.row_group(0).total_byte_size * 2
    splits = _plan_native_splits([f], target_bytes=target)
    # ranges tile [0, 7) exactly, in order, no overlap
    covered = []
    for p, r0, r1 in splits:
        assert p == f and r1 > r0
        covered.extend(range(r0, r1))
    assert covered == list(range(7))
    # small files under target never pay a footer read: sentinel whole-file
    small = _plan_native_splits([f], target_bytes=10**9)
    assert small == [(f, 0, -1)]


def test_native_reader_row_group_ranges_read_all(spark, tmp_path):
    # reader fn honors rg ranges: two half-file splits == whole file
    docs = [
        (f"d{i}", [{"kind": "md", "text": f"t{i}", "media_ref": "", "offset": 0}])
        for i in range(40)
    ]
    import pandas as pd

    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    f = str(tmp_path / "two_rg.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f, row_group_size=20)
    bins = [[(f, 0, 1)], [(f, 1, 2)]]
    fn = _make_native_reader_fn(bins, chunk_size=102400)
    out = []
    for i in range(2):
        b = pa.RecordBatch.from_arrays([pa.array([i], pa.int32())], names=["bin_idx"])
        for rb in fn(iter([b])):
            out.extend(rb.column(0).to_pylist())
    assert sorted(out) == sorted(d for d, _ in docs)
