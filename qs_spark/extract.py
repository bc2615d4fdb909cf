"""Distributed extraction pipeline.

Spark re-expression of the reference upload pipeline's parse stage
(quanta-search-consumer/core/file_upload.py:129-194 + the per-format wheels):

    input (doc_id, spans[])                         [Iceberg/parquet scan]
      -> format derivation (JVM-side column expr, no Python)
      -> skew split: docs with many page-local units are sliced into parts
         BEFORE the shuffle, so one mega-doc never stalls a task (AQE handles
         shuffle-join skew but not UDF-compute skew — SURVEY.md §4.1)
      -> salted repartition on xxhash64(doc_id[, part]) -> Arrow-batched
         mapInPandas kernels (vectorized pandas UDFs; no per-row Python)
      -> mega-doc parts re-stitched per doc (applyInPandas ordered merge,
         `order` renumbered after empty-unit drops, matching add_metadata's
         enumeration semantics)

Output: (doc_id, order, kind, text, media_ref, fmt) — the first five columns
are the span contract; `fmt` rides along for the store builder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from qs_spark.kernels.dispatch import SPLITTABLE_FMTS, safe_extract_doc
from qs_spark.kernels.sheet_kernel import CHUNK_SIZE

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("order", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("fmt", T.StringType()),
    ]
)

_PART_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("part_k", T.IntegerType()),
        T.StructField("local_order", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("fmt", T.StringType()),
    ]
)

def with_fmt(df: DataFrame) -> DataFrame:
    """JVM-side format derivation, semantically IDENTICAL to the oracle's
    fmt_of_spans: the first span whose kind is KNOWN decides the format
    (unknown/null kinds are skipped, not defaulted), falling back to 'md'.
    F.get/filter are null-safe on empty/null arrays (spans[0] would throw
    under ANSI mode), and the coalesce keeps fmt non-null so neither branch
    filter can silently drop a doc.  The kind->fmt map is imported from
    kernels.dispatch so pipeline and oracle can never drift."""
    from qs_spark.kernels.dispatch import _FMT_BY_KIND

    mapping = F.create_map(*[F.lit(x) for kv in _FMT_BY_KIND.items() for x in kv])
    # null spans -> transform/filter/get propagate null -> coalesce to 'md'
    first_known = F.get(
        F.filter(
            F.transform("spans", lambda s: mapping[s["kind"]]),
            lambda x: x.isNotNull(),
        ),
        0,
    )
    return df.withColumn("fmt", F.coalesce(first_known, F.lit("md")))


def _spans_to_records(spans) -> list[dict]:
    # Arrow hands array<struct> to pandas as a numpy array of dicts; real
    # tables carry nulls (null spans array, null struct, null fields) — treat
    # them as absent/empty rather than crashing a 100 TB job on one row
    if spans is None:
        return []
    return [
        {
            "kind": s.get("kind") or "",
            "text": s.get("text") or "",
            "media_ref": s.get("media_ref") or "",
            "offset": s.get("offset") if s.get("offset") is not None else 0,
        }
        for s in spans
        if s is not None
    ]


def _make_whole_doc_fn(chunk_size: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "order", "kind", "text", "media_ref", "fmt")}
            for did, spans, fmt in zip(pdf["doc_id"], pdf["spans"], pdf["fmt"]):
                for u in safe_extract_doc(_spans_to_records(spans), fmt, chunk_size):
                    out["doc_id"].append(did)
                    out["order"].append(u["order"])
                    out["kind"].append(u["kind"])
                    out["text"].append(u["text"])
                    out["media_ref"].append(u["media_ref"])
                    out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return fn


def _make_part_fn(chunk_size: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "part_k", "local_order", "kind", "text", "media_ref", "fmt",
                )
            }
            for did, part_k, spans, fmt in zip(
                pdf["doc_id"], pdf["part_k"], pdf["spans"], pdf["fmt"]
            ):
                # page-local formats only reach this path, so extracting a
                # slice is semantics-preserving; order is LOCAL here and
                # renumbered at stitch
                for u in safe_extract_doc(_spans_to_records(spans), fmt, chunk_size):
                    out["doc_id"].append(did)
                    out["part_k"].append(int(part_k))
                    out["local_order"].append(u["order"])
                    out["kind"].append(u["kind"])
                    out["text"].append(u["text"])
                    out["media_ref"].append(u["media_ref"])
                    out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return fn


def _stitch(pdf: pd.DataFrame) -> pd.DataFrame:
    # ordered merge of a mega-doc's parts: stable sort by (part_k,
    # local_order), then renumber -> globally identical to a serial walk
    err = pdf[pdf["kind"] == "error"]
    if len(err):
        # error-isolation parity with the whole-doc path: if ANY part's
        # kernel raised, safe_extract_doc on the whole doc would have failed
        # the whole doc with a single order=-1 error span — collapse to that
        one = err.sort_values(["part_k", "local_order"], kind="mergesort").iloc[:1].copy()
        one["order"] = pd.Series([-1], dtype="int32", index=one.index)
        return one[["doc_id", "order", "kind", "text", "media_ref", "fmt"]]
    pdf = pdf.sort_values(["part_k", "local_order"], kind="mergesort").reset_index(drop=True)
    pdf["order"] = pd.Series(range(len(pdf)), dtype="int32")
    return pdf[["doc_id", "order", "kind", "text", "media_ref", "fmt"]]


def extract_spans(
    df: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    split_threshold: int = 64,
    num_partitions: int | None = None,
    repartition_input: bool = True,
) -> DataFrame:
    """(doc_id, spans[]) -> ordered extracted spans.

    split_threshold: max raw spans a single kernel call handles for page-local
    formats; larger docs are sliced into ceil(n/threshold) parts that extract
    in parallel and re-stitch.  At 100 TB this is the knob that bounds
    per-task memory and wall time regardless of the input's size tail.

    num_partitions defaults to 4x shuffle.partitions: per-doc extraction cost
    is long-tailed (a big sheet costs ~100x the median doc), so
    over-partitioning keeps heavy docs from piling up in one task; the ~ms
    per-partition overhead is cheap against a multi-second straggler.

    The two branches each scan the input (a cheap columnar scan with
    pushdown on a real table); callers with a generated/expensive source
    should materialize it first (see corpus.corpus_parquet).

    repartition_input=False skips the salted shuffle of raw payloads for
    inputs that are ALREADY bucket-partitioned by doc_id hash (Iceberg
    bucket(doc_id) layout / corpus_parquet): the salting then happened once
    at write time and the kernel maps directly over scan splits — at 100 TB
    this removes the single biggest data movement of the job.  Mega-doc
    skew splitting is independent of this and always on.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    df = with_fmt(df)
    n_spans = F.size("spans")
    is_mega = F.col("fmt").isin(*SPLITTABLE_FMTS) & (n_spans > split_threshold)

    small = df.filter(~is_mega)
    if repartition_input:
        small = small.repartition(num_partitions, F.xxhash64("doc_id"))
    small_out = small.mapInPandas(_make_whole_doc_fn(chunk_size), schema=SPAN_SCHEMA)

    mega = df.filter(is_mega)
    t = F.lit(split_threshold)
    n_parts = F.ceil(n_spans / t).cast("int")
    parts = (
        mega.select(
            "doc_id",
            "fmt",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_parts - 1),
                    lambda i: F.slice("spans", i * t + 1, split_threshold),
                )
            ).alias("part_k", "spans"),
        )
        .repartition(num_partitions, F.xxhash64("doc_id", "part_k"))
        .mapInPandas(_make_part_fn(chunk_size), schema=_PART_SCHEMA)
    )
    mega_out = parts.groupBy("doc_id").applyInPandas(_stitch, schema=SPAN_SCHEMA)

    return small_out.unionByName(mega_out)


def oracle_extract(docs: list[tuple[str, list[dict]]], chunk_size: int = CHUNK_SIZE) -> pd.DataFrame:
    """Single-threaded golden oracle over (doc_id, raw_spans) pairs."""
    rows = []
    for did, spans in docs:
        for u in safe_extract_doc(spans, None, chunk_size):
            rows.append((did, u["order"], u["kind"], u["text"], u["media_ref"]))
    return pd.DataFrame(rows, columns=["doc_id", "order", "kind", "text", "media_ref"])
