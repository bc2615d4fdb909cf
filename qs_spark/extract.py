"""Distributed extraction pipeline.

Spark re-expression of the reference upload pipeline's parse stage
(quanta-search-consumer/core/file_upload.py:129-194 + the per-format wheels):

    input (doc_id, spans[])                         [Iceberg/parquet scan]
      -> format derivation (JVM-side column expr, no Python)
      -> skew split: docs with many page-local units are sliced into parts
         BEFORE the shuffle, so one mega-doc never stalls a task (AQE handles
         shuffle-join skew but not UDF-compute skew — SURVEY.md §4.1)
      -> salted repartition on xxhash64(doc_id[, part]) -> Arrow-batched
         kernels (mapInArrow; no per-row Python in the exchange)
      -> mega-doc parts re-stitched per doc (applyInPandas ordered merge,
         `order` renumbered after empty-unit drops, matching add_metadata's
         enumeration semantics)

Mega-doc routing is metadata-only when the input table carries a
`size_class` partition column (the Iceberg hidden-partitioning analog,
written by corpus.corpus_parquet): each branch's filter is on the partition
column, so the scan reads every byte exactly ONCE across the two branches
instead of decoding the full payload twice.

The Python exchange uses mapInArrow rather than mapInPandas: Spark's
list<struct> -> pandas conversion materializes one dict per span and the
kernel-side record build used to allocate a second — flattening the struct
column once per batch and building the kernel records directly from the flat
field arrays measured ~25% faster end-to-end on the 100k-doc corpus.

Output: (doc_id, order, kind, text, media_ref, fmt) — the first five columns
are the span contract; `fmt` rides along for the store builder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F, types as T

from qs_spark.kernels.dispatch import SPLITTABLE_FMTS, fmt_of_spans, safe_extract_doc
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

_SPAN_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("order", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("fmt", pa.string()),
    ]
)

_PART_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_k", pa.int32()),
        ("local_order", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("fmt", pa.string()),
    ]
)

DEFAULT_SPLIT_THRESHOLD = 64
SIZE_CLASS_COL = "size_class"


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


def mega_predicate(split_threshold: int = DEFAULT_SPLIT_THRESHOLD):
    """Docs routed to the split/re-stitch path: page-local formats with more
    raw spans than one kernel call should own."""
    return F.col("fmt").isin(*SPLITTABLE_FMTS) & (
        F.size("spans") > split_threshold
    )


def with_size_class(
    df: DataFrame, split_threshold: int = DEFAULT_SPLIT_THRESHOLD
) -> DataFrame:
    """Derive the mega/small routing column.  Written as a PARTITION column
    at table-build time (corpus.corpus_parquet; on Iceberg you'd declare it
    as a hidden partition transform) so extract_spans' two branches become
    partition-pruned scans — each input byte is read once, not twice."""
    if "fmt" not in df.columns:
        df = with_fmt(df)
    cls = F.when(mega_predicate(split_threshold), F.lit("mega")).otherwise(
        F.lit("small")
    )
    # record the derivation threshold as column metadata (parquet round-trips
    # Spark schema metadata in the footer): extract_spans verifies it before
    # trusting a stored routing column, so a table classed with a custom
    # threshold can never be silently misrouted by a default-threshold job
    return df.withColumn(
        SIZE_CLASS_COL,
        cls.alias(SIZE_CLASS_COL, metadata={"split_threshold": split_threshold}),
    )


def _docs_from_arrow(batch: pa.RecordBatch, with_part_k: bool = False):
    """Yield (doc_id, fmt[, part_k], records) per document from one Arrow
    batch, building the kernel's list-of-dict span records straight from the
    flattened struct children (no pandas, no intermediate dict per span).

    When the batch carries no `fmt` column (the native-scan path reads raw
    table batches straight off parquet), fmt is yielded as None and the
    caller derives it per doc with kernels.dispatch.fmt_of_spans — the exact
    Python mirror of with_fmt (parity pinned by test_extract_golden).

    Null-safety mirrors the old pandas path: a null spans array or a null
    struct element is treated as absent, null fields as ''/0 — a 100 TB table
    always carries a few of those and they must not kill a task."""
    import pyarrow.compute as pc

    idx = {n: i for i, n in enumerate(batch.schema.names)}
    spans = batch.column(idx["spans"])
    lengths = pc.list_value_length(spans).fill_null(0).to_pylist()
    flat = pc.list_flatten(spans)  # concatenated children; null lists skipped
    svalid = flat.is_valid().to_pylist() if flat.null_count else None
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offs = flat.field("offset").to_pylist()
    dids = batch.column(idx["doc_id"]).to_pylist()
    fmts = batch.column(idx["fmt"]).to_pylist() if "fmt" in idx else None
    parts = batch.column(idx["part_k"]).to_pylist() if with_part_k else None
    pos = 0
    for i in range(batch.num_rows):
        ln = lengths[i]
        recs = []
        for j in range(pos, pos + ln):
            if svalid is not None and not svalid[j]:
                continue  # null struct element == absent span
            recs.append(
                {
                    "kind": kinds[j] or "",
                    "text": texts[j] or "",
                    "media_ref": refs[j] or "",
                    "offset": offs[j] if offs[j] is not None else 0,
                }
            )
        pos += ln
        fmt = fmts[i] if fmts is not None else None
        if with_part_k:
            yield dids[i], fmt, parts[i], recs
        else:
            yield dids[i], fmt, None, recs


def _make_whole_doc_fn(chunk_size: int):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols: tuple[list, ...] = ([], [], [], [], [], [])
            o_did, o_order, o_kind, o_text, o_ref, o_fmt = cols
            for did, fmt, _, recs in _docs_from_arrow(batch):
                if fmt is None:  # native-scan batches carry no fmt column
                    fmt = fmt_of_spans(recs)
                for u in safe_extract_doc(recs, fmt, chunk_size):
                    o_did.append(did)
                    o_order.append(u["order"])
                    o_kind.append(u["kind"])
                    o_text.append(u["text"])
                    o_ref.append(u["media_ref"])
                    o_fmt.append(fmt)
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, _SPAN_PA_SCHEMA)],
                schema=_SPAN_PA_SCHEMA,
            )

    return fn


def _make_part_fn(chunk_size: int):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols: tuple[list, ...] = ([], [], [], [], [], [], [])
            o_did, o_part, o_lorder, o_kind, o_text, o_ref, o_fmt = cols
            for did, fmt, part_k, recs in _docs_from_arrow(batch, with_part_k=True):
                # page-local formats only reach this path, so extracting a
                # slice is semantics-preserving; order is LOCAL here and
                # renumbered at stitch
                for u in safe_extract_doc(recs, fmt, chunk_size):
                    o_did.append(did)
                    o_part.append(int(part_k))
                    o_lorder.append(u["order"])
                    o_kind.append(u["kind"])
                    o_text.append(u["text"])
                    o_ref.append(u["media_ref"])
                    o_fmt.append(fmt)
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, _PART_PA_SCHEMA)],
                schema=_PART_PA_SCHEMA,
            )

    return fn


def _stitch(parts: DataFrame) -> DataFrame:
    """Ordered merge of mega-doc parts, entirely JVM-side: renumber by
    (part_k, local_order) per doc -> globally identical to a serial walk.

    Error-isolation parity with the whole-doc path: if ANY part's kernel
    raised, safe_extract_doc on the whole doc would have failed the whole doc
    with a single order=-1 error span — collapse to the FIRST error row (by
    part order).  Both the renumber and the collapse ride ONE window shuffle
    (same partitioning/ordering), and the kernel child is consumed exactly
    once — an applyInPandas stitch did the same logic but paid a second
    Arrow->pandas round trip of the full mega payload."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("part_k", "local_order")
    wdoc = Window.partitionBy("doc_id")
    is_err = F.when(F.col("kind") == "error", 1).otherwise(0)
    # one select, not three withColumns: each chained op is a full analyzer
    # pass over the tree on the driver; the window columns are unchanged
    return (
        parts.select(
            "*",
            F.sum(is_err).over(wdoc).alias("n_err"),
            F.sum(is_err).over(w).alias("err_seen"),  # running, incl. self
            F.row_number().over(w).alias("rn"),
        )
        .filter(
            (F.col("n_err") == 0)
            | ((F.col("kind") == "error") & (F.col("err_seen") == 1))
        )
        .select(
            "doc_id",
            F.when(F.col("n_err") > 0, F.lit(-1))
            .otherwise(F.col("rn") - 1)
            .cast("int")
            .alias("order"),
            "kind",
            "text",
            "media_ref",
            "fmt",
        )
    )


def extract_spans(
    df: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    split_threshold: int = DEFAULT_SPLIT_THRESHOLD,
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

    The two branches each scan the input.  When the table carries the
    `size_class` partition column AND split_threshold is the default the
    branch filters are partition-pruned (each byte decoded once); otherwise
    it's two real scans — cheap columnar reads on a real table, but callers
    with a generated/expensive source should materialize first (see
    corpus.corpus_parquet).

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

    # Trust a stored size_class only when its recorded derivation threshold
    # matches this call's (r04 ADVICE: a table classed via
    # with_size_class(df, custom) used to be silently misrouted at the
    # default threshold).  Tables written before the metadata existed carry
    # none and are trusted only at the default, as before.
    if SIZE_CLASS_COL in df.columns:
        stored_t = df.schema[SIZE_CLASS_COL].metadata.get("split_threshold")
        has_class = (
            stored_t == split_threshold
            if stored_t is not None
            else split_threshold == DEFAULT_SPLIT_THRESHOLD
        )
    else:
        has_class = False
    df = with_fmt(df)
    if has_class:
        # partition-column filters -> pruned scans, payload decoded once
        small = df.filter(F.col(SIZE_CLASS_COL) == "small")
        mega = df.filter(F.col(SIZE_CLASS_COL) == "mega")
    else:
        is_mega = mega_predicate(split_threshold)
        small = df.filter(~is_mega)
        mega = df.filter(is_mega)

    # prune to exactly the kernel's columns BEFORE the Arrow exchange —
    # mapInArrow ships every input column to Python otherwise
    small = small.select("doc_id", "spans", "fmt")
    if repartition_input:
        small = small.repartition(num_partitions, F.xxhash64("doc_id"))
    small_out = small.mapInArrow(_make_whole_doc_fn(chunk_size), schema=SPAN_SCHEMA)

    mega_out = _extract_mega(mega, chunk_size, split_threshold, num_partitions)

    return small_out.unionByName(mega_out)


def _extract_mega(
    mega: DataFrame, chunk_size: int, split_threshold: int, num_partitions: int
) -> DataFrame:
    """The mega-doc split/extract/re-stitch branch (needs a `fmt` column).
    Shared by extract_spans and the native-scan path — megas are ~0.2% of
    docs, so both keep this tail on the JVM scan."""
    n_spans = F.size("spans")
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
        # no reorder select: the part kernel reads Arrow columns by NAME
        # (_docs_from_arrow builds a name index), so column order is free
        .repartition(num_partitions, F.xxhash64("doc_id", "part_k"))
        .mapInArrow(_make_part_fn(chunk_size), schema=_PART_SCHEMA)
    )
    return _stitch(parts)


# --------------------------------------------------------------------------
# Native-scan fast path: pyarrow reads the parquet bytes INSIDE the Python
# workers, so the raw payload never pays the JVM columnar->row->Arrow-IPC
# re-serialization that dominates the mapInArrow exchange (measured at sf0.1:
# the identity Python round trip costs ~3.5x the pure columnar scan).  This
# is the PyIceberg/at-scale pattern: table metadata (partition dirs = the
# manifest stand-in) plans (file, row-group-range) splits driver-side; each
# task decodes its fragment Arrow-natively and runs the kernel in-process.
# Real data crosses the Python/JVM boundary exactly once — the OUTPUT spans.
# The mega tail (~0.2% of docs) stays on the JVM scan branch unchanged.
# --------------------------------------------------------------------------

_NATIVE_TARGET_SPLIT_BYTES = 128 * 1024 * 1024


def _plan_native_splits(
    files: list[str], target_bytes: int = _NATIVE_TARGET_SPLIT_BYTES
) -> list[tuple[str, int, int]]:
    """(path, rg_start, rg_end) splits; rg_end == -1 means "whole file"
    (footer never read driver-side for files under target_bytes — at 100 TB
    only the rare oversized data file pays a metadata read; Iceberg manifests
    carry row-group offsets and would make even that free)."""
    import os

    import pyarrow.parquet as pq

    splits: list[tuple[str, int, int]] = []
    for f in sorted(files):
        if os.path.getsize(f) <= target_bytes:
            splits.append((f, 0, -1))
            continue
        meta = pq.ParquetFile(f).metadata
        n_rg = meta.num_row_groups
        # group row groups into runs of ~target_bytes (uncompressed
        # total_byte_size — the kernel-work proxy; per-column compressed
        # sizes exist but the coarser number is fine for task sizing)
        run_start, run_bytes = 0, 0
        for g in range(n_rg):
            run_bytes += meta.row_group(g).total_byte_size
            if run_bytes >= target_bytes:
                splits.append((f, run_start, g + 1))
                run_start, run_bytes = g + 1, 0
        if run_start < n_rg:
            splits.append((f, run_start, n_rg))
        if n_rg == 0:
            splits.append((f, 0, -1))
    return splits


def _pack_splits_lpt(
    splits: list[tuple[str, int, int]], sizes: list[int], n_bins: int
) -> list[list[tuple[str, int, int]]]:
    """Longest-processing-time packing of splits into n_bins task bins:
    sort by byte weight descending, assign each to the lightest bin.  Bounds
    imbalance at (1 + 1/k) of optimal — good enough that ~2 waves of bins
    per core beat per-file tasks, whose ~0.3 s Python-exec overhead each
    dominated the job (measured: 390 one-file tasks = ~4 s of pure task
    overhead at 32 cores)."""
    import heapq

    n_bins = max(1, min(n_bins, len(splits)))
    heap = [(0, i) for i in range(n_bins)]
    heapq.heapify(heap)
    bins: list[list[tuple[str, int, int]]] = [[] for _ in range(n_bins)]
    for w, s in sorted(zip(sizes, splits), key=lambda x: -x[0]):
        load, i = heapq.heappop(heap)
        bins[i].append(s)
        heapq.heappush(heap, (load + w, i))
    return [b for b in bins if b]


def _make_native_reader_fn(
    bins: list[list[tuple[str, int, int]]], chunk_size: int, batch_rows: int = 8192
):
    """mapInArrow fn over a bin-index table: each task streams its bin's
    parquet fragments through the whole-doc kernel.  Bounded memory: one
    Arrow batch of raw payload + its extracted spans live at a time.  The
    bin list rides the task closure (paths only — at real scale you'd ship
    it as a broadcast of the Iceberg scan-task list; same shape)."""
    whole = _make_whole_doc_fn(chunk_size)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        for b in batches:
            for bin_idx in b.column(0).to_pylist():
                for pth, r0, r1 in bins[bin_idx]:
                    pf = pq.ParquetFile(pth)
                    rgs = (
                        list(range(pf.metadata.num_row_groups))
                        if r1 < 0
                        else list(range(r0, r1))
                    )
                    if not rgs:
                        continue
                    raw = pf.iter_batches(
                        batch_size=batch_rows,
                        row_groups=rgs,
                        columns=["doc_id", "spans"],
                    )
                    yield from whole(iter(raw))

    return fn


def native_scan_table(spark, path: str, split_threshold: int) -> DataFrame | None:
    """Validate `path` as a size_class-partitioned span table trusted for
    metadata-only mega/small routing and return its MEGA partition as a
    DataFrame (empty when there are no megas); None when the table can't be
    trusted (caller falls back to the generic scan).

    Cost discipline (r06, guide §5 "the driver should do almost no data
    work"): the old form opened the whole table with spark.read.parquet —
    a full file listing + schema inference over every data file (~0.25 s
    per query on the sandbox's 390-file corpus) only to filter out the
    ~0.2% mega partition.  Validation now reads ONE data-file footer
    driver-side (pyarrow, ~ms) and only the mega directory is handed to
    Spark, with an explicit schema so no inference pass runs.  The
    trusted-threshold rule is unchanged in effect: parquet's partitionBy
    drops column metadata (a stored with_size_class threshold never
    round-trips — verified), so a bare-path table is only ever trusted at
    the default derivation threshold; a table format with real column
    metadata (Iceberg) would consult it here."""
    import glob
    import os

    import pyarrow.parquet as pq

    small_dir = os.path.join(path, f"{SIZE_CLASS_COL}=small")
    if not os.path.isdir(small_dir):
        return None
    if split_threshold != DEFAULT_SPLIT_THRESHOLD:
        return None
    mega_dir = os.path.join(path, f"{SIZE_CLASS_COL}=mega")
    sample = next(
        (
            f
            for d in (small_dir, mega_dir)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            if os.path.getsize(f) > 0
        ),
        None,
    )
    if sample is None:
        return None
    from pyspark.sql.pandas.types import from_arrow_schema

    arrow_schema = pq.read_schema(sample)
    if "spans" not in arrow_schema.names or "doc_id" not in arrow_schema.names:
        return None
    schema = from_arrow_schema(arrow_schema)
    has_megas = any(
        os.path.getsize(f) > 0
        for f in glob.glob(os.path.join(mega_dir, "*.parquet"))
    )
    if not has_megas:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(mega_dir)


def extract_spans_native(
    spark,
    table_path: str,
    chunk_size: int = CHUNK_SIZE,
    split_threshold: int = DEFAULT_SPLIT_THRESHOLD,
    num_partitions: int | None = None,
    target_split_bytes: int = _NATIVE_TARGET_SPLIT_BYTES,
    task_waves: int = 2,
) -> DataFrame:
    """extract_spans over an on-disk size_class-partitioned table, reading
    the small partition's parquet bytes pyarrow-natively inside the workers
    (see module note above).  Output is row-identical to
    extract_spans(spark.read.parquet(table_path), repartition_input=False)
    — pinned by test_extract_native — and falls back to exactly that when
    the table lacks the trusted layout.

    task_waves: task bins per core (LPT-packed by bytes).  2 balances the
    per-task Python-exec overhead (~0.3 s each, measured) against
    straggler overlap; doc-level cost skew largely averages out at the
    bin level because each bin holds many hash-bucketed files."""
    import glob
    import os

    df = native_scan_table(spark, table_path, split_threshold)
    if df is None:
        return extract_spans(
            spark.read.parquet(table_path),
            chunk_size=chunk_size,
            split_threshold=split_threshold,
            num_partitions=num_partitions,
            repartition_input=False,
        )
    if num_partitions is None:
        num_partitions = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    small_dir = os.path.join(table_path, f"{SIZE_CLASS_COL}=small")
    files = [
        f
        for f in glob.glob(os.path.join(small_dir, "*.parquet"))
        if os.path.getsize(f) > 0
    ]
    splits = _plan_native_splits(files, target_split_bytes)
    if splits:
        sizes = [
            os.path.getsize(p) if r1 < 0 else target_split_bytes
            for p, _, r1 in splits
        ]
        cores = spark.sparkContext.defaultParallelism
        bins = _pack_splits_lpt(splits, sizes, n_bins=task_waves * cores)
        # one bin per partition via spark.range: partitioning is pinned (a
        # repartition() here is a shuffle whose payload is a few hundred
        # bytes, so AQE's partition coalescing would legally collapse it to
        # one task and serialize every read — measured 40 s vs 4 s), and a
        # JVM range source avoids a Python-RDD lineage whose pickle pass
        # would double the per-task Python-exec cost (measured 7.3 s vs
        # 4.0 s per 390 no-op tasks)
        bin_df = spark.range(len(bins), numPartitions=len(bins)).select(
            F.col("id").cast("int").alias("bin_idx")
        )
        small_out = bin_df.mapInArrow(
            _make_native_reader_fn(bins, chunk_size), schema=SPAN_SCHEMA
        )
    else:
        small_out = spark.createDataFrame([], SPAN_SCHEMA)

    # Size the mega branch's exchange by its DATA bytes (the partition dir
    # is the Iceberg-stats analog), not by 4x shuffle.partitions: megas are
    # ~0.2% of docs, and a cores-proportional partition count turned the
    # branch into hundreds of near-empty Python tasks whose ~0.3 s each
    # overhead GREW with cores (measured: 5 s at 8 cores -> 10 s at 32 on
    # ~5 MB of megas, inverting the scaling curve).  Slices carry payload
    # text, so bytes track kernel work here — 1 MB per task, floored at 1
    # (r06: 4 MB/task put the sandbox's 5.4 MB mega dir on 2 kernel tasks of
    # ~0.5 s each, ~1 s of critical path the union stage waits on; 1 MB/task
    # measured 0.72 s vs 1.0-2.2 s across 3-trial A/B, still bytes-derived
    # so the count cannot balloon with cores).
    mega_dir = os.path.join(table_path, f"{SIZE_CLASS_COL}=mega")
    mega_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(mega_dir, "*.parquet"))
    )
    if mega_bytes:
        mega_nparts = int(max(1, min(num_partitions, mega_bytes // (1024 * 1024) + 1)))
        # `df` is the mega partition itself (native_scan_table reads only
        # that directory with an explicit schema — no full-table listing)
        mega_out = _extract_mega(
            with_fmt(df), chunk_size, split_threshold, mega_nparts
        )
    else:
        # no megas: skip the whole split/stitch plan construction
        mega_out = spark.createDataFrame([], SPAN_SCHEMA)
    out = small_out.unionByName(mega_out)
    # Branch annotation for write_store (r06, guide §2.6): a store write
    # rebalances ABOVE this union, which fuses both branches into one map
    # stage — and that stage cannot start until the mega chain's stitch
    # shuffle is materialized, so the 100+-task native-kernel wave idles
    # ~1.3 s behind a 10-task mega pipeline (event-log audit, sf0.1).
    # Exposing the branches (with their byte weights) lets write_store
    # rebalance each branch separately: the kernel's exchange then has no
    # shuffle dependency and runs concurrently with the mega chain.
    small_bytes = sum(os.path.getsize(p) for p, _, _ in splits)
    out._qs_store_branches = [
        (small_out, max(small_bytes, 1)),
        (mega_out, max(mega_bytes, 1)),
    ]
    return out


def oracle_extract(docs: list[tuple[str, list[dict]]], chunk_size: int = CHUNK_SIZE) -> pd.DataFrame:
    """Single-threaded golden oracle over (doc_id, raw_spans) pairs."""
    rows = []
    for did, spans in docs:
        for u in safe_extract_doc(spans, None, chunk_size):
            rows.append((did, u["order"], u["kind"], u["text"], u["media_ref"]))
    return pd.DataFrame(rows, columns=["doc_id", "order", "kind", "text", "media_ref"])
