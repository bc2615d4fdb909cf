"""Deterministic synthetic interleaved corpus (FIXTURES.md F-1).

Every document is a pure function of its integer index (md5-keyed), so the
corpus can be generated distributedly on executors AND regenerated
single-threaded by the oracle, with no driver-side materialization and no
dependence on partitioning — a 10^12-doc table is just `spark.range(10**12)`
piped through the same generator.

Schema (BASELINE.json input_hint):
  doc_id string,
  spans  array<struct<kind string, text string, media_ref string, offset int>>

Format mix per 1000 docs: 300 html, 250 pdf (~40% of pdf pages carry media ->
OCR path), 150 docx, 120 xlsx, 80 csv, 70 txt, 30 md; 2/1000 are mega-docs
(100x pages) to exercise skew splitting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from qs_spark.kernels.detstr import md5_int, sentence, words

_FMT_THRESHOLDS = [
    (300, "html"),
    (550, "pdf"),
    (700, "docx"),
    (820, "xlsx"),
    (900, "csv"),
    (970, "txt"),
    (1000, "md"),
]

MEGA_EVERY = 500  # 2 per 1000
MEGA_PAGES = 400

# bump whenever generator output changes — keys the corpus_parquet cache so
# stale materializations can never be served across code versions
CORPUS_VERSION = 1


def doc_id_of(idx: int) -> str:
    return f"doc{idx:08d}"


def fmt_of(idx: int) -> str:
    did = doc_id_of(idx)
    if md5_int(did, "mega") % MEGA_EVERY == 0:
        return "pdf"  # mega-docs are huge OCR-heavy PDFs (the skew tail)
    u = md5_int(did, "fmt") % 1000
    for thresh, fmt in _FMT_THRESHOLDS:
        if u < thresh:
            return fmt
    return "md"


def _size_mult(did: str) -> int:
    # crude power-law tail: P(mult=m) ~ m^-2, capped
    u = (md5_int(did, "size") % 10_000) / 10_000.0 + 1e-4
    return min(int(u ** -0.77), 12)


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _gen_html(did: str) -> list[dict]:
    m = _size_mult(did)
    n_paras = 2 + md5_int(did, "np") % (4 * m + 1)
    parts = [
        "<html><head><title>t</title><script>var x=1;</script>"
        "<style>.a{color:red}</style></head><body>",
        "<nav><a href='/'>home</a> <a href='/x'>about</a></nav>",
        "<header><h1>%s</h1></header>" % " ".join(words((did, "h1"), 4)),
    ]
    parts.append("<main>")
    for i in range(n_paras):
        kind = md5_int(did, "pk", i) % 10
        if kind < 7:
            parts.append("<p>%s</p>" % sentence((did, "para", i), 8 + md5_int(did, "pl", i) % 25))
        elif kind < 8:  # link-farm block: >50% link chars -> boilerplate, dropped
            los = " ".join(
                "<a href='/l%d'>%s</a>" % (j, " ".join(words((did, "lf", i, j), 3)))
                for j in range(4)
            )
            parts.append("<p>%s %s</p>" % (los, words((did, "lftail", i), 1)[0]))
        elif kind < 9:
            items = "".join(
                "<li>%s</li>" % " ".join(words((did, "li", i, j), 5)) for j in range(3)
            )
            parts.append("<ul>%s</ul>" % items)
        else:
            rows = "".join(
                "<tr><td>%s</td><td>%s</td></tr>"
                % (" ".join(words((did, "tc", i, j, 0), 2)), " ".join(words((did, "tc", i, j, 1), 2)))
                for j in range(2)
            )
            parts.append("<table>%s</table>" % rows)
    parts.append("</main>")
    parts.append("<aside>ads %s</aside><footer>c 2026</footer></body></html>" % words((did, "ad"), 1)[0])
    return [_span("html", "".join(parts), "", 0)]


def _gen_pdf(did: str, mega: bool) -> list[dict]:
    m = _size_mult(did)
    n_pages = MEGA_PAGES if mega else 2 + md5_int(did, "npg") % (6 * m + 1)
    spans = []
    for p in range(n_pages):
        r = md5_int(did, "page", p) % 100
        if r < 55:  # text page
            n_lines = 2 + md5_int(did, "nl", p) % 5
            text = "\n".join(
                sentence((did, "pline", p, j), 6 + md5_int(did, "pw", p, j) % 12)
                for j in range(n_lines)
            )
            spans.append(_span("pdf_text", text, "", p))
        elif r < 70:  # table page -> OCR route
            n_lines = 2 + md5_int(did, "tl", p) % 4
            text = "\n".join(
                " ".join(words((did, "trow", p, j), 4)) for j in range(n_lines)
            )
            spans.append(_span("pdf_table", text, "", p))
        elif r < 93:  # figure/media page -> OCR with media_ref
            spans.append(_span("pdf_figure", "", f"media://{did}/{p}", p))
        else:  # empty text page (dropped by walker -> order shifts)
            spans.append(_span("pdf_text", "", "", p))
    return spans


def _gen_docx(did: str) -> list[dict]:
    m = _size_mult(did)
    n_blocks = 2 + md5_int(did, "nb") % (5 * m + 1)
    spans = []
    for b in range(n_blocks):
        r = md5_int(did, "blk", b) % 100
        if r < 68:
            spans.append(
                _span("docx_para", sentence((did, "dp", b), 10 + md5_int(did, "dw", b) % 20), "", b)
            )
        elif r < 84:
            n_lines = 2 + md5_int(did, "dtl", b) % 3
            text = "\n".join(" ".join(words((did, "dtr", b, j), 4)) for j in range(n_lines))
            spans.append(_span("docx_table", text, "", b))
        else:
            spans.append(_span("ocr_region", "", f"media://{did}/{b}", b))
    return spans


def _sheet_csv(did: str, s: int, n_rows: int, junk: bool) -> str:
    n_cols = 3 + md5_int(did, "nc", s) % 3
    lines = []
    if junk:
        lines.append("," * (n_cols - 1))
    lines.append(",".join(f"col{c}_{words((did, 'hdr', s, c), 1)[0]}" for c in range(n_cols)))
    for r in range(n_rows):
        lines.append(
            ",".join(" ".join(words((did, "cell", s, r, c), 1 + md5_int(did, "cw", s, r, c) % 2)) for c in range(n_cols))
        )
    return "\n".join(lines)


def _gen_sheet(did: str, kind: str) -> list[dict]:
    n_sheets = 1 if kind == "csv_rows" else 1 + md5_int(did, "ns") % 3
    spans = []
    for s in range(n_sheets):
        big = md5_int(did, "bigsheet", s) % 40 == 0
        n_rows = 2000 if big else 4 + md5_int(did, "nr", s) % 40
        junk = md5_int(did, "junk", s) % 5 == 0
        spans.append(_span(kind, _sheet_csv(did, s, n_rows, junk), "", s))
    return spans


def _gen_txt(did: str) -> list[dict]:
    m = _size_mult(did)
    n_sents = 3 + md5_int(did, "nsent") % (10 * m + 1)
    text = " ".join(sentence((did, "ts", j), 5 + md5_int(did, "tw", j) % 15) for j in range(n_sents))
    return [_span("txt", text, "", 0)]


def _gen_md(did: str) -> list[dict]:
    n = 2 + md5_int(did, "nmd") % 5
    text = "\n\n".join(
        "## %s\n%s" % (" ".join(words((did, "mh", j), 3)), sentence((did, "mp", j), 12))
        for j in range(n)
    )
    return [_span("md", text, "", 0)]


def gen_doc(idx: int) -> tuple[str, list[dict]]:
    """Deterministic (doc_id, raw_spans) for document #idx."""
    did = doc_id_of(idx)
    fmt = fmt_of(idx)
    mega = md5_int(did, "mega") % MEGA_EVERY == 0
    if fmt == "html":
        spans = _gen_html(did)
    elif fmt == "pdf":
        spans = _gen_pdf(did, mega)
    elif fmt == "docx":
        spans = _gen_docx(did)
    elif fmt == "xlsx":
        spans = _gen_sheet(did, "sheet_rows")
    elif fmt == "csv":
        spans = _gen_sheet(did, "csv_rows")
    elif fmt == "txt":
        spans = _gen_txt(did)
    else:
        spans = _gen_md(did)
    return did, spans


SPANS_FIELD_ORDER = ("kind", "text", "media_ref", "offset")


def gen_batch(indices) -> pd.DataFrame:
    ids, spans = [], []
    for i in indices:
        did, sp = gen_doc(int(i))
        ids.append(did)
        spans.append(sp)
    return pd.DataFrame({"doc_id": ids, "spans": spans})


def corpus_df(spark, n_docs: int):
    """Distributed corpus as a DataFrame (no driver materialization)."""
    from pyspark.sql import types as T

    schema = T.StructType(
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_batch(pdf["id"].tolist())

    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)
    return spark.range(n_docs, numPartitions=n_parts).mapInPandas(gen, schema=schema)


def corpus_parquet(spark, n_docs: int, path: str | None = None, n_buckets: int | None = None):
    """Materialize the corpus as a parquet table partitioned by `size_class`
    (mega/small) and bucketed by doc_id hash within each class, and return a
    reader DF.

    The north-rule input is a TABLE of interleaved docs; benchmarks measure
    extraction from storage, not generation.  The layout is the parquet
    stand-in for an Iceberg table with a hidden `size_class` partition and a
    `bucket(doc_id)` distribution:

      - size_class partitioning makes extract_spans' mega/small routing
        METADATA-ONLY: each branch's filter prunes to its own directory, so
        the full payload is scanned+decoded exactly once per job (the
        derived-filter alternative re-decoded every byte a second time just
        to find the ~0.2% mega docs);
      - bucketing by xxhash64(doc_id) moves the "salted repartition" to
        WRITE time: extraction scans co-located, size-balanced splits and
        needs no per-job shuffle of raw payloads
        (extract_spans(..., repartition_input=False)).
    """
    import os

    from pyspark.sql import functions as F

    from qs_spark.extract import SIZE_CLASS_COL, with_size_class

    # ~128-384 docs per bucket file: enough task granularity for fine waves,
    # big enough to amortize per-file open cost
    n_buckets = n_buckets or max(8, min(512, n_docs // 256))
    path = path or f"/tmp/qs_corpus_v{CORPUS_VERSION}_{n_docs}_sc.parquet"
    # a crashed write leaves a partial dir — only a fully _SUCCESS-marked
    # materialization may be served from cache
    done = all(
        os.path.isfile(os.path.join(path, f"{SIZE_CLASS_COL}={cls}", "_SUCCESS"))
        for cls in ("small", "mega")
    )
    if not done:
        base = with_size_class(corpus_df(spark, n_docs))
        # megas are ~0.2% of docs: give them their own (small) bucket count
        # so the mega partition isn't shredded into n_buckets sliver files
        for cls, nb in (("small", n_buckets), ("mega", max(4, n_buckets // 64))):
            (
                base.filter(F.col(SIZE_CLASS_COL) == cls)
                .drop(SIZE_CLASS_COL, "fmt")
                .repartition(nb, F.xxhash64("doc_id"))
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"{SIZE_CLASS_COL}={cls}"))
            )
    return spark.read.parquet(path)
