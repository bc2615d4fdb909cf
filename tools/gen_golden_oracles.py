"""Generate golden VALUES oracles for the driver entries whose INPUT (the
synthetic interleaved corpus) exists in no DuckDB table — the extraction
flagship (x33), the preview-search flows (x34/x41), and the checkpoint
lineage (x47).

Why VALUES literals: the driver's correctness gate runs oracle SQL over the
pre-registered parquet views only, and the corpus is generated — DuckDB
cannot re-derive it.  What it CAN verify is that the distributed pipeline
reproduces a SINGLE-THREADED, INDEPENDENTLY-IMPLEMENTED reference
byte-for-byte: this script runs tools/serial_reference.py (a from-scratch
serial re-implementation of the whole extraction walk — NO import from
qs_spark.kernels, r03 VERDICT #3) plus an equally independent
re-implementation of the search / preview dataflow below (plain dicts and
loops, no DataFrame code shared with the pipeline) and freezes the output as
`SELECT ... FROM (VALUES ...)` statements in qs_spark/golden/*.sql, which
__spark_entry__.oracle_sql() serves to the driver.  The only shared helpers
are previews.process_single_text/process_texts — char-index arithmetic that
IS the spec, property-tested against an independent char walker.

Scale pinning: goldens are generated at N_DOCS = 500, the documents.parquet
row count of BOTH sf0.001 and sf0.01 (the harness scales).  At other scales
these four entries fall back to rows-only semantics — regenerate if the
driver scale ever changes.

Regenerate after ANY kernel / corpus / search-constant change:

    python tools/gen_golden_oracles.py

The x47 bucket ids come from Spark's xxhash64 (a tiny local session maps the
200 doc_ids to buckets); every COUNT in x47 comes from the pandas reference,
and the script asserts bucket completeness + doc-count totals independently.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from serial_reference import (  # noqa: E402 — the kernel-independent walk
    EXT_BY_FMT,
    ref_fmt_of_spans as fmt_of_spans,
    ref_safe_extract_doc as safe_extract_doc,
)

from qs_spark.corpus import gen_doc  # noqa: E402 — the INPUT generator
from qs_spark.previews import process_single_text, process_texts  # noqa: E402
from qs_spark.stopwords import STOPWORDS  # noqa: E402

N_DOCS = 500  # documents.parquet rows at sf0.001 AND sf0.01
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "qs_spark", "golden")

_TOK_RE = re.compile(r"[^a-z0-9]+")
_NON_ALNUM = re.compile(r"[^A-Za-z0-9 ]+")


def spark_round(x: float, scale: int) -> float:
    """Spark's ROUND for doubles: BigDecimal.valueOf (shortest repr) +
    HALF_UP — python's round() is half-even and would drift on exact ties."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()


def sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def emit(name: str, select_cols: str, colnames: list[str], rows: list[tuple]) -> None:
    vals = ",\n".join("(" + ", ".join(r) + ")" for r in rows)
    sql = (
        f"SELECT {select_cols}\nFROM (VALUES\n{vals}\n) AS t({', '.join(colnames)})\n"
    )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, name), "w") as f:
        f.write(sql)
    print(f"wrote {name}: {len(rows)} rows, {len(sql)} bytes")


# ---------------------------------------------------------------- reference


def reference_extract(n_docs: int) -> list[dict]:
    """Serial reference: one dict per extracted unit, across the corpus."""
    out = []
    for idx in range(n_docs):
        did, spans = gen_doc(idx)
        fmt = fmt_of_spans(spans)
        for u in safe_extract_doc(spans, fmt):
            out.append(
                {
                    "doc_id": did,
                    "fmt": fmt,
                    "order": u["order"],
                    "kind": u["kind"],
                    "text": u["text"],
                    "media_ref": u["media_ref"],
                }
            )
    return out


def reference_store(units: list[dict]) -> list[dict]:
    """F1 + F2 + page_no over reference units (store.build_store semantics)."""
    rows = []
    for u in units:
        if u["kind"] == "error":
            continue
        fname = u["doc_id"] + EXT_BY_FMT[u["fmt"]]
        text = f"File Name : {fname}\n\n\n{u['text'] or ''}".lower().replace("\n", " ")
        rows.append(
            {
                "row_id": f"{u['doc_id']}#{u['order']}",
                "document_id": u["doc_id"],
                "document_name": fname,
                "page_no": u["order"] + 1,
                "text": text,
            }
        )
    return rows


def _tokens(text: str) -> set[str]:
    return {t for t in _TOK_RE.split(text) if t}


def reference_search_previews(
    rows: list[dict], query: str, exact: bool
) -> list[tuple]:
    """Independent re-implementation of the full preview-search dataflow
    (retrieval -> A2 rollup -> F10 -> P7 -> W1/W2 previews -> F11 boost ->
    O1 top-200); shares only the char-exact preview windowing helpers with
    the pipeline (they ARE the spec, tested separately)."""
    query__ = query.strip().lower()
    query_ = _NON_ALNUM.sub(" ", query__.replace('"', "").replace("'", ""))
    terms = [w for w in query_.split() if w not in STOPWORDS]
    if exact:
        words = query_.split()
        if not words:
            return []
        match = [
            r
            for r in rows
            if all(w in _tokens(r["text"]) for w in words) and query__ in r["text"]
        ]
    else:
        if not terms:
            return []
        tset = set(terms)
        match = [r for r in rows if tset & _tokens(r["text"])]
    per_file: dict[str, list[dict]] = {}
    for r in match:
        per_file.setdefault(r["document_name"], []).append(r)
    n_files = len(per_file)
    out = []
    for name, rs in per_file.items():
        c = len(rs)
        s = spark_round(min(0.7 + 0.3 * math.log(1 + c) / math.log(1 + n_files), 0.9995), 6)
        if not s > 0.655:  # P7
            continue
        rs = sorted(rs, key=lambda r: (r["document_id"], r["page_no"]))
        texts = [r["text"].replace(f"file name : {name}", "") for r in rs]  # F8
        previews = process_texts(texts, query__, 3, 3)  # W1/W2
        score = s
        if score < 0.9 and previews:  # F11
            score = 0.9
        score = min(score + (0.99998 - score) * min(len(previews) / 10, 1), 0.99998)
        if exact and not previews:
            continue
        out.append((name, c, round(score * 100, 3), previews))
    out.sort(key=lambda t: (-t[2], t[0]))
    return out[:200]


def reference_preview_docs(rows: list[dict], query: str, doc_ids: set[str]) -> list[tuple]:
    """Independent /user/search_preview flow (W3 + F8 + O3)."""
    query__ = query.lower()
    out = []
    for r in rows:
        if r["document_id"] not in doc_ids:
            continue
        text = r["text"].replace(f"file name : {r['document_name'].lower()}", "")
        previews = process_single_text(text, query__, 3, -1)
        if previews:
            out.append((r["document_id"], r["document_name"], r["page_no"], previews))
    out.sort(key=lambda t: (t[0], t[2]))
    return out


def to_json(previews: list[str]) -> str:
    # Spark to_json formatting: compact separators, raw UTF-8
    return json.dumps(previews, separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------- goldens


def gen_x33(units: list[dict]) -> None:
    per_doc: dict[str, list[dict]] = {}
    for u in units:
        per_doc.setdefault(u["doc_id"], []).append(u)
    rows = []
    for did in sorted(per_doc):
        us = sorted(per_doc[did], key=lambda u: u["order"])
        digest = md5_hex(
            "|".join(
                f"{u['order']}#{u['kind']}#{md5_hex(u['text'] or '')}#{u['media_ref']}"
                for u in us
            )
        )
        rows.append(
            (
                sql_str(did),
                sql_str(us[0]["fmt"]),
                str(len(us)),
                sql_str(digest),
            )
        )
    emit(
        "x33_extract_full_corpus.sql",
        "doc_id, fmt, CAST(n_spans AS BIGINT) AS n_spans, span_digest",
        ["doc_id", "fmt", "n_spans", "span_digest"],
        rows,
    )


def gen_x34(store: list[dict]) -> None:
    rows = []
    for mode, query, exact in (("or", "spark join", False), ("exact", "data table", True)):
        for name, c, score, previews in reference_search_previews(store, query, exact):
            rows.append(
                (
                    sql_str(name),
                    str(c),
                    repr(score),
                    sql_str(to_json(previews)),
                    sql_str(mode),
                )
            )
    emit(
        "x34_search_with_previews.sql",
        "document_name, CAST(match_count AS BIGINT) AS match_count,"
        " CAST(relavence_score AS DOUBLE) AS relavence_score, preview, mode",
        ["document_name", "match_count", "relavence_score", "preview", "mode"],
        rows,
    )


def gen_x41(store: list[dict]) -> None:
    ids = {f"doc{i:08d}" for i in range(60)}
    pages = reference_preview_docs(store, "table", ids)
    # A5 preview_count = total snippets across the result (api.py:977),
    # attached to every row as the entry's broadcast scalar is
    total = sum(len(previews) for _, _, _, previews in pages)
    rows = [
        (sql_str(did), sql_str(name), str(page), sql_str(to_json(previews)), str(total))
        for did, name, page, previews in pages
    ]
    emit(
        "x41_preview_docs_pages.sql",
        "document_id, document_name, CAST(page_no AS INT) AS page_no, previews,"
        " CAST(preview_count AS BIGINT) AS preview_count",
        ["document_id", "document_name", "page_no", "previews", "preview_count"],
        rows,
    )


def gen_x47() -> None:
    """Checkpoint lineage over the 200-doc corpus: counts from the pandas
    reference; bucket ids = Spark xxhash64(doc_id) % 8 (evaluated once in a
    local session — the one Spark dependency here, it IS the layout spec)."""
    units = reference_extract(200)
    from qs_spark.session import get_spark

    spark = get_spark("golden_buckets", cores=2, shuffle_partitions=4)
    from pyspark.sql import functions as F

    ids = sorted({u["doc_id"] for u in units})
    bucket_of = {
        r.doc_id: r.b
        for r in spark.createDataFrame([(d,) for d in ids], "doc_id string")
        .select("doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    spark.stop()
    per_bucket: dict[int, dict] = {b: {"docs": set(), "spans": 0} for b in range(8)}
    for u in units:
        b = bucket_of[u["doc_id"]]
        per_bucket[b]["docs"].add(u["doc_id"])
        per_bucket[b]["spans"] += 1
    # independent invariants: every bucket commits; all extracted docs counted
    assert sum(len(v["docs"]) for v in per_bucket.values()) == len(ids)
    rows = [
        (
            str(b),
            str(len(per_bucket[b]["docs"])),
            str(per_bucket[b]["spans"]),
            sql_str("committed"),
            sql_str("driver"),
        )
        for b in range(8)
    ]
    emit(
        "x47_checkpoint_lineage.sql",
        "CAST(bucket AS INT) AS bucket, CAST(doc_count AS BIGINT) AS doc_count,"
        " CAST(span_count AS BIGINT) AS span_count, status, run_id",
        ["bucket", "doc_count", "span_count", "status", "run_id"],
        rows,
    )


def gen_x48() -> None:
    """Media pipeline reference: replays the (pure-python) synth + decode +
    histogram featurizer + frame sampler serially for the 512 synthetic
    media rows and freezes the joined output.  Embeddings are integer
    micro-units (the entry quantizes identically) so no float-format
    dependence exists."""
    import hashlib
    import math

    import numpy as np

    from qs_spark.multimodal import EMBED_DIM, _decode, sample_frame_rows, synth_media_row

    rows = []
    for i in range(512):
        ref, mime, payload, meta = synth_media_row(i)
        duration_ms = meta["duration_ms"]
        decoded = _decode(payload, mime)
        hist, _ = np.histogram(decoded, bins=EMBED_DIM, range=(0, 256))
        vec = (hist / max(len(decoded), 1)).astype(np.float32)
        e6 = [int(math.floor(float(v) * 1e6 + 0.5)) for v in vec]
        if mime.startswith("video/") and duration_ms:
            # r05f/g: the frame sampler pixel-decodes real h.264 access
            # units; fold the per-frame decoded-plane digests exactly as the
            # entry does (order-stable comma join -> md5) plus the IDR count
            # and milli-mean-luma sum, so the golden validates the PIXEL
            # decode, not just the grid arithmetic
            frames = sample_frame_rows(payload, duration_ms, 1000)
            n_frames, last_ts = len(frames), frames[-1]["ts_ms"]
            n_idr = sum(1 for r in frames if r["is_idr"])
            luma = sum(r["mean_luma_milli"] for r in frames)
            fdig = hashlib.md5(
                ",".join(r["frame_digest"] for r in frames).encode()
            ).hexdigest()
        else:
            n_frames, last_ts, n_idr, luma, fdig = 0, -1, -1, -1, ""
        rows.append(
            (
                sql_str(ref),
                sql_str(mime),
                str(len(payload)),
                sql_str(json.dumps(e6, separators=(",", ":"))),
                str(n_frames),
                str(last_ts),
                str(n_idr),
                str(luma),
                sql_str(fdig),
            )
        )
    emit(
        "x48_media_pipeline.sql",
        "media_ref, mime, CAST(n_bytes AS INT) AS n_bytes, embedding_e6,"
        " CAST(n_frames AS BIGINT) AS n_frames, CAST(last_ts_ms AS INT) AS last_ts_ms,"
        " CAST(n_idr AS BIGINT) AS n_idr, CAST(luma_milli_sum AS BIGINT)"
        " AS luma_milli_sum, frames_digest",
        ["media_ref", "mime", "n_bytes", "embedding_e6", "n_frames", "last_ts_ms",
         "n_idr", "luma_milli_sum", "frames_digest"],
        rows,
    )


def main() -> None:
    units = reference_extract(N_DOCS)
    gen_x33(units)
    store = reference_store(units)
    gen_x34(store)
    gen_x41(store)
    gen_x47()
    gen_x48()


if __name__ == "__main__":
    main()
