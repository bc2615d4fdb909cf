"""Independent single-threaded reference implementation of the extraction
walk — shares NO code with qs_spark.kernels (r03 VERDICT #3).

The golden x33/x34/x41/x47 oracles previously froze the output of the SAME
kernel modules the Spark pipeline ships, so they proved distributed == serial
but not kernel == reference: a kernel-semantics bug would freeze into its own
oracle.  This module re-derives the whole walk from the documented reference
semantics with plain dicts and loops:

  - dispatch: extension routing per quanta-search-consumer/core/
    extractor.py:52-156 (format derived from raw-span kinds, corpus schema
    FIXTURES.md F-1)
  - pdf/docx page walk + OCR stitch: ameya_parser_pdf
    whl!.../pdf/extractors/easyocr_extractor.py:23-77 (render+OCR when the
    page carries media/tables, retry at dpi*2, each line + "\\n", empty pages
    dropped so later orders shift)
  - deterministic synthetic OCR: the md5+LCG spec shared with corpus
    generation (re-implemented here from the documented constants, not
    imported)
  - sheets: pandas read_csv loader + the reference's greedy O(rows^2)
    to_string chunker including the dropped-row quirk
    (ameya_parser_xlsx whl!XLSW/extractors/simple_reader_extractor.py:45-75)
    and the all-Unnamed skiprows retry loop; every probe and every emit is a
    REAL df.to_string(index=False) call — none of the pipeline's closed-form
    fast paths exist here
  - txt: the documented sentence-split + greedy-pack spec
  - html: the north-rule main-content spec driven by stdlib html.parser
    event callbacks (the pipeline kernel rides a regex tokenizer + explicit
    stack machine — different architecture, same spec)
  - order: enumeration after empty-unit drops (add_metadata's
    page_no = idx+1, ameya_dataprocessing_core whl!core/files/utils.py:110)
  - error isolation: any exception -> one {kind:'error', order:-1} span
    (consumer.py:322-344, Processing->Failed per document)

Only dependency on the repo: qs_spark.corpus.gen_doc (the INPUT, by the
callers), and pandas (the reference's own loader dependency).
"""

from __future__ import annotations

import hashlib
import io
import re

import pandas as pd

CHUNK_SIZE = 102400  # ref: simple_reader_extractor.py:18

# ------------------------------------------------------------------ dispatch

_FMT_BY_KIND = {
    "html": "html",
    "pdf_text": "pdf",
    "pdf_table": "pdf",
    "pdf_figure": "pdf",
    "docx_para": "docx",
    "docx_table": "docx",
    "ocr_region": "docx",
    "sheet_rows": "xlsx",
    "csv_rows": "csv",
    "txt": "txt",
    "md": "md",
}

EXT_BY_FMT = {
    "html": ".html",
    "pdf": ".pdf",
    "docx": ".docx",
    "xlsx": ".xlsx",
    "csv": ".csv",
    "txt": ".txt",
    "md": ".md",
}


def ref_fmt_of_spans(raw_spans: list[dict]) -> str:
    for sp in raw_spans:
        f = _FMT_BY_KIND.get(sp["kind"])
        if f:
            return f
    return "md"


# ---------------------------------------------------------- synthetic OCR

_VOCAB = (
    "the a spark data table row column key value query filter join merge sort "
    "group agg window hash scan batch stream order part line customer vector "
    "small big fast slow dup index span text page chunk media region block "
    "cell sheet title body nav main footer figure ocr token term score rank"
).split()


def _h128(*parts: object) -> int:
    return int.from_bytes(
        hashlib.md5("|".join(str(p) for p in parts).encode("utf-8")).digest(), "big"
    )


def _vocab_words(seed_parts: tuple, n: int) -> list[str]:
    out = []
    h = _h128(*seed_parts)
    for _ in range(n):
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(_VOCAB[h % len(_VOCAB)])
    return out


def _ocr_lines(media_ref: str, dpi: int) -> list[str]:
    h = _h128(media_ref)
    if h % 13 == 0:
        return []
    if h % 7 == 0 and dpi <= 300:
        return []
    n_lines = 1 + (h % 4)
    return [
        " ".join(_vocab_words((media_ref, dpi, i), 3 + (h >> (i + 3)) % 5))
        for i in range(n_lines)
    ]


def _stitch_page(media_ref: str) -> str:
    lines = _ocr_lines(media_ref, 300)
    if not lines:
        lines = _ocr_lines(media_ref, 600)  # retry @ dpi*2 (easyocr:50-60)
    return "".join(line + "\n" for line in lines)


def _stitch_text_lines(text: str) -> str:
    return "".join(line + "\n" for line in text.split("\n") if line)


# -------------------------------------------------------------- pdf / docx

_TEXT_KINDS = {"pdf_text", "docx_para"}
_TABLE_KINDS = {"pdf_table", "docx_table"}
_MEDIA_KINDS = {"pdf_figure", "ocr_region", "docx_image"}


def ref_walk_pages(raw_spans: list[dict], plan: str = "basic +") -> list[dict]:
    ocr = plan != "basic"
    out = []
    for sp in raw_spans:
        k = sp["kind"]
        if k in _TEXT_KINDS:
            t = sp["text"] or ""
            if t:
                out.append({"kind": "pdf_text", "text": t, "media_ref": ""})
        elif k in _TABLE_KINDS:
            if ocr:
                t = _stitch_text_lines(sp["text"] or "")
                if t:
                    out.append({"kind": "ocr", "text": t, "media_ref": ""})
            else:
                t = sp["text"] or ""
                if t:
                    out.append({"kind": "pdf_text", "text": t, "media_ref": ""})
        elif k in _MEDIA_KINDS:
            if ocr:
                t = _stitch_page(sp["media_ref"] or "")
                if t:
                    out.append(
                        {"kind": "ocr", "text": t, "media_ref": sp["media_ref"] or ""}
                    )
    return out


# --------------------------------------------------------------------- txt

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _chunk_text(text: str, chunk_size: int) -> list[str]:
    if not text:
        return []
    if len(text) <= chunk_size:
        return [text]
    chunks, cur, cur_len = [], [], 0
    for s in (x for x in _SENT_RE.split(text) if x):
        add = len(s) if not cur else len(s) + 1
        if cur and cur_len + add > chunk_size:
            chunks.append(" ".join(cur))
            cur, cur_len = [], 0
            add = len(s)
        cur.append(s)
        cur_len += add
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def ref_walk_txt(raw_spans: list[dict], chunk_size: int) -> list[dict]:
    out = []
    for sp in raw_spans:
        for c in _chunk_text(sp["text"] or "", chunk_size):
            out.append({"kind": "sentence_chunk", "text": c, "media_ref": ""})
    if not out or not out[0]["text"]:
        return []  # ref: docs[0] falsy/IndexError gate
    return out


# ------------------------------------------------------------------ sheets


def _read_retry(sheet_csv: str, excel_mode: bool) -> pd.DataFrame | None:
    """pandas loader + the all-Unnamed skiprows retry loop (ref XLSW
    simple_reader_extractor: retry with skiprows while every header is
    'Unnamed*'; excel skips empty frames, csv propagates EmptyDataError)."""
    try:
        df = pd.read_csv(io.StringIO(sheet_csv))
    except pd.errors.EmptyDataError:
        return None
    count = 0
    while all(str(c).startswith("Unnamed") for c in df.columns):
        try:
            df = pd.read_csv(io.StringIO(sheet_csv), skiprows=count + 1)
        except pd.errors.EmptyDataError:
            if excel_mode:
                return None
            raise
        if excel_mode and df.empty:
            return None
        count += 1
    if excel_mode and df.empty:
        return None
    return df


def _greedy_chunks(df: pd.DataFrame, chunk_size: int) -> list[str]:
    """The reference's greedy chunker verbatim: probe every prefix with a
    real to_string, emit rows [_row, _p_row_num) — the boundary row itself is
    DROPPED (the reference's off-by-one), and a first-probe overflow leaves
    _p_row_num at 0."""
    n = df.shape[0]
    row = 0
    chunks = []
    while row < n:
        p_row_num = 0
        for i in range(row, n):
            if len(df.iloc[row : i + 1].to_string(index=False)) < chunk_size:
                p_row_num = i
            else:
                break
        if p_row_num + 1 <= row and row > 0:
            raise ValueError(
                f"row {row} alone exceeds chunk_size={chunk_size}; "
                "reference semantics would loop forever"
            )
        chunks.append(df.iloc[row:p_row_num].to_string(index=False))
        row = p_row_num + 1
    return chunks


def ref_walk_sheets(raw_spans: list[dict], excel_mode: bool, chunk_size: int) -> list[dict]:
    chunks: list[str] = []
    for sp in raw_spans:
        df = _read_retry(sp["text"] or "", excel_mode)
        if df is None:
            continue
        chunks.extend(_greedy_chunks(df, chunk_size))
    if not chunks or not chunks[0]:
        return []  # ref: first-doc falsy / IndexError gate
    return [{"kind": "table_chunk", "text": c, "media_ref": ""} for c in chunks]


# -------------------------------------------------------------------- html
#
# Independent architecture: stdlib html.parser event callbacks (the pipeline
# kernel rides a regex tokenizer + explicit stack machine — architectures
# swapped in round 4 because the regex machine is 1.8x faster and the slow
# one only runs at golden-regeneration time).  Spec, per the north rule +
# COVERAGE.md: prune boilerplate containers, collect text per innermost open
# content block, collapse whitespace, " | "-join table cells, drop >50%
# link-density blocks, implied end tags with a table-scope boundary, flush
# still-open blocks at EOF.

from html.parser import HTMLParser as _HTMLParser  # noqa: E402

_PRUNE = {
    "script", "style", "noscript", "template", "head", "nav", "footer",
    "aside", "header", "form", "button", "iframe", "svg",
}
_BLOCKS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "tr"}
_SELF_CLOSE_SAME = {"p", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6"}
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
         "embed", "source", "track", "wbr"}
_WS = re.compile(r"\s+")


class _RefMainContentParser(_HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._prune_depth = 0
        self._block_stack: list[dict] = []  # {tag, parts, link, total, cells}
        self._a_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            if tag == "br" and self._block_stack:
                self._block_stack[-1]["parts"].append(" ")
            return
        if tag in _PRUNE:
            self._prune_depth += 1
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag == "table":
            self._block_stack.append(
                {"tag": "table", "parts": [], "link": 0, "total": 0, "cells": []}
            )
        elif tag in _BLOCKS:
            while self._block_stack:
                top = self._block_stack[-1]["tag"]
                if top == "table":
                    break
                if (top == tag and tag in _SELF_CLOSE_SAME) or (
                    top == "p" and tag != "p"
                ):
                    self._emit_top()
                else:
                    break
            self._block_stack.append(
                {"tag": tag, "parts": [], "link": 0, "total": 0, "cells": []}
            )
        elif tag in ("td", "th") and self._block_stack and self._block_stack[-1]["tag"] == "tr":
            b = self._block_stack[-1]
            b["cells"].append(len(b["parts"]))

    def _emit_top(self) -> None:
        b = self._block_stack.pop()
        if b["tag"] == "table":
            return
        if b["tag"] == "tr" and b["cells"]:
            bounds = b["cells"] + [len(b["parts"])]
            cell_texts = [
                "".join(b["parts"][bounds[i] : bounds[i + 1]])
                for i in range(len(bounds) - 1)
            ]
            text = " | ".join(
                t for t in (_WS.sub(" ", c).strip() for c in cell_texts) if t
            )
        else:
            text = _WS.sub(" ", "".join(b["parts"])).strip()
        if text and (b["total"] == 0 or b["link"] / b["total"] <= 0.5):
            self.blocks.append(text)

    def handle_endtag(self, tag: str) -> None:
        if tag in _PRUNE:
            if self._prune_depth:
                self._prune_depth -= 1
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag == "table":
            if any(b["tag"] == "table" for b in self._block_stack):
                while self._block_stack:
                    sentinel = self._block_stack[-1]["tag"] == "table"
                    self._emit_top()
                    if sentinel:
                        break
            return
        scope = 0
        for i in range(len(self._block_stack) - 1, -1, -1):
            if self._block_stack[i]["tag"] == "table":
                scope = i + 1
                break
        if tag in _BLOCKS and any(
            b["tag"] == tag for b in self._block_stack[scope:]
        ):
            while self._block_stack:
                match = self._block_stack[-1]["tag"] == tag
                self._emit_top()
                if match:
                    break

    def flush(self) -> None:
        while self._block_stack:
            self._emit_top()

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not self._block_stack:
            return
        b = self._block_stack[-1]
        b["parts"].append(data)
        n = len(_WS.sub("", data))
        b["total"] += n
        if self._a_depth:
            b["link"] += n


def ref_extract_main(html: str) -> list[str]:
    p = _RefMainContentParser()
    p.feed(html or "")
    p.close()
    p.flush()
    return p.blocks


def ref_walk_html(raw_spans: list[dict]) -> list[dict]:
    out = []
    for sp in raw_spans:
        for block in ref_extract_main(sp["text"] or ""):
            out.append({"kind": "html_text", "text": block, "media_ref": ""})
    return out


# ----------------------------------------------------------------- top-level


def ref_extract_doc(
    raw_spans: list[dict],
    fmt: str | None = None,
    chunk_size: int = CHUNK_SIZE,
    plan: str | None = None,
) -> list[dict]:
    fmt = fmt or ref_fmt_of_spans(raw_spans)
    if fmt in ("pdf", "docx"):
        units = ref_walk_pages(raw_spans, plan=plan or "basic +")
    elif fmt == "xlsx":
        units = ref_walk_sheets(raw_spans, excel_mode=True, chunk_size=chunk_size)
    elif fmt == "csv":
        units = ref_walk_sheets(raw_spans, excel_mode=False, chunk_size=chunk_size)
    elif fmt == "txt":
        units = ref_walk_txt(raw_spans, chunk_size=chunk_size)
    elif fmt == "md":
        units = [
            {"kind": "raw", "text": sp["text"] or "", "media_ref": ""}
            for sp in raw_spans
        ]
    elif fmt == "html":
        units = ref_walk_html(raw_spans)
    else:
        raise AssertionError(f"Unsupported extension is given: {fmt}")
    for i, u in enumerate(units):
        u["order"] = i
    return units


def ref_safe_extract_doc(
    raw_spans: list[dict],
    fmt: str | None = None,
    chunk_size: int = CHUNK_SIZE,
    plan: str | None = None,
) -> list[dict]:
    try:
        return ref_extract_doc(raw_spans, fmt, chunk_size, plan)
    except Exception as e:  # noqa: BLE001 — any error = this doc Failed
        return [
            {
                "kind": "error",
                "text": f"{type(e).__name__}: {e}"[:500],
                "media_ref": "",
                "order": -1,
            }
        ]
