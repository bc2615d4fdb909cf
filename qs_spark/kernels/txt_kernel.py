"""TXT sentence chunker.

The reference runs llama-index's SentenceSplitter(chunk_size=102400) via an
IngestionPipeline (ameya_parser_txt whl!.../txt/extractors/
simple_reader_extractor.py:15-46) — and then appends the RAW splitter node
instead of the Document it just built (`documents.append(i)`, :44), so TXT
chunks carry only the splitter text (SURVEY.md §2.12-3); the text content is
unaffected, which is all the span contract sees.

Our deterministic re-implementation (documented spec, not a token-level clone
of llama's tokenizer-based budget):
  - if the text fits the budget, emit it UNCHANGED as one chunk (this is the
    reference's behavior at the 102400 default for any normal file, and keeps
    a pure SQL oracle possible for the single-chunk case);
  - otherwise split into sentences at /(?<=[.!?])\\s+/ and greedily pack
    sentences (joined by a single space) while the chunk stays <= chunk_size
    chars; an over-long single sentence becomes its own chunk.
  - empty input -> no chunks -> file contributes nothing (reference:
    docs[0] IndexError -> extraction error -> file fails).
"""

from __future__ import annotations

import re

CHUNK_SIZE = 102400

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENT_RE.split(text) if s]


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE) -> list[str]:
    if not text:
        return []
    if len(text) <= chunk_size:
        return [text]
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for s in split_sentences(text):
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


def walk_txt(raw_spans: list[dict], chunk_size: int = CHUNK_SIZE) -> list[dict]:
    """One raw 'txt' span = the whole file; emit sentence chunks in order."""
    out: list[dict] = []
    for sp in raw_spans:
        for c in chunk_text(sp["text"] or "", chunk_size):
            out.append({"kind": "sentence_chunk", "text": c, "media_ref": ""})
    if not out or not out[0]["text"]:
        return []
    return out
