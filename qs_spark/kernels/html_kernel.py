"""HTML main-content extraction (boilerplate strip).

The reference supports no HTML ingestion; this kernel is the north-rule
addition ("HTML boilerplate strip, DOM heuristics" — BASELINE.json) specified
here and oracled by our own tests + a SQL-expressible identity case.

Spec (deterministic, stdlib-only DOM tokenization via html.parser):
  - Pruned subtrees (classic boilerplate containers + non-content):
    script style noscript template head nav footer aside header form button
    iframe svg.
  - Content blocks: p h1..h6 li pre blockquote tr.  Text is collected per
    block (innermost open block wins); character references are decoded;
    intra-block whitespace runs collapse to a single space and the block is
    stripped.  Table rows join their td/th cell texts with " | ".
  - Link-density heuristic (boilerpipe-style): a block whose text is >50%
    inside <a> tags is dropped as boilerplate (nav bars that aren't <nav>).
  - Text not anchored in any content block (stray text in div/body) is
    ignored — unanchored runs are overwhelmingly chrome at web scale.
  - Empty blocks are dropped; emitted spans have kind 'html_text' in document
    order.
  - Malformed-markup recovery (HTML implied end tags): a new <p>/<li>/<tr>/
    heading closes an open block of the same tag; any block start closes an
    open <p>; </li>-style end tags unwind implied-open inner blocks; blocks
    still open at end-of-document are flushed, not discarded.
  - Nested tables: <table> pushes a boundary sentinel that stops the
    implied-close unwind (per the HTML spec, implied end tags do not cross a
    table scope), so an inner table's <tr> no longer closes the enclosing
    outer <tr>, and outer-cell text after the inner table lands back in the
    outer row.  Inner blocks emit when they close, i.e. before their
    enclosing outer row.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_PRUNE = {
    "script", "style", "noscript", "template", "head", "nav", "footer",
    "aside", "header", "form", "button", "iframe", "svg",
}
_BLOCKS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "tr"}
# blocks a new same-tag start implicitly closes (HTML implied-end-tag rules;
# blockquote/pre nest legitimately and are excluded)
_SELF_CLOSE_SAME = {"p", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6"}
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
         "embed", "source", "track", "wbr"}
_WS_RE = re.compile(r"\s+")


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._prune_depth = 0
        self._block_stack: list[dict] = []  # {tag, parts, link_chars, total, cells}
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
            # table-boundary sentinel: implied end tags never cross a table
            # scope, so a nested table's <tr> must not close the outer <tr>
            self._block_stack.append(
                {"tag": "table", "parts": [], "link": 0, "total": 0, "cells": []}
            )
        elif tag in _BLOCKS:
            # HTML implied-end-tag rules: real-world markup omits </p>/</li>
            # (<p>one<p>two, <li>a<li>b); without this the unclosed block
            # stays stuck on the stack and its text is silently lost
            while self._block_stack:
                top = self._block_stack[-1]["tag"]
                if top == "table":
                    break  # unwind stops at the table boundary
                if (top == tag and tag in _SELF_CLOSE_SAME) or (
                    top == "p" and tag != "p"  # any block start closes an open <p>
                ):
                    self._emit_top()
                else:
                    break
            self._block_stack.append(
                {"tag": tag, "parts": [], "link": 0, "total": 0, "cells": []}
            )
        elif tag in ("td", "th") and self._block_stack and self._block_stack[-1]["tag"] == "tr":
            b = self._block_stack[-1]
            b["cells"].append(len(b["parts"]))  # cell boundary marker

    def _emit_top(self) -> None:
        b = self._block_stack.pop()
        if b["tag"] == "table":
            return  # boundary sentinel, never emits
        if b["tag"] == "tr" and b["cells"]:
            cell_texts = []
            bounds = b["cells"] + [len(b["parts"])]
            for i in range(len(bounds) - 1):
                cell_texts.append("".join(b["parts"][bounds[i] : bounds[i + 1]]))
            text = " | ".join(
                t for t in (_WS_RE.sub(" ", c).strip() for c in cell_texts) if t
            )
        else:
            text = _WS_RE.sub(" ", "".join(b["parts"])).strip()
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
            # close everything open inside the innermost table scope (an
            # unclosed inner <tr> emits here), then pop its sentinel
            if any(b["tag"] == "table" for b in self._block_stack):
                while self._block_stack:
                    top_is_sentinel = self._block_stack[-1]["tag"] == "table"
                    self._emit_top()
                    if top_is_sentinel:
                        break
            return
        # match only within the innermost table scope: an end tag must not
        # unwind across (and silently emit) a table boundary
        scope_start = 0
        for i in range(len(self._block_stack) - 1, -1, -1):
            if self._block_stack[i]["tag"] == "table":
                scope_start = i + 1
                break
        if tag in _BLOCKS and any(
            b["tag"] == tag for b in self._block_stack[scope_start:]
        ):
            # unwind implied-open inner blocks (<li>a<p>b</li>) down to and
            # including the matching one
            while self._block_stack:
                top_is_match = self._block_stack[-1]["tag"] == tag
                self._emit_top()
                if top_is_match:
                    break

    def flush(self) -> None:
        """Emit any still-open blocks (document ended without closing them)."""
        while self._block_stack:
            self._emit_top()

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not self._block_stack:
            return
        b = self._block_stack[-1]
        b["parts"].append(data)
        n = len(_WS_RE.sub("", data))
        b["total"] += n
        if self._a_depth:
            b["link"] += n


def extract_main(html: str) -> list[str]:
    """HTML -> ordered list of main-content block texts."""
    p = _MainContentParser()
    p.feed(html or "")
    p.close()
    p.flush()
    return p.blocks


def walk_html(raw_spans: list[dict]) -> list[dict]:
    out: list[dict] = []
    for sp in raw_spans:
        for block in extract_main(sp["text"] or ""):
            out.append({"kind": "html_text", "text": block, "media_ref": ""})
    return out
