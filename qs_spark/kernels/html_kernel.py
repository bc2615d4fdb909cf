"""HTML main-content extraction (boilerplate strip).

The reference supports no HTML ingestion; this kernel is the north-rule
addition ("HTML boilerplate strip, DOM heuristics" — BASELINE.json) specified
here and oracled by our own tests + a SQL-expressible identity case.

Spec (deterministic, stdlib-only):
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

Architecture (rounds 4-5): a flat regex tokenizer + explicit stack machine
(faster than event-callback dispatch on this corpus).  The stack machine is
ours; the tokenizer is a faithful port of stdlib html.parser's scanning
(round 5, after the r04 ADVICE divergences) so that real-world malformed
markup parses identically to the INDEPENDENT golden oracle in
tools/serial_reference.py, which drives actual html.parser callbacks —
equality pinned by test_serial_reference_matches_kernels plus a 40k-doc
pathological fuzz (0 divergences at last regeneration).  Leniency summary: a
bare '<' that opens no well-formed tag is literal text; '</'+junk is a bogus
comment; script/style bodies are CDATA; stdlib marked-section errors
(<![xyz]>) raise the same exception text, which doc-level error isolation
turns into the same error span on both sides.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

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
# exact ASCII subset of the regex's \s, built by probing it — used to count
# non-whitespace chars (link-density stat) without a per-chunk re.sub; the
# non-ASCII path keeps the regex so unicode whitespace semantics are
# untouched
_WS_DEL = {i: None for i in range(128) if _WS_RE.match(chr(i))}


def _nonws_len(text: str) -> int:
    if text.isascii():
        return len(text.translate(_WS_DEL))
    return len(_WS_RE.sub("", text))
# --- tokenizer: a faithful port of stdlib html.parser's scanning (CPython
# 3.11 Lib/html/parser.py + Lib/_markupbase.py, public source), minus the
# event-dispatch machinery.  Parity fixes over the r04 regex (r04 ADVICE):
#   - tag-name charset [a-zA-Z][^\t\n\r\f />\x00]* — <p-card> is 'p-card',
#     not a truncated <p>
#   - self-closing only when a standalone '/' precedes '>': an UNQUOTED
#     attribute value swallows a trailing slash (<a href=http://x.com/> is a
#     plain start tag), so a_depth no longer resets and link text cannot
#     escape the link-density filter
#   - end tags tolerate '</ li>' / '</p junk>' (endtagfind + tagfind
#     recovery); '</'+junk is a bogus comment consumed through '>'
#   - comments close on --\s*>, declarations/PIs/marked sections consume
#     in-stream (the old pre-strip spliced malformed-tag boundaries)
#   - script/style content is CDATA: markup inside is raw text until a
#     conforming matching close tag
_LOCATE_START = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*      # tag name
  (?:[\s/]*                         # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]* # attribute name
      (?:\s*=+\s*                   # value indicator
        (?:'[^']*'                  # LITA-enclosed value
          |"[^"]*"                  # LIT-enclosed value
          |(?!['"])[^>\s]*          # bare value
        )
        (?:\s*,)*                   # possibly followed by a comma
      )?(?:\s|/(?!>))*
    )*
  )?
  \s*                               # trailing whitespace
""",
    re.VERBOSE,
)
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
# Hot-path shortcuts for the overwhelmingly common well-formed shapes; both
# are strict SUBSETS of the tolerant grammar, constructed so that any input
# they accept is parsed identically by the slow path (names without exotic
# chars; attr bodies without bare '/', so an unquoted value ending in '/'
# can never be misread as self-closing; quoted values may hold '>' but not
# '<').  Anything else falls through to the faithful html.parser port.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][a-zA-Z0-9._:-]*"
    r"(?:=(?:\"[^\"<]*\"|'[^'<]*'|[^<>\s\"'/]+))?)*\s*)"
    r"(/?)>"
)
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")
_ATTRFIND = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_MS_NAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MS_CLOSE2 = re.compile(r"]\s*]\s*>")  # <![CDATA[ .. ]]>-style sections
_MS_CLOSE1 = re.compile(r"]\s*>")  # <![if ..]>-style sections
# next-char classes after a located start tag that mean "input ended inside
# the tag" (check_for_whole_start_tag's letters/=// set)
_INCOMPLETE_NEXT = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
# html.parser CDATA_CONTENT_ELEMENTS: inside these, markup is raw text until
# a matching close tag — '<p>' inside a script string must not open a block
_CDATA_ELEMS = ("script", "style")
_CDATA_CLOSE = {e: re.compile(r"</\s*" + e, re.I) for e in _CDATA_ELEMS}


def _fallback(html: str, i: int) -> tuple[int, str]:
    """goahead's end-of-feed recovery for an unparseable '<' construct: raw
    data through the next '>', else up to the next '<', else one char."""
    gt = html.find(">", i + 1)
    if gt >= 0:
        return gt + 1, html[i : gt + 1]
    lt = html.find("<", i + 1)
    if lt >= 0:
        return lt, html[i:lt]
    return i + 1, html[i : i + 1]


def _parse_start(
    html: str, i: int
) -> tuple[int, str | None, bool, str | None, bool]:
    """check_for_whole_start_tag + parse_starttag port.
    Returns (newpos, tagname|None, selfclosing, data_chunk|None, chunk_raw):
    recovery chunks are entity-decoded like any data (goahead's k<0 branch
    under convert_charrefs); only parse_starttag's junk-tail chunk is raw."""
    j = _LOCATE_START.match(html, i).end()
    nxt = html[j : j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/" and html.startswith("/>", j):
        endpos = j + 2
    elif nxt == "" or nxt in _INCOMPLETE_NEXT:
        pos, chunk = _fallback(html, i)  # input ended inside the tag
        return pos, None, False, chunk, False
    else:
        endpos = j  # bogus input after the locatable part
    tm = _TAGFIND.match(html, i + 1)
    name = tm.group(1).lower()
    k = tm.end()
    while k < endpos:
        am = _ATTRFIND.match(html, k)
        if not am:
            break
        k = am.end()
    tail = html[k:endpos].strip()
    if tail == ">":
        return endpos, name, False, None, False
    if tail == "/>":
        return endpos, name, True, None, False
    return endpos, None, False, html[i:endpos], True  # junk tail: raw data


def _parse_end(html: str, i: int) -> tuple[int, str | None, str | None]:
    """parse_endtag port.  Returns (newpos, endname|None, chunk|None):
    '</name junk>' still fires end(name); '</'+junk is a bogus comment
    (dropped through '>'); '</>' vanishes; EOF leaves '</...' as data
    (entity-decoded by the caller, per goahead's recovery branch)."""
    gt = html.find(">", i + 1)
    if gt < 0:
        pos, chunk = _fallback(html, i)
        return pos, None, chunk
    m = _ENDTAG.match(html, i)
    if m:
        return gt + 1, m.group(1).lower(), None
    tm = _TAGFIND.match(html, i + 2)
    if tm:
        return gt + 1, tm.group(1).lower(), None
    if html.startswith("</>", i):
        return i + 3, None, None
    return gt + 1, None, None  # bogus comment


def _parse_decl(html: str, i: int) -> tuple[int, str | None]:
    """parse_comment / parse_marked_section / parse_html_declaration port —
    all dropped content, only the consumption endpoint (and the stdlib's
    marked-section exceptions, which the doc-level error isolation turns into
    the same error span as the html.parser oracle) matters.
    Returns (newpos, raw_chunk|None)."""
    n = len(html)
    if html.startswith("<!--", i):
        m = _COMMENT_CLOSE.search(html, i + 4)
        if m:
            return m.end(), None
        return _fallback(html, i)
    if html.startswith("<![", i):
        if i + 3 == n:
            return _fallback(html, i)
        nm = _MS_NAME.match(html, i + 3)
        if not nm:
            raise AssertionError("expected name token at %r" % html[i : i + 20])
        if nm.end() == n:
            return _fallback(html, i)  # name runs to end of buffer
        sect = nm.group().strip().lower()
        if sect in ("temp", "cdata", "ignore", "include", "rcdata"):
            m = _MS_CLOSE2.search(html, i + 3)
        elif sect in ("if", "else", "endif"):
            m = _MS_CLOSE1.search(html, i + 3)
        else:
            raise AssertionError(
                "unknown status keyword %r in marked section"
                % html[i + 3 : nm.end()]
            )
        if m:
            return m.end(), None
        return _fallback(html, i)
    gt = html.find(">", i + 2)  # doctype / declaration / bogus comment
    if gt >= 0:
        return gt + 1, None
    return _fallback(html, i)


def extract_main(html: str) -> list[str]:
    """HTML -> ordered list of main-content block texts."""
    html = html or ""
    blocks: list[str] = []
    stack: list[dict] = []  # {tag, parts, link, total, cells}
    prune = 0
    a_depth = 0

    def emit_top() -> None:
        b = stack.pop()
        if b["tag"] == "table":
            return  # boundary sentinel, never emits
        if b["tag"] == "tr" and b["cells"]:
            bounds = b["cells"] + [len(b["parts"])]
            cells = [
                "".join(b["parts"][bounds[i] : bounds[i + 1]])
                for i in range(len(bounds) - 1)
            ]
            text = " | ".join(
                t for t in (_WS_RE.sub(" ", c).strip() for c in cells) if t
            )
        else:
            text = _WS_RE.sub(" ", "".join(b["parts"])).strip()
        if text and (b["total"] == 0 or b["link"] / b["total"] <= 0.5):
            blocks.append(text)

    def start(tag: str) -> None:
        nonlocal prune, a_depth
        if tag in _VOID:
            if tag == "br" and stack:
                stack[-1]["parts"].append(" ")
            return
        if tag in _PRUNE:
            prune += 1
            return
        if prune:
            return
        if tag == "a":
            a_depth += 1
        if tag == "table":
            # table-boundary sentinel: implied end tags never cross a table
            # scope, so a nested table's <tr> must not close the outer <tr>
            stack.append({"tag": "table", "parts": [], "link": 0, "total": 0, "cells": []})
        elif tag in _BLOCKS:
            # HTML implied-end-tag rules: real-world markup omits </p>/</li>
            # (<p>one<p>two, <li>a<li>b); without this the unclosed block
            # stays stuck on the stack and its text is silently lost
            while stack:
                top = stack[-1]["tag"]
                if top == "table":
                    break  # unwind stops at the table boundary
                if (top == tag and tag in _SELF_CLOSE_SAME) or (
                    top == "p" and tag != "p"  # any block start closes an open <p>
                ):
                    emit_top()
                else:
                    break
            stack.append({"tag": tag, "parts": [], "link": 0, "total": 0, "cells": []})
        elif tag in ("td", "th") and stack and stack[-1]["tag"] == "tr":
            stack[-1]["cells"].append(len(stack[-1]["parts"]))  # cell boundary

    def end(tag: str) -> None:
        nonlocal prune, a_depth
        if tag in _PRUNE:
            if prune:
                prune -= 1
            return
        if prune:
            return
        if tag == "a":
            a_depth = max(0, a_depth - 1)
        if tag == "table":
            # close everything open inside the innermost table scope (an
            # unclosed inner <tr> emits here), then pop its sentinel
            if any(b["tag"] == "table" for b in stack):
                while stack:
                    sentinel = stack[-1]["tag"] == "table"
                    emit_top()
                    if sentinel:
                        break
            return
        if tag not in _BLOCKS:
            return  # only block end tags can unwind the stack
        # match only within the innermost table scope: an end tag must not
        # unwind across (and silently emit) a table boundary
        scope = 0
        for i in range(len(stack) - 1, -1, -1):
            if stack[i]["tag"] == "table":
                scope = i + 1
                break
        if any(b["tag"] == tag for b in stack[scope:]):
            # unwind implied-open inner blocks (<li>a<p>b</li>) down to and
            # including the matching one
            while stack:
                match = stack[-1]["tag"] == tag
                emit_top()
                if match:
                    break

    def data(text: str, raw: bool = False) -> None:
        # raw=True mirrors html.parser's recovery paths, which emit the
        # chunk without character-reference decoding
        if prune or not stack or not text:
            return
        if not raw:
            text = _unescape(text)
        b = stack[-1]
        b["parts"].append(text)
        n = _nonws_len(text)
        b["total"] += n
        if a_depth:
            b["link"] += n

    pos, n = 0, len(html)
    cdata: str | None = None
    while pos < n:
        if cdata is not None:
            # CDATA content mode (script/style): raw text — pruned, since
            # both elements are boilerplate — until a conforming close tag;
            # '</script x>'-style near-misses stay data and the mode continues
            mm = _CDATA_CLOSE[cdata].search(html, pos)
            if not mm:
                break  # unterminated: EOF ends the element (text is pruned)
            em = _ENDTAG.match(html, mm.start())
            if em and em.group(1).lower() == cdata:
                end(cdata)
                cdata = None
                pos = em.end()
            else:
                gt = html.find(">", mm.start() + 1)
                if gt < 0:
                    break
                pos = gt + 1
            continue
        lt = html.find("<", pos)
        if lt < 0:
            data(html[pos:])
            break
        if lt > pos:
            data(html[pos:lt])
        pos = lt
        c = html[lt + 1 : lt + 2]
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            m = _SIMPLE_START.match(html, lt)
            if m and not (
                m.group(3)
                and m.group(2)
                and m.group(2)[-1] not in "\"' \t\n\r\f"
                # a trailing '/' right after an unquoted value belongs to the
                # value (html.parser attr semantics) — tolerant path decides
            ):
                name = m.group(1).lower()
                selfclose = bool(m.group(3))
                pos = m.end()
            else:
                pos, name, selfclose, chunk, chunk_raw = _parse_start(html, lt)
                if chunk is not None:
                    data(chunk, raw=chunk_raw)
                    continue
            if name is not None:
                start(name)
                if selfclose:
                    end(name)  # <tag/> = start+end (startendtag parity)
                elif name in _CDATA_ELEMS:
                    cdata = name
        elif c == "/":
            m = _SIMPLE_END.match(html, lt)
            if m:
                end(m.group(1).lower())
                pos = m.end()
                continue
            pos, ename, chunk = _parse_end(html, lt)
            if chunk is not None:
                data(chunk)
            elif ename is not None:
                end(ename)
        elif c == "!":
            pos, chunk = _parse_decl(html, lt)
            if chunk is not None:
                data(chunk)
        elif c == "?":
            gt = html.find(">", lt + 2)  # processing instruction: dropped
            if gt >= 0:
                pos = gt + 1
            else:
                pos, chunk = _fallback(html, lt)
                data(chunk)
        else:
            data("<", raw=True)  # lone '<' before a non-tag char is literal
            pos = lt + 1
    while stack:  # EOF flush: still-open blocks emit, not discarded
        emit_top()
    return blocks


def walk_html(raw_spans: list[dict]) -> list[dict]:
    out: list[dict] = []
    for sp in raw_spans:
        for block in extract_main(sp["text"] or ""):
            out.append({"kind": "html_text", "text": block, "media_ref": ""})
    return out
