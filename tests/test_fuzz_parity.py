"""Property-based kernel<->serial-reference parity (HTML markup fuzz +
whole-dispatch span-structure fuzz).

HTML: the pipeline's regex-tokenizer HTML kernel must
agree with the KERNEL-INDEPENDENT serial reference (tools/serial_reference,
driven by stdlib html.parser callbacks — a deliberately different
architecture) on ARBITRARY hostile markup, not just the curated list in
test_extract_golden.

The generator composes the constructs that historically diverged tokenizer
ports: custom-element names with '-', unquoted attribute values ending in
'/', rawtext (<script>/<style>) with near-miss end tags, unterminated
quotes, comments hiding markup, marked sections, entity edge cases
(bare '&amp', numeric overflow, hex), NUL/CR/non-ASCII soup, and plain
character noise.  Comparison runs through safe_extract_doc on BOTH sides so
inputs that make html.parser raise must produce the identical error span
from the kernel (same exception text -> same (kind='error') span).

80k seeded random cases passed before this was frozen; the in-suite budget
is smaller but derandomized-free so CI keeps exploring new inputs.
"""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import serial_reference as sr  # noqa: E402

from qs_spark.kernels.dispatch import safe_extract_doc  # noqa: E402

NAMES = ["p", "div", "a", "li", "td", "tr", "table", "span", "P-Card", "x-y",
         "script", "style", "header", "b", "i", "foo123", "nav", "aside"]
ATTRS = ["href", "data-x", "a", "class", "=junk", "a-b"]
VALS = ["v", "a>b", "http://x.com/", "a b", "'q'", '"q"', "", "a<b", "x/"]
TEXTS = ["hello world", "a & b", "&amp;", "&nbsp;", "5 < 6", "x > y", "&#65;",
         "&#x42;", "plain much longer text body here today", "tail", " ",
         "&#bad;", "longer body text for density checks", "a&b", "x<y>z"]
MISC = ["<!-- c -->", "<!-- <p>x</p> -->", "<!doctype html>", "<![if x]>",
        "<![endif]>", "<", ">", "</", "<>", "</ x>", "< p>", "&", ";", "<!",
        "<?pi x?>", "<!-->", "--!>", "/>",
        "<script>", "</script>", "</script >", "</scriptx>", "</scripT>",
        "<style>", "</style>", "<textarea>", "&amp", "&ampx", "&#99999999;",
        "&#x;", "&#;", "&Amp;", "<![CDATA[x]]>", "<![cdata[x]]>",
        "<!--", "-->", "<!---->", "<!--->", "<a href='", "'>", '">',
        "<p a='unterminated>", "<p a=\"x", "=", "<!x>", "<?", "?>",
        "<p\x00q>", "<p/ >", "<//p>", "<p!>", "&#X41;", "&gt", "&LT;"]
SOUP = "<>/&;=\"' abAB-.:_!x\n\t\r\x00\xa0İß€?[]"

_open = st.sampled_from(NAMES).map(lambda n: f"<{n}>")
_close = st.sampled_from(NAMES).map(lambda n: f"</{n}>")
_selfc = st.sampled_from(NAMES).map(lambda n: f"<{n}/>")
_attr = st.tuples(
    st.sampled_from(NAMES),
    st.sampled_from(ATTRS),
    st.sampled_from(VALS),
    st.sampled_from(['"', "'", ""]),
).map(lambda t: f"<{t[0]} {t[1]}={t[3]}{t[2]}{t[3]}>")
_soup = st.text(alphabet=SOUP, min_size=1, max_size=12)

token = st.one_of(
    _open, _close, _selfc, _attr,
    st.sampled_from(TEXTS), st.sampled_from(MISC), _soup,
)
markup = st.lists(token, min_size=0, max_size=40).map("".join)


@settings(max_examples=400, deadline=None)
@given(html=markup)
def test_html_kernel_matches_serial_reference_on_fuzzed_markup(html):
    spans = [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]
    assert safe_extract_doc(spans, None) == sr.ref_safe_extract_doc(spans, None)


# ---- dispatch-level fuzz: random span structures across ALL kernels ----
#
# This is the fuzzer that caught the NUL/BOM sheet divergence (r05): pandas'
# C parser truncates a header cell at '\x00' ('\x00a' -> 'Unnamed: 0' -> the
# retry loop -> csv-mode EmptyDataError fails the whole doc) and strips a
# leading U+FEFF BOM, while the pandas-free pure-sheet path modeled headers
# verbatim and silently skipped/chunked instead.  60k seeded cases pass with
# the pure-path NUL/BOM opt-out in place.

KINDS = ["html", "pdf_text", "pdf_table", "pdf_figure", "docx_para",
         "docx_table", "ocr_region", "sheet_rows", "csv_rows", "txt", "md",
         "unknown_kind", ""]
SPAN_TEXTS = [None, "", " ", "a,b\n1,2\n3,4", "one. two. three. four ends here.",
              "<p>hello world</p>", "col1,col2\nUnnamed: 0,x\n1,2",
              "a\tb\nc\td", "x" * 300, "line1\nline2\n\nline3", "a,b\n,\n,",
              "Header\n=====\ntext", "5 < 6 &amp; more", "\x00\x01",
              "İstanbul ß €", "a,b,c\n1,2\n3,4,5,6", '"q,uoted",2\n3,4',
              "﻿a,b\nx,y", "\x00a,b\nx,y", "a,\x00\nx,y",
              "Unnamed: 0,Unnamed: 1\n1,2\n3,4"]

span = st.fixed_dictionaries({
    "kind": st.sampled_from(KINDS),
    "text": st.sampled_from(SPAN_TEXTS),
    "media_ref": st.sampled_from(["", "m1", "s3://x/y.png"]),
    "offset": st.sampled_from([0, 1, 3, -1, 100]),
})
span_doc = st.lists(span, min_size=0, max_size=6)


@settings(max_examples=300, deadline=None)
@given(spans=span_doc)
def test_dispatch_matches_serial_reference_on_fuzzed_spans(spans):
    assert safe_extract_doc(spans, None) == sr.ref_safe_extract_doc(spans, None)


def test_nul_and_bom_sheet_regressions():
    """The exact divergences the fuzzer caught, pinned deterministically."""
    for text in ("\x00\x01", "\x00a,b\nx,y", "a,\x00\nx,y", "﻿a,b\nx,y"):
        for kind in ("csv_rows", "sheet_rows"):
            spans = [{"kind": kind, "text": text, "media_ref": "", "offset": 0}]
            assert (
                safe_extract_doc(spans, None)
                == sr.ref_safe_extract_doc(spans, None)
            ), (kind, text)
