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
         "&#bad;", "longer body text for density checks", "a&b", "x<y>z",
         # named-entity LONGEST-PREFIX matching without ';' (browsers and
         # html.unescape match '&notin' -> '¬in' via the '&not' prefix):
         "&notin", "&notin;", "&times", "&timesbar;", "&centerdot",
         "&curren", "&currency;", "&ampamp", "&gtgt", "&lt x",
         # charref edge values: NUL, surrogate range, max/overflow, C1 window
         "&#0;", "&#xD800;", "&#xDFFF;", "&#x10FFFF;", "&#x110000;",
         "&#x80;", "&#x9F;", "&#13;", "&#xA;",
         # CR/CRLF soup (parser buffer-boundary behavior)
         "a\r\nb", "a\rb", "\r", "\r\n"]
MISC = ["<!-- c -->", "<!-- <p>x</p> -->", "<!doctype html>", "<![if x]>",
        "<![endif]>", "<", ">", "</", "<>", "</ x>", "< p>", "&", ";", "<!",
        "<?pi x?>", "<!-->", "--!>", "/>",
        "<script>", "</script>", "</script >", "</scriptx>", "</scripT>",
        "<style>", "</style>", "<textarea>", "&amp", "&ampx", "&#99999999;",
        "&#x;", "&#;", "&Amp;", "<![CDATA[x]]>", "<![cdata[x]]>",
        "<!--", "-->", "<!---->", "<!--->", "<a href='", "'>", '">',
        "<p a='unterminated>", "<p a=\"x", "=", "<!x>", "<?", "?>",
        "<p\x00q>", "<p/ >", "<//p>", "<p!>", "&#X41;", "&gt", "&LT;",
        # rawtext near-miss close tags + markup hidden inside rawtext
        "<script><!--", "--></script>", "<script>a</scr", "ipt>b</script>",
        "<style>/*</p>*/</style>", "<script></style></script>",
        "<script>'</script x>'</script>", "<title>", "</title>",
        "<textarea></textarea>", "</ script>", "</scr ipt>",
        # spaced '=' and duplicate attributes (parse_starttag corners)
        "<p a = 'x'>", "<p a='1' a=\"2\">", "<p =x>", "<p a=>", "<p a ==b>",
        # doctype / marked-section variants
        "<!DOCTYPE html PUBLIC '-//W3C//DTD'>", "<![INCLUDE[x]]>",
        "<!ENTITY x 'y'>", "<?xml version='1.0'?>"]
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


# markup tokens interleaved with UNRESTRICTED unicode noise (astral planes,
# combining marks, control chars — everything st.text generates), so the
# tokenizer's state machine is stressed with arbitrary text between
# constructs; 25k interleaved + 20k raw-unicode seeded examples passed
# offline before freezing at a CI budget
_piece = st.one_of(
    st.lists(token, min_size=1, max_size=6).map("".join),
    st.text(max_size=30),
)
markup_raw = st.lists(_piece, min_size=0, max_size=12).map("".join)


@settings(max_examples=300, deadline=None)
@given(html=markup_raw)
def test_html_kernel_matches_serial_reference_on_raw_unicode(html):
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
              "Unnamed: 0,Unnamed: 1\n1,2\n3,4",
              # unbalanced quotes / dup headers / trailing commas / wide rows
              '"a\nb', 'a,a\n1,2', 'a,b,\n1,2,\n', '"x""y",2\np,q',
              'a;b\n1;2', " \t \nx,y\n1,2", "a,b\r\n1,2\r\n", "a,b\r1,2",
              ",,,\n,,,\n", '"unterminated,b\n1,2\n3,4']

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


# ---- txt + pdf walker fuzz (30k/40k seeded cases clean offline) ----

TXT_FRAGS = ["Hello world", "a", "", " ", "One. Two. Three", "x?! y",
             "no end", "Dr. Smith went", "a.b", "...", "word " * 50, "tail.",
             "A!B?C.", "line\nbreak", "\t", "é ü ß", "end. ", ". lead",
             "a  b", "U.S. code"]


@settings(max_examples=200, deadline=None)
@given(
    frags=st.lists(st.sampled_from(TXT_FRAGS), min_size=0, max_size=10),
    cs=st.sampled_from([5, 12, 25, 60, 200, 102400]),
)
def test_txt_chunker_matches_serial_reference(frags, cs):
    from qs_spark.kernels.txt_kernel import walk_txt

    spans = [{"kind": "txt", "text": "".join(frags), "media_ref": "", "offset": 0}]

    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:  # noqa: BLE001
            return ("err", f"{type(e).__name__}: {e}")

    assert run(lambda: walk_txt(spans, chunk_size=cs)) == run(
        lambda: sr.ref_walk_txt(spans, cs)
    )


pdf_span = st.fixed_dictionaries({
    "kind": st.sampled_from(["pdf_text", "pdf_table", "pdf_figure",
                             "ocr_region", "docx_para", "docx_table"]),
    "text": st.sampled_from([None, "", " ", "page text here", "low",
                             "x" * 40, "multi\nline", "é"]),
    "media_ref": st.sampled_from(["", "m0", "m1", "s3://b/f.png"]),
    "offset": st.integers(min_value=0, max_value=7),
})


@settings(max_examples=200, deadline=None)
@given(spans=st.lists(pdf_span, min_size=0, max_size=8),
       plan=st.sampled_from(["basic", "basic +"]))
def test_pdf_walker_matches_serial_reference(spans, plan):
    from qs_spark.kernels.pdf_kernel import walk_pages

    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:  # noqa: BLE001
            return ("err", f"{type(e).__name__}: {e}")

    assert run(lambda: walk_pages(spans, plan=plan)) == run(
        lambda: sr.ref_walk_pages(spans, plan)
    )


# ---- sheet text fuzz: the parse/format path (text -> frame -> chunks) ----
#
# Caught two more real divergences (r05):
#   1. pandas' C parser skips WHITESPACE-ONLY lines as blank (' \nx' parses
#      with header 'x'); the pure path took ' ' as the header line.
#   2. to_string column headers go through Index._format_with_header:
#      escape + one leading space + trim_front (strip leading ASCII spaces
#      while ALL labels are non-empty and all start with ' ') — so ' a '
#      prints as 'a ', [' a', 'b'] keeps ' a', and '\xa0a' keeps its
#      non-breaking space.  The kernel's closed-form width model used
#      verbatim labels.
# 80k seeded cases pass with both fixes.

SHEET_CELLS = ["a", "bb", "hello", "x_1", "Name Two", "", " ", "  ", "\t",
               "1", "007", "2.5", "1.50", "-3", "1e5", "NaN", "nan", "True",
               "false", "none", "inf", "9223372036854775807", "café",
               "a b c", "_u", "0.1000", "1.", ".5", "Unnamed: 0", "-0",
               "1e-3", "NA", "null", "Infinity", "1_000", "+4", "a ", " a",
               " a ", "a\x0bb", "\xa0a", "  x", "\tq",
               # dtype-inference flippers for the closed-form to_string model:
               # int64 overflow -> object/float, inf literals, float repr
               # boundaries, full-width digits, date-ish strings
               "12345678901234567890123", "1e309", "-1e309", "-.5", "5.",
               "0.30000000000000004", "9007199254740993", "１２３",
               "2020-01-01", "1/2/2021", "0x1F", "00", "-0.0", "1E5",
               "3.141592653589793238", "TRUE", "False ", "N/A", "<NA>",
               "0.1", "0.10", "1e16", "1e15", "-9223372036854775808",
               "9223372036854775808", "nan ", " inf", "+inf", "-inf"]

sheet_line = st.lists(
    st.sampled_from(SHEET_CELLS), min_size=1, max_size=5
).map(",".join)
sheet_text = st.lists(sheet_line, min_size=1, max_size=7).map("\n".join)


@settings(max_examples=300, deadline=None)
@given(
    text=sheet_text,
    excel=st.booleans(),
    cs=st.sampled_from([15, 30, 60, 120, 400, 102400]),
)
def test_sheet_walker_matches_serial_reference_on_fuzzed_csv(text, excel, cs):
    from qs_spark.kernels.sheet_kernel import walk_sheets

    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:  # noqa: BLE001 — exception text is contract
            return ("err", f"{type(e).__name__}: {e}")

    spans = [{"kind": "x", "text": text, "media_ref": "", "offset": 0}]
    a = run(lambda: walk_sheets(spans, excel, chunk_size=cs))
    b = run(lambda: sr.ref_walk_sheets(spans, excel, cs))
    assert a == b


# raw-text sheet fuzz: arbitrary (csv-biased) text straight into both
# walkers, covering loader-level behavior the cell-grammar strategy can't
# reach (quote tokenization, BOM/NUL mid-stream, \r line splits, unicode
# headers); slow (read_csv per example), so the CI budget is small — 6k
# seeded examples passed offline in one verified run, plus a longer
# background run cut off without a counterexample
_csvish = st.text(
    alphabet=st.sampled_from(list("abc01,.\n\" 'U:named\t\r\xa0é-+eE_")),
    max_size=80,
)


@settings(max_examples=120, deadline=None)
@given(
    text=st.one_of(_csvish, st.text(max_size=80)),
    excel=st.booleans(),
    cs=st.sampled_from([15, 60, 102400]),
)
def test_sheet_walker_matches_serial_reference_on_raw_text(text, excel, cs):
    from qs_spark.kernels.sheet_kernel import walk_sheets

    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:  # noqa: BLE001 — exception text is contract
            return ("err", f"{type(e).__name__}: {e}")

    spans = [{"kind": "x", "text": text, "media_ref": "", "offset": 0}]
    a = run(lambda: walk_sheets(spans, excel, chunk_size=cs))
    b = run(lambda: sr.ref_walk_sheets(spans, excel, cs))
    assert a == b, (text, excel, cs, a, b)


def test_sheet_header_format_regressions():
    """The exact header-model divergences the sheet fuzzer caught."""
    from qs_spark.kernels.sheet_kernel import walk_sheets

    cases = [
        " \nx_1\nx_1",          # whitespace-only line is blank to pandas
        " a, \nx,y\nq,w",       # trim_front strips shared leading spaces
        " a,b\nx,y\nq,w",       # ...but not when another label lacks one
        "\xa0a\nbb\ncc",        # non-breaking space is NOT trimmed
        "a\tb\nxxxx\nyyyy",     # header tab rendered escaped ('a\\tb')
        " a \nxxx\nyyy",        # leading stripped, trailing kept ('a ')
        # EVERY retry read parses to the END of the text: a wider line
        # below raggedness-errors read 0 ("Expected 1 fields in line 3,
        # saw 2") before the lazy peel would accept header 'a,bb' at
        # read 2 — the uniform-comma-matrix gate must route to pandas
        "Unnamed: 0\nUnnamed: 0\na,bb",
        # narrowing lines pad NaN instead (no error): earlier reads
        # succeed all-Unnamed, the final header is accepted
        "Unnamed: 0,Unnamed: 1,Unnamed: 2\na,b\nc,d",
    ]
    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:  # noqa: BLE001 — exception text is contract
            return ("err", f"{type(e).__name__}: {e}")

    for text in cases:
        for excel in (True, False):
            for cs in (15, 60, 102400):
                spans = [{"kind": "x", "text": text, "media_ref": "", "offset": 0}]
                a = run(lambda: walk_sheets(spans, excel, chunk_size=cs))
                b = run(lambda: sr.ref_walk_sheets(spans, excel, cs))
                assert a == b, (text, excel, cs, a, b)


def test_nul_and_bom_sheet_regressions():
    """The exact divergences the fuzzer caught, pinned deterministically."""
    for text in ("\x00\x01", "\x00a,b\nx,y", "a,\x00\nx,y", "﻿a,b\nx,y"):
        for kind in ("csv_rows", "sheet_rows"):
            spans = [{"kind": kind, "text": text, "media_ref": "", "offset": 0}]
            assert (
                safe_extract_doc(spans, None)
                == sr.ref_safe_extract_doc(spans, None)
            ), (kind, text)
