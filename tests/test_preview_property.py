"""Property test for the W1/W2 preview windowing: the bisect-based
implementation (char-exact port of the reference,
quanta-search-api/core/file_preview.py:24-83) must agree with an
INDEPENDENT naive reference that walks characters instead of indexing
whitespace positions."""

from hypothesis import given, settings, strategies as st

from qs_spark.previews import process_single_text

PREVIEW_LENGTH = 3


def naive_previews(text: str, query: str, preview_length: int, limit: int) -> list[str]:
    # W1: overlapping occurrences, resume at i+1, bounded by limit
    occs, i = [], text.find(query)
    while i != -1 and (limit < 0 or len(occs) < limit):
        occs.append(i)
        i = text.find(query, i + 1)
    out = []
    for start in occs:
        end = start + len(query)
        # walk BACKWARD from `start` counting whitespace chars at positions
        # <= start; the preview_length-th one is the left boundary
        seen, w_before = 0, 0
        for p in range(start, -1, -1):
            if text[p].isspace():
                seen += 1
                if seen == preview_length:
                    w_before = p
                    break
        # walk FORWARD from `end` counting whitespace at positions >= end
        seen, w_after = 0, len(text)
        for p in range(end, len(text)):
            if text[p].isspace():
                seen += 1
                if seen == preview_length:
                    w_after = p
                    break
        preview = text[w_before:w_after].strip()
        if "file name :" not in preview:
            out.append(preview)
    return out


_alpha = st.sampled_from(list("ab x\t\nq "))  # whitespace-heavy alphabet


@settings(max_examples=300, deadline=None)
@given(
    text=st.text(alphabet=_alpha, min_size=0, max_size=120),
    query=st.text(alphabet=st.sampled_from(list("ab x")), min_size=1, max_size=6),
    limit=st.sampled_from([-1, 1, 3]),
)
def test_preview_windows_match_naive_reference(text, query, limit):
    assert process_single_text(text, query, PREVIEW_LENGTH, limit) == naive_previews(
        text, query, PREVIEW_LENGTH, limit
    )


# wider regime: unicode whitespace (\xa0 is str.isspace()), CR, varying
# preview_length and limit=0 — 40k seeded examples passed offline before
# this was frozen at a CI-sized budget
@settings(max_examples=120, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab x\t\nq \r\xa0 é.")), max_size=300
    ),
    query=st.text(alphabet=st.sampled_from(list("ab x.")), min_size=1, max_size=8),
    plen=st.sampled_from([1, 2, 3, 7]),
    limit=st.sampled_from([-1, 0, 1, 3, 10]),
)
def test_preview_windows_match_naive_reference_wide(text, query, plen, limit):
    assert process_single_text(text, query, plen, limit) == naive_previews(
        text, query, plen, limit
    )


def test_preview_known_edges():
    # occurrence at string start / end, fewer than N words each side
    assert process_single_text("abc", "abc", 3, -1) == ["abc"]
    assert process_single_text("x abc y", "abc", 3, -1) == ["x abc y"]
    # overlapping occurrences both found
    assert process_single_text("aaa", "aa", 3, -1) == ["aaa", "aaa"]
    # the filename-tag filter drops a window that CONTAINS the tag (here the
    # ±3-word window spans the whole string); a window that only clips the
    # tag's tail survives
    assert process_single_text("a file name : b", "name", 3, -1) == []
    assert process_single_text("file name : f abc", "abc", 3, -1) == [": f abc"]
