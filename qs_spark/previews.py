"""Preview-snippet windowing (W1/W2/W3) + full search with previews.

Char-exact re-implementation of the reference's preview pipeline
(quanta-search-api/core/file_preview.py:24-83,172-203):
  W1 find_occurrences: every start index of the query substring (overlapping,
     scan resumes at i+1), bounded by `limit`
  W2 +-N-word window: whitespace-position index; bisect_right(start) /
     bisect_left(end); slice text[ws[before-N] : ws[after+N-1]].strip();
     snippets containing "file name :" are dropped
  W3 per-page grouping: {page_no, previews: [...]}

These run as a pandas kernel inside applyInPandas (per-file groups) — the
semantics are index arithmetic on raw character positions, which is exactly
the "keep in a pandas kernel for exactness" case (SURVEY.md §2.8).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from qs_spark import search as S


def find_occurrences(text: str, query: str, limit: int) -> list[int]:
    """W1 (file_preview.py:24-43)."""
    positions: list[int] = []
    i = text.find(query)
    while i != -1 and (limit < 0 or len(positions) < limit):
        positions.append(i)
        i = text.find(query, i + 1)
    return positions


def process_single_text(text: str, query: str, preview_length: int, limit: int) -> list[str]:
    """W2 (file_preview.py:45-83)."""
    whitespace_positions = [i for i, c in enumerate(text) if c.isspace()]
    results: list[str] = []
    query_len = len(query)
    for start_pos in find_occurrences(text, query, limit):
        end_pos = start_pos + query_len
        before_index = bisect_right(whitespace_positions, start_pos)
        if before_index >= preview_length:
            w_before = whitespace_positions[before_index - preview_length]
        else:
            w_before = 0
        after_index = bisect_left(whitespace_positions, end_pos)
        if len(whitespace_positions) - after_index >= preview_length:
            w_after = whitespace_positions[after_index + preview_length - 1]
        else:
            w_after = len(text)
        preview = text[w_before:w_after].strip()
        if "file name :" not in preview:
            results.append(preview)
    return results


def process_texts(texts: list[str], query: str, preview_length: int, limit: int) -> list[str]:
    out: list[str] = []
    for t in texts:
        out.extend(process_single_text(t, query, preview_length, limit))
    return out


_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("document_name", T.StringType()),
        T.StructField("match_count", T.LongType()),
        T.StructField("relavence_score", T.DoubleType()),
        T.StructField("preview", T.ArrayType(T.StringType())),
    ]
)


def search_with_previews(
    store: DataFrame,
    query: str,
    exact_match: bool = False,
    state: str | None = None,
    uid: str | None = None,
    realm: dict[str, str] | None = None,
    postings_path: str | None = None,
) -> DataFrame:
    """The complete search flow (file_searcher.py:195-357): retrieval ->
    rollup -> F10 -> P7 -> W1/W2 previews (pandas kernel, F8 filename-tag
    strip first) -> F11 preview boost -> O1 top-200.  Tenant filters
    (P4: state/uid/realm) apply before retrieval, mirroring
    file_searcher.py:236,258,265.

    Exact mode additionally requires a non-empty preview (file_searcher.py:346).
    """
    query__ = query.strip().lower()
    store = S.filter_tenant(store, state, uid, realm)
    rows = S.match_query_rows(store, query, exact_match, postings_path)
    if rows is None:
        return store.sparkSession.createDataFrame([], _RESULT_SCHEMA)

    # Score + threshold JVM-side FIRST (F10, P7; shared with search_rank via
    # score_per_file): the pandas preview kernel then only runs over rows of
    # the surviving files — the reference also previews only above-threshold
    # files (file_searcher.py:327-341).
    #
    # NO broadcast hint on survivors: in OR mode P7 never filters (BASE_SCORE
    # 0.7 > cutoff 0.655, reference constants load_envs.py:33-40), so
    # `survivors` is EVERY matching file — millions of rows at corpus scale,
    # and a forced broadcast would OOM the driver.  Unhinted, AQE broadcasts
    # it when it is actually small and shuffle-joins on document_name when it
    # is not; either way the preview kernel's groupBy reuses the same
    # document_name partitioning, so the join adds no extra exchange.
    survivors = S.score_per_file(rows)
    surviving_rows = rows.select("document_name", "document_id", "page_no", "text").join(
        survivors, "document_name"
    )

    def per_file_previews(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["document_name"].iloc[0]
        avg_score = float(pdf["avg_score"].iloc[0])
        pdf = pdf.sort_values(["document_id", "page_no"], kind="mergesort")
        texts = [
            t.replace(f"file name : {name}", "") for t in pdf["text"]
        ]  # F8 (file_searcher.py:334)
        previews = process_texts(texts, query__, S.PREVIEW_LENGTH, S.MAX_PREVIEW_COUNT)
        # F11 (utils/util.py:195-221)
        score = avg_score
        if score < S.BASE_PREVIEW_SCORE and previews:
            score = S.BASE_PREVIEW_SCORE
        score = min(
            score + (S.MAX_SCORE - score) * min(len(previews) / S.PREVIEW_DIVISOR, 1),
            S.MAX_SCORE,
        )
        if exact_match and not previews:  # file_searcher.py:346
            return pd.DataFrame(columns=[f.name for f in _RESULT_SCHEMA.fields])
        return pd.DataFrame(
            {
                "document_name": [name],
                "match_count": [int(pdf["match_count"].iloc[0])],
                "relavence_score": [round(score * 100, 3)],
                "preview": [previews],
            }
        )

    return (
        surviving_rows.groupBy("document_name")
        .applyInPandas(per_file_previews, schema=_RESULT_SCHEMA)
        .orderBy(F.desc("relavence_score"), "document_name")
        .limit(S.MAX_DOC_LIMIT)
    )


_PAGE_PREVIEW_SCHEMA = T.StructType(
    [
        T.StructField("document_id", T.StringType()),
        T.StructField("document_name", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("previews", T.ArrayType(T.StringType())),
    ]
)


def preview_docs(
    store: DataFrame,
    query: str,
    doc_ids: list[str],
    state: str = "Publish",
    uid: str | None = None,
    realm: dict[str, str] | None = None,
) -> DataFrame:
    """The /user/search_preview flow (W3 + P9 + F8 + O3):
    fetch rows for the requested docs (+state filter, P4), strip the
    filename tag (F8), window previews per page (W1/W2), emit
    {page_no, previews} sorted by page_no (O3).  A5 preview_count =
    sum(size(previews)) is one agg over the result.

    Reference: quanta-search-api/core/file_preview.py:146-203 + router
    api.py:928-994.  The preview flow lowercases the query WITHOUT stripping
    (file_searcher.py:391: ev.query.lower()) and strips the filename tag with
    the LOWERCASED file name (file_preview.py:168: file_name.lower()).
    """
    query__ = query.lower()
    rows = S.filter_tenant(store, state=state, uid=uid, realm=realm).filter(
        F.col("document_id").isin(doc_ids)
    ).select("document_id", "document_name", "page_no", "text")

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("document_id", "document_name", "page_no", "previews")}
        for _, r in pdf.iterrows():
            text = r["text"].replace(f"file name : {r['document_name'].lower()}", "")  # F8
            previews = process_single_text(text, query__, S.PREVIEW_LENGTH, -1)
            if previews:
                out["document_id"].append(r["document_id"])
                out["document_name"].append(r["document_name"])
                out["page_no"].append(int(r["page_no"]))
                out["previews"].append(previews)
        if not out["document_id"]:
            # typed-empty frame: a bare {} gives float64 columns, which Arrow
            # refuses to cast to list<string>
            return pd.DataFrame({k: pd.Series(dtype=object) for k in out})
        return pd.DataFrame(out)

    return (
        rows.groupBy("document_id")
        .applyInPandas(per_page, schema=_PAGE_PREVIEW_SCHEMA)
        .orderBy("document_id", "page_no")  # O3 (file_searcher.py:397-399)
    )


def preview_count(previews_df: DataFrame):
    """A5 (router api.py:977): total preview snippets."""
    return previews_df.agg(F.sum(F.size("previews")).alias("preview_count"))
