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


def search_with_previews(store: DataFrame, query: str, exact_match: bool = False) -> DataFrame:
    """The complete search flow (file_searcher.py:195-357): retrieval ->
    rollup -> F10 -> P7 -> W1/W2 previews (pandas kernel, F8 filename-tag
    strip first) -> F11 preview boost -> O1 top-200.

    Exact mode additionally requires a non-empty preview (file_searcher.py:346).
    """
    query__, _, terms = normalize_query_cached(query)
    if not terms and not exact_match:
        return store.sparkSession.createDataFrame([], _RESULT_SCHEMA)
    rows = (
        S._match_rows_and(store, terms) if exact_match else S._match_rows_or(store, terms)
    )
    if exact_match:
        rows = rows.filter(F.contains(F.col("text"), F.lit(query__)))
    n_files_df = rows.select("document_name").distinct().agg(F.count("*").alias("n_files"))
    rows = rows.crossJoin(F.broadcast(n_files_df))

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        name = pdf["document_name"].iloc[0]
        n_files = int(pdf["n_files"].iloc[0])
        count = len(pdf)
        # F10 (utils/util.py:165-192)
        avg_score = round(
            min(0.7 + 0.3 * (math.log(1 + count) / math.log(1 + n_files)), 0.9995), 6
        )
        if avg_score <= S.CUTOFF:
            return pd.DataFrame(columns=[f.name for f in _RESULT_SCHEMA.fields])
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
        if exact_match and not previews:
            return pd.DataFrame(columns=[f.name for f in _RESULT_SCHEMA.fields])
        return pd.DataFrame(
            {
                "document_name": [name],
                "match_count": [count],
                "relavence_score": [round(score * 100, 3)],
                "preview": [previews],
            }
        )

    return (
        rows.groupBy("document_name")
        .applyInPandas(per_file, schema=_RESULT_SCHEMA)
        .orderBy(F.desc("relavence_score"), "document_name")
        .limit(S.MAX_DOC_LIMIT)
    )


def normalize_query_cached(query: str):
    return S.normalize_query(query)
