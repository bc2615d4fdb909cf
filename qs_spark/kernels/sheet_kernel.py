"""Excel / CSV sheet walker + greedy chunker.

Reproduces the reference loaders' observable behavior exactly
(ameya_parser_excel whl!.../excel/extractors/simple_reader_extractor.py:16-142,
 ameya_parser_csv   whl!.../csv/extractors/simple_reader_extractor.py:14-72):

  1. read sheet -> pandas DataFrame (header = first row)
  2. "Unnamed" retry loop: while ALL column names start with "Unnamed",
     re-read with skiprows=count+1, incrementing count each pass
     (excel variant additionally bails if the re-read is empty and skips an
     empty sheet; the csv variant has no empty checks)
  3. greedy chunker over rows, budget chunk_size=102400 chars of
     df.to_string(index=False):

        while _row < num_rows:
            _p_row_num = 0
            for i in range(_row, num_rows):
                if len(to_string(rows _row..i)) < chunk_size: _p_row_num = i
                else: break
            emit to_string(rows _row.._p_row_num-1)      # EXCLUSIVE end:
            _row = _p_row_num + 1                        # row _p_row_num is
                                                         # silently dropped

     Two load-bearing quirks (SURVEY.md §2.12):
       - the last fitting row of every chunk window is never emitted
         (iloc[_row:_p_row_num] is end-exclusive);
       - a 1-row sheet yields to_string of an EMPTY frame
         ("Empty DataFrame\\nColumns: [...]\\nIndex: []") — pandas' repr for
         an empty selection — which is truthy and therefore stored.

Our input raw span carries the sheet serialized as CSV text (one span per
sheet, kind 'sheet_rows' / 'csv_rows'); parsing uses pandas.read_csv exactly
like the reference CSV loader, and the excel path shares it (the reference's
read_excel lands in the same DataFrame shape).  Byte-equality of to_string
output holds because oracle and pipeline run the same in-process pandas.
"""

from __future__ import annotations

import io

import pandas as pd

CHUNK_SIZE = 102400  # ref: simple_reader_extractor.py:18 (excel/csv/txt)


def _read_with_unnamed_retry(sheet_csv: str, excel_mode: bool) -> pd.DataFrame | None:
    """Parse + reproduce the all-Unnamed skiprows retry loop."""
    try:
        df = pd.read_csv(io.StringIO(sheet_csv))
    except pd.errors.EmptyDataError:
        return None
    count = 0
    while True:
        if all(str(col).startswith("Unnamed") for col in df.columns):
            try:
                df = pd.read_csv(io.StringIO(sheet_csv), skiprows=count + 1)
            except pd.errors.EmptyDataError:
                if excel_mode:
                    return None  # ref excel: `if df.empty: break` -> skip sheet
                raise  # ref csv has no guard: the error propagates, file fails
            if excel_mode and df.empty:
                return None
            count += 1
        else:
            break
    if excel_mode and df.empty:
        return None  # ref excel `if df.empty: continue`
    return df


def chunk_frame_reference(df: pd.DataFrame, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """The reference's greedy chunker, byte-for-byte (incl. the dropped row).
    O(rows^2) to_string calls — kept as the oracle; the pipeline uses the
    equivalent O(rows log rows) chunk_frame below."""
    num_rows = df.shape[0]
    _row = 0
    chunks: list[str] = []
    while _row < num_rows:
        _p_row_num = 0
        for i in range(_row, num_rows):
            text = df.iloc[_row : i + 1].to_string(index=False)
            if len(text) < chunk_size:
                _p_row_num = i
            else:
                break
        if _p_row_num + 1 <= _row and _row > 0:
            raise ValueError(
                f"row {_row} alone exceeds chunk_size={chunk_size}; "
                "reference semantics would loop forever"
            )
        chunks.append(df.iloc[_row:_p_row_num].to_string(index=False))
        _row = _p_row_num + 1
    return chunks


def chunk_frame(df: pd.DataFrame, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Semantics-identical fast chunker.

    len(df.iloc[a:i+1].to_string(index=False)) is monotone nondecreasing in i
    (more lines, column widths only grow), so the reference inner loop's
    "largest i with len < chunk_size" is found by galloping + binary search —
    O(log rows) to_string probes per chunk instead of one per row.  Emitted
    text still comes from the same to_string call, so output is byte-equal to
    chunk_frame_reference (asserted in tests over corpus + fixtures).

    The reference quirk where the FIRST probe already overflowing leaves
    _p_row_num at 0 (and the loop would regress) is reproduced/guarded
    identically.
    """
    num_rows = df.shape[0]
    _row = 0
    chunks: list[str] = []

    def fits(i: int) -> bool:  # len(to_string(rows _row..i)) < chunk_size
        return len(df.iloc[_row : i + 1].to_string(index=False)) < chunk_size

    while _row < num_rows:
        if not fits(_row):
            _p_row_num = 0  # reference: inner loop breaks on first probe
        else:
            lo = _row  # known fitting
            step = 1
            hi = None
            while hi is None:
                probe = lo + step
                if probe >= num_rows:
                    if fits(num_rows - 1):
                        lo = num_rows - 1
                        break
                    hi = num_rows - 1
                elif fits(probe):
                    lo = probe
                    step *= 2
                else:
                    hi = probe
            if hi is not None:
                while hi - lo > 1:  # invariant: fits(lo), not fits(hi)
                    mid = (lo + hi) // 2
                    if fits(mid):
                        lo = mid
                    else:
                        hi = mid
            _p_row_num = lo
        if _p_row_num + 1 <= _row and _row > 0:
            raise ValueError(
                f"row {_row} alone exceeds chunk_size={chunk_size}; "
                "reference semantics would loop forever"
            )
        chunks.append(df.iloc[_row:_p_row_num].to_string(index=False))
        _row = _p_row_num + 1
    return chunks


def walk_sheets(
    raw_spans: list[dict], excel_mode: bool, chunk_size: int = CHUNK_SIZE
) -> list[dict]:
    """All sheets of one workbook (one raw span per sheet, in sheet order) ->
    concatenated chunk streams as {kind:'table_chunk', text, media_ref:''}.

    File-level gate (ref simple_directory_reader: `if not docs[0].text`):
    if the FIRST emitted chunk has falsy text the whole file is skipped; if no
    chunks at all were produced the reference raises (docs[0] IndexError ->
    extraction error) and the file contributes nothing.
    """
    chunks: list[str] = []
    for sp in raw_spans:
        df = _read_with_unnamed_retry(sp["text"] or "", excel_mode)
        if df is None:
            continue
        chunks.extend(chunk_frame(df, chunk_size))
    if not chunks or not chunks[0]:
        return []
    return [{"kind": "table_chunk", "text": c, "media_ref": ""} for c in chunks]
