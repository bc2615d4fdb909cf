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


def _render(df: pd.DataFrame, lens, hdr) -> str:
    """Our renderer for all-string frames, byte-equal to
    df.to_string(index=False): cells right-aligned to
    max(header, widest cell in slice), single-space column join, newline
    row join.  Only used after _formula_check validated it byte-for-byte
    on a sample of this exact frame (including its widest cell)."""
    import numpy as np

    if df.shape[0] == 0:
        return df.iloc[0:0].to_string(index=False)  # "Empty DataFrame..." repr
    widths = np.maximum(hdr, lens.max(axis=0))
    cols = df.columns.tolist()
    out_lines = [" ".join(str(c).rjust(int(w)) for c, w in zip(cols, widths))]
    arrs = [df[c].to_numpy() for c in cols]
    ws = [int(w) for w in widths]
    for r in range(df.shape[0]):
        out_lines.append(" ".join(a[r].rjust(w) for a, w in zip(arrs, ws)))
    return "\n".join(out_lines)


def _as_string_frame(df: pd.DataFrame) -> pd.DataFrame | None:
    """Project df to the all-string frame whose cells are EXACTLY what
    to_string(index=False) would print: pandas' own column formatter
    (format_array, leading_space=False — the same call
    DataFrameFormatter._get_strcols_without_index makes) applied once per
    column.  Validation against real to_string happens in _formula_check, so
    a pandas-version drift here degrades to the slow path, never to wrong
    bytes.

    ONLY slice-stable dtypes may take this path: pandas formats FLOAT columns
    per printed frame (a sub-frame holding only 1.5-style values prints
    '1.5' where the full frame printed '1.50'), so a full-frame projection
    is NOT what to_string of a chunk slice would emit — and the sampled
    validation in _formula_check cannot catch a divergence that only appears
    in a later chunk.  object/int/bool cells format per-cell, independent of
    the slice; everything else (float, datetime, category, ...) returns None
    and the caller falls back to real per-slice to_string probing."""
    if all(dt == object for dt in df.dtypes):
        return df
    if not all(
        dt == object
        or pd.api.types.is_integer_dtype(dt)
        or pd.api.types.is_bool_dtype(dt)
        for dt in df.dtypes
    ):
        return None
    try:
        from pandas.io.formats.format import format_array

        cols = {}
        for i, c in enumerate(df.columns):
            cols[i] = format_array(df.iloc[:, i]._values, None, leading_space=False)
        out = pd.DataFrame(cols)
        out.columns = df.columns
        return out
    except Exception:
        return None


def _formula_check(df: pd.DataFrame):
    """Enable the closed-form length + fast renderer.

    All-string frames use their cells directly; numeric/mixed frames are
    first projected through pandas' own column formatter (_as_string_frame).
    Validation: render a sample sub-frame (first 64 rows + the row holding
    the globally widest cell, so any pandas truncation/justify surprise is
    in-sample) with _render and require BYTE equality with the real
    to_string OF THE ORIGINAL frame.  Any mismatch -> None -> callers fall
    back to real to_string probing, so correctness never depends on the
    formula.

    Returns (string frame, cell-length matrix, header lengths) or None.
    """
    import numpy as np

    if df.shape[0] == 0:
        return None
    sdf = _as_string_frame(df)
    if sdf is None:
        return None
    try:
        lens = sdf.map(len).to_numpy(dtype="int64")
    except TypeError:
        return None
    hdr = np.array([len(str(c)) for c in df.columns], dtype="int64")
    widest_row = int(lens.max(axis=1).argmax())
    check_rows = sorted(set(range(min(64, df.shape[0]))) | {widest_row})
    if _render(sdf.iloc[check_rows], lens[check_rows], hdr) != df.iloc[
        check_rows
    ].to_string(index=False):
        return None
    return sdf, lens, hdr


def chunk_frame(df: pd.DataFrame, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Semantics-identical fast chunker.

    len(df.iloc[a:i+1].to_string(index=False)) is monotone nondecreasing in i
    (more lines, column widths only grow), so the reference inner loop's
    "largest i with len < chunk_size" can be located without formatting every
    prefix: via a validated closed-form length (all-string frames, the
    common case) or galloping + binary search with O(log rows) to_string
    probes.  Emitted text always comes from the same to_string call, so
    output is byte-equal to chunk_frame_reference (asserted in tests).

    The reference quirk where the FIRST probe already overflowing leaves
    _p_row_num at 0 (and the loop would regress) is reproduced/guarded
    identically.
    """
    num_rows = df.shape[0]
    _row = 0
    chunks: list[str] = []

    # attempt the formula path for EVERY non-empty frame: validation costs
    # one to_string of min(64, rows) rows — the same as a single probe — and
    # then every boundary is closed-form and every emit is _render (no
    # further to_string).  The old >32 gate made small sheets (the common
    # case) pay probe+emit to_string each: measured 1.9x slower per sheet.
    formula = _formula_check(df) if num_rows > 0 else None
    if formula is not None:
        import numpy as np

        sdf, lens, hdr = formula

        def boundary(a: int) -> int:
            """largest i in [a, n) with formula_len(a..i) < chunk_size, else -1"""
            w = np.maximum.accumulate(lens[a:], axis=0)  # running col widths
            sw = np.maximum(w, hdr).sum(axis=1)
            ll = np.arange(2, num_rows - a + 2, dtype="int64")  # lines incl header
            total = ll * (sw + lens.shape[1] - 1) + ll - 1
            idx = int(np.searchsorted(total, chunk_size))  # first >= chunk_size
            return a + idx - 1 if idx > 0 else -1

        while _row < num_rows:
            b = boundary(_row)
            _p_row_num = b if b >= 0 else 0
            if _p_row_num + 1 <= _row and _row > 0:
                raise ValueError(
                    f"row {_row} alone exceeds chunk_size={chunk_size}; "
                    "reference semantics would loop forever"
                )
            chunks.append(
                _render(sdf.iloc[_row:_p_row_num], lens[_row:_p_row_num], hdr)
            )
            _row = _p_row_num + 1
        return chunks

    def fits(i: int) -> bool:  # len(to_string(rows _row..i)) < chunk_size
        return len(df.iloc[_row : i + 1].to_string(index=False)) < chunk_size

    while _row < num_rows:
        if fits(num_rows - 1):
            # common case: the whole remainder fits -> one probe total
            _p_row_num = num_rows - 1
        elif not fits(_row):
            _p_row_num = 0  # reference: inner loop breaks on first probe
        else:
            lo = _row  # known fitting
            step = 1
            hi = None
            while hi is None:
                probe = lo + step
                if probe >= num_rows:
                    hi = num_rows - 1  # not fits (checked above)
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
