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

Chunking strategy (fastest applicable path per frame; all byte-equal to the
reference, property-tested against chunk_frame_reference):

  0. PURE: sheets whose data region provably parses to an all-object frame
     of plain strings (every cell [A-Za-z_][A-Za-z0-9_ ]*, no coercible
     bool/NA/inf token) skip pandas ENTIRELY — str.split tokenization, the
     same closed-form width model, direct render.  pandas' per-call parser
     construction (~1.3 ms/sheet regardless of size) was 55% of the whole
     extraction kernel's CPU; this path is ~15x cheaper per small sheet.
     Anything outside the grammar falls through to 1-3 (see
     _pure_sheet_chunks for the full gate list); _pure_model_ok validates
     against read_csv + chunk_frame_reference once per process.
  1. FAST: frames whose every cell formats slice-stably and per-cell
     (str / None / NaN / int / bool — object, integer or bool dtypes).
     Cell strings are produced by our own model of pandas' object formatter
     (pprint_thing with \\t\\r\\n escapes, 'None'/'NaN' sentinels), lengths
     are closed-form, and chunks are rendered directly — ZERO pandas
     formatting calls per frame.  The model is validated byte-for-byte once
     per process against a pathological canary frame (_fast_model_ok);
     if pandas drifts, the whole path disables itself.
  2. FLOAT-HINT: frames that additionally carry float64 columns (pandas
     formats those per printed sub-frame — '1.5' vs '1.50' — so no frozen
     projection can be slice-stable).  A closed-form model of the
     fixed->trim-trailing-zeros float formatter PREDICTS each boundary; two
     real to_string length probes CONFIRM it (fits(pred) and not
     fits(pred+1)) and the emit is a real to_string — correctness never
     depends on the prediction, a wrong hint just degrades to galloping.
  3. PROBE: anything else (datetime, categorical, nullable, exotic objects):
     galloping + binary search over real to_string lengths, O(log rows)
     probes per chunk (len(to_string) is monotone in the row count).
"""

from __future__ import annotations

import io
import re

import numpy as np
import pandas as pd

CHUNK_SIZE = 102400  # ref: simple_reader_extractor.py:18 (excel/csv/txt)


_FAST_READ_OK: bool | None = None


def _fast_read_frame(text: str, skiprows: int | None = None) -> pd.DataFrame:
    """pd.read_csv minus the expensive generic DataFrame(dict) construction.

    The C parser's output (columns already mangled/deduped, one fresh numpy
    array per column) goes straight through DataFrame._from_arrays(...,
    verify_integrity=False) — the construction path pandas itself uses
    internally — skipping per-column sanitize/homogenize/copy that dominated
    the sheet kernel's profile (measured 0.79 -> 0.37 ms per small sheet,
    ~2x).  Values, dtypes, column labels and to_string output are identical;
    EmptyDataError propagates exactly as from read_csv (it is part of the
    reference contract).  Validated per process by _fast_read_ok on a
    hostile battery; any mismatch or unexpected error falls back to the real
    read_csv — and the kernel-independent x33 golden (serial_reference uses
    plain read_csv) would catch a silent divergence at the driver level."""
    kw: dict = {"iterator": True}
    if skiprows is not None:
        kw["skiprows"] = skiprows
    tfr = pd.read_csv(io.StringIO(text), **kw)
    try:
        index, columns, col_dict = tfr._engine.read(None)
    finally:
        tfr.close()
    n = len(next(iter(col_dict.values()))) if col_dict else 0
    idx = pd.RangeIndex(0, n) if index is None else index
    arrays = [col_dict[c] for c in columns]
    df = pd.DataFrame._from_arrays(arrays, columns, idx, verify_integrity=False)
    # per-frame invariant on the private-API construction (r04 ADVICE): the
    # frame must mirror the engine output exactly — shape, labels, and
    # per-column dtype (metadata-only, no data pass).  A violation raises,
    # which _read_csv turns into a fallback to the public loader; the
    # per-process battery alone could miss a non-raising construction drift
    # on an input class outside it.
    if df.shape != (n, len(columns)) or list(df.columns) != list(columns):
        raise RuntimeError("fast-frame construction mismatch (shape/columns)")
    for got_dt, arr in zip(df.dtypes, arrays):
        if got_dt != getattr(arr, "dtype", got_dt):
            raise RuntimeError("fast-frame construction mismatch (dtype)")
    return df


def _fast_read_ok() -> bool:
    """Once per process: byte-validate the fast loader against real read_csv
    on a battery of hostile CSVs (dup headers, quotes, bools, NaN columns,
    leading zeros, int64/uint64 edges, mixed dtypes)."""
    global _FAST_READ_OK
    if _FAST_READ_OK is not None:
        return _FAST_READ_OK
    battery = [
        "a,b,c\n1,2.5,x\n3,NaN,y\n-4,1e5,\n",
        "a,a,b\n1,2,3\n",
        "x\n\n1\n2\n",
        'q,w\n"a,b",2\n"c""d",3\n',
        "h1,h2\nTrue,false\nFalse,true\n",
        "a,b\n,\n,\n",
        "a,b\n007,08\n",
        "mixed\n1\nx\n2.5\n",
        "i\n9223372036854775807\n",
        "u\n18446744073709551615\n",
    ]
    ok = True
    try:
        for text in battery:
            for sk in (None, 1):
                a = pd.read_csv(io.StringIO(text), skiprows=sk)
                b = _fast_read_frame(text, skiprows=sk)
                if (
                    list(a.columns) != list(b.columns)
                    or list(map(str, a.dtypes)) != list(map(str, b.dtypes))
                    or not a.equals(b)
                    or a.to_string(index=False) != b.to_string(index=False)
                ):
                    ok = False
                    break
            if not ok:
                break
    except Exception:
        ok = False
    _FAST_READ_OK = ok
    return ok


def _read_csv(text: str, skiprows: int | None = None) -> pd.DataFrame:
    """Loader dispatch: validated fast path, else the real read_csv.
    EmptyDataError always propagates (reference contract)."""
    if _fast_read_ok():
        try:
            return _fast_read_frame(text, skiprows)
        except pd.errors.EmptyDataError:
            raise
        except Exception:
            pass  # unexpected shape -> the generic loader decides
    if skiprows is None:
        return pd.read_csv(io.StringIO(text))
    return pd.read_csv(io.StringIO(text), skiprows=skiprows)


def _read_with_unnamed_retry(sheet_csv: str, excel_mode: bool) -> pd.DataFrame | None:
    """Parse + reproduce the all-Unnamed skiprows retry loop."""
    try:
        df = _read_csv(sheet_csv)
    except pd.errors.EmptyDataError:
        return None
    count = 0
    while True:
        if all(str(col).startswith("Unnamed") for col in df.columns):
            try:
                df = _read_csv(sheet_csv, skiprows=count + 1)
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
    equivalent O(rows) chunk_frame below."""
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


# ---------------------------------------------------------------------------
# FAST path: direct model of pandas' per-cell object formatting
# ---------------------------------------------------------------------------

def _escape(s: str) -> str:
    """pprint_thing's escape_chars=('\\t','\\r','\\n') applied to a cell."""
    if "\t" in s or "\r" in s or "\n" in s:
        return s.replace("\t", "\\t").replace("\r", "\\r").replace("\n", "\\n")
    return s


def _trim_single_float(fixed: str) -> str:
    """pandas _trim_zeros_single_float: strip trailing zeros, keep >=1."""
    fixed = fixed.rstrip("0")
    if fixed.endswith("."):
        fixed += "0"
    return fixed


def _fmt_obj_cell(v) -> str | None:
    """Exactly what to_string prints for one OBJECT-dtype cell, or None when
    the value type is outside the validated model (-> slower path).
    Mirrors pandas GenericArrayFormatter._format_strings with
    leading_space=False (to_string's index=False): None -> 'None', nan ->
    na_rep 'NaN', str via pprint_thing escapes, and non-na floats via the
    PER-CELL formatter _trim_zeros_single_float(f'{v: .6f}') — per-cell, so
    slice-stable, unlike float64 columns which trim uniformly per slice."""
    if isinstance(v, str):
        return _escape(v)
    if v is None:
        return "None"
    if isinstance(v, (bool, np.bool_)):
        return "True" if v else "False"
    if isinstance(v, (int, np.integer)):
        return str(v)
    if isinstance(v, float):  # covers np.float64 (a float subclass)
        return "NaN" if v != v else _trim_single_float(f"{v: .6f}")
    return None


def _fmt_labels(cols) -> list[str]:
    """Column labels exactly as pandas' Index._format_with_header renders
    them for a string/object column Index (the only kind read_csv yields):
    format_array adds ONE leading space to every escaped label
    (leading_space=True), then trim_front strips leading ASCII spaces — one
    per round, only while ALL labels are non-empty AND all start with ' '
    (so ' a ' prints as 'a ', [' a', 'b'] keeps ' a' because 'b' has no
    space to share, and '\\xa0a' keeps its non-breaking space — found by the
    sheet fuzzer on space-led and unicode-whitespace headers)."""
    out = [" " + _escape(str(c)) for c in cols]
    while all(out) and all(x[0] == " " for x in out):
        out = [x[1:] for x in out]
    return out


def _hdr_strings(df: pd.DataFrame, dts: list | None = None) -> list[str]:
    """Column labels as to_string prints them: the _fmt_labels render
    (escape + leading-space + trim_front), then prefixed with a single
    space for numeric-dtype columns (pandas _get_formatted_column_labels'
    need_leadsp — int/float/bool headers get ' name' so a sign column never
    touches the label; applied AFTER the trim, as in pandas).

    dts: precomputed list(df.dtypes) — the .dtypes property builds a fresh
    Series per access and dominated this function's profile when taken per
    column."""
    if dts is None:
        dts = list(df.dtypes)
    out = _fmt_labels(df.columns)
    for i, dt in enumerate(dts):
        if isinstance(dt, np.dtype) and dt.kind in "iufb":
            out[i] = " " + out[i]
    return out


def _fast_cells(df: pd.DataFrame, dts: list | None = None) -> list[list[str]] | None:
    """Formatted cell strings per column for slice-stable frames, else None."""
    if dts is None:
        dts = list(df.dtypes)
    for dt in dts:
        if not isinstance(dt, np.dtype) or (dt.kind not in "iub" and dt != object):
            return None  # float64 -> float-hint path; extension/exotic -> probe
    # one object-matrix extraction instead of a Series per column: numpy
    # scalars box as np.int64/np.bool_/np.float64, which _fmt_obj_cell and
    # str() format identically to their python counterparts
    mat = df.to_numpy(dtype=object)
    cols: list[list[str]] = []
    for i, dt in enumerate(dts):
        vals = mat[:, i].tolist()
        if dt == object:
            col = []
            ap = col.append
            for v in vals:
                if type(v) is str:  # the hot case: plain cells, no escapes
                    ap(
                        v.replace("\t", "\\t").replace("\r", "\\r").replace("\n", "\\n")
                        if ("\t" in v or "\r" in v or "\n" in v)
                        else v
                    )
                else:
                    f = _fmt_obj_cell(v)
                    if f is None:
                        return None
                    ap(f)
        elif dt.kind in "iu":  # numpy ints only
            col = [str(x) for x in vals]
        else:  # dt.kind == "b" (everything else rejected above)
            col = ["True" if x else "False" for x in vals]
        cols.append(col)
    return cols


_CANARY_OK: dict[tuple, bool] = {}


def _fast_model_ok() -> bool:
    """Validate the fast formatter against real to_string ONCE per process
    (keyed by the display options that could change formatting), on a canary
    frame packed with the hostile cases: escapes, empties, unicode, None/NaN,
    mixed object cells, wide headers, negative ints.  Any byte mismatch
    disables the fast path for the whole process — correctness then rides on
    the probe path, never on the model."""
    key = (pd.get_option("display.unicode.east_asian_width"),)
    ok = _CANARY_OK.get(key)
    if ok is not None:
        return ok
    canary = pd.DataFrame(
        {
            "a\tb": pd.Series(["x\ty", "p\nq\r", "", "日本", "much-longer-cell"], dtype=object),
            "n": np.array([1, -22, 333, 0, 7], dtype="int64"),
            "flag": np.array([True, False, True, False, True]),
            "obj": pd.Series([None, float("nan"), 3, True, "s"], dtype=object),
            "of": pd.Series([1.5, 1e-07, -2.25, 1e9, 0.0], dtype=object),
            "wide_integer_header": np.array([5, 6, 7, 8, 9], dtype="int64"),
        }
    )
    try:
        cells = _fast_cells(canary)
        hdr = _hdr_strings(canary)
        ok = cells is not None
        if ok:
            rows = list(zip(*cells))
            lens = np.array([[len(v) for v in c] for c in cells], dtype="int64").T
            hl = np.array([len(h) for h in hdr], dtype="int64")
            for a, b in ((0, 5), (1, 4), (2, 3)):  # full + sub-slices
                w = np.maximum(hl, lens[a:b].max(axis=0))
                got = _render_rows(rows, hdr, [int(x) for x in w], a, b)
                if got != canary.iloc[a:b].to_string(index=False):
                    ok = False
                    break
    except Exception:
        ok = False
    _CANARY_OK[key] = ok
    return ok


def _render_rows(
    rows: list[tuple], hdr: list[str], widths: list[int], a: int, b: int
) -> str:
    """Byte-equal stand-in for df.iloc[a:b].to_string(index=False) on a
    non-empty slice of a fast-path frame: every cell (and header) right-
    justified to the column's max width within THE SLICE, single-space
    column join, newline row join.

    rows is ROW-major (one tuple of formatted cell strings per row).  The
    rendering rides one %-format per line ('%7s %4s ...'): '%Ns' on a str
    right-justifies exactly like str.rjust (incl. the no-truncation case
    where the cell is wider than N), and measured 2.7x faster than a
    per-cell rjust generator join."""
    fmt = " ".join("%%%ds" % w for w in widths)
    lines = [fmt % tuple(hdr)]
    lines += [fmt % r for r in rows[a:b]]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# FLOAT-HINT path: closed-form model of FloatArrayFormatter for boundary
# prediction (confirmed by real probes before use)
# ---------------------------------------------------------------------------

def _float_hint_matrices(df: pd.DataFrame):
    """(lens_base, dec, hdr_len) for a frame with float64 columns, or None.

    pandas formats a float64 column as f'{v:.6f}' then trims trailing zeros
    UNIFORMLY across the printed slice (>=1 decimal kept), so within a slice
      cell_len = int_part_len + 1 + max(dec_needed over slice rows)
    lens_base carries int_part_len+1 for float cols (cell length for other
    cols), dec carries the per-row needed decimals (0 elsewhere); a slice's
    column width = max(hdr, runmax(lens_base) + runmax(dec)).

    Columns that could trip pandas' scientific-notation fallback in ANY
    slice (any nonzero |v| < 1e-6; or any |v| > 1e6 while some fixed
    rendering exceeds digits+6 = 12 chars; nan/inf) reject the hint — the
    caller then gallops with real probes.
    """
    n = df.shape[0]
    lens_base = np.zeros((n, df.shape[1]), dtype="int64")
    dec = np.zeros((n, df.shape[1]), dtype="int64")
    for i in range(df.shape[1]):
        s = df.iloc[:, i]
        dt = s.dtype
        if isinstance(dt, np.dtype) and dt.kind == "f":
            vals = s.to_numpy()
            av = np.abs(vals)
            if not np.isfinite(vals).all() or ((av < 1e-6) & (vals != 0)).any():
                return None
            fixeds = [f"{v:.6f}" for v in vals]
            if (av > 1e6).any() and max(map(len, fixeds)) > 12:
                return None  # too_long + has_large_values -> scientific
            for r, fixed in enumerate(fixeds):
                frac = fixed[-6:]
                d = 6 - (len(frac) - len(frac.rstrip("0")))
                dec[r, i] = max(d, 1)
                lens_base[r, i] = len(fixed) - 6  # int part + '.'
        else:
            col = None
            if dt == object:
                col = []
                for v in s.tolist():
                    f = _fmt_obj_cell(v)
                    if f is None:
                        return None
                    col.append(f)
            elif isinstance(dt, np.dtype) and dt.kind in "iu":
                col = [str(x) for x in s.tolist()]
            elif isinstance(dt, np.dtype) and dt.kind == "b":
                col = ["True" if x else "False" for x in s.tolist()]
            else:
                return None
            for r, v in enumerate(col):
                lens_base[r, i] = len(v)
    hdr_len = np.array([len(h) for h in _hdr_strings(df)], dtype="int64")
    return lens_base, dec, hdr_len


def _closed_form_boundary(lens_base, dec, hdr_len, a: int, n: int, chunk_size: int) -> int:
    """largest i in [a, n) with modeled len(to_string(rows a..i)) < chunk_size,
    else -1.  len = n_lines*(sum(col_widths)+ncols-1)+n_lines-1.

    The scan window is capped: every column width is >= its header width, so
    a chunk of r rows models at least (r+2)*(sum(hdr_len)+ncols) - 1 chars —
    rows beyond chunk_size // that-per-line-floor can never be in this chunk.
    The cap turns the per-chunk running-max over the whole remaining tail
    (quadratic across a many-chunk sheet) into a bounded window."""
    per_line_floor = int(hdr_len.sum()) + lens_base.shape[1]
    cap = min(n - a, chunk_size // max(per_line_floor, 1) + 1)
    w = np.maximum.accumulate(lens_base[a : a + cap], axis=0) + np.maximum.accumulate(
        dec[a : a + cap], axis=0
    )
    sw = np.maximum(w, hdr_len).sum(axis=1)
    ll = np.arange(2, cap + 2, dtype="int64")  # lines incl header
    total = ll * (sw + lens_base.shape[1] - 1) + ll - 1
    idx = int(np.searchsorted(total, chunk_size))  # first >= chunk_size
    return a + idx - 1 if idx > 0 else -1


def _chunk_from_cells(
    rows: list[tuple],
    hdr: list[str],
    hdr_len: np.ndarray,
    lens: np.ndarray,
    empty_repr_fn,
    chunk_size: int,
) -> list[str]:
    """The reference's greedy chunk loop over pre-formatted slice-stable
    cells: closed-form boundary location + direct render, zero pandas calls.
    Shared by the frame fast path (chunk_frame) and the pandas-free pure
    sheet path (_pure_sheet_chunks); byte-equality with
    chunk_frame_reference is pinned by both their validation batteries.

    rows: row-major formatted cell strings; lens: (n_rows, n_cols) int64
    matrix of their lengths; empty_repr_fn: lazily produces pandas'
    empty-selection repr for the 1-row-sheet quirk."""
    num_rows = len(rows)
    zeros = np.zeros_like(lens)
    chunks: list[str] = []
    empty_repr: str | None = None
    _row = 0
    while _row < num_rows:
        b = _closed_form_boundary(lens, zeros, hdr_len, _row, num_rows, chunk_size)
        _p_row_num = b if b >= 0 else 0
        if _p_row_num + 1 <= _row and _row > 0:
            raise ValueError(
                f"row {_row} alone exceeds chunk_size={chunk_size}; "
                "reference semantics would loop forever"
            )
        if _p_row_num > _row:
            w = np.maximum(hdr_len, lens[_row:_p_row_num].max(axis=0))
            chunks.append(_render_rows(rows, hdr, [int(x) for x in w], _row, _p_row_num))
        else:
            if empty_repr is None:  # pandas' empty-selection repr, once
                empty_repr = empty_repr_fn()
            chunks.append(empty_repr)
        _row = _p_row_num + 1
    return chunks


def chunk_frame(df: pd.DataFrame, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Semantics-identical fast chunker (byte-equal to chunk_frame_reference,
    asserted in tests and by the independently-generated x33 golden).

    len(df.iloc[a:i+1].to_string(index=False)) is monotone nondecreasing in i
    (more lines, column widths only grow), so the reference inner loop's
    "largest i with len < chunk_size" can be located without formatting every
    prefix.  Path selection per frame is documented in the module docstring.

    The reference quirk where the FIRST probe already overflowing leaves
    _p_row_num at 0 (and the loop would regress) is reproduced/guarded
    identically on every path.
    """
    num_rows = df.shape[0]
    _row = 0
    chunks: list[str] = []
    if num_rows == 0:
        return chunks

    dts = list(df.dtypes)
    cells = _fast_cells(df, dts) if _fast_model_ok() else None
    if cells is not None:
        # FAST: closed-form boundaries + direct render, no pandas calls
        hdr = _hdr_strings(df, dts)
        hdr_len = np.array([len(h) for h in hdr], dtype="int64")
        lens = np.array([[len(v) for v in c] for c in cells], dtype="int64").T
        return _chunk_from_cells(
            list(zip(*cells)),
            hdr,
            hdr_len,
            lens,
            lambda: df.iloc[0:0].to_string(index=False),
            chunk_size,
        )

    def fits(i: int) -> bool:  # len(to_string(rows _row..i)) < chunk_size
        return len(df.iloc[_row : i + 1].to_string(index=False)) < chunk_size

    hint = _float_hint_matrices(df) if _fast_model_ok() else None

    while _row < num_rows:
        if fits(num_rows - 1):
            # common case: the whole remainder fits -> one probe total
            _p_row_num = num_rows - 1
        elif not fits(_row):
            _p_row_num = 0  # reference: inner loop breaks on first probe
        else:
            _p_row_num = -1
            if hint is not None:
                # FLOAT-HINT: predict, then CONFIRM with two real probes —
                # a wrong prediction costs nothing but the fallback below
                pred = _closed_form_boundary(*hint, _row, num_rows, chunk_size)
                if pred >= _row and fits(pred) and (
                    pred + 1 >= num_rows or not fits(pred + 1)
                ):
                    _p_row_num = pred
            if _p_row_num < 0:
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


def chunk_frame_markdown(df: pd.DataFrame, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """The reference's `result_type == "markdown"` chunker branch
    (ameya_parser_excel whl!.../excel/extractors/simple_reader_extractor.py:53,65
    and the csv twin): the SAME greedy loop, with chunk text rendered by
    chunk.to_markdown(index=False) instead of to_string.

    Reference-dead code: the consumer pins {"result_type": "text"}
    (quanta-search-consumer/utils/util.py:307), so no production file ever
    takes this branch.  pandas.to_markdown delegates to `tabulate`, which
    this container does not ship — when tabulate is importable the branch
    runs the real renderer (galloping + binary-search probes; len of a
    pipe-table is monotone in the row count for the same width-only-grows
    reason to_string's is), otherwise it raises NotImplementedError, the
    same honest-gap policy as the codec-bound multimodal decoders."""
    try:
        import tabulate  # noqa: F401 — pandas' to_markdown backend
    except ImportError as e:
        raise NotImplementedError(
            "result_type='markdown' needs the `tabulate` package "
            "(pandas.to_markdown backend), which is not installed; the "
            "reference consumer pins result_type='text' so this branch is "
            "dead in production"
        ) from e

    num_rows = df.shape[0]
    _row = 0
    chunks: list[str] = []

    def fits(i: int) -> bool:
        return len(df.iloc[_row : i + 1].to_markdown(index=False)) < chunk_size

    while _row < num_rows:
        if fits(num_rows - 1):
            _p_row_num = num_rows - 1
        elif not fits(_row):
            _p_row_num = 0  # reference: inner loop breaks on first probe
        else:
            lo, step, hi = _row, 1, None
            while hi is None:
                probe = lo + step
                if probe >= num_rows:
                    hi = num_rows - 1
                elif fits(probe):
                    lo, step = probe, step * 2
                else:
                    hi = probe
            while hi - lo > 1:
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
        chunks.append(df.iloc[_row:_p_row_num].to_markdown(index=False))
        _row = _p_row_num + 1
    return chunks


# ---------------------------------------------------------------------------
# PURE path: pandas-free parse + chunk for the restricted sheet grammar
# ---------------------------------------------------------------------------
#
# pandas' per-call parser construction (TextFileReader -> engine -> C wrapper)
# costs ~1.3 ms per sheet regardless of size and dominated the kernel profile
# (xlsx+csv = 81% of extraction CPU, >half of it in read machinery).  For
# sheets whose DATA region provably parses to an all-object frame of plain
# strings — every cell matches [A-Za-z_][A-Za-z0-9_ ]* and is not a token
# pandas would coerce (bool/NA/inf spellings; the leading-letter rule already
# excludes every numeric form) — read_csv is observationally equivalent to
# str.split, and to_string to the same width model the fast chunk path
# already rides.  Anything outside the grammar (quotes, CR, blank lines,
# empty/numeric/coercible cells, ragged rows, duplicate or all-"Unnamed"
# labels that would exhaust the retry loop) returns None and falls back to
# the pandas path, so error messages and exotic inference stay byte-exact.
# Validated once per process by _pure_model_ok against read_csv +
# chunk_frame_reference on an adversarial battery; any mismatch disables the
# path for the process (correctness then rides the pandas path, as before).

# one data line: non-empty cells matching [A-Za-z_][A-Za-z0-9_ ]*, comma-
# joined -- the leading letter makes numeric coercion impossible, the charset
# makes quote/escape/NA-with-punctuation forms impossible.  Enforced by the
# byte-class LUT passes in _pure_sheet_chunks (formerly a whole-block regex).
# cells pandas' C parser would coerce to bool/NaN/inf despite the letter
# lead-in, checked as a WHOLE (lowered) cell via set membership on the
# first-byte-gated suspects — formerly a whole-block lower()+regex pass.
_PURE_BAD_TOKENS = frozenset(
    ["true", "false", "na", "nan", "null", "none", "inf", "infinity"]
)

_PURE_OK: bool | None = None

# byte-class LUT for the data block: letters, digits, '_', ' ', ',', '\n'
# (exactly _PURE_BLOCK's charset plus the two separators).  A cell's FIRST
# byte must additionally be a letter/underscore — checked vectorized below.
_PURE_LUT = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_ ,\n":
    _PURE_LUT[_c] = True
_PURE_FIRST_LUT = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_":
    _PURE_FIRST_LUT[_c] = True
# first bytes of the coercible tokens (true/false/nan/na/null/none/inf...):
# only a block containing a cell starting with one of these needs the
# (allocation-heavy) lower()+regex confirmation pass
_PURE_BAD_FIRST_LUT = np.zeros(256, dtype=bool)
for _c in b"tfniTFNI":
    _PURE_BAD_FIRST_LUT[_c] = True
del _c


def _pure_sheet_chunks(
    text: str, excel_mode: bool, chunk_size: int = CHUNK_SIZE
) -> list[str] | None:
    """Parse + unnamed-retry + chunk one sheet without pandas, or None when
    the input is outside the validated grammar (caller falls back to the
    read_csv path).  A non-None return is authoritative (possibly [] for a
    skipped/empty sheet).

    The data region is validated and measured in a handful of vectorized
    numpy passes over the raw bytes (separator positions -> cell lengths +
    raggedness; byte-class LUTs -> charset; first-byte gate -> the rare
    coercible-token confirmation), replacing the former whole-block regex +
    per-row len() sweep.  Byte-equality with the pandas path is pinned by
    _pure_model_ok's per-process battery and the hypothesis property test."""
    if not _pure_model_ok():
        return None
    # NUL and BOM break the verbatim-header model BEFORE the data-block
    # charset gate runs: pandas' C parser truncates a header cell at '\x00'
    # ('\x00a' -> empty -> 'Unnamed: 0', which must trigger the retry loop
    # and, in csv mode, the reference's propagated EmptyDataError) and
    # strips a leading U+FEFF BOM — found by the dispatch fuzz, so opt out
    # with the quote/CR cases and let the pandas path decide
    if '"' in text or "\r" in text or "\x00" in text or "\ufeff" in text:
        return None
    # any empty line (leading/trailing/blank) <=> pandas semantics differ;
    # equivalent to the former '"" in text.split("\n")' without the split
    if not text or text[0] == "\n" or text[-1] == "\n" or "\n\n" in text:
        return None

    # EVERY pandas read in the Unnamed-retry loop parses from its skiprows
    # offset to the END of the text, so a line with MORE fields than an
    # EARLIER read's header raises ParserError (or flips implicit-index
    # promotion) before the lazy peel below ever reaches it — found by the
    # sheet fuzzer: 'Unnamed: 0\nUnnamed: 0\na,bb' errors on read 0
    # ("Expected 1 fields in line 3, saw 2") while the peel would accept
    # header 'a,bb' at read 2.  Require a fully UNIFORM comma-count matrix
    # up front (',' and '\n' are unambiguous single bytes in UTF-8): every
    # read is then raggedness-free and the peel is an exact model; anything
    # non-uniform falls back to the pandas path.
    _ub = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    _cc = np.cumsum(_ub == 44)
    _nl_pos = np.flatnonzero(_ub == 10)
    _per_line = np.diff(
        np.concatenate(([0], _cc[_nl_pos], [int(_cc[-1])]))
    )
    if _per_line.size > 1 and (_per_line != _per_line[0]).any():
        return None

    # header + the reference's all-"Unnamed" skiprows retry loop
    # (_read_with_unnamed_retry): re-read with one more leading line skipped
    # until some label doesn't start with "Unnamed".  Lines are peeled
    # lazily (one find per retry) -- most sheets take zero retries.
    n = len(text)
    nl = text.find("\n")
    hdr_line = text[:nl] if nl != -1 else text
    if not hdr_line.strip():
        # a whitespace-only line is BLANK to pandas (skip_blank_lines covers
        # it even when non-empty: ' \nx' parses with header 'x'), which the
        # verbatim line model can't express — pandas path (dispatch fuzz)
        return None
    fields = hdr_line.split(",")
    labels = [f if f else f"Unnamed: {i}" for i, f in enumerate(fields)]
    while all(l.startswith("Unnamed") for l in labels):
        if nl == -1:
            # re-read would raise EmptyDataError (excel: skip sheet; csv:
            # propagate with pandas' exact message) -> pandas path decides
            return None
        off = nl + 1
        nl = text.find("\n", off)
        hdr_line = text[off:nl] if nl != -1 else text[off:]
        if not hdr_line.strip():
            return None  # blank-to-pandas candidate line, as above
        fields = hdr_line.split(",")
        labels = [f if f else f"Unnamed: {i}" for i, f in enumerate(fields)]
        if excel_mode and nl == -1:
            return []  # ref: `if df.empty: return None` right after a re-read
    if len(set(labels)) != len(labels):
        return None  # mangle-dedupe (.1 suffixes) -> pandas path

    if nl == -1:
        # 0-row frame: excel skips it (post-loop df.empty check); csv chunks
        # it to nothing (chunk_frame of an empty frame)
        return []
    block = text[nl + 1 :]
    try:
        buf = np.frombuffer(block.encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError:
        return None  # non-ASCII is outside the grammar

    ncols = len(fields)
    sep = (buf == 44) | (buf == 10)  # ',' '\n'
    pos = np.flatnonzero(sep)
    nrows = int((buf == 10).sum()) + 1
    if len(pos) != nrows * ncols - 1:
        return None  # ragged -> pandas' index-promotion semantics
    if ncols > 1:
        # newlines must land exactly every ncols-th separator
        expect_nl = np.zeros(len(pos), dtype=bool)
        expect_nl[ncols - 1 :: ncols] = True
        if not np.array_equal(buf[pos] == 10, expect_nl):
            return None  # ragged rows with compensating widths
    bounds = np.empty(len(pos) + 2, dtype=np.int64)
    bounds[0] = -1
    bounds[1:-1] = pos
    bounds[-1] = len(buf)
    lens_flat = bounds[1:] - bounds[:-1] - 1
    if not lens_flat.all():
        return None  # empty cell
    first = buf[bounds[:-1] + 1]
    if not _PURE_FIRST_LUT[first].all() or not _PURE_LUT[buf].all():
        return None  # cell not letter/underscore-led, or charset violation
    # bool/NA/inf spellings pandas would coerce: only cells whose first byte
    # is in tfni/TFNI can be one, so slice just those and set-test them
    suspect = np.flatnonzero(_PURE_BAD_FIRST_LUT[first])
    if suspect.size:
        starts = bounds[:-1] + 1
        ends = bounds[1:]
        for i in suspect:
            if block[starts[i] : ends[i]].lower() in _PURE_BAD_TOKENS:
                return None

    rows = [tuple(ln.split(",")) for ln in block.split("\n")]
    lens = lens_flat.reshape(nrows, ncols)
    # rendered headers: the _fmt_labels render (the pure grammar's frames
    # are all-object, so no numeric leading space); the empty-selection
    # repr keeps the VERBATIM labels (pandas prints the raw column Index
    # there, untrimmed)
    hdr = _fmt_labels(labels)
    hdr_len = np.array([len(h) for h in hdr], dtype="int64")
    empty_repr = "Empty DataFrame\nColumns: [%s]\nIndex: []" % ", ".join(labels)
    return _chunk_from_cells(rows, hdr, hdr_len, lens, lambda: empty_repr, chunk_size)


def _pure_model_ok() -> bool:
    """Once per process: byte-validate _pure_sheet_chunks against the pandas
    reference (read_csv retry loop + the O(rows^2) chunk_frame_reference) on
    an in-grammar battery, and pin that out-of-grammar inputs correctly
    decline (return None) rather than claim authority."""
    global _PURE_OK
    if _PURE_OK is not None:
        return _PURE_OK
    _PURE_OK = True  # let _pure_sheet_chunks run inside the validation
    in_grammar = [
        # (text, excel_mode, chunk_size)
        ("a,b_c\nfoo,bar baz\nqux x,y_z", True, CHUNK_SIZE),
        ("a,b\nword one,two", False, CHUNK_SIZE),  # 1 row -> empty-repr quirk
        (",,\nh0,h1,h2\ncell a,b,c\nd,e,f", True, CHUNK_SIZE),  # junk retry
        (",,\n,,\nh0,h1,h2\naa,bb,cc\nd,e,f\ng,h,i", False, CHUNK_SIZE),
        ("hdr_only,x", True, CHUNK_SIZE),  # 0 data rows: excel skip
        ("hdr_only,x", False, CHUNK_SIZE),  # 0 data rows: csv -> no chunks
        # multi-chunk with the dropped-row quirk (each row fits alone)
        ("h_a,h_b\naaa,bbb\nccc,ddd\neee,fff\nggg,hhh", True, 30),
        ("a,b\n" + "\n".join(f"w{i} x,yy zz" for i in range(30)), False, 90),
        # rows too wide to pair -> consecutive empty-repr emissions
        ("w0_col,x0,w1_col,x1\na b,c,d e,f\ng,h i,j,k", True, 50),
        # labels that legitimately start with "Unnamed" vs the retry test
        ("Unnamed_x,real_h\ncell,word", True, CHUNK_SIZE),
        # retry loop exhausts in EXCEL mode: empty re-read -> sheet skipped
        # (decidable without pandas; the csv twin raises EmptyDataError and
        # is asserted to fall back below)
        (",,\n,,", True, CHUNK_SIZE),
    ]
    out_of_grammar = [
        'a,b\n"q",x',  # quotes
        "a,b\nx,1",  # numeric cell
        "a,b\nx,",  # empty cell
        "a,b\nx,True",  # bool token
        "a,b\nx,NaN",  # NA token
        "a,b\nx,inf",  # inf token
        "a,b\nx,y\n",  # trailing newline
        "a,b\nx,y\n\nz,w",  # blank line
        "a,a\nx,y",  # duplicate labels
        "a,b\nx,y,z",  # ragged
    ]
    try:
        for text, excel, cs in in_grammar:
            got = _pure_sheet_chunks(text, excel, cs)
            if got is None:
                _PURE_OK = False
                break
            df = _read_with_unnamed_retry(text, excel)
            want = [] if df is None else chunk_frame_reference(df, cs)
            if got != want:
                _PURE_OK = False
                break
        if _PURE_OK:
            for text in out_of_grammar:
                for excel in (True, False):
                    if _pure_sheet_chunks(text, excel) is not None:
                        _PURE_OK = False
                        break
                if not _PURE_OK:
                    break
        # csv-mode retry exhaustion must DECLINE so the pandas path raises
        # EmptyDataError with its exact message (it lands in the error span)
        if _PURE_OK and _pure_sheet_chunks(",,\n,,", False) is not None:
            _PURE_OK = False
    except Exception:
        _PURE_OK = False
    return _PURE_OK


def walk_sheets(
    raw_spans: list[dict],
    excel_mode: bool,
    chunk_size: int = CHUNK_SIZE,
    result_type: str = "text",
) -> list[dict]:
    """All sheets of one workbook (one raw span per sheet, in sheet order) ->
    concatenated chunk streams as {kind:'table_chunk', text, media_ref:''}.

    result_type mirrors the reference loader option: "text" (the production
    value — the consumer pins it) renders to_string chunks; "markdown"
    renders to_markdown chunks (reference-dead branch, see
    chunk_frame_markdown for the tabulate gate).

    File-level gate (ref simple_directory_reader: `if not docs[0].text`):
    if the FIRST emitted chunk has falsy text the whole file is skipped; if no
    chunks at all were produced the reference raises (docs[0] IndexError ->
    extraction error) and the file contributes nothing.
    """
    chunker = chunk_frame if result_type == "text" else chunk_frame_markdown
    chunks: list[str] = []
    for sp in raw_spans:
        text = sp["text"] or ""
        if result_type == "text":
            pure = _pure_sheet_chunks(text, excel_mode, chunk_size)
            if pure is not None:
                chunks.extend(pure)
                continue
        df = _read_with_unnamed_retry(text, excel_mode)
        if df is None:
            continue
        chunks.extend(chunker(df, chunk_size))
    if not chunks or not chunks[0]:
        return []
    return [{"kind": "table_chunk", "text": c, "media_ref": ""} for c in chunks]
