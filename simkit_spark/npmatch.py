"""Vectorized Title-Case mention matcher.

Replays ``MENTION_RE = (?:[A-Z][a-z]+)(?: [A-Z][a-z]+)*`` (maximal
Title-Case token runs, the extraction stage's mention pattern) as pure
numpy boolean algebra over an ASCII byte buffer — no regex engine, no
per-row Python (parity with ``re.finditer`` is asserted in tests,
including overlap/greediness corners like "McDonald", "xAcme", double
spaces and row-boundary adjacency).

Zero-copy Arrow entry point: ``title_case_matches_arrow`` matches a
``pyarrow.StringArray`` directly on its (offsets, data) buffers — the
Arrow string layout IS the flat-buffer + row-offset representation the
matcher wants, so the extraction hot path never materializes Python
string objects, never re-encodes, and never concatenates. Rows are
adjacent with no separator bytes; the match core carries an explicit
row-start break mask so tokens, lowercase runs and space-continuations
can never chain across a row boundary.

Match surfaces (and any other variable-length substring set, e.g. the
between-mention text) are materialized WITHOUT a Python loop by
gathering the matched byte ranges into one contiguous buffer and
handing offsets+data to ``pyarrow.StringArray.from_buffers``.

Callers catch ``UnicodeEncodeError`` (non-ASCII input — byte offsets
would diverge from the char offsets the contract promises) and fall
back to the regex path for that batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _gather_strings_arrow(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Variable-length ASCII substrings of ``flat`` -> pyarrow string
    array, built Arrow-native (one gather + from_buffers; no per-row
    Python)."""
    import pyarrow as pa  # noqa: PLC0415

    n = len(starts)
    if n == 0:
        return pa.array([], type=pa.string())
    lengths = (ends - starts).astype(np.int64)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    total = int(out_off[-1])
    idx = np.repeat(starts, lengths) + (np.arange(total) - np.repeat(out_off[:-1], lengths))
    data = flat[idx].tobytes()
    if total > np.iinfo(np.int32).max:
        # string offsets are int32 — a batch gathering > 2 GiB of match
        # bytes would silently wrap; large_string carries int64 offsets
        return pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(out_off.tobytes()), pa.py_buffer(data)
        )
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(data)
    )


def _gather_strings(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pd.Series:
    """pandas-Series twin of _gather_strings_arrow (between-text etc.)."""
    arr = _gather_strings_arrow(flat, starts, ends)
    if len(arr) == 0:
        return pd.Series([], dtype=object)
    return arr.to_pandas()


class MatchTable:
    """All MENTION_RE matches over a batch of ASCII texts, in
    (row, start) order — exactly ``re.finditer`` order.

    Attributes: ``row`` (text index), ``start``/``end`` (char offsets
    within the text), ``surface_arrow`` (matched strings, pyarrow
    array), ``surface`` (same as a pandas Series, converted lazily),
    ``flat_start``/``flat_end`` (offsets into ``flat``, the internal
    byte buffer — reusable via ``substrings`` for e.g. the
    between-mention text).
    """

    __slots__ = (
        "row", "start", "end", "surface_arrow", "flat_start", "flat_end",
        "flat", "_surface_pd",
    )

    def __init__(self, row, start, end, surface_arrow, flat_start, flat_end, flat):
        self.row = row
        self.start = start
        self.end = end
        self.surface_arrow = surface_arrow
        self.flat_start = flat_start
        self.flat_end = flat_end
        self.flat = flat
        self._surface_pd = None

    @property
    def surface(self) -> pd.Series:
        if self._surface_pd is None:
            if len(self.surface_arrow) == 0:
                self._surface_pd = pd.Series([], dtype=object)
            else:
                self._surface_pd = self.surface_arrow.to_pandas()
        return self._surface_pd

    def substrings(self, flat_starts: np.ndarray, flat_ends: np.ndarray) -> pd.Series:
        return _gather_strings(self.flat, flat_starts, flat_ends)


_EMPTY_I64 = np.array([], dtype=np.int64)


def _empty_table(flat: np.ndarray) -> MatchTable:
    import pyarrow as pa  # noqa: PLC0415

    return MatchTable(
        _EMPTY_I64, _EMPTY_I64, _EMPTY_I64, pa.array([], type=pa.string()),
        _EMPTY_I64, _EMPTY_I64, flat,
    )


def _matches_core(flat: np.ndarray, row_off: np.ndarray) -> MatchTable:
    """Match core over a contiguous ASCII byte buffer where row r spans
    ``[row_off[r], row_off[r+1])`` with NO separator bytes between rows
    (the Arrow string layout). A row-start break mask keeps lowercase
    runs, token starts and space-continuations from chaining across row
    boundaries."""
    n = flat.size
    if n == 0:
        return _empty_table(flat)

    # row starts (clip: trailing empty rows have offset == n)
    is_start = np.zeros(n, dtype=bool)
    starts_in = row_off[:-1]
    is_start[starts_in[starts_in < n]] = True

    idx = np.arange(n, dtype=np.int64)
    up = (flat >= 65) & (flat <= 90)
    low = (flat >= 97) & (flat <= 122)
    sp = flat == 32

    # a token starts at an uppercase byte followed IN THE SAME ROW by a
    # lowercase byte
    nxt_low = np.zeros(n, dtype=bool)
    nxt_low[:-1] = low[1:] & ~is_start[1:]
    tstart = up & nxt_low
    if not tstart.any():
        return _empty_table(flat)

    # nnl[i] = smallest j >= i where the lowercase run breaks (non-low
    # byte OR the next row begins)
    tmp = np.where(~low | is_start, idx, n)
    nnl = np.minimum.accumulate(tmp[::-1])[::-1]

    starts_tok = idx[tstart]
    # start+1 is lowercase in the same row by construction
    ends_tok = nnl[np.minimum(starts_tok + 1, n - 1)]

    # a token continues the previous match iff exactly one space sits
    # between it and a token ending right there — all within one row
    end_at = np.zeros(n + 1, dtype=bool)
    end_at[ends_tok] = True
    s = starts_tok
    sm1 = np.maximum(s - 1, 0)
    continuation = (
        (s >= 2) & sp[sm1] & end_at[sm1] & ~is_start[s] & ~is_start[sm1]
    )

    first = ~continuation
    match_starts = starts_tok[first]
    # last token's end per match: tokens are in flat order, so reduceat
    # over the match-first boundaries takes each group's max end
    bounds = np.nonzero(first)[0]
    match_ends = np.maximum.reduceat(ends_tok, bounds)

    rows = np.searchsorted(row_off, match_starts, side="right") - 1
    col_start = match_starts - row_off[rows]
    col_end = match_ends - row_off[rows]
    surfaces = _gather_strings_arrow(flat, match_starts, match_ends)
    return MatchTable(
        rows, col_start, col_end, surfaces, match_starts, match_ends, flat
    )


def title_case_matches(texts: "list[str] | np.ndarray") -> MatchTable:
    """Match a batch of Python strings; raises UnicodeEncodeError on
    non-ASCII (callers fall back to the regex path)."""
    joined = "".join(str(t) for t in texts)
    flat = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter(
        (len(str(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    row_off = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=row_off[1:])
    return _matches_core(flat, row_off)


def title_case_matches_arrow(arr) -> MatchTable:
    """Match a ``pyarrow`` string array ZERO-COPY on its (offsets,
    data) buffers — no Python strings, no join, no re-encode. Raises
    UnicodeEncodeError if any byte is non-ASCII (char offsets would
    diverge from byte offsets; caller falls back to the regex path).
    Null slots match nothing."""
    import pyarrow as pa  # noqa: PLC0415

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        import pyarrow.compute as pc  # noqa: PLC0415

        arr = pc.fill_null(arr, "")
    off_width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=off_width)
    row_off = raw_off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    base = int(row_off[0])
    if base:
        row_off = row_off - base
    end = base + int(row_off[-1])
    flat = np.frombuffer(bufs[2], dtype=np.uint8, count=end)[base:] if end else np.array([], dtype=np.uint8)
    if flat.size and (flat & 0x80).any():
        raise UnicodeEncodeError(
            "ascii", "<arrow batch>", 0, 1, "non-ASCII byte in batch"
        )
    return _matches_core(flat, row_off)
