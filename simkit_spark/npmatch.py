"""Vectorized Title-Case mention matcher.

Replays ``MENTION_RE = (?:[A-Z][a-z]+)(?: [A-Z][a-z]+)*`` (maximal
Title-Case token runs, the extraction stage's mention pattern) as pure
numpy boolean algebra over an ASCII byte matrix — no regex engine, no
per-row Python (parity with ``re.finditer`` is asserted in tests,
including overlap/greediness corners like "McDonald", "xAcme", double
spaces and row-width boundaries):

  token start  = uppercase byte followed by a lowercase byte
  token extent = the contiguous lowercase run after the start
  match        = maximal chain of tokens joined by single spaces

Match surfaces (and any other variable-length substring set, e.g. the
between-mention text) are materialized WITHOUT a Python loop by
gathering the matched byte ranges into one contiguous buffer and
handing offsets+data to ``pyarrow.StringArray.from_buffers``.

Callers catch ``UnicodeEncodeError`` from the ASCII packing and fall
back to the regex path for non-ASCII batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _gather_strings(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pd.Series:
    """Variable-length ASCII substrings of ``flat`` -> pandas str
    Series, built Arrow-native (one gather + from_buffers; no per-row
    Python)."""
    import pyarrow as pa  # noqa: PLC0415

    n = len(starts)
    if n == 0:
        return pd.Series([], dtype=object)
    lengths = (ends - starts).astype(np.int64)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    total = int(out_off[-1])
    idx = np.repeat(starts, lengths) + (np.arange(total) - np.repeat(out_off[:-1], lengths))
    data = flat[idx].tobytes()
    if total > np.iinfo(np.int32).max:
        # string offsets are int32 — a batch gathering > 2 GiB of match
        # bytes would silently wrap; large_string carries int64 offsets
        arr = pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(out_off.tobytes()), pa.py_buffer(data)
        )
    else:
        arr = pa.StringArray.from_buffers(
            n, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(data)
        )
    return arr.to_pandas()


class MatchTable:
    """All MENTION_RE matches over a batch of ASCII texts, in
    (row, start) order — exactly ``re.finditer`` order.

    Attributes: ``row`` (text index), ``start``/``end`` (char offsets
    within the text), ``surface`` (matched strings, pandas Series),
    ``flat_start``/``flat_end`` (offsets into ``flat``, the internal
    byte buffer — reusable via ``substrings`` for e.g. the
    between-mention text).
    """

    __slots__ = ("row", "start", "end", "surface", "flat_start", "flat_end", "flat")

    def __init__(self, row, start, end, surface, flat_start, flat_end, flat):
        self.row = row
        self.start = start
        self.end = end
        self.surface = surface
        self.flat_start = flat_start
        self.flat_end = flat_end
        self.flat = flat

    def substrings(self, flat_starts: np.ndarray, flat_ends: np.ndarray) -> pd.Series:
        return _gather_strings(self.flat, flat_starts, flat_ends)


def title_case_matches(texts: "list[str] | np.ndarray") -> MatchTable:
    """Match the batch; raises UnicodeEncodeError on non-ASCII (callers
    fall back to the regex path).

    Packing: ONE ``"\\x00".join(texts).encode("ascii")`` buffer (no
    per-row padding waste; NUL can't occur in the pattern so rows never
    chain); row index per match falls out of a searchsorted against the
    row start offsets."""
    joined = "\x00".join(str(t) for t in texts) + "\x00"
    flat = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    n = flat.size
    empty = np.array([], dtype=np.int64)

    def _empty() -> MatchTable:
        return MatchTable(
            empty, empty, empty, pd.Series([], dtype=object), empty, empty, flat
        )

    if len(joined) == 1:  # no texts, or all empty with one trailing NUL
        if not len(texts):
            return _empty()
    # row r spans [row_off[r], row_off[r+1] - 1) in flat (NUL-terminated)
    lens = np.fromiter((len(str(t)) for t in texts), dtype=np.int64, count=len(texts))
    row_off = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=row_off[1:])

    idx = np.arange(n, dtype=np.int64)
    up = (flat >= 65) & (flat <= 90)
    low = (flat >= 97) & (flat <= 122)
    sp = flat == 32

    nxt_low = np.zeros(n, dtype=bool)
    nxt_low[:-1] = low[1:]
    tstart = up & nxt_low
    if not tstart.any():
        return _empty()

    # nnl[i] = smallest j >= i with ~low[j] (token L-runs end there)
    tmp = np.where(~low, idx, n)
    nnl = np.minimum.accumulate(tmp[::-1])[::-1]

    starts_tok = idx[tstart]
    # start+1 is lowercase by construction, so the run end lookup is safe
    ends_tok = nnl[np.minimum(starts_tok + 1, n - 1)]

    # a token continues the previous match iff exactly one space sits
    # between it and a token ending right there
    end_at = np.zeros(n + 1, dtype=bool)
    end_at[ends_tok] = True
    s = starts_tok
    continuation = (s >= 2) & sp[np.maximum(s - 1, 0)] & end_at[np.maximum(s - 1, 0)]

    first = ~continuation
    match_starts = starts_tok[first]
    # last token's end per match: tokens are in flat order, so reduceat
    # over the match-first boundaries takes each group's max end
    bounds = np.nonzero(first)[0]
    match_ends = np.maximum.reduceat(ends_tok, bounds)

    rows = np.searchsorted(row_off, match_starts, side="right") - 1
    col_start = match_starts - row_off[rows]
    col_end = match_ends - row_off[rows]
    surfaces = _gather_strings(flat, match_starts, match_ends)
    return MatchTable(
        rows, col_start, col_end, surfaces, match_starts, match_ends, flat
    )
