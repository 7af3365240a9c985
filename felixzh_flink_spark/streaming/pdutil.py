"""Shared pandas-chunk helpers for the stateful streaming operators.

One quirk justifies the module: `pdf[col].max()` on an EMPTY chunk (or a
chunk whose values are all null) returns pandas ``NaT`` — which passes an
``is not None`` check and then raises from ``.timestamp()``, killing the
whole streaming query. Every last-activity timer in triggers/neardup/cep
funnels through `chunk_max_ms` so the guard lives in exactly one place.
"""

from __future__ import annotations

import pandas as pd


def chunk_max_ms(pdf: pd.DataFrame, col: str = "_ts", cur: int = 0) -> int:
    """Running max of a timestamp column in epoch ms, NaT/empty-safe:
    returns `cur` unchanged when the chunk contributes nothing."""
    if not len(pdf):
        return cur
    m = pdf[col].max()
    if pd.isna(m):          # NaT from empty/all-null — `is not None` passes!
        return cur
    return max(cur, int(m.timestamp() * 1000))
