"""Rounding that matches DuckDB's ROUND (half away from zero).

Python's built-in ``round`` and numpy/pandas ``round`` use banker's
rounding; DuckDB rounds half away from zero. Results feed a value-hash
comparison against DuckDB oracles, so all user-facing rounded columns
go through these helpers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def round_half_away(x: float, ndigits: int) -> float:
    """Half-away-from-zero rounding of a float, like DuckDB ROUND."""
    if x != x:  # nan
        return x
    scale = 10.0 ** ndigits
    if x >= 0:
        return math.floor(x * scale + 0.5) / scale
    return -math.floor(-x * scale + 0.5) / scale


def round_series(s: "pd.Series", ndigits: int) -> "pd.Series":
    scale = 10.0 ** ndigits
    arr = np.asarray(s, dtype=np.float64)
    out = np.where(arr >= 0,
                   np.floor(arr * scale + 0.5) / scale,
                   -np.floor(-arr * scale + 0.5) / scale)
    return pd.Series(out, index=s.index)
