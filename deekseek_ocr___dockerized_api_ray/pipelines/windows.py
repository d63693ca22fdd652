"""Stream-shaped windowing over the events table.

Ray Data has no event-time windows; the engine treats events as an
ordered, partitioned log: partition by user (bucketed keyed shuffle),
sort within partition by (ts, event_id), and compute windows with
vectorized pandas inside each bucket group (one call per bucket, not
per user). Ordering assumption: (ts, event_id) is a total order per
user -- event_id breaks timestamp ties deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_series
from ..functions.text_stats import sha1_64

_GAP_DEFAULT_S = 1800  # 30-minute session gap


def events_sessionize(sf_dir: str, gap_s: int = _GAP_DEFAULT_S, n_buckets: int = 64):
    """Session windows: per user, maximal event runs with inter-event
    gap <= gap_s (a NEW session starts when gap > gap_s).

    Output: (user_id, session_start_s, n_events, sum_value r2) -- one
    row per session; session identity is its first event's epoch second.
    """
    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def sessionize_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        ts_s = ts_us // 1_000_000  # floor to epoch seconds (session identity)
        user = df["user_id"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        gap_us = np.empty(len(df), dtype=np.int64)
        gap_us[0] = (gap_s + 1) * 1_000_000
        gap_us[1:] = ts_us[1:] - ts_us[:-1]
        # gap strictly greater than gap_s at MICROSECOND precision,
        # matching the oracle's `ts - lag(ts) > INTERVAL gap SECOND`
        new_session = new_user | (gap_us > gap_s * 1_000_000)
        session_id = np.cumsum(new_session)
        g = pd.DataFrame(
            {"user_id": user, "session_id": session_id, "ts_s": ts_s,
             "value": df["value"].to_numpy()}
        ).groupby(["user_id", "session_id"], as_index=False).agg(
            session_start_s=("ts_s", "min"),
            n_events=("ts_s", "size"),
            sum_value=("value", "sum"),
        )
        g["sum_value"] = round_series(g["sum_value"], 2)
        g["n_events"] = g["n_events"].astype("int64")
        return g[["user_id", "session_start_s", "n_events", "sum_value"]]

    bucketed = ev.map_batches(add_bucket, batch_format="pandas", batch_size=131072)
    return bucketed.groupby("bucket").map_groups(sessionize_bucket, batch_format="pandas")


def events_sliding_hour(sf_dir: str, slide_s: int = 1800, width_s: int = 3600,
                        n_buckets: int = 64):
    """Sliding windows (width 1h, slide 30min): each event lands in
    width/slide windows; implemented by exploding each event into its
    window ids (a map, no self-join), then one keyed aggregate.

    Output: (window_start_s, event_type, n_events, sum_value r2).
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    n_windows = width_s // slide_s

    def explode_windows(df: pd.DataFrame) -> pd.DataFrame:
        ts_s = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64) // 1_000_000
        last = (ts_s // slide_s) * slide_s  # latest window containing the event
        frames = []
        for i in range(n_windows):
            start = last - i * slide_s
            frames.append(
                pd.DataFrame(
                    {"window_start_s": start, "event_type": df["event_type"].to_numpy(),
                     "value": df["value"].to_numpy()}
                )
            )
        return pd.concat(frames, ignore_index=True)

    exploded = ev.map_batches(explode_windows, batch_format="pandas", batch_size=131072)
    final = grouped_agg(
        exploded, ["window_start_s", "event_type"],
        {"n_events": ("value", "size"), "sum_value": ("value", "sum")},
        n_buckets=n_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_series(df["sum_value"], 2)
        df["n_events"] = df["n_events"].astype("int64")
        return df[["window_start_s", "event_type", "n_events", "sum_value"]]

    return final.map_batches(finish, batch_format="pandas")
