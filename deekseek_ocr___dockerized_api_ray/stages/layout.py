"""PDF layout parsing into reading-order blocks: recursive XY-cut
(Nagy & Seth's projection-profile page segmentation) over the grounding
box table, as a Ray Data stage.

A page's layout boxes are recursively split at the widest gaps of the
vertical projection (horizontal cuts, top-to-bottom bands) and, within a
band, of the horizontal projection (vertical cuts, left-to-right
columns). Leaves are ordered (y1, x1, tag_index, box_index) -- a
deterministic total order. This reproduces standard Manhattan-layout
reading order: full-width header first, then each column top-to-bottom,
then the footer.

Ray shape: the box table is bucketed by doc-id hash in ONE keyed
shuffle; each reduce call runs the pure-python recursion per document
(box counts per page are tens, never corpus-scale). No driver
materialization.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd


def _widest_split(lo: np.ndarray, hi: np.ndarray):
    """(gap_width, before_idx, after_idx): the single widest whitespace
    gap in the merged interval projection, with the interval indices on
    each side. gap_width 0 means the projection is unbroken."""
    order = np.lexsort((hi, lo))
    best, best_pos = 0.0, -1
    reach = hi[order[0]]
    for pos in range(1, len(order)):
        i = order[pos]
        if lo[i] - reach > best:
            best, best_pos = float(lo[i] - reach), pos
        reach = max(reach, hi[i])
    if best_pos < 0:
        return 0.0, order, order[:0]
    return best, order[:best_pos], order[best_pos:]


def xy_cut_order(x1, y1, x2, y2, tie1=None, tie2=None,
                 min_gap: float = 0.0) -> np.ndarray:
    """Reading ranks (0..n-1) for one page's boxes via recursive XY-cut.

    Ties inside an atomic (uncuttable) region are broken by
    (y1, x1, tie1, tie2) so the order is total and deterministic.
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    n = len(x1)
    tie1 = np.zeros(n) if tie1 is None else np.asarray(tie1)
    tie2 = np.zeros(n) if tie2 is None else np.asarray(tie2)

    def rec(idx: np.ndarray) -> List[int]:
        if len(idx) <= 1:
            return list(idx)
        # ONE cut at the widest whitespace gap across both axes
        # (horizontal band cut on ties), then recurse on each side --
        # the widest-gap XY-cut variant: full-width header/footer bands
        # peel off first, yet two-column bodies stay column-major
        # because the inter-column gutter out-widens the line gaps
        gy, y_a, y_b = _widest_split(y1[idx], y2[idx])
        gx, x_a, x_b = _widest_split(x1[idx], x2[idx])
        if max(gx, gy) > min_gap:
            a, b = (y_a, y_b) if gy >= gx else (x_a, x_b)
            return rec(idx[a]) + rec(idx[b])
        order = np.lexsort((tie2[idx], tie1[idx], x1[idx], y1[idx]))
        return list(idx[order])

    seq = rec(np.arange(n, dtype=np.int64))
    ranks = np.empty(n, dtype=np.int64)
    ranks[np.asarray(seq, dtype=np.int64)] = np.arange(n, dtype=np.int64)
    return ranks


def add_reading_order(boxes, n_buckets: int = 64, min_gap: float = 0.0):
    """Grounding-box Dataset -> same rows + ``reading_rank`` within each
    page (doc_id, offset) group.

    Degenerate boxes (x1>=x2 or y1>=y2) are excluded from the geometry
    and ranked after all real boxes, in (tag_index, box_index) order.
    """
    from ..functions.text_stats import sha1_64

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["bucket"] = [sha1_64(v) % n_buckets for v in df["doc_id"]]
        return df

    def order_docs(df: pd.DataFrame) -> pd.DataFrame:
        # Pages average ~1-2 boxes, so per-page pandas groups are pure
        # overhead (~0.7 ms/page measured). Instead: one bucket-wide
        # sort puts every page's boxes in (real-first, tag, box) order,
        # numpy segment math assigns the base within-page rank (which
        # is already FINAL for <=1-real-box pages and for the
        # degenerate tail), and the python XY-cut recursion runs ONLY
        # on the real-box prefix of pages with >= 2 real boxes.
        df = (df.drop(columns=["bucket"])
              .sort_values(["doc_id", "offset", "degenerate",
                            "tag_index", "box_index"], kind="mergesort")
              .reset_index(drop=True))
        n = len(df)
        if n == 0:
            df["reading_rank"] = np.empty(0, dtype=np.int64)
            return df
        doc = df["doc_id"].to_numpy()
        off = df["offset"].to_numpy()
        new_page = np.empty(n, dtype=bool)
        new_page[0] = True
        new_page[1:] = (doc[1:] != doc[:-1]) | (off[1:] != off[:-1])
        page_start = np.flatnonzero(new_page)
        page_len = np.diff(np.append(page_start, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(page_start, page_len)
        real = ~df["degenerate"].to_numpy()
        n_real = np.add.reduceat(real.astype(np.int64), page_start)
        x1 = df["vx1"].to_numpy(dtype=np.float64)
        y1 = df["vy1"].to_numpy(dtype=np.float64)
        x2 = df["vx2"].to_numpy(dtype=np.float64)
        y2 = df["vy2"].to_numpy(dtype=np.float64)
        t1 = df["tag_index"].to_numpy()
        t2 = df["box_index"].to_numpy()
        multi = n_real >= 2
        for s, nr in zip(page_start[multi], n_real[multi]):
            sl = slice(s, s + nr)
            rank[sl] = xy_cut_order(x1[sl], y1[sl], x2[sl], y2[sl],
                                    tie1=t1[sl], tie2=t2[sl],
                                    min_gap=min_gap)
        df["reading_rank"] = rank
        return df

    return (boxes.map_batches(bucket, batch_format="pandas", batch_size=65536)
            .groupby("bucket").map_groups(order_docs, batch_format="pandas"))
