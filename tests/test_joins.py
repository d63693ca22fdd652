"""checkpointed_join: Ray 2.49 chained-join bug repro + helper fix.

The minimal repro: attach the SAME (node, k) degree table to both
endpoints of an edge list. The second join's probe side still carries
the first join's ``k`` payload column -- same NAME as the build side's
payload -- and Ray 2.49's HashShuffleAggregator dies at finalize.
"""

import pandas as pd
import pytest
import ray
import ray.data as rd

from deekseek_ocr___dockerized_api_ray.stages.joins import checkpointed_join

EDGES = pd.DataFrame({"src": ["a", "b", "c", "a"],
                      "dst": ["b", "c", "a", "c"]})
DEG = pd.DataFrame({"node": ["a", "b", "c"], "k": [3, 2, 3]})


def test_raw_second_join_collides(ray_session):
    """Pin the Ray 2.49 bug this helper exists for. If this starts
    PASSING after a Ray upgrade, checkpointed_join can be retired."""
    edges = rd.from_pandas(EDGES)
    deg = rd.from_pandas(DEG)
    j1 = edges.join(deg, join_type="inner", on=("src",),
                    right_on=("node",), num_partitions=2)
    j2 = j1.join(deg, join_type="inner", on=("dst",),
                 right_on=("node",), num_partitions=2)
    with pytest.raises(Exception):
        j2.to_pandas()


def test_checkpointed_join_chain(ray_session):
    edges = rd.from_pandas(EDGES)
    deg = rd.from_pandas(DEG)
    j1 = checkpointed_join(edges, deg, on=("src",), right_on=("node",),
                           num_partitions=2,
                           left_cols=["src", "dst"],
                           right_cols=["node", "k"])
    j1 = j1.map_batches(
        lambda df: df.rename(columns={"k": "kx"})[["src", "dst", "kx"]],
        batch_format="pandas")
    j2 = checkpointed_join(j1, deg, on=("dst",), right_on=("node",),
                           num_partitions=2,
                           left_cols=["src", "dst", "kx"],
                           right_cols=["node", "k"])
    out = (j2.to_pandas().rename(columns={"k": "ky"})
           .sort_values(["src", "dst"]).reset_index(drop=True))
    expect = (EDGES.merge(DEG.rename(columns={"node": "src", "k": "kx"}),
                          on="src")
              .merge(DEG.rename(columns={"node": "dst", "k": "ky"}),
                     on="dst")
              .sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["src", "dst", "kx", "ky"]], expect[["src", "dst", "kx", "ky"]])


def test_checkpointed_join_suffix_collision(ray_session):
    """Colliding payload names get the suffix; the values line up."""
    left = rd.from_pandas(pd.DataFrame({"id": [1, 2], "val": [10, 20]}))
    right = rd.from_pandas(pd.DataFrame({"id": [1, 2], "val": [7, 8]}))
    out = checkpointed_join(left, right, on=("id",), num_partitions=2,
                            left_cols=["id", "val"],
                            right_cols=["id", "val"]).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out["val"]) == [10, 20]
    assert list(out["val_r"]) == [7, 8]


def test_next_purchase_asof_matches_brute_force(ray_session):
    import os

    import numpy as np
    import pandas as pd
    import pytest

    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_next_purchase_asof,
    )

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("driver testdata absent")
    got = events_next_purchase_asof(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    pur = ev[ev["event_type"] == "purchase"]
    exp = {}
    for _, r in ev.iterrows():
        mine = pur[(pur["user_id"] == r["user_id"]) & (pur["ts"] > r["ts"])]
        if mine.empty:
            continue
        nxt = mine.sort_values(["ts", "event_id"]).iloc[0]
        exp[int(r["event_id"])] = (int(nxt["event_id"]),
                                   int(pd.Timestamp(nxt["ts"]).timestamp())
                                   - int(pd.Timestamp(r["ts"]).timestamp()))
    assert dict(zip(got["event_id"],
                    zip(got["purchase_event_id"], got["wait_s"]))) == exp
    assert (got["wait_s"] >= 0).all()
    # strictness: a purchase event never matches itself
    merged = got.merge(ev[["event_id", "event_type"]], on="event_id")
    pp = merged[merged["event_type"] == "purchase"]
    assert (pp["purchase_event_id"] != pp["event_id"]).all()
