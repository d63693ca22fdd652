"""Driver-contract coverage inside pytest: entry(), queries() sweep at
sf0.001, oracle parity for SQL-expressible queries via DuckDB."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@needs_data
def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    rows = ds.take(5)
    assert len(rows) == 5
    assert {"doc_id", "spans", "markdown", "n_spans", "n_errors"} <= set(rows[0].keys())
    assert ds.count() > 0


@needs_data
def test_oracle_keys_subset_of_queries(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@needs_data
def test_all_queries_run_and_oracles_match(entrymod):
    import duckdb
    import pandas as pd

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    failures = []
    for name, fn in qs.items():
        try:
            res = fn(SF)
            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        except Exception as e:
            failures.append(f"{name}: raised {e}")
            continue
        if name not in oracles:
            continue
        sdf = con.execute(oracles[name]).df()
        if len(df) != len(sdf):
            failures.append(f"{name}: rows {len(df)} != {len(sdf)}")
            continue
        cols = sorted(df.columns)
        if cols != sorted(sdf.columns):
            failures.append(f"{name}: columns {cols} != {sorted(sdf.columns)}")
            continue
        a = df[cols].sort_values(cols).reset_index(drop=True).astype(str)
        b = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
        if not a.equals(b):
            failures.append(f"{name}: value mismatch")
    assert not failures, failures


@needs_data
def test_hll_vs_exact_reach(entrymod, ray_session):
    qs = entrymod.queries()
    exact = {r["event_type"]: r["n_users"] for r in qs["events_user_reach"](SF).take_all()}
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in qs["events_user_reach_hll"](SF).take_all()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) / max(1, v) < 0.05
