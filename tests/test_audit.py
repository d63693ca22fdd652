"""Data-quality audit: the keys-only anti-join / dup-PK kernels must
COUNT planted violations correctly (clean driver data yields zeros, so
the sweep alone would not catch a kernel that always returns 0)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_anti_join_counts_planted_orphans(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.audit import anti_join_count

    child = rd.from_pandas(pd.DataFrame(
        {"fk": [1, 1, 2, 3, 5, 5, 5, 9]}))          # 5,5,5,9 are orphans
    parent = rd.from_pandas(pd.DataFrame({"pk": [1, 2, 3, 4, 4]}))
    assert anti_join_count(child, "fk", parent, "pk", n_buckets=4) == 4

    clean = rd.from_pandas(pd.DataFrame({"fk": [1, 2, 3]}))
    parent2 = rd.from_pandas(pd.DataFrame({"pk": [1, 2, 3]}))
    assert anti_join_count(clean, "fk", parent2, "pk", n_buckets=4) == 0


def test_dup_pk_and_predicate_counts(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.audit import (
        dup_pk_count,
        predicate_count,
    )

    ds = rd.from_pandas(pd.DataFrame({"pk": [1, 1, 1, 2, 3, 3]}))
    assert dup_pk_count(ds, "pk", n_buckets=4) == 3

    vals = rd.from_pandas(pd.DataFrame({"v": [1.0, 10.0, 99.0, 100.5]}))
    assert predicate_count(vals, lambda df: df["v"].to_numpy() > 50) == 2


@needs_data
def test_audit_report_shape(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.audit import data_quality_audit

    df = data_quality_audit(SF)
    assert list(df.columns) == ["check_name", "n_violations"]
    assert len(df) == 7
    assert (df["check_name"].sort_values().to_numpy() == df["check_name"].to_numpy()).all()
    by = dict(zip(df["check_name"], df["n_violations"]))
    # structural checks are clean on driver data; range rules counted
    # exactly (expected values recomputed directly from the parquet)
    assert by["fk_orders_customer"] == 0
    assert by["pk_dup_orders"] == 0
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"])
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    assert by["range_lineitem_quantity_gt45"] == int((li["l_quantity"] > 45).sum()) > 0
    assert by["range_events_value_gt400"] == int((ev["value"] > 400).sum())


def test_no_unannotated_driver_materializations():
    """Guardrail (VERDICT r2 #8): every driver-side take_all / to_pandas
    / iter_rows in the package must state its size bound in a `bound:`
    comment -- an unbounded materialization cannot land silently."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "audit_materialize",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "audit_materialize.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.audit() == []


def test_audit_catches_phantom_gate(tmp_path):
    """Guardrail-of-the-guardrail (VERDICT r3 #3): a `bound:` comment
    claiming 'gated at <param>' where no enclosing condition tests the
    parameter must FAIL the audit (two rounds shipped exactly that);
    a real gate and a `bound-static:` grain must pass."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "audit_materialize",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "audit_materialize.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fixture = tmp_path / "pkg"
    fixture.mkdir()
    (fixture / "phantom.py").write_text(
        "def phantom(ds, broadcast_edges=2_000_000):\n"
        "    # bound: gated at broadcast_edges distinct edges\n"
        "    edges = ds.to_pandas()\n"
        "    return len(edges)\n")
    (fixture / "real.py").write_text(
        "def real(ds, broadcast_edges=2_000_000):\n"
        "    n = ds.count()\n"
        "    if n <= broadcast_edges:\n"
        "        # bound: gated at broadcast_edges distinct edges\n"
        "        return ds.to_pandas()\n"
        "    return ds\n"
        "\n"
        "def static_grain(ds):\n"
        "    # bound-static: 24 hour-of-day rows\n"
        "    return ds.to_pandas()\n")

    got = mod.audit(str(fixture))
    assert len(got) == 1, got
    assert "phantom.py:3" in got[0] and "phantom bound" in got[0]
    assert "broadcast_edges" in got[0]
