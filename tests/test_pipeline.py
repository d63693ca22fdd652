"""End-to-end flagship pipeline conformance (span-sequence equality).

The invariant (BASELINE.json input_hint): per document, the engine's
output spans must equal the reference-semantics oracle under
(kind, text, media_ref, order), order = sorted offset. The oracle is
the straight-line reference_extract_document, computed single-process.
"""

import pytest

from deekseek_ocr___dockerized_api_ray.pipelines.extract import (
    expected_table,
    reference_extract_document,
    run_extract,
)
from deekseek_ocr___dockerized_api_ray.sources.corpus import (
    corpus_dataset,
    generate_doc,
    generate_documents,
)

N_DOCS = 120
SEED = 42


def _span_tuples(spans):
    # order = sorted offset; compare (kind, text, media_ref, offset)
    return [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in sorted(spans, key=lambda s: s["offset"])
    ]


@pytest.fixture(scope="module")
def extracted(ray_session):
    ds = run_extract(corpus_dataset(N_DOCS, SEED), mode="markdown")
    rows = {r["doc_id"]: r for r in ds.take_all()}
    assert len(rows) == N_DOCS
    return rows


def test_span_sequence_equality(extracted):
    for i in range(N_DOCS):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown")
        got = extracted[doc["doc_id"]]
        assert _span_tuples(got["spans"]) == _span_tuples(exp["spans"]), doc["doc_id"]


def test_markdown_equality(extracted):
    for i in range(N_DOCS):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown")
        got = extracted[doc["doc_id"]]
        assert got["markdown"] == exp["markdown"], doc["doc_id"]
        assert got["n_spans"] == exp["n_spans"]
        assert got["n_errors"] == exp["n_errors"]


def test_offsets_dense_and_ordered(extracted):
    for r in extracted.values():
        offs = [s["offset"] for s in sorted(r["spans"], key=lambda s: s["offset"])]
        assert offs == list(range(len(offs)))


def test_custom_mode_is_raw(ray_session):
    # custom => raw output, no cleaning (pdf_to_markdown_cli.py:354-360)
    ds = run_extract(corpus_dataset(20, SEED), mode="custom")
    rows = {r["doc_id"]: r for r in ds.take_all()}
    for i in range(20):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "custom")
        assert rows[doc["doc_id"]]["markdown"] == exp["markdown"]
    # raw output retains the page-split markers for multi-span docs
    multi = [r for r in rows.values() if r["n_spans"] > 1]
    assert any("<--- Page Split --->" in r["markdown"] for r in multi)


def test_error_row_semantics_m15(ray_session):
    # poison two media refs: the span text must become the reference's
    # inline error string and the job must complete (start_server.py:464-466)
    docs = [generate_doc(i, SEED) for i in range(30)]
    refs = [s["media_ref"] for d in docs for s in d["spans"] if s["media_ref"]]
    fail = {refs[0], refs[5]}
    ds = run_extract(corpus_dataset(30, SEED), mode="markdown", fail_refs=fail)
    rows = {r["doc_id"]: r for r in ds.take_all()}
    assert len(rows) == 30
    n_err = sum(r["n_errors"] for r in rows.values())
    assert n_err == 2
    for d in docs:
        exp = reference_extract_document(d, "markdown", fail_refs=fail)
        got = rows[d["doc_id"]]
        assert _span_tuples(got["spans"]) == _span_tuples(exp["spans"])


def test_parallelism_invariance(ray_session):
    # same corpus through 1 block vs many blocks -> identical rows
    a = run_extract(corpus_dataset(40, SEED, parallelism=1), mode="markdown").take_all()
    b = run_extract(corpus_dataset(40, SEED, parallelism=16), mode="markdown").take_all()
    ka = {r["doc_id"]: (tuple(_span_tuples(r["spans"])), r["markdown"]) for r in a}
    kb = {r["doc_id"]: (tuple(_span_tuples(r["spans"])), r["markdown"]) for r in b}
    assert ka == kb


def test_strategies_agree(ray_session):
    # fused (no shuffle), exploded (bucketed reassembly) and the per-doc
    # map_groups baseline must produce identical documents
    from deekseek_ocr___dockerized_api_ray.pipelines.extract import (
        run_extract_per_doc_groups,
    )

    def key(rows):
        return {
            r["doc_id"]: (tuple(_span_tuples(r["spans"])), r["markdown"],
                          r["n_spans"], r["n_errors"])
            for r in rows
        }

    fused = key(run_extract(corpus_dataset(60, SEED), strategy="fused").take_all())
    exploded = key(
        run_extract(corpus_dataset(60, SEED), strategy="exploded",
                    reassemble_buckets=7).take_all()
    )
    baseline = key(run_extract_per_doc_groups(corpus_dataset(60, SEED)).take_all())
    assert fused == exploded == baseline
    assert len(fused) == 60


def test_exploded_strategy_matches_oracle(ray_session):
    rows = run_extract(corpus_dataset(25, SEED), strategy="exploded").take_all()
    got = {r["doc_id"]: r for r in rows}
    for i in range(25):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown")
        assert _span_tuples(got[doc["doc_id"]]["spans"]) == _span_tuples(exp["spans"])
        assert got[doc["doc_id"]]["markdown"] == exp["markdown"]


def test_expected_table_matches_generator():
    t = expected_table(10, SEED)
    assert t.num_rows == 10
    assert t.column("doc_id").to_pylist()[0] == "doc-000000"


def test_generate_documents_deterministic():
    t1 = generate_documents(15, SEED)
    t2 = generate_documents(15, SEED)
    assert t1.equals(t2)
    # shuffled span order: at least one doc stores spans out of offset order
    assert any(
        [s["offset"] for s in spans] != sorted(s["offset"] for s in spans)
        for spans in t1.column("spans").to_pylist()
    )


def test_spill_exchange_reassembly(ray_session, tmp_path):
    # the disk-based partitioned exchange must agree with the sort-shuffle
    # reassembly and the fused path exactly
    spill = str(tmp_path / "spill")
    a = run_extract(corpus_dataset(50, SEED), strategy="exploded",
                    spill_dir=spill, reassemble_buckets=9).take_all()
    b = run_extract(corpus_dataset(50, SEED), strategy="fused").take_all()
    ka = {r["doc_id"]: (tuple(_span_tuples(r["spans"])), r["markdown"]) for r in a}
    kb = {r["doc_id"]: (tuple(_span_tuples(r["spans"])), r["markdown"]) for r in b}
    assert ka == kb
    assert len(ka) == 50
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(spill))


def test_spill_exchange_dirty_dir_safe(ray_session, tmp_path):
    # rerunning with the same spill dir must NOT mix stale and new files
    spill = str(tmp_path / "spill2")
    a = run_extract(corpus_dataset(20, SEED), strategy="exploded",
                    spill_dir=spill, reassemble_buckets=4).take_all()
    b = run_extract(corpus_dataset(20, SEED), strategy="exploded",
                    spill_dir=spill, reassemble_buckets=4).take_all()
    ka = {r["doc_id"]: (r["n_spans"], r["markdown"]) for r in a}
    kb = {r["doc_id"]: (r["n_spans"], r["markdown"]) for r in b}
    assert ka == kb


def test_asof_join_interleaved(ray_session, tmp_path):
    """As-of semantics on genuinely interleaved times: each event picks
    the greatest order date <= its ts, ties on date -> min orderkey,
    events before any order are dropped (inner as-of)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_last_order_asof,
    )

    ts = lambda s: pd.Timestamp(s)
    events = pa.Table.from_pylist([
        {"event_id": 1, "user_id": 7, "ts": ts("2024-01-01 10:00"), "event_type": "x", "value": 1.0},
        {"event_id": 2, "user_id": 7, "ts": ts("2024-01-03 10:00"), "event_type": "x", "value": 1.0},
        {"event_id": 3, "user_id": 7, "ts": ts("2024-01-05 10:00"), "event_type": "x", "value": 1.0},
        {"event_id": 4, "user_id": 8, "ts": ts("2024-01-02 00:00"), "event_type": "x", "value": 1.0},  # before any order
        {"event_id": 5, "user_id": 9, "ts": ts("2024-01-02 00:00"), "event_type": "x", "value": 1.0},  # user with no orders
    ])
    orders = pa.Table.from_pylist([
        {"o_orderkey": 100, "o_custkey": 7, "o_orderdate": ts("2024-01-02 00:00")},
        {"o_orderkey": 101, "o_custkey": 7, "o_orderdate": ts("2024-01-04 00:00")},
        {"o_orderkey": 102, "o_custkey": 7, "o_orderdate": ts("2024-01-04 00:00")},  # tie -> min 101
        {"o_orderkey": 103, "o_custkey": 8, "o_orderdate": ts("2024-01-03 00:00")},
    ])
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))

    got = {r["event_id"]: r["last_orderkey"]
           for r in events_last_order_asof(str(tmp_path)).take_all()}
    assert got == {2: 100, 3: 101}


def test_range_join_followups(ray_session, tmp_path):
    """Range self-join: strictly-later same-user events within the window;
    boundary at exactly +window included, equal-ts excluded."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_followups_range,
    )

    ts = lambda s: pd.Timestamp(s)
    events = pa.Table.from_pylist([
        {"event_id": 1, "user_id": 7, "ts": ts("2024-01-01 00:00:00")},
        {"event_id": 2, "user_id": 7, "ts": ts("2024-01-01 00:00:00")},  # equal ts: no pair either way
        {"event_id": 3, "user_id": 7, "ts": ts("2024-01-01 01:00:00")},
        {"event_id": 4, "user_id": 7, "ts": ts("2024-01-02 00:00:00")},  # exactly +1d from 1/2: included
        {"event_id": 5, "user_id": 7, "ts": ts("2024-01-03 00:00:01")},  # beyond every window
        {"event_id": 6, "user_id": 8, "ts": ts("2024-01-01 00:30:00")},  # other user
    ])
    pq.write_table(events, str(tmp_path / "events.parquet"))
    got = sorted((r["event_id_a"], r["event_id_b"])
                 for r in events_followups_range(str(tmp_path), window_s=86400).take_all())
    assert got == [(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def test_pack_sequences(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.packing import pack_sequences

    docs = rd.from_items([
        {"doc_id": f"d{i:02d}", "text": " ".join(["w"] * n)}
        for i, n in enumerate([100, 200, 700, 900, 5000, 50, 60])
    ])
    rows = pack_sequences(docs, max_tokens=1000, n_shards=1).take_all()
    by_doc = {r["doc_id"]: r for r in rows}
    # deterministic doc_id order: d00(100)+d01(200)+d02(700) fill bin 0;
    # d03(900) bin 1; d04(5000) oversize own bin; d05+d06 next bin
    assert by_doc["d00"]["bin_id"] == by_doc["d01"]["bin_id"] == by_doc["d02"]["bin_id"]
    assert by_doc["d03"]["bin_id"] != by_doc["d00"]["bin_id"]
    assert by_doc["d04"]["oversize"] and sum(
        1 for r in rows if r["bin_id"] == by_doc["d04"]["bin_id"]) == 1
    assert by_doc["d05"]["bin_id"] == by_doc["d06"]["bin_id"]
    # no bin over budget (except oversize singletons)
    fills = {}
    for r in rows:
        if not r["oversize"]:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= 1000 for v in fills.values())
    # determinism across runs and shard counts partitioning
    again = pack_sequences(docs, max_tokens=1000, n_shards=1).take_all()
    assert sorted(map(tuple, (r.values() for r in rows))) == sorted(
        map(tuple, (r.values() for r in again)))
