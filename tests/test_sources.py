"""Source readers (S4/S5/S7) and the grounding-span stage."""

import os

import pytest

from deekseek_ocr___dockerized_api_ray.sources.readers import (
    glob_media_dir,
    parse_path_list,
    read_media_files,
    read_results,
)
from deekseek_ocr___dockerized_api_ray.stages.explode import explode
from deekseek_ocr___dockerized_api_ray.stages.grounding_spans import grounding_spans


def test_parse_path_list(tmp_path):
    f1 = tmp_path / "a.pdf"
    f1.write_bytes(b"x")
    lst = tmp_path / "list.txt"
    lst.write_text(f"# comment\n\n{f1}\n{tmp_path}/missing.pdf\n")
    assert parse_path_list(str(lst)) == [str(f1)]


def test_glob_media_dir(tmp_path):
    (tmp_path / "b.PNG").write_bytes(b"1")
    (tmp_path / "a.jpg").write_bytes(b"2")
    (tmp_path / "c.txt").write_bytes(b"3")
    got = glob_media_dir(str(tmp_path))
    assert [os.path.basename(p) for p in got] == ["a.jpg", "b.PNG"]


def test_read_media_files(ray_session, tmp_path):
    p1 = tmp_path / "x.png"
    p1.write_bytes(b"payload-1")
    p2 = tmp_path / "y.png"
    p2.write_bytes(b"payload-2")
    rows = read_media_files([str(p1), str(p2)]).take_all()
    got = {os.path.basename(r["path"]): bytes(r["payload"]) for r in rows}
    assert got == {"x.png": b"payload-1", "y.png": b"payload-2"}
    assert read_media_files([]).count() == 0


def test_read_results_roundtrip(ray_session, tmp_path):
    from deekseek_ocr___dockerized_api_ray.sources.corpus import corpus_dataset
    from deekseek_ocr___dockerized_api_ray.state.checkpoint import (
        run_extract_checkpointed,
    )

    cdir = tmp_path / "corpus"
    corpus_dataset(20, 42, parallelism=4).write_parquet(str(cdir))
    out = tmp_path / "out"
    run_extract_checkpointed(str(cdir), str(out), n_partitions=2)
    back = read_results(str(out))
    assert back.count() == 20
    assert "markdown" in back.schema().names


def test_grounding_spans(ray_session):
    from deekseek_ocr___dockerized_api_ray.sources.corpus import corpus_dataset
    from deekseek_ocr___dockerized_api_ray.stages.ocr import OCRStage

    flat = explode(corpus_dataset(40, 42))
    ocrd = flat.map_batches(
        OCRStage, fn_constructor_kwargs=dict(mode="markdown"),
        batch_format="pyarrow", batch_size=512, concurrency=2,
    )
    rows = grounding_spans(ocrd).take_all()
    assert rows, "corpus produced no grounding tags"
    labels = {r["label"] for r in rows}
    assert "image" in labels or any(r["is_image"] for r in rows)
    assert any(not r["is_image"] for r in rows)
    # degenerate boxes flagged, valid ones scaled into the 999 grid
    assert any(r["degenerate"] for r in rows)
    for r in rows:
        if not r["degenerate"]:
            assert 0 <= r["px1"] < r["px2"] <= 999
            assert 0 <= r["py1"] < r["py2"] <= 999
        else:
            assert r["px1"] == -1
    # deterministic: rerun equals
    rows2 = grounding_spans(
        explode(corpus_dataset(40, 42)).map_batches(
            OCRStage, fn_constructor_kwargs=dict(mode="markdown"),
            batch_format="pyarrow", batch_size=512, concurrency=2,
        )
    ).take_all()
    key = lambda r: (r["doc_id"], r["offset"], r["tag_index"], r["box_index"])
    assert sorted(map(key, rows)) == sorted(map(key, rows2))


def test_read_corpus_jsonl(ray_session, tmp_path):
    import json

    from deekseek_ocr___dockerized_api_ray.pipelines.extract import (
        reference_extract_document,
        run_extract,
    )
    from deekseek_ocr___dockerized_api_ray.sources.corpus import (
        generate_doc,
        read_corpus_jsonl,
    )

    docs = [generate_doc(i, 42) for i in range(8)]
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
        # a sparse row exercising the field defaults
        f.write(json.dumps({"doc_id": "sparse", "spans": [{"kind": "text", "text": "hi"}]}) + "\n")
    ds = read_corpus_jsonl(str(p))
    out = {r["doc_id"]: r for r in run_extract(ds).take_all()}
    assert len(out) == 9
    for d in docs:
        exp = reference_extract_document(d, "markdown")
        assert out[d["doc_id"]]["markdown"] == exp["markdown"]
    assert out["sparse"]["markdown"] == "hi"


def test_configure_context(ray_session):
    from ray.data import DataContext

    from deekseek_ocr___dockerized_api_ray.runtime import configure_context

    before = DataContext.get_current().target_max_block_size
    ctx = configure_context(wide_binary=True)
    assert ctx.target_max_block_size == 512 * 1024 * 1024
    ctx.target_max_block_size = before  # restore for other tests
    assert configure_context().execution_options.preserve_order is False


def test_list_results(tmp_path):
    import os
    import time

    from deekseek_ocr___dockerized_api_ray.sources.readers import list_results

    out = tmp_path / "out"
    out.mkdir()
    for i in range(5):
        d = out / f"part={i:04d}"
        d.mkdir()
        os.utime(d, (1000 + i, 1000 + i))
    (out / "part=9999.tmp").mkdir()  # in-flight: excluded
    got = list_results(str(out), limit=3)
    assert len(got) == 3
    assert [os.path.basename(p) for p, _ in got] == ["part=0004", "part=0003", "part=0002"]
