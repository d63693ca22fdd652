"""Mode/options coverage: MAX_PAGES (O1), extract-images (M6), batch-script
path with SKIP_REPEAT (O4, W3), config knobs (S2/S6, section 2.11)."""

import pytest

from deekseek_ocr___dockerized_api_ray.config import (
    EngineConfig,
    effective_dpi,
    load_prompt_config,
    max_pages,
    raster_zoom,
)
from deekseek_ocr___dockerized_api_ray.pipelines.extract import (
    batch_script_document,
    reference_extract_document,
    run_extract,
    run_extract_batch_script,
)
from deekseek_ocr___dockerized_api_ray.sources.corpus import corpus_dataset, generate_doc

SEED = 42


def test_effective_dpi_clamp():
    # start_server.py:385-391: env used only if 0 < v <= 300
    assert effective_dpi("", 144) == 144
    assert effective_dpi("96", 144) == 96
    assert effective_dpi("300", 144) == 300
    assert effective_dpi("301", 144) == 144
    assert effective_dpi("0", 144) == 144
    assert effective_dpi("-5", 144) == 144
    assert effective_dpi("abc", 144) == 144
    assert raster_zoom(144) == 2.0


def test_max_pages_env():
    assert max_pages("") == 0
    assert max_pages("5") == 5
    assert max_pages("junk") == 0


def test_load_prompt_config(tmp_path):
    p = tmp_path / "prompt.yaml"
    p.write_text("prompt: |\n  <image>\n  Custom extraction task.\n")
    got = load_prompt_config(str(p))
    assert got is not None and "Custom extraction task." in got
    # non-mapping / missing key / unreadable -> None (Lib/file_utils.py:164-190)
    p2 = tmp_path / "bad.yaml"
    p2.write_text("- just\n- a list\n")
    assert load_prompt_config(str(p2)) is None
    p3 = tmp_path / "empty.yaml"
    p3.write_text("prompt: ''\n")
    assert load_prompt_config(str(p3)) is None
    assert load_prompt_config(str(tmp_path / "missing.yaml")) is None


def test_engine_config_prompts():
    assert "grounding" in EngineConfig(mode="markdown").resolved_prompt()
    assert EngineConfig(mode="ocr").resolved_prompt() == "<image>\nFree OCR."
    assert EngineConfig(mode="custom", prompt="<image>\nDo X.").resolved_prompt() == "<image>\nDo X."


def test_max_pages_truncation(ray_session):
    rows = run_extract(corpus_dataset(30, SEED), mode="markdown", max_pages=3).take_all()
    got = {r["doc_id"]: r for r in rows}
    for i in range(30):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown", max_pages=3)
        g = got[doc["doc_id"]]
        assert g["n_spans"] == exp["n_spans"] <= 3
        assert g["markdown"] == exp["markdown"]
    # exploded strategy agrees
    rows_e = run_extract(corpus_dataset(12, SEED), mode="markdown", max_pages=3,
                         strategy="exploded").take_all()
    got_e = {r["doc_id"]: r["markdown"] for r in rows_e}
    for i in range(12):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown", max_pages=3)
        assert got_e[doc["doc_id"]] == exp["markdown"]


def test_extract_images_mode(ray_session):
    rows = run_extract(corpus_dataset(40, SEED), mode="markdown",
                       extract_images=True).take_all()
    got = {r["doc_id"]: r["markdown"] for r in rows}
    any_link = False
    for i in range(40):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown", extract_images=True)
        assert got[doc["doc_id"]] == exp["markdown"], doc["doc_id"]
        if "![Extracted Image](images/" in exp["markdown"]:
            any_link = True
    assert any_link, "corpus produced no image links -- fixture too weak"


def test_batch_script_path(ray_session):
    rows = run_extract_batch_script(corpus_dataset(40, SEED)).take_all()
    got = {r["doc_id"]: r for r in rows}
    dropped_total = 0
    for i in range(40):
        doc = generate_doc(i, SEED)
        exp = batch_script_document(doc)
        g = got[doc["doc_id"]]
        assert g["raw_text"] == exp["raw_text"]
        assert g["clean_text"] == exp["clean_text"]
        assert g["n_kept"] == exp["n_kept"]
        assert g["n_dropped"] == exp["n_dropped"]
        dropped_total += exp["n_dropped"]
    # SKIP_REPEAT must actually fire somewhere in 40 docs (~5% of media)
    assert dropped_total > 0
    # batch-script cleaned text has the page-split markers and links format
    sample = next(r for r in got.values() if r["n_kept"] > 1)
    assert "<--- Page Split --->" in sample["clean_text"]


def test_batch_script_skip_repeat_off(ray_session):
    rows = run_extract_batch_script(corpus_dataset(15, SEED), skip_repeat=False).take_all()
    for r in rows:
        assert r["n_dropped"] == 0
    exp = batch_script_document(generate_doc(3, SEED), skip_repeat=False)
    got = next(r for r in rows if r["doc_id"] == exp["doc_id"])
    assert got["raw_text"] == exp["raw_text"]


def test_eval_batch_path(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.extract import (
        eval_document_rows,
        run_extract_eval,
    )

    rows = run_extract_eval(corpus_dataset(25, SEED)).take_all()
    got = {(r["doc_id"], r["offset"]): r for r in rows}
    n_expected = 0
    for i in range(25):
        doc = generate_doc(i, SEED)
        for exp in eval_document_rows(doc):
            g = got[(exp["doc_id"], exp["offset"])]
            assert g["raw_text"] == exp["raw_text"]
            assert g["clean_text"] == exp["clean_text"]
            n_expected += 1
    assert len(rows) == n_expected
    # raw keeps the model EOS token (no strip on the eval path)
    from deekseek_ocr___dockerized_api_ray.functions.cleaning import EOS_MODEL

    assert any(EOS_MODEL in r["raw_text"] for r in rows)
