"""Multimodal plumbing: decode stub, tiling plan, frame sampling."""

import pyarrow as pa
import pytest

from deekseek_ocr___dockerized_api_ray.functions.tiling import image_token_count, tile_grid
from deekseek_ocr___dockerized_api_ray.sources.corpus import (
    fixture_media_dims,
    generate_documents,
    media_row,
    media_table_for_docs,
)
from deekseek_ocr___dockerized_api_ray.stages.multimodal import (
    FrameSampleStage,
    MediaDecodeStage,
    decode_media,
    tiling_plan,
)


def test_media_row_deterministic():
    r1 = media_row("media://doc-000001/0", "image")
    r2 = media_row("media://doc-000001/0", "image")
    assert r1 == r2
    assert r1["payload"].startswith(b"FAKEPNG0")
    assert (r1["width"], r1["height"]) == fixture_media_dims("media://doc-000001/0")


def test_decode_stub_parses_dims():
    stage = MediaDecodeStage()
    rows = [media_row(f"media://d/{i}", "image") for i in range(5)]
    batch = pa.Table.from_pylist(rows)
    out = stage(batch)
    assert "payload" not in out.column_names
    for w, dw in zip(out.column("width").to_pylist(), out.column("dec_width").to_pylist()):
        assert w == dw
    for m in out.column("mean_byte").to_pylist():
        assert 0.0 <= m <= 255.0


def test_decode_rejects_unknown_payload_without_pil():
    stage = MediaDecodeStage()
    if stage.pil is not None:
        pytest.skip("PIL present; real decode path applies")
    batch = pa.Table.from_pylist(
        [{"media_ref": "x", "kind": "image", "width": 1, "height": 1,
          "payload": b"\x89PNG not really"}]
    )
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_tiling_plan_pipeline(ray_session):
    import ray.data as rd

    docs = generate_documents(40, 42)
    media = media_table_for_docs(docs)
    out = tiling_plan(decode_media(rd.from_arrow(media))).take_all()
    assert len(out) == media.num_rows
    for r in out:
        assert (r["tiles_w"], r["tiles_h"]) == tile_grid(r["width"], r["height"])
        assert r["n_image_tokens"] == image_token_count(r["width"], r["height"])
        assert r["n_tiles"] == r["tiles_w"] * r["tiles_h"]


def test_frame_sampling():
    stage = FrameSampleStage(stride=10, max_frames=4)
    batch = pa.Table.from_pylist([{"n_frames": 55}, {"n_frames": 5}, {"n_frames": 0}])
    out = stage(batch).column("frame_indices").to_pylist()
    assert out[0] == [0, 10, 20, 30]
    assert out[1] == [0]
    assert out[2] == []


def test_pdf_chain_dims_consistent(ray_session):
    """S2->A4 chain: rasterized page dims = fixture dims x zoom, and the
    token plan over them equals the direct computation."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.functions.preprocess import image_token_run
    from deekseek_ocr___dockerized_api_ray.sources.corpus import (
        fixture_media_dims,
        generate_documents,
        pdf_table_for_docs,
    )
    from deekseek_ocr___dockerized_api_ray.stages.multimodal import (
        preprocess_plan,
        rasterize_pdfs,
    )

    docs = generate_documents(30, 42)
    pdfs = rd.from_arrow(pdf_table_for_docs(docs))
    rows = preprocess_plan(rasterize_pdfs(pdfs, dpi=144)).take_all()
    assert rows
    media_by_doc = {}
    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        media_by_doc[doc_id] = [fixture_media_dims(s["media_ref"]) for s in
                                sorted(spans, key=lambda s: s["offset"])
                                if s["media_ref"]]
    for r in rows:
        w72, h72 = media_by_doc[r["media_ref"]][r["page"]]
        assert (r["width"], r["height"]) == (w72 * 2, h72 * 2)  # zoom 144/72
        assert r["n_seq_tokens"] == image_token_run(r["width"], r["height"])
