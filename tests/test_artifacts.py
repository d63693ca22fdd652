"""Artifact writers: crop ZIPs (W5), vector layout-overlay PDFs (W6/W7)
and stale-job cleanup (D2) -- determinism, structure, idempotency."""

import os
import sys
import zipfile

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deekseek_ocr___dockerized_api_ray.state.artifacts import (  # noqa: E402
    clear_stale_jobs,
    label_color,
    pdf_bytes_for,
    zip_bytes_for,
)

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_zip_bytes_deterministic_and_readable(tmp_path):
    members = [("b.jpg", b"bbb"), ("a.jpg", b"aaa")]
    z1 = zip_bytes_for(members)
    z2 = zip_bytes_for(list(reversed(members)))
    assert z1 == z2  # name-sorted, fixed timestamps -> byte-reproducible
    p = tmp_path / "x.zip"
    p.write_bytes(z1)
    with zipfile.ZipFile(p) as zf:
        assert zf.namelist() == ["a.jpg", "b.jpg"]
        assert zf.read("a.jpg") == b"aaa"
        assert all(i.date_time == (1980, 1, 1, 0, 0, 0) for i in zf.infolist())


def _boxes(labels, coords):
    return pd.DataFrame({
        "label": labels,
        "vx1": [c[0] for c in coords], "vy1": [c[1] for c in coords],
        "vx2": [c[2] for c in coords], "vy2": [c[3] for c in coords],
    })


def test_pdf_structure_and_determinism():
    pages = [(_boxes(["title", "text"], [(0, 0, 500, 100), (0, 200, 999, 900)]),
              999, 999),
             (_boxes(["image"], [(10, 10, 400, 400)]), 800, 600)]
    data = pdf_bytes_for(pages)
    assert data == pdf_bytes_for(pages)  # deterministic colors -> byte-equal
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert data.count(b" re S") == 3          # one stroked rect per box
    assert data.count(b"/Type /Page ") == 2
    assert b"/MediaBox [0 0 800 600]" in data
    assert b"(title) Tj" in data
    # title stroked at width 4, others at 2 (run_dpsk_ocr_pdf.py:193-199)
    assert b" 4 w " in data and b" 2 w " in data
    # xref offset in the trailer points at the xref table
    xref_at = int(data.split(b"startxref\n")[1].split(b"\n")[0])
    assert data[xref_at:xref_at + 4] == b"xref"
    # every xref entry points at the matching "i 0 obj" header
    lines = data[xref_at:].split(b"\n")
    n_objs = int(lines[1].split()[1]) - 1
    for i in range(1, n_objs + 1):
        off = int(lines[2 + i].split()[0])
        assert data[off:].startswith(f"{i} 0 obj".encode())


def test_label_color_ranges_match_reference_bounds():
    for lab in ("title", "text", "image", "table", "formula"):
        r, g, b = label_color(lab)
        assert 0 <= r < 200 and 0 <= g < 200 and 0 <= b < 255
    assert label_color("title") == label_color("title")
    assert label_color("title") != label_color("text")


@needs_data
def test_crops_zip_pipeline_members_match_links(ray_session, tmp_path):
    from deekseek_ocr___dockerized_api_ray.pipelines.extract import run_extract
    from deekseek_ocr___dockerized_api_ray.sources.corpus import (
        cached_corpus_path,
        read_corpus,
    )
    from deekseek_ocr___dockerized_api_ray.stages.crops import extract_crops
    from deekseek_ocr___dockerized_api_ray.state.artifacts import write_crops_zip

    corpus = read_corpus(cached_corpus_path(60, 42))
    crops = extract_crops(run_extract(corpus, mode="markdown"))
    out = str(tmp_path / "zips")
    lineage = write_crops_zip(crops, out).to_pandas()
    assert len(lineage) > 0
    crop_df = crops.to_pandas()
    for _, row in lineage.iterrows():
        with zipfile.ZipFile(row["zip_path"]) as zf:
            names = zf.namelist()
        expect = sorted(crop_df.loc[crop_df["doc_id"] == row["doc_id"],
                                    "filename"])
        assert names == expect
        assert row["n_members"] == len(expect)
    # idempotent: second run rewrites byte-identical zips
    sizes1 = {r["zip_path"]: os.path.getsize(r["zip_path"])
              for _, r in lineage.iterrows()}
    write_crops_zip(crops, out).to_pandas()
    assert sizes1 == {p: os.path.getsize(p) for p in sizes1}


@needs_data
def test_layout_pdf_pipeline(ray_session, tmp_path):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        write_layout_pdfs,
    )

    boxes = pd.DataFrame({
        "doc_id": ["d1"] * 3 + ["d2"],
        "offset": [0, 0, 1, 0],
        "tag_index": [0, 1, 0, 0],
        "box_index": [0, 0, 0, 0],
        "label": ["title", "text", "image", "table"],
        "media_ref": ["m0", "m0", "m1", "m2"],
        "degenerate": [False, False, False, True],
        "vx1": [0.0, 0.0, 10.0, 0.0], "vy1": [0.0, 200.0, 10.0, 0.0],
        "vx2": [500.0, 999.0, 400.0, 10.0],
        "vy2": [100.0, 900.0, 400.0, 10.0],
    })
    out = str(tmp_path / "pdfs")
    lineage = write_layout_pdfs(rd.from_pandas(boxes), out,
                                n_buckets=2).to_pandas()
    # d2's only box is degenerate -> no pdf (reference skips bad boxes)
    assert list(lineage["doc_id"]) == ["d1"]
    assert lineage.iloc[0]["n_pages"] == 2
    assert lineage.iloc[0]["n_boxes"] == 3
    data = open(lineage.iloc[0]["pdf_path"], "rb").read()
    assert data.startswith(b"%PDF-1.4") and data.count(b" re S") == 3


def test_clear_stale_jobs(tmp_path):
    root = tmp_path / "job"
    (root / "_manifest").mkdir(parents=True)
    (root / "_lineage").mkdir()
    (root / "part=0000").mkdir()
    (root / "part=0001").mkdir()
    (root / "_manifest" / "0000.json").write_text("{}")
    (root / "_manifest" / ".0002.tmp").write_text("")
    (root / "out.tmp").write_text("")
    res = clear_stale_jobs(str(root))
    # incomplete part=0001 removed, completed part=0000 + metadata kept
    assert [os.path.basename(d) for d in res["removed_dirs"]] == ["part=0001"]
    assert res["kept"] == 1
    assert (root / "part=0000").is_dir() and (root / "_lineage").is_dir()
    assert not (root / "_manifest" / ".0002.tmp").exists()
    assert not (root / "out.tmp").exists()
    # purge mode mirrors the reference's clear-everything sweep
    res2 = clear_stale_jobs(str(root), purge_completed=True)
    assert not (root / "part=0000").exists()
    assert not (root / "_manifest").exists()
    assert res2["kept"] == 0


GEO_PAYLOAD = """{'Line': {'line': ['(-10, -5) -- (10, -5)', '(0, 8) -- (-10, -5)', '(0, 8) -- (10, -5)'], 'line_type': ['-', '--', '-'], 'line_endpoint': ['A: (-10, -5)', 'B: (10, -5)', 'C: (0, 8)']}, 'Circle': {'circle_center': ['O: (0, 0)'], 'radius': [5]}}"""


def test_parse_geometry_matches_reference_split_semantics():
    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        parse_geometry,
    )

    geo = parse_geometry(GEO_PAYLOAD)
    # reference semantics: eval dict + ' -- ' / ': ' splits
    # (run_dpsk_ocr_image.py:273-312) -- replicate and compare
    d = eval(GEO_PAYLOAD)  # test-only: the reference's own parse
    ref_lines = [(eval(ln.split(" -- ")[0]), eval(ln.split(" -- ")[-1]), t)
                 for ln, t in zip(d["Line"]["line"], d["Line"]["line_type"])]
    assert [(tuple(map(float, a)), tuple(map(float, b)), s)
            for a, b, s in ref_lines] == geo["lines"]
    assert geo["endpoints"] == [("A", (-10.0, -5.0)), ("B", (10.0, -5.0)),
                                ("C", (0.0, 8.0))]
    assert geo["circles"] == [((0.0, 0.0), 5.0)]
    # non-geometry text passes through
    assert parse_geometry("# plain markdown") is None
    # malformed elements are skipped, not fatal (the reference's try/except)
    broken = GEO_PAYLOAD.replace("'(0, 8) -- (10, -5)'", "'junk'")
    assert len(parse_geometry(broken)["lines"]) == 2


def test_geometry_pdf_structure():
    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        geometry_pdf_bytes,
        parse_geometry,
    )

    data = geometry_pdf_bytes(parse_geometry(GEO_PAYLOAD))
    assert data == geometry_pdf_bytes(parse_geometry(GEO_PAYLOAD))
    assert data.startswith(b"%PDF-1.4")
    assert data.count(b" l S") == 3       # 3 line strokes
    assert data.count(b" c S") == 1       # 1 circle outline
    assert data.count(b" c f") == 6       # 2 endpoint dots per line
    assert b"[6 4] 0 d" in data           # dashed style honored
    for lab in (b"(A) Tj", b"(B) Tj", b"(C) Tj"):
        assert lab in data
    xref_at = int(data.split(b"startxref\n")[1].split(b"\n")[0])
    assert data[xref_at:xref_at + 4] == b"xref"


def test_replot_geometry_stage(ray_session, tmp_path):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        replot_geometry,
    )

    df = pd.DataFrame({
        "doc_id": ["g1", "g2"],
        "text": [GEO_PAYLOAD, "# not geometry"],
    })
    out = str(tmp_path / "geo")
    lineage = replot_geometry(rd.from_pandas(df), out).to_pandas()
    assert list(lineage["doc_id"]) == ["g1"]
    assert lineage.iloc[0]["n_lines"] == 3
    assert lineage.iloc[0]["n_circles"] == 1
    assert lineage.iloc[0]["n_endpoints"] == 3
    assert os.path.isfile(os.path.join(out, "g1_geo.pdf"))
    assert not os.path.isfile(os.path.join(out, "g2_geo.pdf"))


def test_save_upload_reference_layout_and_dedupe(tmp_path):
    import hashlib
    from datetime import datetime

    from deekseek_ocr___dockerized_api_ray.state.uploads import (
        cleanup_old_uploads,
        file_hash,
        save_upload,
    )

    src = tmp_path / "doc.pdf"
    src.write_bytes(b"pdf-ish payload")
    up = str(tmp_path / "uploads")
    now = datetime(2026, 8, 17, 12, 0, 0)
    dest = save_upload(str(src), up, now=now)
    # reference layout: {YYYYmmdd_HHMMSS}_{md5_12}_{name}
    h = hashlib.md5(b"pdf-ish payload").hexdigest()[:12]
    assert os.path.basename(dest) == f"20260817_120000_{h}_doc.pdf"
    assert file_hash(str(src)) == h
    # faithful mode duplicates (new timestamp); dedupe mode is idempotent
    d2 = save_upload(str(src), up, now=datetime(2026, 8, 17, 12, 0, 1))
    assert d2 != dest
    d3 = save_upload(str(src), up, dedupe=True)
    assert d3 in (dest, d2)
    assert len(os.listdir(up)) == 2
    # age-based cleanup (file_utils.py:192-214)
    old = os.path.join(up, "x_old")
    open(old, "w").write("o")
    os.utime(old, (0, 0))
    assert cleanup_old_uploads(up, max_age_days=7) == 1
    assert not os.path.exists(old)
    # missing source -> None, matching the reference's error contract
    assert save_upload(str(tmp_path / "nope.pdf"), up) is None


def test_ingest_uploads_idempotent(ray_session, tmp_path):
    from deekseek_ocr___dockerized_api_ray.state.uploads import ingest_uploads

    srcs = []
    for i in range(5):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * 100)
        srcs.append(str(p))
    up = str(tmp_path / "landing")
    lin1 = ingest_uploads(srcs, up).to_pandas()
    assert len(lin1) == 5 and lin1["n_bytes"].eq(100).all()
    lin2 = ingest_uploads(srcs, up).to_pandas()
    # dedupe: same dest paths, no extra files landed
    assert sorted(lin2["dest"]) == sorted(lin1["dest"])
    assert len(os.listdir(up)) == 5


def test_jsonl_shards_deterministic_and_complete(ray_session, tmp_path):
    """Two exports of the same corpus produce byte-identical shards;
    every doc lands in exactly one shard; files parse as JSON lines."""
    import json

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        export_jsonl_shards,
    )

    SF = "/root/testdata/sf0.001"
    a = (export_jsonl_shards(SF, n_shards=4, out_dir=str(tmp_path / "a"))
         .to_pandas().sort_values("shard").reset_index(drop=True))
    b = (export_jsonl_shards(SF, n_shards=4, out_dir=str(tmp_path / "b"))
         .to_pandas().sort_values("shard").reset_index(drop=True))
    assert a.equals(b)                       # incl. sha256 -> byte-identical
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert a["n_docs"].sum() == len(docs)
    first = json.loads(open(tmp_path / "a" / "shard_00000.jsonl").readline())
    assert set(first) == {"doc_id", "text", "lang"}


def test_jsonl_roundtrip(ray_session, tmp_path):
    """export -> read_jsonl_shards reproduces the documents rows."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.sources.readers import (
        read_jsonl_shards,
    )
    from deekseek_ocr___dockerized_api_ray.state.artifacts import (
        export_jsonl_shards,
    )

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    export_jsonl_shards(SF, n_shards=4, out_dir=out).materialize()
    back = (read_jsonl_shards(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = (pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "lang", "text"])
            .sort_values("doc_id").reset_index(drop=True))
    assert back[["doc_id", "lang", "text"]].equals(orig)
