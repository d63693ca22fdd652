"""W4 crop output: plan parity with the reference + Ray pipeline."""

import os
import struct

from deekseek_ocr___dockerized_api_ray.functions.cleaning import (
    clean_content,
    join_pages,
    match_tags,
    rewrite_image_tags_with_crops,
)
from deekseek_ocr___dockerized_api_ray.sources.corpus import fixture_media_dims


def test_crop_specs_match_links():
    # every emitted CropSpec's filename appears (urlquoted) in the text
    content = (
        "a<|ref|>image<|/ref|><|det|>[[100, 100, 400, 300]]<|/det|>b"
        "<|ref|>image<|/ref|><|det|>[[9, 9, 1, 1]]<|/det|>c"     # degenerate
        "<|ref|>image<|/ref|><|det|>bad<|/det|>d"                 # parse fail
        "<|ref|>image<|/ref|><|det|>[[50, 50, 900, 900]]<|/det|>"
    )
    dims = [(850, 1100), (425, 550)]
    _, imgs, _ = match_tags(content)
    out, crops = rewrite_image_tags_with_crops(
        content, imgs, dims, lambda i: f"d_img{i}.jpg"
    )
    assert [c.filename for c in crops] == ["d_img0.jpg", "d_img1.jpg"]
    for c in crops:
        assert f"(images/{c.filename})" in out
        assert c.x2 > c.x1 and c.y2 > c.y1
    # modulo page pairing: tag 0 -> page 0, tag 3 -> page 3 % 2 = 1
    assert crops[0].page_index == 0
    assert crops[1].page_index == 3 % 2
    w, h = dims[1]
    assert crops[1] == crops[1]._replace(
        x1=int(50 / 999 * w), y1=int(50 / 999 * h),
        x2=int(900 / 999 * w), y2=int(900 / 999 * h),
    )


def test_crop_pipeline(ray_session, tmp_path):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.extract import run_extract
    from deekseek_ocr___dockerized_api_ray.sources.corpus import corpus_dataset
    from deekseek_ocr___dockerized_api_ray.stages.crops import (
        extract_crops,
        synthetic_crop_payload,
        write_crops,
    )

    extracted = run_extract(corpus_dataset(30, 42), mode="markdown").materialize()
    crops = extract_crops(extracted).materialize()
    rows = crops.take_all()
    assert rows, "corpus should yield at least one extractable image"
    md_by_doc = {r["doc_id"]: r["markdown"] for r in
                 run_extract(corpus_dataset(30, 42), mode="markdown",
                             extract_images=True).take_all()}
    for r in rows:
        # the plan agrees with the extract_images markdown links
        assert f"(images/{r['filename']})" in md_by_doc[r["doc_id"]]
        # payload is a parseable FAKEPNG with the crop dims
        assert r["payload"] == synthetic_crop_payload(
            r["media_ref"], (r["x1"], r["y1"], r["x2"], r["y2"]))
        w, h = struct.unpack("<II", r["payload"][8:16])
        assert (w, h) == (r["crop_w"], r["crop_h"])
        # crop fits the source page
        pw, ph = fixture_media_dims(r["media_ref"])
        assert 0 <= r["x1"] < r["x2"] <= pw and 0 <= r["y1"] < r["y2"] <= ph
    n = write_crops(crops, str(tmp_path))
    assert n == len(rows)
    files = os.listdir(tmp_path / "images")
    assert sorted(files) == sorted(r["filename"] for r in rows)
