"""Exercise the PIL code paths with a minimal in-test fake PIL module.

The sandbox has no real PIL; these tests verify the PIL branches of
MediaDecodeStage / crops actually execute (imports, call order, output
shapes) so a real-PIL deployment doesn't hit them cold.
"""

import io
import sys
import types

import numpy as np
import pyarrow as pa
import pytest


class _FakeImg:
    def __init__(self, w, h, transposed=False):
        self._w, self._h = w, h
        self.transposed = transposed

    @property
    def size(self):
        return (self._w, self._h)

    def convert(self, mode):
        assert mode == "RGB"
        return self

    def crop(self, box):
        x1, y1, x2, y2 = box
        return _FakeImg(x2 - x1, y2 - y1)

    def save(self, buf, format=None):
        assert format == "JPEG"
        buf.write(b"JPEGBYTES:%dx%d" % (self._w, self._h))

    def __array__(self, dtype=None, copy=None):
        return np.full((self._h, self._w, 3), 7, dtype=np.uint8)


@pytest.fixture
def fake_pil(monkeypatch):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    ops_mod = types.ModuleType("PIL.ImageOps")

    def _open(fobj):
        payload = fobj.read()
        assert payload.startswith(b"REALPNG:")
        w, h = (int(x) for x in payload[8:].split(b"x"))
        return _FakeImg(w, h)

    image_mod.open = _open
    image_mod.Image = _FakeImg

    def _exif_transpose(img):
        img.transposed = True
        return img

    ops_mod.exif_transpose = _exif_transpose
    pil.Image = image_mod
    pil.ImageOps = ops_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    monkeypatch.setitem(sys.modules, "PIL.ImageOps", ops_mod)
    return pil


def test_media_decode_pil_branch(fake_pil):
    from deekseek_ocr___dockerized_api_ray.stages.multimodal import MediaDecodeStage

    stage = MediaDecodeStage()
    assert stage.pil is not None
    batch = pa.Table.from_pylist([
        {"media_ref": "r1", "payload": b"REALPNG:640x480"},
        # FAKEPNG fixtures still take the fixture path even with PIL present
        {"media_ref": "r2",
         "payload": b"FAKEPNG0" + (320).to_bytes(4, "little") + (200).to_bytes(4, "little") + b"\x10" * 32},
    ])
    out = stage(batch).to_pylist()
    assert (out[0]["dec_width"], out[0]["dec_height"]) == (640, 480)
    assert out[0]["mean_byte"] == pytest.approx(7.0)
    assert (out[1]["dec_width"], out[1]["dec_height"]) == (320, 200)


def test_crop_stage_pil_branch(fake_pil):
    from deekseek_ocr___dockerized_api_ray.stages.crops import _pil_crop_payload

    payload = _pil_crop_payload(b"REALPNG:850x1100", (10, 20, 110, 220))
    assert payload == b"JPEGBYTES:100x200"


def test_crop_stage_uses_pil_when_payload_fn_given(fake_pil):
    from deekseek_ocr___dockerized_api_ray.stages.crops import CropStage

    stage = CropStage(dims_fn=lambda ref: (850, 1100),
                      payload_fn=lambda ref: b"REALPNG:850x1100")
    assert stage.has_pil
    batch = pa.Table.from_pylist([{
        "doc_id": "d0",
        "spans": [
            {"kind": "image", "media_ref": "m0", "offset": 0,
             "text": "x<|ref|>image<|/ref|><|det|>[[100, 100, 400, 300]]<|/det|>y"},
        ],
    }])
    rows = stage(batch).to_pylist()
    assert len(rows) == 1
    assert rows[0]["payload"].startswith(b"JPEGBYTES:")
    assert rows[0]["filename"] == "d0_img0.jpg"


def _fake_pdf(n_pages, dims):
    import struct

    payload = b"FAKEPDF0" + struct.pack("<I", n_pages)
    for w, h in dims:
        payload += struct.pack("<II", w, h)
    return payload


def test_pdf_rasterize_fixture_path(ray_session):
    import struct

    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.multimodal import rasterize_pdfs

    pdf = rd.from_items([
        {"media_ref": "p0", "payload": _fake_pdf(2, [(612, 792), (100, 50)])},
    ])
    rows = sorted(rasterize_pdfs(pdf, dpi=144).take_all(), key=lambda r: r["page"])
    # zoom = 144/72 = 2.0
    assert [(r["width"], r["height"]) for r in rows] == [(1224, 1584), (200, 100)]
    for r in rows:
        assert r["png"].startswith(b"FAKEPNG0")
        w, h = struct.unpack("<II", r["png"][8:16])
        assert (w, h) == (r["width"], r["height"])


def test_pdf_rasterize_fitz_branch(monkeypatch):
    """Fake fitz module drives the real-PyMuPDF branch: open(stream=),
    Matrix(zoom, zoom), get_pixmap(matrix, alpha=False), tobytes."""
    import sys
    import types

    import pyarrow as pa

    calls = {}

    class _FakePix:
        def __init__(self, w, h):
            self.width, self.height = w, h

        def tobytes(self, fmt):
            assert fmt == "png"
            return b"PNG:%dx%d" % (self.width, self.height)

    class _FakePage:
        def __init__(self, w, h):
            self._w, self._h = w, h

        def get_pixmap(self, matrix=None, alpha=None):
            assert alpha is False
            calls["matrix"] = matrix
            return _FakePix(int(self._w * matrix.z), int(self._h * matrix.z))

    class _FakeDoc:
        page_count = 2

        def __getitem__(self, i):
            return _FakePage(612, 792)

        def close(self):
            calls["closed"] = True

    class _Matrix:
        def __init__(self, zx, zy):
            assert zx == zy
            self.z = zx

    fitz = types.ModuleType("fitz")
    fitz.Matrix = _Matrix

    def _open(stream=None, filetype=None):
        assert filetype == "pdf" and stream == b"%PDF-real"
        return _FakeDoc()

    fitz.open = _open
    monkeypatch.setitem(sys.modules, "fitz", fitz)

    from deekseek_ocr___dockerized_api_ray.stages.multimodal import PdfRasterizeStage

    stage = PdfRasterizeStage(dpi=216)  # zoom = 3.0
    out = stage(pa.Table.from_pylist(
        [{"media_ref": "r", "payload": b"%PDF-real"}])).to_pylist()
    assert len(out) == 2
    assert (out[0]["width"], out[0]["height"]) == (1836, 2376)
    assert out[0]["png"] == b"PNG:1836x2376"
    assert calls["matrix"].z == 3.0 and calls["closed"]
