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
