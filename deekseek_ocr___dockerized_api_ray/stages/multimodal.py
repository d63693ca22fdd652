"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns moved through Arrow untouched;
decode / resize / frame-sample are actor-pool ``map_batches`` stages.
The sandbox has no PIL/ffmpeg, so the pixel-level decode is STUBBED: if
PIL is importable the real path runs, otherwise payloads produced by
sources/corpus.media_row (``FAKEPNG0`` magic + packed dims + sha stripe)
are parsed deterministically -- the Ray-side plumbing (schema, batch
size, actor signature, output layout) is real and tested either way.

Tiling/token math is the real reference math (functions/tiling.py).
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..functions.tiling import image_token_count, tile_grid

_FAKE_MAGIC = b"FAKEPNG0"


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class MediaDecodeStage:
    """Decode payloads -> (width, height, mean_byte); PIL when available,
    deterministic FAKEPNG parse otherwise. Real decode of real formats
    without PIL raises NotImplementedError (clearly a stub boundary)."""

    def __init__(self):
        self.pil = _try_pil()

    def _decode_one(self, payload: bytes):
        if payload.startswith(_FAKE_MAGIC):
            w, h = struct.unpack("<II", payload[8:16])
            stripe = payload[16:]
            mean = float(np.frombuffer(stripe, dtype=np.uint8).mean()) if stripe else 0.0
            return w, h, round(mean, 6)
        if self.pil is None:
            raise NotImplementedError(
                "real image decode requires PIL (not in this sandbox); "
                "payload is not a FAKEPNG fixture"
            )
        import io

        from PIL import ImageOps

        img = self.pil.open(io.BytesIO(payload))
        # EXIF orientation fix, per run_dpsk_ocr_image.py:29-43 (S3)
        try:
            img = ImageOps.exif_transpose(img)
        except Exception:
            pass
        arr = np.asarray(img.convert("RGB"))
        return img.size[0], img.size[1], round(float(arr.mean()), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, m = self._decode_one(payload)
            widths.append(w)
            heights.append(h)
            means.append(m)
        out = batch.drop_columns(["payload"])  # payload consumed; don't re-ship
        return (
            out.append_column("dec_width", pa.array(widths, type=pa.int32()))
            .append_column("dec_height", pa.array(heights, type=pa.int32()))
            .append_column("mean_byte", pa.array(means, type=pa.float64()))
        )


class TilingPlanStage:
    """Tiling plan per media row: (tiles_w, tiles_h, n_tiles, n_image_tokens)
    from the reference math -- the CPU-side preprocessing the reference
    runs in a 64-thread pool (run_dpsk_ocr_pdf.py:264-269, A4/A5)."""

    def __init__(self, crop_mode: bool = True):
        self.crop_mode = crop_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        grids = [tile_grid(w, h, crop_mode=self.crop_mode) for w, h in zip(ws, hs)]
        tokens = [image_token_count(w, h, crop_mode=self.crop_mode) for w, h in zip(ws, hs)]
        return (
            batch.append_column("tiles_w", pa.array([g[0] for g in grids], type=pa.int32()))
            .append_column("tiles_h", pa.array([g[1] for g in grids], type=pa.int32()))
            .append_column("n_tiles", pa.array([g[0] * g[1] for g in grids], type=pa.int32()))
            .append_column("n_image_tokens", pa.array(tokens, type=pa.int32()))
        )


class FrameSampleStage:
    """Video frame sampling plan: every ``stride``-th frame index up to
    ``max_frames`` -- pure plumbing (the decoder itself is the stubbed
    boundary above). Input needs an ``n_frames`` int column."""

    def __init__(self, stride: int = 30, max_frames: int = 16):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        plans: List[List[int]] = []
        for n in batch.column("n_frames").to_pylist():
            idx = list(range(0, int(n), self.stride))[: self.max_frames]
            plans.append(idx)
        return batch.append_column("frame_indices", pa.array(plans, type=pa.list_(pa.int32())))


def decode_media(media_ds, concurrency=(1, 8), batch_size: int = 256):
    """Actor-pool decode; small batches because payload rows are wide."""
    return media_ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def tiling_plan(media_ds, crop_mode: bool = True, batch_size: int = 4096):
    return media_ds.map_batches(
        TilingPlanStage, fn_constructor_kwargs=dict(crop_mode=crop_mode),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8),
    )


class PreprocessPlanStage:
    """A4 preprocessing plan per media row: the global-view pad geometry,
    tile grid and token-sequence length the model-side preprocessing
    will use (functions/preprocess.py; image_process.py:326-496). Pure
    arithmetic on (width, height) -- the CPU-side work the reference
    runs in its 64-thread pool, here an actor-pool batch stage."""

    def __init__(self, crop_mode: bool = True):
        self.crop_mode = crop_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.preprocess import image_token_run, pad_geometry

        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        geos = [pad_geometry(w, h) for w, h in zip(ws, hs)]
        runs = [image_token_run(w, h, crop_mode=self.crop_mode)
                for w, h in zip(ws, hs)]
        return (
            batch.append_column("pad_resized_w", pa.array([g.resized_w for g in geos], type=pa.int32()))
            .append_column("pad_resized_h", pa.array([g.resized_h for g in geos], type=pa.int32()))
            .append_column("pad_x", pa.array([g.paste_x for g in geos], type=pa.int32()))
            .append_column("pad_y", pa.array([g.paste_y for g in geos], type=pa.int32()))
            .append_column("n_seq_tokens", pa.array(runs, type=pa.int32()))
        )


def preprocess_plan(media_ds, crop_mode: bool = True):
    """Dataset wrapper: media rows (width, height, ...) -> + pad geometry
    and token-run columns."""
    return media_ds.map_batches(
        PreprocessPlanStage,
        fn_constructor_kwargs=dict(crop_mode=crop_mode),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def _try_fitz():
    try:
        import fitz  # noqa: F401

        return fitz
    except ImportError:
        return None


class PdfRasterizeStage:
    """S2: PDF payload -> one row per page with PNG bytes + dims
    (docker/start_server.py:383-409 semantics: env-clamped DPI, zoom =
    dpi/72, ``get_pixmap(matrix=Matrix(zoom, zoom), alpha=False)``,
    ``tobytes("png")``).

    PyMuPDF (fitz) is the real backend; absent (this sandbox), payloads
    must be FAKEPDF fixtures (``FAKEPDF0`` magic + uint32 page count +
    per-page uint32 w,h at 72 dpi) which rasterize to FAKEPNG rows with
    the SAME zoom math -- the Ray-side plumbing (batch shape, per-page
    explode, dims columns) is identical either way.
    """

    _FAKE_PDF_MAGIC = b"FAKEPDF0"

    def __init__(self, dpi: Optional[int] = None):
        from ..config import effective_dpi

        self.dpi = effective_dpi() if dpi is None else dpi
        self.fitz = _try_fitz()

    def _pages_fake(self, payload: bytes):
        from ..config import raster_zoom

        zoom = raster_zoom(self.dpi)
        n = struct.unpack("<I", payload[8:12])[0]
        out = []
        for i in range(n):
            w, h = struct.unpack("<II", payload[12 + 8 * i : 20 + 8 * i])
            pw, ph = int(w * zoom), int(h * zoom)
            png = (_FAKE_MAGIC + struct.pack("<II", pw, ph)
                   + payload[12 + 8 * i : 20 + 8 * i])
            out.append((i, pw, ph, png))
        return out

    def _pages_fitz(self, payload: bytes):
        from ..config import raster_zoom

        fitz = self.fitz
        zoom = raster_zoom(self.dpi)
        matrix = fitz.Matrix(zoom, zoom)
        doc = fitz.open(stream=payload, filetype="pdf")
        out = []
        for i in range(doc.page_count):
            pix = doc[i].get_pixmap(matrix=matrix, alpha=False)
            out.append((i, pix.width, pix.height, pix.tobytes("png")))
        doc.close()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, pages, ws, hs, pngs = [], [], [], [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if payload.startswith(self._FAKE_PDF_MAGIC):
                rows = self._pages_fake(payload)
            elif self.fitz is not None:
                rows = self._pages_fitz(payload)
            else:
                raise NotImplementedError(
                    "real PDF rasterization requires PyMuPDF (not in this "
                    "sandbox); payload is not a FAKEPDF fixture"
                )
            for i, w, h, png in rows:
                refs.append(ref)
                pages.append(i)
                ws.append(w)
                hs.append(h)
                pngs.append(png)
        return pa.Table.from_arrays(
            [pa.array(refs, type=pa.string()),
             pa.array(pages, type=pa.int32()),
             pa.array(ws, type=pa.int32()),
             pa.array(hs, type=pa.int32()),
             pa.array(pngs, type=pa.binary())],
            names=["media_ref", "page", "width", "height", "png"],
        )


def rasterize_pdfs(pdf_ds, dpi: Optional[int] = None):
    """PDF rows (media_ref, payload) -> page rows; actor pool (fitz doc
    handles are stateful)."""
    return pdf_ds.map_batches(
        PdfRasterizeStage,
        fn_constructor_kwargs=dict(dpi=dpi),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
