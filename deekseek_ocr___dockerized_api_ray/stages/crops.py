"""W4: cropped-image output for the extract_images path.

The reference crops each successfully-parsed det box out of the paired
page image and saves a JPEG next to the markdown
(Lib/postprocessor.py:119-139, filenames ``{stem}_img{i}_{timestamp}``,
ours the deterministic ``{doc_id}_img{i}.jpg`` used by the M6 link
rewrite). The crop PLAN (which page, which box, which filename) comes
from the same code path that rewrites the links
(functions/cleaning.rewrite_image_tags_with_crops), so plan and links
can never disagree.

Payload production:
  - PIL available: decode the page payload, ``img.crop(box)``, encode
    JPEG -- the real path.
  - sandbox (no PIL): FAKEPNG synthetic crop -- magic + packed crop dims
    + a sha256 stripe of (media_ref, box), deterministic and parseable
    by stages/multimodal.MediaDecodeStage like any other fixture payload.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Callable, List, Optional, Tuple

import pyarrow as pa

from ..functions.cleaning import (
    join_pages,
    match_tags,
    rewrite_image_tags_with_crops,
)

_FAKE_MAGIC = b"FAKEPNG0"


def synthetic_crop_payload(media_ref: str, box: Tuple[int, int, int, int]) -> bytes:
    """Deterministic FAKEPNG crop payload (sandbox path)."""
    x1, y1, x2, y2 = box
    stripe = hashlib.sha256(f"{media_ref}|{x1},{y1},{x2},{y2}".encode()).digest()
    return _FAKE_MAGIC + struct.pack("<II", x2 - x1, y2 - y1) + stripe


def _pil_crop_payload(page_payload: bytes, box) -> bytes:
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(page_payload)).convert("RGB")
    buf = io.BytesIO()
    img.crop(box).save(buf, format="JPEG")
    return buf.getvalue()


class CropStage:
    """Actor stage: extracted-doc rows (doc_id, spans already OCR'd) ->
    one row per saved crop (doc_id, filename, media_ref, box, crop
    dims, payload bytes).

    ``dims_fn(media_ref)`` supplies page dims (default: the fixture
    lookup; production: a broadcast media-dims dict via ``ray.put``).
    ``payload_fn(media_ref)`` optionally supplies the page payload for
    the real PIL crop; when absent (or PIL is absent) crops are the
    deterministic FAKEPNG synthetics.
    """

    def __init__(self, dims_fn: Optional[Callable] = None,
                 payload_fn: Optional[Callable] = None):
        if dims_fn is None:
            from ..sources.corpus import fixture_media_dims as dims_fn
        self.dims_fn = dims_fn
        self.payload_fn = payload_fn
        try:
            from PIL import Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "filename", "media_ref",
                               "x1", "y1", "x2", "y2",
                               "crop_w", "crop_h", "payload")}
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            spans = sorted(spans, key=lambda s: s["offset"])
            joined = join_pages([s["text"] for s in spans])
            media_refs = [s["media_ref"] for s in spans if s["media_ref"]]
            page_dims = [self.dims_fn(r) for r in media_refs]
            _, matches_images, _ = match_tags(joined)
            _, crops = rewrite_image_tags_with_crops(
                joined, matches_images, page_dims,
                lambda i: f"{doc_id}_img{i}.jpg",
            )
            for c in crops:
                ref = media_refs[c.page_index]
                box = (c.x1, c.y1, c.x2, c.y2)
                if self.has_pil and self.payload_fn is not None:
                    payload = _pil_crop_payload(self.payload_fn(ref), box)
                else:
                    payload = synthetic_crop_payload(ref, box)
                out["doc_id"].append(doc_id)
                out["filename"].append(c.filename)
                out["media_ref"].append(ref)
                out["x1"].append(c.x1)
                out["y1"].append(c.y1)
                out["x2"].append(c.x2)
                out["y2"].append(c.y2)
                out["crop_w"].append(c.x2 - c.x1)
                out["crop_h"].append(c.y2 - c.y1)
                out["payload"].append(payload)
        return pa.Table.from_arrays(
            [pa.array(out["doc_id"], type=pa.string()),
             pa.array(out["filename"], type=pa.string()),
             pa.array(out["media_ref"], type=pa.string()),
             pa.array(out["x1"], type=pa.int32()),
             pa.array(out["y1"], type=pa.int32()),
             pa.array(out["x2"], type=pa.int32()),
             pa.array(out["y2"], type=pa.int32()),
             pa.array(out["crop_w"], type=pa.int32()),
             pa.array(out["crop_h"], type=pa.int32()),
             pa.array(out["payload"], type=pa.binary())],
            names=["doc_id", "filename", "media_ref", "x1", "y1", "x2", "y2",
                   "crop_w", "crop_h", "payload"],
        )


def extract_crops(extracted_ds, dims_fn: Optional[Callable] = None,
                  payload_fn: Optional[Callable] = None):
    """Extracted docs -> crop rows (streaming; one actor-pool stage)."""
    return extracted_ds.select_columns(["doc_id", "spans"]).map_batches(
        CropStage,
        fn_constructor_kwargs=dict(dims_fn=dims_fn, payload_fn=payload_fn),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def write_crops(crops_ds, out_dir: str) -> int:
    """Write each crop payload to ``out_dir/images/{filename}`` (the
    reference's images/ layout, Lib/postprocessor.py:84-124). Files are
    written tmp -> rename, so a retried task simply overwrites with the
    same deterministic bytes (idempotent). Returns the file count."""
    images_dir = os.path.join(out_dir, "images")
    os.makedirs(images_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        for name, payload in zip(batch.column("filename").to_pylist(),
                                 batch.column("payload").to_pylist()):
            path = os.path.join(images_dir, name)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        return pa.Table.from_arrays(
            [pa.array([batch.num_rows], type=pa.int64())], names=["n"]
        )

    return int(crops_ds.map_batches(_write, batch_format="pyarrow").sum("n") or 0)
