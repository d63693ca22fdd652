"""Artifact writers for the extraction outputs the reference ships as
files: per-document crop ZIPs (W5, ``Lib/postprocessor.py:141-174``
``{stem}_images.zip`` of the crop basenames), the layout-overlay PDF
(W6/W7, ``run_dpsk_ocr_pdf.py:152-214,345`` -- boxes stroked width 4
for ``title`` else 2, label text at (x1, y1-15), one output page per
input page), and the stale-job cleanup (D2,
``docker/start_server.py:89-97``).

Deliberate deviations, documented:

  - The reference draws onto the page RASTER and packs images with
    img2pdf; this engine has no raster libs, so the overlay is a
    VECTOR PDF written directly (raw PDF 1.4 syntax, stdlib only):
    blank page of the page's dimensions, stroked rectangles, Helvetica
    labels. Same geometry, no pixels.
  - The reference colors boxes with ``np.random`` per tag; here the
    color is a deterministic hash of the label (same component ranges
    0-200/0-200/0-255), so artifacts are byte-reproducible.
  - ZIP members carry a FIXED timestamp (1980-01-01) for byte-exact
    reproducibility; the reference inherits file mtimes.

Ray shape: both writers group their input by doc in ONE bucketed keyed
shuffle; each reduce call writes that document's artifact atomically
(tmp + rename, idempotent on re-run) and returns a lineage row -- the
partition-friendly, resumable file-output pattern.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import zipfile
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def label_color(label: str) -> Tuple[int, int, int]:
    """Deterministic stand-in for the reference's np.random color: same
    component ranges (0-200, 0-200, 0-255), keyed by the label text."""
    d = hashlib.md5(label.encode("utf-8")).digest()
    return d[0] % 200, d[1] % 200, d[2] % 255


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# W5: per-document crop ZIP
# ---------------------------------------------------------------------------

def zip_bytes_for(members: List[Tuple[str, bytes]]) -> bytes:
    """Deterministic ZIP (DEFLATE, fixed timestamps, name-sorted)."""
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in sorted(members):
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload)
    return buf.getvalue()


def write_crops_zip(crops_ds, out_dir: str, n_buckets: int = 64):
    """W5: one ``{doc_id}_images.zip`` per document with a crop, members
    named by the crop plan's filenames (the M6 link targets, so links
    and archive agree by construction). Docs without crops produce no
    zip -- the reference's ``None`` return.

    Returns a lineage Dataset (doc_id, zip_path, n_members, zip_bytes)
    sorted by doc_id.
    """
    from ..functions.text_stats import sha1_64

    os.makedirs(out_dir, exist_ok=True)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["bucket"] = [sha1_64(str(v)) % n_buckets for v in df["doc_id"]]
        return df

    def write_docs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, g in df.drop(columns=["bucket"]).groupby("doc_id",
                                                             sort=False):
            members = list(zip(g["filename"], g["payload"]))
            data = zip_bytes_for(members)
            path = os.path.join(out_dir, f"{doc_id}_images.zip")
            _write_atomic(path, data)
            rows.append((str(doc_id), path, len(members), len(data)))
        return pd.DataFrame(rows, columns=["doc_id", "zip_path", "n_members",
                                           "zip_bytes"])

    # repartition BEFORE the keyed groupby: on small inputs Ray fuses
    # the upstream into one block and map_groups then runs as a SINGLE
    # task (measured 14 s serial for ~5k artifact files); spreading to
    # n_buckets blocks restores one write task per bucket
    return (crops_ds.map_batches(bucket, batch_format="pandas",
                                 batch_size=65536)
            .repartition(n_buckets)
            .groupby("bucket").map_groups(write_docs, batch_format="pandas")
            .sort("doc_id"))


# ---------------------------------------------------------------------------
# W6/W7: vector layout-overlay PDF
# ---------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(boxes: pd.DataFrame, width: int, height: int) -> bytes:
    """Content stream: one stroked rect + label per box (title width 4,
    else 2 -- run_dpsk_ocr_pdf.py:193-199; label at (x1, y1-15))."""
    ops = []
    for _, b in boxes.iterrows():
        x1 = int(b["vx1"] / 999 * width)
        y1 = int(b["vy1"] / 999 * height)
        x2 = int(b["vx2"] / 999 * width)
        y2 = int(b["vy2"] / 999 * height)
        r, g, bl = label_color(str(b["label"]))
        lw = 4 if b["label"] == "title" else 2
        # PDF origin is bottom-left: flip y
        ry, rh = height - y2, max(y2 - y1, 0)
        ops.append(f"{r / 255:.3f} {g / 255:.3f} {bl / 255:.3f} RG "
                   f"{lw} w {x1} {ry} {max(x2 - x1, 0)} {rh} re S")
        tx, ty = x1, max(0, y1 - 15)
        ops.append(f"BT /F1 8 Tf {r / 255:.3f} {g / 255:.3f} {bl / 255:.3f} rg "
                   f"{tx} {height - ty - 8} Td ({_pdf_escape(str(b['label']))}) Tj ET")
    return ("\n".join(ops)).encode("latin-1", "replace")


def pdf_bytes_for(pages: List[Tuple[pd.DataFrame, int, int]]) -> bytes:
    """Assemble a raw PDF 1.4: [(boxes_df, width, height)] -> bytes.
    Object layout: 1 catalog, 2 pages, 3 font, then per page a Page
    object and its content stream."""
    objs: List[bytes] = []
    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, (boxes, w, h) in enumerate(pages):
        stream = _page_stream(boxes, w, h)
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Contents {page_ids[i] + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>".encode())
        objs.append(f"<< /Length {len(stream)} >>\nstream\n".encode()
                    + stream + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def write_layout_pdfs(boxes_ds, out_dir: str, dims_fn=None,
                      n_buckets: int = 64):
    """W6/W7: one ``{doc_id}_layouts.pdf`` per document -- a page per
    input page (offset order), every non-degenerate grounding box
    stroked at its pixel position with its label. ``dims_fn(media_ref)``
    supplies page pixel dims (default: the 999x999 virtual grid).

    Returns a lineage Dataset (doc_id, pdf_path, n_pages, n_boxes,
    pdf_bytes) sorted by doc_id.
    """
    from ..functions.text_stats import sha1_64

    os.makedirs(out_dir, exist_ok=True)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["bucket"] = [sha1_64(str(v)) % n_buckets for v in df["doc_id"]]
        return df

    def write_docs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, g in df.drop(columns=["bucket"]).groupby("doc_id",
                                                             sort=False):
            g = g[~g["degenerate"]]
            pages = []
            n_boxes = 0
            for _, pg in g.sort_values(
                    ["offset", "tag_index", "box_index"]).groupby(
                    "offset", sort=True):
                if dims_fn is not None:
                    w, h = dims_fn(pg["media_ref"].iloc[0])
                else:
                    w, h = 999, 999
                pages.append((pg, int(w), int(h)))
                n_boxes += len(pg)
            if not pages:
                continue
            data = pdf_bytes_for(pages)
            path = os.path.join(out_dir, f"{doc_id}_layouts.pdf")
            _write_atomic(path, data)
            rows.append((str(doc_id), path, len(pages), n_boxes, len(data)))
        return pd.DataFrame(rows, columns=["doc_id", "pdf_path", "n_pages",
                                           "n_boxes", "pdf_bytes"])

    # see write_crops_zip: pre-repartition so the per-bucket writers
    # actually fan out instead of fusing into one task
    return (boxes_ds.map_batches(bucket, batch_format="pandas",
                                 batch_size=65536)
            .repartition(n_buckets)
            .groupby("bucket").map_groups(write_docs, batch_format="pandas")
            .sort("doc_id"))


# ---------------------------------------------------------------------------
# D2: stale-job cleanup
# ---------------------------------------------------------------------------

def clear_stale_jobs(root: str, purge_completed: bool = False) -> dict:
    """D2 analogue of the reference's startup sweep
    (``start_server.py:89-97`` rmtree's every leftover job dir). This
    engine RESUMES from the manifest instead, so the default removes
    only partition dirs with no manifest record (crash leftovers that
    would block the atomic rename) and stray ``.tmp`` files; the
    reference's clear-everything behavior is ``purge_completed=True``.

    Returns {"removed_dirs": [...], "removed_tmp": [...], "kept": n}.
    """
    removed_dirs: List[str] = []
    removed_tmp: List[str] = []
    kept = 0
    if not os.path.isdir(root):
        return {"removed_dirs": removed_dirs, "removed_tmp": removed_tmp,
                "kept": kept}
    manifest_dir = os.path.join(root, "_manifest")
    done = set()
    if os.path.isdir(manifest_dir):
        for name in os.listdir(manifest_dir):
            if name.endswith(".json") and not name.startswith("."):
                done.add(name[:-len(".json")])
            elif name.endswith(".tmp"):
                p = os.path.join(manifest_dir, name)
                os.unlink(p)
                removed_tmp.append(p)
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        # metadata dirs (_manifest, _lineage) are never partitions
        if name.startswith("_") or not os.path.isdir(path):
            if name.endswith(".tmp") and os.path.isfile(path):
                os.unlink(path)
                removed_tmp.append(path)
            continue
        pid = name.split("=", 1)[-1]
        if purge_completed or pid not in done:
            shutil.rmtree(path, ignore_errors=True)
            removed_dirs.append(path)
        else:
            kept += 1
    if purge_completed:
        for meta in ("_manifest", "_lineage"):
            p = os.path.join(root, meta)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed_dirs.append(p)
    return {"removed_dirs": removed_dirs, "removed_tmp": removed_tmp,
            "kept": kept}


# ---------------------------------------------------------------------------
# W7: geometry re-plot (run_dpsk_ocr_image.py:269-319)
# ---------------------------------------------------------------------------

#: the reference's fixed canvas: matplotlib axes [-15, 15] x [-15, 15]
GEO_LIM = 15.0


def parse_geometry(text: str) -> Optional[dict]:
    """Parse the geometry-mode OCR payload: a dict literal with
    ``Line: {line: ["(x,y) -- (x,y)", ...], line_type: [...],
    line_endpoint: ["A: (x,y)", ...]}`` and optional ``Circle``.
    The reference ``eval``s the payload and per-element splits
    (``run_dpsk_ocr_image.py:273-312``); this engine uses
    ``ast.literal_eval`` (never eval -- the M14 rule) with the same
    per-element error tolerance (bad elements are skipped).

    Returns {"lines": [((x0,y0),(x1,y1),style)], "endpoints":
    [(label,(x,y))], "circles": [((cx,cy),r)]} or None if the payload
    is not a geometry dict.
    """
    import ast

    if "line_type" not in text:
        return None
    try:
        d = ast.literal_eval(text.strip())
        lines_raw = d["Line"]["line"]
        types = d["Line"]["line_type"]
        endpoints_raw = d["Line"].get("line_endpoint", [])
    except Exception:
        return None
    lines = []
    for idx, line in enumerate(lines_raw):
        try:
            p0 = ast.literal_eval(line.split(" -- ")[0])
            p1 = ast.literal_eval(line.split(" -- ")[-1])
            style = types[idx] if idx < len(types) else "-"
            lines.append(((float(p0[0]), float(p0[1])),
                          (float(p1[0]), float(p1[1])), str(style)))
        except Exception:
            continue
    endpoints = []
    for ep in endpoints_raw:
        try:
            label = ep.split(": ")[0]
            x, y = ast.literal_eval(ep.split(": ")[1])
            endpoints.append((str(label), (float(x), float(y))))
        except Exception:
            continue
    circles = []
    try:
        if "Circle" in d:
            centers = d["Circle"]["circle_center"]
            radii = d["Circle"]["radius"]
            for center, r in zip(centers, radii):
                cx, cy = ast.literal_eval(center.split(": ")[1])
                circles.append(((float(cx), float(cy)), float(r)))
    except Exception:
        pass
    return {"lines": lines, "endpoints": endpoints, "circles": circles}


def geometry_pdf_bytes(geo: dict, size: int = 600) -> bytes:
    """Vector re-plot of a parsed geometry payload: lines (0.8pt-scaled
    strokes, dashed for '--' -- the reference draws both solid, its
    if/else branches are identical; we honor the declared style),
    endpoint dots + labels, circles as 4-arc Beziers. Canvas =
    [-GEO_LIM, GEO_LIM]^2 mapped onto a ``size`` pt square page."""
    k = 0.5522847498307934  # 4-arc Bezier circle constant

    def tx(x: float) -> float:
        return (x + GEO_LIM) / (2 * GEO_LIM) * size

    def ty(y: float) -> float:
        return (y + GEO_LIM) / (2 * GEO_LIM) * size

    ops = ["0 0 0 RG 0 0 0 rg 1.6 w"]
    for (x0, y0), (x1, y1), style in geo["lines"]:
        if style == "--":
            ops.append("[6 4] 0 d")
        ops.append(f"{tx(x0):.2f} {ty(y0):.2f} m {tx(x1):.2f} {ty(y1):.2f} l S")
        if style == "--":
            ops.append("[] 0 d")
    for (x0, y0), (x1, y1), _ in geo["lines"]:
        for (px, py) in ((x0, y0), (x1, y1)):
            r = 2.0
            cx, cy = tx(px), ty(py)
            ops.append(
                f"{cx + r:.2f} {cy:.2f} m "
                f"{cx + r:.2f} {cy + k * r:.2f} {cx + k * r:.2f} {cy + r:.2f} {cx:.2f} {cy + r:.2f} c "
                f"{cx - k * r:.2f} {cy + r:.2f} {cx - r:.2f} {cy + k * r:.2f} {cx - r:.2f} {cy:.2f} c "
                f"{cx - r:.2f} {cy - k * r:.2f} {cx - k * r:.2f} {cy - r:.2f} {cx:.2f} {cy - r:.2f} c "
                f"{cx + k * r:.2f} {cy - r:.2f} {cx + r:.2f} {cy - k * r:.2f} {cx + r:.2f} {cy:.2f} c f")
    for label, (x, y) in geo["endpoints"]:
        ops.append(f"BT /F1 6 Tf {tx(x) + 1:.2f} {ty(y) + 1:.2f} Td "
                   f"({_pdf_escape(label)}) Tj ET")
    for (cx, cy), r in geo["circles"]:
        px, py = tx(cx), ty(cy)
        pr = r / (2 * GEO_LIM) * size
        ops.append(
            f"{px + pr:.2f} {py:.2f} m "
            f"{px + pr:.2f} {py + k * pr:.2f} {px + k * pr:.2f} {py + pr:.2f} {px:.2f} {py + pr:.2f} c "
            f"{px - k * pr:.2f} {py + pr:.2f} {px - pr:.2f} {py + k * pr:.2f} {px - pr:.2f} {py:.2f} c "
            f"{px - pr:.2f} {py - k * pr:.2f} {px - k * pr:.2f} {py - pr:.2f} {px:.2f} {py - pr:.2f} c "
            f"{px + k * pr:.2f} {py - pr:.2f} {px + pr:.2f} {py - k * pr:.2f} {px + pr:.2f} {py:.2f} c S")
    stream = ("\n".join(ops)).encode("latin-1", "replace")
    objs: List[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [4 0 R] /Count 1 >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {size} {size}] "
        f"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>".encode(),
        f"<< /Length {len(stream)} >>\nstream\n".encode() + stream
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def replot_geometry(spans_ds, out_dir: str, text_col: str = "text",
                    id_col: str = "doc_id"):
    """W7 stage: rows whose OCR text is a geometry payload are re-plotted
    to ``{doc_id}_geo.pdf``; all other rows pass through untouched (the
    reference's ``if 'line_type' in outputs`` gate). Stateless
    map_batches; returns a lineage Dataset (doc_id, n_lines, n_circles,
    n_endpoints, pdf_bytes) for the rows that plotted."""
    os.makedirs(out_dir, exist_ok=True)

    def plot(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df[id_col], df[text_col]):
            geo = parse_geometry(text)
            if geo is None:
                continue
            data = geometry_pdf_bytes(geo)
            _write_atomic(os.path.join(out_dir, f"{doc_id}_geo.pdf"), data)
            rows.append((str(doc_id), len(geo["lines"]), len(geo["circles"]),
                         len(geo["endpoints"]), len(data)))
        return pd.DataFrame(rows, columns=["doc_id", "n_lines", "n_circles",
                                           "n_endpoints", "pdf_bytes"])

    return spans_ds.map_batches(plot, batch_format="pandas",
                                batch_size=65536)


def export_jsonl_shards(sf_dir: str, n_shards: int = 8,
                        out_dir: str | None = None):
    """Training-shard JSONL export: deterministic shard assignment
    (md5_number_lower of the decimal doc_id % n_shards -- the repo's
    SQL-replicable hash-gate convention), each shard file written ONCE
    by its own map_groups call with rows sorted by doc_id and canonical
    JSON (sorted keys, compact separators), so shard bytes are
    reproducible run to run. Atomic tmp+rename per shard makes re-runs
    idempotent. On a multi-node cluster ``out_dir`` must be shared
    storage, same as the checkpoint writer.

    Returns lineage rows (shard, n_docs, n_bytes, sha256); the driver
    oracle checks (shard, n_docs), byte determinism is pinned by test.
    """
    import json
    import tempfile

    import ray.data as rd

    from ..functions.hashing import _hash64

    out = out_dir or tempfile.mkdtemp(prefix="jsonl_shards_", dir="/tmp")
    os.makedirs(out, exist_ok=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def assign(batch: pa.Table) -> pa.Table:
        shards = [_hash64(str(d)) % n_shards
                  for d in batch.column("doc_id").to_pylist()]
        return batch.append_column("shard",
                                   pa.array(shards, type=pa.int32()))

    def write_shard(group: pa.Table) -> pa.Table:
        df = group.sort_by([("doc_id", "ascending")])
        shard = int(df.column("shard")[0].as_py())
        lines = [json.dumps(row, sort_keys=True, separators=(",", ":"))
                 for row in df.select(["doc_id", "text", "lang"]).to_pylist()]
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        path = os.path.join(out, f"shard_{shard:05d}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.Table.from_arrays(
            [pa.array([shard], type=pa.int64()),
             pa.array([df.num_rows], type=pa.int64()),
             pa.array([len(payload)], type=pa.int64()),
             pa.array([hashlib.sha256(payload).hexdigest()],
                      type=pa.string())],
            names=["shard", "n_docs", "n_bytes", "sha256"])

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("shard").map_groups(write_shard,
                                         batch_format="pyarrow"))
