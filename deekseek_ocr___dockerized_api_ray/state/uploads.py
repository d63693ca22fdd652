"""W8 upload saver + age-based upload cleanup (the reference's
``Lib/file_utils.py:23-50`` ``save_uploaded_file`` -- copy to the upload
dir as ``{YYYYmmdd_HHMMSS}_{md5_12}_{original_name}`` -- and
``:192-214`` ``cleanup_old_uploads`` -- unlink files older than
``max_age_days``).

Parity: the hash is the same chunked MD5 truncated to 12 hex chars; the
filename layout is identical. Additions for the engine's model:

  - ``now`` is injectable (deterministic names under test; the
    reference stamps wall-clock).
  - ``dedupe=True`` makes ingestion IDEMPOTENT: if any existing upload
    carries the same hash + original name, the copy is skipped and the
    existing path returned -- the behavior a resumable distributed
    ingest needs (re-running a partition must not duplicate landed
    files). Default False = faithful reference behavior.
  - ``ingest_uploads`` is the Ray-native batch surface: a Dataset of
    source paths fans the copies out as tasks and returns lineage rows
    (source, dest, md5_12, bytes) -- ingestion lands files AND the
    manifest table in one pass.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from datetime import datetime
from typing import Optional

import pandas as pd


def file_hash(path: str, length: int = 12) -> str:
    """Chunked MD5, truncated -- byte-parity with the reference."""
    hasher = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(65536), b""):
            hasher.update(chunk)
    return hasher.hexdigest()[:length]


def _save_upload_hashed(source_path: str, upload_dir: str,
                        original_filename: Optional[str] = None,
                        now: Optional[datetime] = None,
                        dedupe: bool = False,
                        existing_names: Optional[list] = None):
    """Core of ``save_upload`` that also returns the (already computed)
    hash, so batch callers don't re-read the file to hash it again.
    ``existing_names`` lets a batch caller list the upload dir ONCE and
    reuse it across the whole batch instead of an os.listdir per file.
    Returns (dest_path or None, md5_12 or None)."""
    try:
        filename = original_filename or os.path.basename(source_path)
        h = file_hash(source_path)
        if dedupe:
            if existing_names is None:
                existing_names = (sorted(os.listdir(upload_dir))
                                  if os.path.isdir(upload_dir) else [])
            suffix = f"_{h}_{filename}"
            for existing in existing_names:
                if existing.endswith(suffix):
                    return os.path.join(upload_dir, existing), h
        os.makedirs(upload_dir, exist_ok=True)
        ts = (now or datetime.now()).strftime("%Y%m%d_%H%M%S")
        dest = os.path.join(upload_dir, f"{ts}_{h}_{filename}")
        shutil.copy(source_path, dest)
        if existing_names is not None:
            existing_names.append(os.path.basename(dest))
        return dest, h
    except Exception:
        return None, None


def save_upload(source_path: str, upload_dir: str,
                original_filename: Optional[str] = None,
                now: Optional[datetime] = None,
                dedupe: bool = False) -> Optional[str]:
    """Copy ``source_path`` into ``upload_dir`` under the reference's
    ``{timestamp}_{hash}_{name}`` layout; returns the dest path, or
    None on error (the reference's contract)."""
    dest, _ = _save_upload_hashed(source_path, upload_dir,
                                  original_filename, now, dedupe)
    return dest


def cleanup_old_uploads(upload_dir: str, max_age_days: int = 7,
                        now_ts: Optional[float] = None) -> int:
    """Unlink uploads older than ``max_age_days``; returns the count
    (``file_utils.py:192-214``)."""
    import time

    deleted = 0
    cutoff = (now_ts if now_ts is not None else time.time()) \
        - max_age_days * 24 * 60 * 60
    if not os.path.isdir(upload_dir):
        return 0
    for name in os.listdir(upload_dir):
        path = os.path.join(upload_dir, name)
        try:
            if os.path.isfile(path) and os.stat(path).st_mtime < cutoff:
                os.unlink(path)
                deleted += 1
        except OSError:
            continue
    return deleted


def ingest_uploads(paths, upload_dir: str, dedupe: bool = True,
                   now: Optional[datetime] = None):
    """Batch-ingest a Dataset (or list) of source paths: copies fan out
    as Ray tasks; returns a lineage Dataset (source, dest, md5_12,
    n_bytes) sorted by source. With ``dedupe`` (default) re-runs are
    idempotent -- the resumable-partition contract."""
    import ray.data as rd

    ds = paths if hasattr(paths, "map_batches") else rd.from_items(
        [{"source": p} for p in paths])

    def copy_batch(df: pd.DataFrame) -> pd.DataFrame:
        # list the upload dir once per batch; each file is hashed once
        # (the hash save_upload computed is reused for the lineage row)
        existing = (sorted(os.listdir(upload_dir))
                    if os.path.isdir(upload_dir) else [])
        rows = []
        for src in df["source"]:
            dest, h = _save_upload_hashed(src, upload_dir, now=now,
                                          dedupe=dedupe,
                                          existing_names=existing)
            if dest is None:
                continue
            rows.append((src, dest, h, os.path.getsize(dest)))
        return pd.DataFrame(rows, columns=["source", "dest", "md5_12",
                                           "n_bytes"])

    return ds.map_batches(copy_batch, batch_format="pandas",
                          batch_size=256).sort("source")
