"""Input sources beyond the corpus table (SURVEY.md section 2.1).

  S4  image-directory glob  -> ray.data.read_binary_files
  S5  PDF file-list / folder -> path-list parsing with the reference's
      comment/missing-file semantics, then read_binary_files
  S7  result loader          -> read the engine's output table back
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

#: extensions the reference's scripts route by (config.py:24-27)
IMAGE_EXTS = (".jpg", ".jpeg", ".png")
PDF_EXT = ".pdf"


def parse_path_list(list_file: str) -> List[str]:
    """File-list source semantics (pdf_to_markdown_cli.py:267-283):
    one path per line, ``#`` comment lines and blank lines skipped,
    missing files skipped (the reference warns and continues)."""
    paths: List[str] = []
    with open(list_file, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if os.path.exists(line):
                paths.append(line)
    return paths


def glob_media_dir(input_dir: str, exts=IMAGE_EXTS) -> List[str]:
    """Image-dir glob source (run_dpsk_ocr_eval_batch.py:121-127):
    every file in the dir whose suffix matches, sorted for stability."""
    out = []
    for p in sorted(glob.glob(os.path.join(input_dir, "*"))):
        if p.lower().endswith(tuple(exts)):
            out.append(p)
    return out


def read_media_files(paths: List[str]):
    """Binary payload Dataset from file paths: (path, bytes) rows.

    Feeds stages/multimodal.decode_media after renaming ``bytes`` to
    ``payload``. Empty path list -> empty Dataset with the same schema.
    """
    import pyarrow as pa
    import ray.data as rd

    if not paths:
        return rd.from_arrow(
            pa.table({"path": pa.array([], pa.string()),
                      "payload": pa.array([], pa.binary())})
        )
    ds = rd.read_binary_files(paths, include_paths=True)

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["path" if c == "path" else "payload" for c in batch.column_names]
        )

    return ds.map_batches(_rename, batch_format="pyarrow")


def read_pdf_folder(input_dir: str):
    """Folder source (pdf_to_markdown_cli.py:277-283): glob *.pdf."""
    return read_media_files(sorted(glob.glob(os.path.join(input_dir, "*.pdf"))))


def read_results(out_dir: str):
    """Result loader (S7): read the engine's partitioned output back,
    skipping the checkpoint bookkeeping dirs."""
    import ray.data as rd

    files = sorted(
        os.path.join(out_dir, d, f)
        for d in os.listdir(out_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
        for f in os.listdir(os.path.join(out_dir, d))
        if f.endswith(".parquet")
    )
    if not files:
        return rd.read_parquet(out_dir)
    return rd.read_parquet(files)


def list_results(out_dir: str, limit: int = 50):
    """Result listing (O2, Lib/file_utils.py:106-122): completed output
    partitions sorted by modification time, newest first, capped at
    ``limit``. Returns [(partition_dir, mtime), ...]."""
    entries = []
    for d in os.listdir(out_dir):
        if d.startswith("part=") and not d.endswith(".tmp"):
            p = os.path.join(out_dir, d)
            entries.append((p, os.path.getmtime(p)))
    entries.sort(key=lambda e: e[1], reverse=True)
    return entries[:limit]


def read_jsonl_shards(shard_dir: str):
    """Read a directory of JSONL training shards (the twin of
    state/artifacts.export_jsonl_shards) back into a Dataset via Ray's
    native JSON reader -- one block per shard file, schema inferred by
    Arrow. Round-trip contract: read_jsonl_shards(export(...)) equals
    the exported rows (pinned by test)."""
    import ray.data as rd

    return rd.read_json(shard_dir, file_extensions=["jsonl"])
