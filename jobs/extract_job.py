"""Cluster job entry point for the flagship extraction pipeline.

Production submission (north_rule: fixed-size multi-node cluster):

    ray job submit --working-dir . -- \
        python jobs/extract_job.py \
            --input  s3://corpus/interleaved.lance \
            --output s3://out/extracted \
            --partitions 4096 --mode markdown

In this sandbox (`RAY_ADDRESS=local`, no job server) the same script
runs directly: `python jobs/extract_job.py --input ... --output ...`.

The run is checkpointed per partition: re-submitting after a failure
skips completed partitions via the output manifest; lineage rows
accumulate under `<output>/_lineage/`. This owns its Ray session (the
driver-contract module `__ray_entry__.py` never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus dir (parquet/lance twin)")
    ap.add_argument("--output", required=True, help="output dir (partitioned, resumable)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--mode", default="markdown", choices=["markdown", "ocr", "custom"])
    ap.add_argument("--backend", default="mock", choices=["mock", "vllm"])
    ap.add_argument("--strategy", default="fused", choices=["fused", "exploded"])
    ap.add_argument("--max-pages", type=int, default=0)
    ap.add_argument("--extract-images", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="local-mode CPU count; 0 = cluster default")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deekseek_ocr___dockerized_api_ray.state.checkpoint import (
        run_extract_checkpointed,
    )

    result = run_extract_checkpointed(
        args.input,
        args.output,
        n_partitions=args.partitions,
        mode=args.mode,
        backend=args.backend,
        strategy=args.strategy,
        max_pages=args.max_pages,
        extract_images=args.extract_images,
    )
    lineage = result["lineage"]
    summary = {
        "completed_now": result["completed"],
        "skipped_done": result["skipped"],
        "total_partitions_done": len(result["completed"]) + len(result["skipped"]),
        "doc_count": int(sum(lineage.column("doc_count").to_pylist())),
        "span_count": int(sum(lineage.column("span_count").to_pylist())),
        "error_count": int(sum(lineage.column("error_count").to_pylist())),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
