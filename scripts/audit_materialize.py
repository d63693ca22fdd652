"""Driver-materialization audit (VERDICT r2 #8): every DRIVER-side
``.take_all()`` / ``.to_pandas()`` / ``.iter_rows()`` in the package
must carry a ``bound:`` annotation -- a comment, on the call line or
within the 4 lines above it, stating WHY the materialized size is
bounded (dimension grain, top-k limit, combiner-reduced aggregate,
explicit size gate, ...). Per-batch conversions inside map fns
(``batch.to_pandas()``) are exempt -- they are not driver
materializations.

Run standalone (exit 1 on violations) or via
tests/test_materialize_audit.py. The point is not the comment itself:
it forces every new materialization to state its bound at review time,
so an UNBOUNDED one cannot land silently.
"""

from __future__ import annotations

import os
import re
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "deekseek_ocr___dockerized_api_ray")

CALL = re.compile(r"\.(take_all|iter_rows)\(\)|\.to_pandas\(\)")
# per-batch conversions, not driver materializations:
EXEMPT = re.compile(r"\bbatch\.to_pandas\(\)|isinstance\(batch")
LOOKBACK = 4


def audit() -> list:
    violations = []
    for root, _dirs, files in os.walk(PKG):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if not CALL.search(line) or EXEMPT.search(line):
                    continue
                window = lines[max(0, i - LOOKBACK): i + 1]
                if not any("bound:" in w for w in window):
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    violations.append(f"{rel}:{i + 1}: {line.strip()}")
    return violations


if __name__ == "__main__":
    v = audit()
    for x in v:
        print(x)
    print(f"{len(v)} unannotated driver materializations")
    sys.exit(1 if v else 0)
