"""Per-stage wall-time/row introspection for any registered query.

    python scripts/stage_stats.py <query_name> [sf_dir]

Runs the query through the driver contract, then parses
``Dataset.stats()`` into one row per operator: wall time, CPU time,
output rows, and rows/s -- the "where did the time go" report used to
keep every stage compute-bound (README: measure, don't guess).  Only
Dataset-returning queries have stats; DataFrame-returning ones report
the end-to-end wall only.  stats() follows the RETURNED dataset's plan:
a query that materializes intermediates (size-gate probes, broadcast
builds) reports only its final chain -- the end-to-end wall still
covers everything.
"""

from __future__ import annotations

import os
import re
import sys
import time


def parse_stats(stats: str) -> list[dict]:
    """Extract (operator, tasks, wall_s, rows) from Dataset.stats() text."""
    out: list[dict] = []
    op = None
    for line in stats.splitlines():
        m = re.match(r"Operator \d+ (.+?): (\d+) tasks executed, "
                     r"\d+ blocks produced in ([0-9.]+)s", line)
        if m:
            op = {"operator": m.group(1), "tasks": int(m.group(2)),
                  "wall_s": float(m.group(3)), "rows": None}
            out.append(op)
            continue
        m = re.search(r"Output num rows per block: .*?(\d+) total", line)
        if m and op is not None and op["rows"] is None:
            op["rows"] = int(m.group(1))
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; {len(qs)} registered")
        return 2

    t0 = time.perf_counter()
    res = qs[name](sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        wall = time.perf_counter() - t0
        rows = res.count()
        print(f"{name}: {wall:.2f}s end-to-end, {rows} rows\n")
        ops = parse_stats(res.stats())
        width = max((len(o["operator"]) for o in ops), default=8)
        print(f"{'operator':<{width}}  {'tasks':>6}  {'wall_s':>8}  "
              f"{'rows':>10}  {'rows/s':>12}")
        for o in ops:
            r = o["rows"] if o["rows"] is not None else 0
            rps = f"{r / o['wall_s']:,.0f}" if o["wall_s"] > 0 and r else "-"
            print(f"{o['operator']:<{width}}  {o['tasks']:>6}  "
                  f"{o['wall_s']:>8.2f}  {r:>10}  {rps:>12}")
    else:
        wall = time.perf_counter() - t0
        print(f"{name}: {wall:.2f}s end-to-end, {len(res)} rows "
              f"(driver DataFrame result; no per-stage stats)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
