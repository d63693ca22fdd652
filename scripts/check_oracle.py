"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value comparison).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py [sf_dir] --sample N --seed S
       python scripts/check_oracle.py [sf_dir] --json OUT.json

--sample N picks N queries deterministically from seed S (default 0) so
the judge/driver can spot-check without the full ~14 min sweep; --json
writes a per-query {rows, oracled, ok, problems} artifact (the
ORACLE_SWEEP_r{N}.json convention).
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    assert isinstance(result, pd.DataFrame)
    return result


def compare(name, ray_df, sql_df):
    import pandas as pd

    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"columns ray={rc} sql={sc}")
        return problems
    a = ray_df[rc].sort_values(rc).reset_index(drop=True)
    b = sql_df[rc].sort_values(rc).reset_index(drop=True)
    if len(a) == len(b):
        for c in rc:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    import numpy as np

                    if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                        bad = (av.astype(float) != bv.astype(float)).sum()
                        problems.append(f"col {c}: {bad} exact-float mismatches")
                else:
                    if not av.astype(str).equals(bv.astype(str)):
                        bad = (av.astype(str) != bv.astype(str)).sum()
                        problems.append(f"col {c}: {bad} value mismatches")
            except Exception as e:
                problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*", help="restrict to these names")
    ap.add_argument("--sample", type=int, default=0,
                    help="check N deterministically-sampled queries")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None,
                    help="write per-query results to this JSON file")
    args = ap.parse_args()
    sf_dir, only = args.sf_dir, set(args.queries)

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    names = [n for n in qs if not only or n in only]
    if args.sample and args.sample < len(names):
        names = sorted(random.Random(args.seed).sample(names, args.sample))

    report: dict = {}
    n_ok = n_bad = 0
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        rec = {"oracled": name in oracles, "ok": False, "rows": None,
               "problems": []}
        report[name] = rec
        try:
            ray_df = to_pandas(fn(sf_dir))
            rec["rows"] = len(ray_df)
        except Exception as e:
            rec["problems"] = [f"query raised {type(e).__name__}: {e}"]
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        finally:
            rec["sec"] = round(time.perf_counter() - t0, 3)
        if name not in oracles:
            rec["ok"] = True
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, cols={sorted(ray_df.columns)})")
            n_ok += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            rec["problems"] = [f"oracle SQL raised {e}"]
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_bad += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            rec["problems"] = problems
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            rec["ok"] = True
            print(f"OK   {name}: {len(ray_df)} rows match oracle")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    if args.json:
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_oracled": sum(1 for r in report.values() if r["oracled"]),
            "n_ok": n_ok, "n_fail": n_bad,
            "sample": args.sample or None, "seed": args.seed,
            "results": report,
        }
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
