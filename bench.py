"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Headline: the flagship interleaved-extraction pipeline (explode -> mock
OCR actor pool -> keyed reassembly -> finalize) over the deterministic
synthetic corpus at fix-m scale (10x the sf dir's documents row count),
consumed by write_parquet. Sub-queries: representative operators.

  python bench.py               # one JSON line, $RAY_GRAFT_CPUS CPUs (default 32)
  python bench.py --scaling     # same job at N and 4N CPUs (default 4 and
                                # 16; override BENCH_SCALE_LO/HI) in fresh
                                # processes, alternated BENCH_SCALE_ROUNDS
                                # times, min per level -> scaling efficiency

Corpus generation is cached under /tmp and warmed untimed, so timings
measure compute + shuffle, not first-touch generation. The compute pool
is 3/4 of the CPUs at every level so an N-vs-4N pair compares exactly
4x the compute actors (see run_bench).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42


def _n_docs() -> int:
    import pyarrow.parquet as pq

    base = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
    # fix-m tier: 120x the sf's doc count with the "bench" span profile
    # (realistic 10-24-span documents) so the job runs long enough to be
    # compute-bound (scaling measurements need work >> fixed startup cost).
    # BENCH_DOCS_MULT stretches the job further; --scaling sets it to 2 so
    # the fixed per-session overhead (~4-5 s: actor-pool startup + read
    # first wave) stays a small fraction of even the 4N leg -- the
    # criterion describes 10^12-doc jobs where startup amortizes to zero,
    # and at 600k docs it is ~8% of the 16-CPU leg, which is what gets
    # measured otherwise, not the engine's scaling.
    return base * 120 * int(os.environ.get("BENCH_DOCS_MULT", "1"))


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deekseek_ocr___dockerized_api_ray.pipelines.extract import run_extract
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_tumbling_hour,
        q1_pricing_summary,
    )
    from deekseek_ocr___dockerized_api_ray.sources.corpus import (
        cached_corpus_path,
        read_corpus,
    )
    from deekseek_ocr___dockerized_api_ray.stages.dedup import lsh_candidate_pairs
    from deekseek_ocr___dockerized_api_ray.stages.similarity import brute_force_topk

    n_docs = _n_docs()
    corpus_path = cached_corpus_path(n_docs, SEED, profile="bench")  # generate-once, untimed

    # warm the page cache with one untimed read
    read_corpus(corpus_path).count()

    queries: dict[str, float] = {}

    # headline: flagship extraction, sink = partitioned parquet.
    # tmpfs sink: on a real cluster output goes to distributed storage
    # whose bandwidth scales with nodes; a single local disk would make
    # the scaling measurement IO-bound, which is not what's under test.
    # Best-of-2: this sandbox is a shared box with ~2x wall-time noise;
    # min-of-k is the standard way to measure compute under co-tenancy.
    out_dir = f"/dev/shm/bench_extract_out_{NUM_CPUS}"
    extract_sec = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        # fixed-size pool (autoscaling from 1 actor never ramps up within
        # a short job) sized to 3/4 of the CPUs at EVERY level, so an
        # N-vs-4N comparison has exactly 4x the compute actors and the
        # remaining CPUs absorb read/write tasks at both levels
        ds = run_extract(read_corpus(corpus_path), mode="markdown",
                         ocr_concurrency=max(2, (3 * NUM_CPUS) // 4))
        ds.write_parquet(out_dir)
        extract_sec = min(extract_sec, time.perf_counter() - t0)
    queries["extract_flagship"] = round(extract_sec, 3)
    shutil.rmtree(out_dir, ignore_errors=True)

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        result = {
            "metric": "flagship extraction wall time (mock-OCR, span-equal pipeline)",
            "value": round(extract_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / extract_sec, 1),
        }
        ray.shutdown()
        return result

    # exploded strategy via the disk-partitioned exchange (the GPU-backend
    # dataflow shape), for the record alongside the fused headline.
    # Fresh Ray session first: the two flagship reps leave object-store /
    # shm pressure behind, and the spill leg is the one IO/memory-
    # bandwidth-bound leg -- BENCH_r04 read 37 s here while clean-box
    # self-runs read 20 s with q1 controls clean in the same session.
    ray.shutdown()
    time.sleep(3)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    spill = f"/dev/shm/bench_spill_{NUM_CPUS}"  # tmpfs: see sink note above
    # untimed worker-pool warm-up x2: the first heavy pipeline in a fresh
    # session pays ~30-50 Python worker cold starts (package + numpy +
    # pandas imports under full contention) -- measured 58-62 s first
    # rep vs ~8-9 s steady-state reduce on identical input, with the
    # penalty decaying over EXECUTIONS (62 -> 22 -> 8 s), not wall time
    # (a 30 s sleep between map and reduce does not help). Two small
    # exploded runs spin up the task-worker pool and the actor slots;
    # Ray then reuses those processes for the timed reps.
    warm_n = min(100_000, max(10_000, n_docs // 10))
    for _ in range(2):
        shutil.rmtree(spill, ignore_errors=True)
        run_extract(read_corpus(corpus_path).limit(warm_n), mode="markdown",
                    strategy="exploded", ocr_concurrency=max(2, (3 * NUM_CPUS) // 4),
                    spill_dir=spill).count()
    exploded_sec = float("inf")
    map_sec = reduce_sec = None
    # min-of-k with k>=3 here (vs 2 elsewhere): even after the small
    # warm-ups the FIRST full-scale rep's reduce stays ~2-3x steady
    # state (measured 22.4 vs 7.7/9.0 s on the same input) -- the warm
    # pool is necessary but the full-scale first-touch only amortizes
    # across full-scale executions, so rep0 is effectively one more
    # warm-up and the min comes from reps 1-2.
    for _ in range(max(3, int(os.environ.get("BENCH_REPS", "2")))):
        shutil.rmtree(spill, ignore_errors=True)
        timings: dict = {}
        t0 = time.perf_counter()
        run_extract(read_corpus(corpus_path), mode="markdown", strategy="exploded",
                    ocr_concurrency=max(2, (3 * NUM_CPUS) // 4), spill_dir=spill,
                    exchange_timings=timings).count()
        total = time.perf_counter() - t0
        if total < exploded_sec:
            exploded_sec = total
            map_sec = timings.get("map_sec")
            reduce_sec = total - map_sec if map_sec is not None else None
    queries["extract_exploded_spill"] = round(exploded_sec, 3)
    # per-phase attribution (best rep): map = read+explode+OCR+bucket
    # spill to the barrier; reduce = per-bucket read+reassemble+count.
    # Lets the artifact itself localize external-pressure slowdowns.
    if map_sec is not None:
        queries["extract_exploded_spill_map"] = round(map_sec, 3)
        queries["extract_exploded_spill_reduce"] = round(reduce_sec, 3)
    shutil.rmtree(spill, ignore_errors=True)

    t0 = time.perf_counter()
    q1_pricing_summary(SF_DIR).count()
    queries["q1_pricing_summary"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    events_tumbling_hour(SF_DIR).count()
    queries["events_tumbling_hour"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    import ray.data as rd

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    lsh_candidate_pairs(docs).count()
    queries["minhash_candidates"] = round(time.perf_counter() - t0, 3)

    # survivors leg, self-diagnosing: phase barriers (materialize) make
    # the artifact attribute candidates vs verify vs components cost --
    # BENCH_r04 read 29.5 s here vs candidates 8.1 s and the artifact
    # could not tell co-tenant noise from a regression. The fused total
    # is the sum of the phases plus two barrier materializations.
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        survivors_from_pairs,
        verify_pairs_jaccard,
    )

    t0 = time.perf_counter()
    cand_ds = lsh_candidate_pairs(docs).materialize()
    queries["minhash_survivors_p_candidates"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    verified = verify_pairs_jaccard(cand_ds, docs, threshold=0.8).materialize()
    queries["minhash_survivors_p_verify"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    survivors_from_pairs(docs, verified).count()
    queries["minhash_survivors_p_components"] = round(time.perf_counter() - t0, 3)
    queries["minhash_survivors"] = round(
        queries["minhash_survivors_p_candidates"]
        + queries["minhash_survivors_p_verify"]
        + queries["minhash_survivors_p_components"], 3)

    t0 = time.perf_counter()
    from deekseek_ocr___dockerized_api_ray.stages.dedup import snm_candidate_pairs

    snm_candidate_pairs(docs).count()
    queries["snm_pairs"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from deekseek_ocr___dockerized_api_ray.pipelines.text import source_checksums

    source_checksums(SF_DIR).count()
    queries["source_checksums"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from deekseek_ocr___dockerized_api_ray.stages.similarity import (
        embedding_neardup_pairs,
    )

    embedding_neardup_pairs(
        rd.read_parquet(f"{SF_DIR}/embeddings.parquet"), threshold=0.4
    ).count()
    queries["emb_neardup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).take_all()
    queries["ann_topk"] = round(time.perf_counter() - t0, 3)

    # approximate-ANN quality: recall vs the brute-force baseline
    from deekseek_ocr___dockerized_api_ray.stages.similarity import ivf_topk, lsh_topk

    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    def _recall(rows) -> float:
        got: dict = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        per_q = [
            len(got.get(q, set()) & s) / max(1, len(s)) for q, s in exact_sets.items()
        ]
        return round(sum(per_q) / len(per_q), 3)

    t0 = time.perf_counter()
    queries["ann_lsh_recall"] = _recall(lsh_topk(emb, [0, 1, 2, 3, 4], k=10).take_all())
    queries["ann_lsh"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    queries["ann_ivf_recall"] = _recall(ivf_topk(emb, [0, 1, 2, 3, 4], k=10).take_all())
    queries["ann_ivf"] = round(time.perf_counter() - t0, 3)
    from deekseek_ocr___dockerized_api_ray.stages.similarity import ivf_trained_topk

    t0 = time.perf_counter()
    queries["ann_ivf_trained_recall"] = _recall(
        ivf_trained_topk(emb, [0, 1, 2, 3, 4], k=10).take_all())
    queries["ann_ivf_trained"] = round(time.perf_counter() - t0, 3)

    # representative additions: the 3-table distributed join ladder and
    # the CMS-pruned heavy-hitter pass
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import nation_volume_q5
    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import cms_top_ngrams

    t0 = time.perf_counter()
    nation_volume_q5(SF_DIR).count()
    queries["nation_volume_q5"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cms_top_ngrams(SF_DIR).count()
    queries["cms_top_ngrams"] = round(time.perf_counter() - t0, 3)

    # round-4 operator families, one representative leg each
    from deekseek_ocr___dockerized_api_ray.pipelines.substring import (
        duplicated_substring_spans,
    )

    t0 = time.perf_counter()
    duplicated_substring_spans(SF_DIR, k=8).count()
    queries["substring_spans"] = round(time.perf_counter() - t0, 3)

    # exact prefix-filter similarity join (All-Pairs + PPJoin positional
    # and length filters): a routine leg since round 5 -- the r4 builds
    # read 114 s at sf0.1/32cpus (the ~30-word synthetic vocabulary
    # defeats rare-prefix skew pruning); PPJoin's overlap upper bounds
    # prune those low-selectivity prefixes directly.
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        prefix_filter_ngram_pairs,
    )

    t0 = time.perf_counter()
    prefix_filter_ngram_pairs(docs).count()
    queries["prefix_pairs_exact"] = round(time.perf_counter() - t0, 3)

    from deekseek_ocr___dockerized_api_ray.stages.similarity import pq_adc_topk

    t0 = time.perf_counter()
    pq_adc_topk(emb, [0, 1, 2, 3, 4], k=10).count()
    queries["ann_pq_adc"] = round(time.perf_counter() - t0, 3)

    from deekseek_ocr___dockerized_api_ray.stages.similarity import ivf_pq_topk

    t0 = time.perf_counter()
    queries["ann_ivf_pq_recall"] = _recall(
        ivf_pq_topk(emb, [0, 1, 2, 3, 4], k=10, n_lists=6, m=2,
                    n_clusters=4, n_probe=2).take_all())
    queries["ann_ivf_pq"] = round(time.perf_counter() - t0, 3)

    from deekseek_ocr___dockerized_api_ray.pipelines.text import gopher_gate
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_late_data,
    )

    t0 = time.perf_counter()
    gopher_gate(SF_DIR).count()
    queries["gopher_gate"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    events_late_data(SF_DIR).count()
    queries["events_late_data"] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship extraction wall time (mock-OCR, span-equal pipeline)",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        # MULT=4 (2.4M docs): fixed per-session overhead (~4-5 s actor-pool
        # startup + first read wave) drops to ~2% of even the 16-CPU leg,
        # so the ratio measures the engine, not the startup constant
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1", BENCH_REPS="1",
                   BENCH_DOCS_MULT=os.environ.get("BENCH_DOCS_MULT", "4"))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        time.sleep(8)  # let the previous Ray session's workers/shm fully drain
        return json.loads(out.strip().splitlines()[-1])

    # alternate the two levels twice and take the min per level: this box
    # is co-tenant-noisy and subprocess order otherwise biases the ratio.
    # N=4 vs 4N=16: the 32-logical-core box saturates memory bandwidth
    # near full occupancy (a single-node artifact -- real 4N-node clusters
    # add bandwidth with nodes), so the 4-vs-16 pair measures the
    # engine's scaling rather than the box's ceiling.
    lo, hi = int(os.environ.get("BENCH_SCALE_LO", "4")), int(os.environ.get("BENCH_SCALE_HI", "16"))
    rounds = int(os.environ.get("BENCH_SCALE_ROUNDS", "3"))
    runs = [r for _ in range(rounds) for r in (run_at(lo), run_at(hi))]
    r_lo = min((r for r in runs if r["num_cpus"] == lo), key=lambda r: r["value"])
    r_hi = min((r for r in runs if r["num_cpus"] == hi), key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    # per-leg spread (max/min over the pooled invocations): >1.3x means
    # the box was noisy enough that single readings are untrustworthy
    secs_lo = [r["value"] for r in runs if r["num_cpus"] == lo]
    secs_hi = [r["value"] for r in runs if r["num_cpus"] == hi]
    return {
        "metric": f"scaling efficiency (N={lo} vs 4N={hi} CPUs, same input)",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        f"spread_{lo}": round(max(secs_lo) / min(secs_lo), 3),
        f"spread_{hi}": round(max(secs_hi) / min(secs_hi), 3),
        "sf": SF_DIR,
        "n_docs": r_lo["n_docs"],
        "all_secs": {f"run{i}_cpus{r['num_cpus']}": r["value"] for i, r in enumerate(runs)},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
