"""Benchmark harness — prints ONE JSON line with headline timings.

Headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):
  - index_build: full inverted-index build (tokenize -> SPIMI partials ->
    (part,bucket) merge shuffle -> postings+dictionary) over the
    deterministic synthetic transcripts table at this scale (~600k turns at
    sf0.1), reported also as turns/sec.
  - query_batch: 1000 seeded queries through the QueryScorer actor pool
    (reported also as qps).
  - query_p50: median latency of 21 sequential reference-query-set searches
    through the persistent QueryService actor pool (serving path; the Ray
    Data path re-creates its actor pool per job and is the batch story).

--scaling: run the same job in two fresh processes at num_cpus=8 and 32 and
report throughput at both plus scaling efficiency (the sandbox substitute
for the N vs 4N cluster-size rule; see BASELINE.md).

Warm-run methodology: this sandbox VM demand-faults guest memory at ~10-20
MB/s on FIRST touch (measured: 400 MB first-touch 51 s, reuse 0.1 s), so a
cold run measures the hypervisor's lazy page loading, not the engine. Each
timed build is therefore preceded by one UNTIMED build of the same job
(faults the full working set; also warms the OS page cache per the Ray
guide), and the reference numbers are steady-state — matching the
reference's bench methodology of discarding the first iterations
(scripts/benchmark.py:84).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def _bench_queries(n: int = 1000, seed: int = 7):
    import numpy as np
    import pyarrow as pa

    from clip_as_service_ray.sources.transcripts import FULL_VOCAB

    rng = np.random.default_rng(seed)
    words = np.array(FULL_VOCAB, dtype=object)
    texts = [
        " ".join(words[rng.integers(0, len(words), rng.integers(1, 4))])
        for _ in range(n)
    ]
    return pa.table(
        {
            "query_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "limit": pa.array([10] * n, pa.int32()),
        }
    )


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.path.basename(os.path.normpath(sf_dir))
    sf = float(tag[2:]) if tag.startswith("sf") else 0.1
    n_turns_override = int(os.environ.get("BENCH_N_TURNS", "0"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search
    from clip_as_service_ray.pipelines.serving import QueryService
    from clip_as_service_ray.sources.transcripts import (
        n_turns_for_sf,
        reference_query_table,
        transcripts_path,
    )

    n_turns = n_turns_override or n_turns_for_sf(sf)
    src = transcripts_path(n_turns)  # cached deterministic fixture (dir)
    # warm OS page cache so we measure compute+shuffle, not first disk read
    files = (
        [os.path.join(src, f) for f in os.listdir(src)] if os.path.isdir(src) else [src]
    )
    for fp in files:
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass

    cfg = EngineConfig(
        # fixed partition count across parallelism levels (a real cluster
        # keeps its partitioning when nodes are added): comparable work units
        num_index_partitions=32,
        tokenize_concurrency=num_cpus,
        query_concurrency=max(2, num_cpus // 2),
        # the bench replays the SAME query set for min/p50 stats — with the
        # serving LRU cache on, those metrics would measure dict lookups,
        # not the scoring path. Cache benchmarking is not the goal here.
        query_cache_size=0,
    )
    index_dir = f"/tmp/cas_ray_bench/index_n{n_turns}_c{num_cpus}"

    timings: dict[str, float] = {}
    if os.environ.get("BENCH_NO_WARM", "") != "1":
        t0 = time.time()
        build_index(src, index_dir, cfg, overwrite=True)  # untimed warm run
        timings["index_build_cold"] = time.time() - t0
    # in-session reps reuse the warm Ray worker pool (this VM re-faults
    # fresh process heaps at hypervisor speed); min = noise-robust estimate.
    # Each rep builds into a FRESH dir: deleting the previous build's output
    # is driver-side serial IO and must stay outside the timed region.
    import shutil

    # default 3: this VM's warm-run variance is ~2.5x (hypervisor demand
    # paging) — a single rep is not a measurement; min-over-reps inside one
    # Ray session keeps the worker pool/object store faulted between reps
    build_reps = int(os.environ.get("BENCH_BUILD_REPS", "3"))
    rep_times = []
    for i in range(max(1, build_reps)):
        rep_dir = f"{index_dir}_rep{i}"
        shutil.rmtree(rep_dir, ignore_errors=True)  # untimed
        t0 = time.time()
        report = build_index(src, rep_dir, cfg)
        rep_times.append(time.time() - t0)
        if i < build_reps - 1:
            shutil.rmtree(rep_dir, ignore_errors=True)  # untimed
        else:
            shutil.rmtree(index_dir, ignore_errors=True)
            os.replace(rep_dir, index_dir)  # final index at the stable path
    timings["index_build"] = min(rep_times)
    build_runs = rep_times

    n_queries = int(os.environ.get("BENCH_N_QUERIES", "500"))
    n_hits = 0
    if n_queries > 0:
        qtbl = _bench_queries(n_queries)
        # Dataset path (cold): includes per-job actor-pool spin-up — the
        # offline-batch story where init amortizes over huge query sets
        t0 = time.time()
        n_hits = search(index_dir, qtbl, cfg).count()
        timings["query_batch_dataset_cold"] = time.time() - t0
        # steady-state serving throughput through the persistent pool
        svc_b = QueryService(index_dir, cfg)
        try:
            # warm with the FULL query set: replicas are round-robin, so a
            # small warm slice leaves most actors' term-score caches cold and
            # the first timed rep pays their misses (measured 5-6x)
            svc_b.search(qtbl)
            # min over reps: this VM has ~2.5x warm-run variance (hypervisor
            # demand paging), one sample is not a measurement
            batch_times = []
            for _ in range(5):
                t0 = time.time()
                n_hits = svc_b.search(qtbl).num_rows
                batch_times.append(time.time() - t0)
            timings["query_batch"] = min(batch_times)
        finally:
            svc_b.shutdown()
    else:
        timings["query_batch"] = 0.0

    query_profile: dict = {}
    if os.environ.get("BENCH_SKIP_P50", "") == "1":
        timings["query_p50"] = 0.0
        out_early = True
    else:
        out_early = False
    if not out_early:
        ref_q = reference_query_table()
        svc = QueryService(index_dir, cfg)
        try:
            svc.search(ref_q)  # warm (index load + term-score caches)
            lat = []
            for _ in range(21):
                t0 = time.time()
                svc.search(ref_q)
                lat.append(time.time() - t0)
            timings["query_p50"] = statistics.median(lat)
            timings["query_min"] = min(lat)  # noise floor alongside median
            query_profile = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in svc.profile().items()
            }
        finally:
            svc.shutdown()
        # doc-sharded serving layout (the cluster-scale serving story:
        # scatter-ALL across per-shard actors with union stats) — measured
        # on the same corpus split into 4 file groups
        files = sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        ) if os.path.isdir(src) else []
        if len(files) >= 4 and os.environ.get("BENCH_SHARDED", "1") == "1":
            from clip_as_service_ray.pipelines.sharded import (
                ShardedQueryService,
                build_sharded_index,
            )

            n_sh = 4
            groups = [files[i::n_sh] for i in range(n_sh)]
            shard_cfg = EngineConfig(
                num_index_partitions=8, tokenize_concurrency=num_cpus,
                query_cache_size=0,  # see cfg: repeated-set replay
            )
            shard_root = f"/tmp/cas_ray_bench/shards_n{n_turns}"
            build_sharded_index(groups, shard_root, shard_cfg)  # resumable
            svc_s = ShardedQueryService(shard_root, shard_cfg)
            try:
                svc_s.search(ref_q)  # warm
                lat = []
                for _ in range(21):
                    t0 = time.time()
                    svc_s.search(ref_q)
                    lat.append(time.time() - t0)
                timings["query_p50_sharded"] = statistics.median(lat)
                timings["query_min_sharded"] = min(lat)
            finally:
                svc_s.shutdown()

    # positional artifact + phrase/proximity serving (the full-text feature
    # beyond BM25). Round-3: the positional artifact is built by the FUSED
    # single-pass build (build_index(positions=True) — one corpus read, one
    # tokenize, two artifact sinks), so the reported positions cost is the
    # INCREMENT of the fused build over the plain build, not a second full
    # pass (round-2: standalone positions_build was 21.3 s vs 12.7 s build).
    if os.environ.get("BENCH_PHRASE", "1") == "1" and not out_early:
        import pyarrow as pa

        from clip_as_service_ray.pipelines.phrase import PhraseScorer
        from clip_as_service_ray.sources.transcripts import FULL_VOCAB

        pos_dir = f"{index_dir}_pos"
        pos_times = []
        for _ in range(2):  # min-over-reps, same discipline as index_build
            shutil.rmtree(pos_dir, ignore_errors=True)  # untimed
            t0 = time.time()
            build_index(src, pos_dir, cfg, positions=True)
            pos_times.append(time.time() - t0)
        timings["index_build_pos"] = min(pos_times)
        timings["positions_build"] = max(
            0.0, timings["index_build_pos"] - timings["index_build"]
        )
        hot = FULL_VOCAB[:8]
        phrases = [f"{hot[i]} {hot[(i + 1) % len(hot)]}" for i in range(8)]
        phr_q = pa.table(
            {
                "query_id": pa.array(range(len(phrases)), type=pa.int64()),
                "text": pa.array(phrases),
            }
        )
        # warm=True pre-builds the composite-key cache at spawn — the
        # serving-pool behavior (SegmentedPhraseService does the same), so
        # p50 measures the kernel, not first-touch paging
        t0 = time.time()
        scorer = PhraseScorer(pos_dir, default_limit=10, warm=True)
        timings["phrase_pool_spawn"] = time.time() - t0
        scorer(phr_q)  # warm residue (conv inversion caches)
        lat = []
        for _ in range(11):
            t0 = time.time()
            scorer(phr_q)
            lat.append(time.time() - t0)
        timings["phrase_p50"] = statistics.median(lat)
        timings["phrase_min"] = min(lat)

    total = timings["index_build"] + timings["query_batch"]
    out = {
        "metric": "index_build_plus_query_batch_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "index_build_runs": [round(x, 2) for x in build_runs],
        "sf": sf,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["index_build"], 1),
        "qps": (
            round(n_queries / timings["query_batch"], 1)
            if timings["query_batch"]
            else None
        ),
        "n_hits": n_hits,
        # per-stage query breakdown from the serving pool (profile() analog)
        "query_profile": query_profile,
        # per-stage build wall times of the LAST rep (manifest timings_s):
        # lets a reader attribute slow days to a stage (tokenize/merge are
        # memory+disk-bound and inflate with hypervisor paging; see
        # BASELINE.md degraded-box note)
        "build_stage_seconds": {
            k: round(v, 2) for k, v in report.get("timings_s", {}).items()
        },
        "index_counters": {
            "n_docs": report["n_docs"],
            "n_terms": report["n_terms"],
            "n_postings": report["n_postings"],
            "index_bytes": report["index_bytes"],
        },
    }
    ray.shutdown()
    return out


_CAL_PAT = None


def _cal_work(seed: int) -> int:
    """Pure-CPU calibration kernel: seeded regex findall over generated
    strings — no Ray, no shared state, embarrassingly parallel by
    construction. Anything below 1.0 scaling HERE is the box (hypervisor
    steal / shared bus), not the engine."""
    global _CAL_PAT
    import re

    import numpy as np

    if _CAL_PAT is None:
        _CAL_PAT = re.compile(r"[a-z]+|[0-9]")
    rng = np.random.default_rng(seed)
    words = np.array(["merge", "window", "the", "data", "stream", "index"], dtype=object)
    texts = [" ".join(words[rng.integers(0, 6, 30)]) for _ in range(20000)]
    return sum(len(_CAL_PAT.findall(t)) for t in texts)


def cpu_ceiling(lo: int, hi: int, reps: int = 3) -> dict:
    """Measured best-case scaling efficiency of this box from lo to hi
    worker processes on pure CPU-bound work. The engine's measured
    efficiency is reported both raw and normalized against this ceiling."""
    from multiprocessing import Pool

    def leg(n: int) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            with Pool(n) as p:
                p.map(_cal_work, range(128))
            best = min(best, time.time() - t0)
        return best

    sec_lo, sec_hi = leg(lo), leg(hi)
    return {
        "sec_lo": round(sec_lo, 2),
        "sec_hi": round(sec_hi, 2),
        "eff": round((sec_lo / sec_hi) / (hi / lo), 3),
    }


def mem_first_touch_mb_s(mb: int = 200) -> float:
    """First-touch page-fault bandwidth of fresh anonymous memory (MB/s).
    On this VM the hypervisor demand-faults at ~10-20 MB/s on healthy days
    and well below that on degraded days (see BASELINE.md); recording it
    alongside each scaling run lets a reader attribute a bad efficiency
    number to the box state rather than the engine."""
    import numpy as np

    t0 = time.time()
    a = np.ones(mb * 1024 * 1024 // 8)
    dt = time.time() - t0
    del a
    return round(mb / dt, 1)


def run_scaling() -> dict:
    # The sandbox hypervisor's lazy memory makes single runs noisy (build
    # wall time varies ~2.5x run to run with identical code); each leg is
    # therefore run REPS times and the best run is taken — min-time is the
    # standard noise-robust estimator, and both legs get identical treatment
    # on the same input.
    #
    # Input size: 9.6M turns (sf0.4-equivalent), 4x the per-round bench.
    # After the round-3 tokenizer vectorization the whole sf0.1 build is
    # ~20-40 CPU-seconds of work against ~2-3 s of fixed per-build cost
    # (dataset job spin-up, partials write finalize, manifest IO) — at that
    # ratio an 8->32 measurement reads the FIXED cost, not the engine
    # (t = W/c + F: scaling any job whose W/8 ~ F looks flat no matter how
    # well the work itself scales). 4x the input restores W >> F while
    # keeping each rep under ~30 s; the fixture is cached after first use.
    n_turns = int(os.environ.get("BENCH_SCALING_TURNS", "9600000"))
    reps = int(os.environ.get("BENCH_SCALING_REPS", "4"))

    def run(ncpu: int) -> dict:
        # one fresh process per leg; reps run INSIDE the session so the Ray
        # worker pool stays warm between them (min over reps)
        extra = {"RAY_GRAFT_CPUS": str(ncpu), "BENCH_N_QUERIES": "0",
                 "BENCH_NO_WARM": "1", "BENCH_N_TURNS": str(n_turns),
                 "BENCH_BUILD_REPS": str(reps), "BENCH_PHRASE": "0",
                 "BENCH_SHARDED": "0"}
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, **extra), capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pair = os.environ.get("BENCH_SCALING_CPUS", "8,32").split(",")
    lo, hi = int(pair[0]), int(pair[1])
    ceiling = cpu_ceiling(lo, hi)  # before the legs: no Ray running
    mem = mem_first_touch_mb_s()  # paging health context for this run
    r_lo, r_hi = run(lo), run(hi)
    sec_lo = r_lo["queries"]["index_build"]
    sec_hi = r_hi["queries"]["index_build"]
    tp_lo = round(n_turns / sec_lo, 1)
    tp_hi = round(n_turns / sec_hi, 1)
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency_turns_per_sec",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "n_turns": n_turns,
        "reps": reps,
        "turns_per_sec_lo": tp_lo,
        "turns_per_sec_hi": tp_hi,
        "sec_lo": round(sec_lo, 3),
        "sec_hi": round(sec_hi, 3),
        "sec_lo_runs": r_lo.get("index_build_runs"),
        "sec_hi_runs": r_hi.get("index_build_runs"),
        "query_p50_lo": r_lo["queries"]["query_p50"],
        "query_p50_hi": r_hi["queries"]["query_p50"],
        # measured pure-CPU scaling ceiling of THIS box (hypervisor steal /
        # shared bus): raw engine efficiency normalized against it is the
        # box-independent number
        "cpu_ceiling": ceiling,
        "eff_vs_cpu_ceiling": round(eff / ceiling["eff"], 3) if ceiling["eff"] else None,
        "mem_first_touch_mb_s": mem,
        "target": ">=0.8",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
