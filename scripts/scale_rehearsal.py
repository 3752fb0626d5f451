"""24M-turn (sf1-equivalent) scale rehearsal — VERDICT r04 item 7.

The 100x scale story is argued from design; this measures it once on the
box: index build, steady-state serving, one dedup (exact, 128-bit hash
shuffle) and one groupby-heavy pass (term_df: token explode -> term
shuffle) over the SAME 24M-turn synthetic corpus the bench's scaling leg
uses at 9.6M. Records build_stage_seconds and peak worker RSS.

Usage: python scripts/scale_rehearsal.py [n_turns]   (default 24_000_000)
Writes one JSON line to stdout; paste the numbers into BASELINE.md.
Owns its Ray session (a script, not library code). Run EXCLUSIVELY — no
concurrent Ray processes, no concurrent pytest.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/cas_ray_scale24m"


def _rss_sampler(stop: threading.Event, out: dict) -> None:
    """Track peak summed + single-process RSS across the whole Ray tree
    (driver included) by sampling /proc every 2 s."""
    while not stop.is_set():
        total = peak_one = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if b"ray" not in cmd and b"python" not in cmd:
                    continue
                with open(f"/proc/{pid}/statm") as f:
                    rss_pages = int(f.read().split()[1])
                rss = rss_pages * 4096
                total += rss
                peak_one = max(peak_one, rss)
            except OSError:
                continue
        out["peak_total_rss_gb"] = max(
            out.get("peak_total_rss_gb", 0.0), round(total / 2**30, 2)
        )
        out["peak_proc_rss_gb"] = max(
            out.get("peak_proc_rss_gb", 0.0), round(peak_one / 2**30, 2)
        )
        stop.wait(2.0)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    os.makedirs(ROOT, exist_ok=True)
    rss: dict = {}
    stop = threading.Event()
    threading.Thread(target=_rss_sampler, args=(stop, rss), daemon=True).start()

    from clip_as_service_ray.sources.transcripts import (
        reference_query_table,
        transcripts_path,
    )

    t0 = time.time()
    src = transcripts_path(n_turns)  # cached after first call
    fixture_s = round(time.time() - t0, 1)

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import pyarrow as pa
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.serving import QueryService

    cfg = EngineConfig(
        num_index_partitions=32,
        tokenize_concurrency=num_cpus,
        query_concurrency=max(2, num_cpus // 2),
        query_cache_size=0,
    )
    out: dict = {"n_turns": n_turns, "num_cpus": num_cpus,
                 "fixture_s": fixture_s}

    # ---- index build: warm pass + 2 timed reps (min) ----
    idx = os.path.join(ROOT, "idx")
    build_index(src, idx + "_warm", cfg, overwrite=True)
    shutil.rmtree(idx + "_warm", ignore_errors=True)
    reps = []
    report = None
    for i in range(2):
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        report = build_index(src, idx, cfg)
        reps.append(round(time.time() - t0, 2))
    out["build_s"] = min(reps)
    out["build_runs"] = reps
    out["turns_per_sec"] = int(n_turns / out["build_s"])
    out["build_stage_seconds"] = {
        k: round(v, 2) for k, v in report["timings_s"].items()
    }
    out["index_bytes"] = report["index_bytes"]
    out["n_postings"] = report["n_postings"]

    # ---- steady-state serving on the 24M index ----
    qt = reference_query_table()
    svc = QueryService(idx, cfg)
    try:
        svc.search(qt)  # warm replica caches with the full set
        lat = []
        for _ in range(5):
            t0 = time.time()
            n_hits = svc.search(qt).num_rows
            lat.append(time.time() - t0)
        out["query_batch_min_s"] = round(min(lat), 4)
        out["qps"] = int(qt.num_rows / min(lat))
        out["n_hits"] = int(n_hits)
    finally:
        svc.shutdown()

    # ---- documents view of the same corpus for the operator legs ----
    doc_dir = os.path.join(ROOT, "sf_dir")
    doc_pq = os.path.join(doc_dir, "documents.parquet")
    if not os.path.isdir(doc_pq):
        os.makedirs(doc_pq + ".tmp", exist_ok=True)

        def to_docs(batch: pa.Table) -> pa.Table:
            import pandas as pd

            conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(conv.astype(object)).view("int64")
            doc_id = h * 64 + batch.column("turn_idx").to_numpy()
            return pa.table({
                "doc_id": pa.array(doc_id, pa.int64()),
                "text": batch.column("text"),
            })

        (
            ray.data.read_parquet(src, columns=["conv_id", "turn_idx", "text"])
            .map_batches(to_docs, batch_format="pyarrow")
            .write_parquet(doc_pq + ".tmp")
        )
        os.replace(doc_pq + ".tmp", doc_pq)

    from clip_as_service_ray.pipelines.operators import exact_dedup, term_df

    t0 = time.time()
    n_unique = exact_dedup(doc_dir).count()
    out["exact_dedup_s"] = round(time.time() - t0, 2)
    out["dedup_unique_docs"] = int(n_unique)

    t0 = time.time()
    n_terms = term_df(doc_dir).count()
    out["term_df_s"] = round(time.time() - t0, 2)
    out["term_df_terms"] = int(n_terms)

    stop.set()
    time.sleep(0.1)
    out.update(rss)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
