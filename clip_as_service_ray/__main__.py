"""CLI entry point — the analog of ``python -m clip_server``
(``/root/reference/server/clip_server/__main__.py:1-27``): one command to
bring up each pipeline from plain arguments, suitable for ``ray job submit``.

    python -m clip_as_service_ray build  --input T.parquet --index-dir IDX
    python -m clip_as_service_ray search --index-dir IDX --queries Q.parquet --out HITS.parquet
    python -m clip_as_service_ray bench  (alias of bench.py)

Owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="clip_as_service_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, help="transcripts parquet path/dir")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--overwrite", action="store_true")
    b.add_argument("--num-partitions", type=int, default=None)
    b.add_argument("--roles", default=None, help="comma-separated roles to index")
    b.add_argument(
        "--positions", action="store_true",
        help="also build the positional artifact from the same single "
        "tokenize pass (enables phrase/proximity queries)",
    )
    b.add_argument(
        "--analyzer", default=None, choices=["stem", "stop", "stop+stem"],
        help="post-tokenize analyzer (Porter stemming / English stopword "
        "removal); recorded in the index and auto-applied to every query "
        "against it",
    )

    s = sub.add_parser("search", help="run a query batch against an index")
    s.add_argument("--index-dir", required=True)
    s.add_argument(
        "--queries", required=True,
        help="parquet with query_id,text[,limit,exclude]",
    )
    s.add_argument("--out", default=None, help="write hits parquet here (else print)")
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--conjunctive", action="store_true", help="AND semantics")
    s.add_argument("--prefix", action="store_true", help="wildcard prefix queries")
    s.add_argument("--bool-prefix", action="store_true",
                   help="ES match_bool_prefix (search-as-you-type): last "
                        "term is a prefix query, the rest plain OR terms")
    s.add_argument("--suffix", action="store_true",
                   help="leading-wildcard *suffix queries")
    s.add_argument("--regex", action="store_true",
                   help="regexp term queries (Lucene RegexpQuery)")
    s.add_argument("--term-range", action="store_true",
                   help="term range queries '[lo TO hi]' (Lucene TermRangeQuery)")
    s.add_argument("--block-join",
                   choices=["sum", "avg", "max", "count", "parent"],
                   default=None,
                   help="rank conversations by aggregating matching turns "
                        "(ES has_child score_mode); 'parent' is the inverse "
                        "join (ES has_parent: children of matching turn-0 "
                        "parents, carrying the parent score)")
    s.add_argument("--fuzzy", type=int, default=0, help="edit-distance expansion")
    s.add_argument("--fuzzy-transpositions", action="store_true",
                   help="ES-default fuzziness metric: adjacent swap = 1 edit")
    s.add_argument(
        "--boosted", action="store_true",
        help="parse Lucene caret boosts in query text (merge^2 window)",
    )
    s.add_argument(
        "--collapse", action="store_true",
        help="one best turn per conversation (ES field-collapse)",
    )
    s.add_argument(
        "--min-match", type=int, default=0,
        help="minimum_should_match floor: docs must match >= N distinct terms",
    )
    s.add_argument(
        "--synonyms", default=None,
        help="JSON file mapping term -> [synonym terms]; expands OR queries "
        "at query time",
    )
    s.add_argument(
        "--decay", default=None,
        help="function_score doc-value spec as JSON: decay "
             '\'{"field": "ts", "origin": 0, "scale": 100, "kind": "gauss"}\' '
             'or field_value_factor \'{"kind": "fvf", "field": "pop", '
             '"factor": 0.5, "modifier": "log2p", "missing": 1}\' '
             "(needs the field's doc-values artifact; see build-doc-values)",
    )
    s.add_argument(
        "--terms-set-field", default=None,
        help="ES terms_set mode: doc-values field holding each doc's own "
             "minimum_should_match floor (needs build-doc-values)",
    )
    s.add_argument(
        "--delta", type=float, default=0.0,
        help="BM25+ bonus (Lv & Zhai 2011): score = idf * (tf_norm + delta); "
        "0 = classic BM25",
    )
    s.add_argument("--k1", type=float, default=None,
                   help="override BM25 k1 (exact path; default = index's)")
    s.add_argument("--b", type=float, default=None,
                   help="override BM25 b (exact path; default = index's)")
    s.add_argument(
        "--bool", action="store_true", dest="bool_query",
        help="full Lucene BooleanQuery: query text = must clauses, a "
             "per-query `should` column = optional clauses (--min-should "
             "floor), `exclude` column = must_not",
    )
    s.add_argument("--min-should", type=int, default=0,
                   help="minimum_should_match over the should clauses")
    s.add_argument(
        "--cutoff-frequency", type=float, default=None,
        help="Lucene CommonTermsQuery: df/N threshold splitting query terms "
             "into candidate-selecting (low) vs score-only (high) groups",
    )
    s.add_argument(
        "--similarity", default="bm25",
        choices=["bm25", "lmdirichlet", "lmjm", "tfidf", "boolean"],
        help="similarity module (Lucene/ES `similarity` setting); non-BM25 "
             "kernels score via the exact dense path",
    )
    s.add_argument(
        "--sim-param", type=float, default=None,
        help="similarity parameter: mu for lmdirichlet (default 2000), "
             "lambda for lmjm (default 0.1)",
    )
    s.add_argument(
        "--negative-boost", type=float, default=None,
        help="ES boosting query (soft NOT): demote docs matching each "
        "query's `negative` column text by this multiplier before top-k",
    )

    dv = sub.add_parser(
        "build-doc-values",
        help="add a numeric doc-values field to a built index "
             "(enables function_score decay queries)",
    )
    dv.add_argument("--input", required=True,
                    help="parquet with conv_id,turn_idx,<field>")
    dv.add_argument("--index-dir", required=True)
    dv.add_argument("--field", required=True)
    dv.add_argument("--value-column", default=None,
                    help="source column if named differently from --field")

    bp = sub.add_parser(
        "build-positions",
        help="add the positional artifact to a built index (phrase queries)",
    )
    bp.add_argument("--input", required=True, help="the index's source parquet")
    bp.add_argument("--index-dir", required=True)

    ph = sub.add_parser("phrase", help="exact phrase / proximity query batch")
    ph.add_argument("--index-dir", required=True)
    ph.add_argument("--queries", required=True, help="parquet with query_id,text[,limit]")
    ph.add_argument("--out", default=None)
    ph.add_argument("--window", type=int, default=0,
                    help="0 = exact phrase; >0 = proximity window (2+ terms)")
    ph.add_argument("--span-first", type=int, default=0,
                    help=">0 = single term within the first N positions "
                         "(Lucene SpanFirstQuery)")
    ph.add_argument("--prefix-last", action="store_true",
                    help="match_phrase_prefix: query text ends with '*', "
                         "the last token is a vocabulary prefix")
    ph.add_argument("--max-expansions", type=int, default=50,
                    help="prefix-last expansion cap (lex ASC, ES default 50)")
    ph.add_argument("--span-or", action="store_true",
                    help="SpanOrQuery: query text holds '|'-separated "
                         "phrase clauses; hits union the clause spans")
    ph.add_argument("--span-not-pre", type=int, default=0,
                    help="SpanNotQuery pre-window (tokens before the "
                         "include span; exclude phrase rides the queries "
                         "parquet 'not_phrase' column)")
    ph.add_argument("--span-not-post", type=int, default=0,
                    help="SpanNotQuery post-window (tokens after the "
                         "include span)")
    ph.add_argument("--max-gaps", type=int, default=-1,
                    help=">=0 = ES intervals mode (ordered 2-term match "
                         "with at most N tokens between; 0 = adjacent)")
    ph.add_argument("--within-phrase", default="",
                    help="SpanWithinQuery: hits are occurrences of the "
                         "query phrase enclosed by THIS big phrase")
    ph.add_argument("--contains-phrase", default="",
                    help="SpanContainingQuery: query text = 2 big terms "
                         "(span_near via --window), hits are pairs whose "
                         "envelope contains THIS little phrase")

    sg = sub.add_parser(
        "suggest", help="did-you-mean terms from the index dictionary"
    )
    sg.add_argument("--index-dir", required=True)
    sg.add_argument("--text", required=True, help="the (misspelled) term")
    sg.add_argument("--max-dist", type=int, default=2)
    sg.add_argument("--k", type=int, default=5)

    cp = sub.add_parser(
        "complete", help="prefix autocompletions from the index dictionary"
    )
    cp.add_argument("--index-dir", required=True)
    cp.add_argument("--text", required=True, help="the term prefix")
    cp.add_argument("--k", type=int, default=5)

    qs = sub.add_parser(
        "query",
        help="run query-language strings (OR/AND/NOT/-term/+must/term*/"
        "term~d/\"phrase\"/\"a b\"~N) against an index",
    )
    qs.add_argument("--index-dir", required=True)
    qs.add_argument("text", nargs="+", help="one or more query strings")
    qs.add_argument("--limit", type=int, default=10)
    qs.add_argument("--out", default=None, help="write hits parquet here")

    ex = sub.add_parser(
        "explain",
        help="per-term BM25 score breakdown of one document against a "
        "query (Lucene-explain analog; score == /search's, bit-identical)",
    )
    ex.add_argument("--index-dir", required=True)
    ex.add_argument("--text", required=True, help="the query text")
    ex.add_argument("--conv-id", required=True)
    ex.add_argument("--turn-idx", type=int, default=0)

    v = sub.add_parser("serve", help="serve an index over HTTP (/search, /health, /profile)")
    v.add_argument("--index-dir", required=True)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--auth-token", default=None,
                   help="require this Authorization header on every request")
    v.add_argument("--certfile", default=None, help="serve https:// with this cert")
    v.add_argument("--keyfile", default=None)
    v.add_argument("--synonyms", default=None,
                   help="JSON file term -> [synonyms], expands OR queries")

    g = sub.add_parser(
        "serve-segmented",
        help="serve a segmented index with the full lifecycle "
        "(POST /index, /search, /delete; GET /health)",
    )
    g.add_argument("--index-root", required=True)
    g.add_argument("--host", default="127.0.0.1")
    g.add_argument("--port", type=int, default=8080)
    g.add_argument("--auth-token", default=None,
                   help="require this Authorization header on every request")
    g.add_argument("--certfile", default=None, help="serve https:// with this cert")
    g.add_argument("--keyfile", default=None)
    g.add_argument("--synonyms", default=None,
                   help="JSON file term -> [synonyms], expands OR queries")
    g.add_argument("--analyzer", default=None,
                   choices=["stem", "stop", "stop+stem"],
                   help="analyzer for segments built via POST /index (must "
                   "match any existing segments)")

    w = sub.add_parser(
        "serve-ws",
        help="serve a segmented index over WebSocket (async front door: "
        "JSON ops search/phrase/index/delete/health, streamed batches)",
    )
    w.add_argument("--index-root", required=True)
    w.add_argument("--host", default="127.0.0.1")
    w.add_argument("--port", type=int, default=8081)
    w.add_argument("--positions", action="store_true")
    w.add_argument("--auth-token", default=None,
                   help="require this Authorization header on the ws handshake")
    w.add_argument("--certfile", default=None, help="serve wss:// with this cert")
    w.add_argument("--keyfile", default=None)

    gr = sub.add_parser(
        "serve-grpc",
        help="serve an index over gRPC (the reference's default scheme; "
        "Search/Encode/Suggest/Complete/Rank/Health/Profile)",
    )
    gr.add_argument("--index-dir", required=True)
    gr.add_argument("--host", default="127.0.0.1")
    gr.add_argument("--port", type=int, default=50051)
    gr.add_argument("--auth-token", default=None,
                    help="require this authorization metadata on every RPC")
    gr.add_argument("--certfile", default=None, help="serve grpcs:// with this cert")
    gr.add_argument("--keyfile", default=None)
    gr.add_argument("--synonyms", default=None,
                    help="JSON file term -> [synonyms], expands OR queries")

    c = sub.add_parser(
        "compact",
        help="physically purge tombstoned conversations from a segmented "
        "index (postings-level rewrite, no re-tokenize)",
    )
    c.add_argument("--index-root", required=True)

    rp = sub.add_parser(
        "replicate",
        help="cross-cluster replication (ES CCR analog): converge a "
        "follower root to a leader's segments + tombstones, incrementally",
    )
    rp.add_argument("--leader-root", required=True)
    rp.add_argument("--follower-root", required=True)

    sn = sub.add_parser("snapshot", help="point-in-time index snapshot "
                        "(hardlinked artifacts + size manifest)")
    sn.add_argument("--index-dir", required=True)
    sn.add_argument("--snap-dir", required=True)

    rs = sub.add_parser("restore", help="restore a snapshot (manifest-verified)")
    rs.add_argument("--snap-dir", required=True)
    rs.add_argument("--dest", required=True)

    sl = sub.add_parser("slm", help="snapshot-lifecycle run: next numbered "
                        "snapshot + retention prune (ES SLM analog)")
    sl.add_argument("--policy-dir", required=True)
    sl.add_argument("--index-dir", required=True)
    sl.add_argument("--keep", type=int, default=3)

    al = sub.add_parser("alias", help="atomic alias registry (set/resolve/"
                        "drop/list) — the zero-downtime reindex swap")
    al.add_argument("--registry", required=True)
    al.add_argument("--set", nargs=2, metavar=("ALIAS", "INDEX_DIR"))
    al.add_argument("--resolve", metavar="ALIAS")
    al.add_argument("--drop", metavar="ALIAS")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from clip_as_service_ray.config import EngineConfig

    try:
        if args.cmd == "build":
            from clip_as_service_ray.pipelines.build_index import build_index

            kwargs = {}
            if args.num_partitions:
                kwargs["num_index_partitions"] = args.num_partitions
            if args.roles:
                kwargs["index_roles"] = tuple(args.roles.split(","))
            if args.analyzer:
                kwargs["analyzer"] = args.analyzer
            report = build_index(
                args.input, args.index_dir, EngineConfig(**kwargs),
                overwrite=args.overwrite, positions=args.positions,
            )
            print(json.dumps(report, default=str))
        elif args.cmd == "search":
            import pyarrow.parquet as pq

            from clip_as_service_ray.pipelines.search import search_table

            queries = pq.read_table(args.queries)
            synonyms = None
            if args.synonyms:
                with open(args.synonyms) as f:
                    synonyms = json.load(f)
            hits = search_table(
                args.index_dir, queries, EngineConfig(limit=args.limit),
                conjunctive=args.conjunctive, prefix=args.prefix,
                fuzzy=args.fuzzy,
                fuzzy_transpositions=args.fuzzy_transpositions,
                synonyms=synonyms, delta=args.delta,
                boosted=args.boosted, min_match=args.min_match,
                collapse=args.collapse, suffix=args.suffix, regex=args.regex,
                term_range=args.term_range, block_join=args.block_join,
                decay=json.loads(args.decay) if args.decay else None,
                boosting=args.negative_boost,
                terms_set=args.terms_set_field,
                similarity=args.similarity, sim_param=args.sim_param,
                common_terms=args.cutoff_frequency,
                bool_query=args.bool_query, min_should=args.min_should,
                k1=args.k1, b=args.b, bool_prefix=args.bool_prefix,
            )
            if args.out:
                pq.write_table(hits, args.out)
                print(json.dumps({"hits": hits.num_rows, "out": args.out}))
            else:
                print(hits.to_pandas().to_string(index=False))
        elif args.cmd in ("suggest", "complete"):
            # dictionary-only ops: one local reader, no actor pool
            from clip_as_service_ray.stages.query import IndexReader

            reader = IndexReader(args.index_dir)
            if args.cmd == "suggest":
                rows = [
                    {"term": t, "dist": d, "df": df}
                    for t, d, df in reader.suggest(
                        args.text.strip().lower(), args.max_dist, args.k
                    )
                ]
            else:
                rows = [
                    {"term": t, "df": df}
                    for t, df in reader.complete(args.text.strip().lower(), args.k)
                ]
            print(json.dumps({"query": args.text, "terms": rows}))
        elif args.cmd == "query":
            from clip_as_service_ray.pipelines.querylang import query_string_table

            hits = query_string_table(
                args.index_dir, list(args.text),
                EngineConfig(limit=args.limit), limit=args.limit,
            )
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(hits, args.out)
                print(json.dumps({"hits": hits.num_rows, "out": args.out}))
            else:
                print(hits.to_pandas().to_string(index=False))
        elif args.cmd == "explain":
            from clip_as_service_ray.stages.query import IndexReader

            out = IndexReader(args.index_dir).explain(
                args.text, args.conv_id, args.turn_idx
            )
            if out is None:
                print(json.dumps({"error": "document not indexed"}))
                return 1
            print(json.dumps(out))
        elif args.cmd == "build-doc-values":
            from clip_as_service_ray.pipelines.docvalues import build_doc_values

            print(json.dumps(
                build_doc_values(
                    args.input, args.index_dir, args.field, EngineConfig(),
                    value_column=args.value_column,
                ),
                default=str,
            ))
        elif args.cmd == "build-positions":
            from clip_as_service_ray.pipelines.phrase import build_positions

            print(json.dumps(
                build_positions(args.input, args.index_dir, EngineConfig()),
                default=str,
            ))
        elif args.cmd == "phrase":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from clip_as_service_ray.pipelines.phrase import phrase_search_table

            queries = pq.read_table(args.queries)
            for flag, col in (
                (args.within_phrase, "within_phrase"),
                (args.contains_phrase, "contains_phrase"),
            ):
                if flag and col not in queries.column_names:
                    queries = queries.append_column(
                        col, pa.array([flag] * queries.num_rows, pa.string())
                    )
            hits = phrase_search_table(
                args.index_dir, queries, EngineConfig(), window=args.window,
                span_first=args.span_first, prefix_last=args.prefix_last,
                max_expansions=args.max_expansions, span_or=args.span_or,
                span_not_pre=args.span_not_pre,
                span_not_post=args.span_not_post,
                interval_gaps=args.max_gaps,
            )
            if args.out:
                pq.write_table(hits, args.out)
                print(json.dumps({"hits": hits.num_rows, "out": args.out}))
            else:
                print(hits.to_pandas().to_string(index=False))
        elif args.cmd == "serve":
            from clip_as_service_ray.pipelines.http_api import SearchHTTPServer

            synonyms = None
            if args.synonyms:
                with open(args.synonyms) as f:
                    synonyms = json.load(f)
            srv = SearchHTTPServer(args.index_dir, EngineConfig(), args.host, args.port,
                                   auth_token=args.auth_token,
                                   certfile=args.certfile, keyfile=args.keyfile,
                                   synonyms=synonyms)
            print(json.dumps({"serving": srv.url, "index_dir": args.index_dir}), flush=True)
            try:
                srv._thread.join()  # serve until interrupted
            except KeyboardInterrupt:
                pass
            finally:
                srv.shutdown()
        elif args.cmd == "replicate":
            from clip_as_service_ray.pipelines.ccr import replicate

            print(json.dumps(replicate(args.leader_root, args.follower_root)))
        elif args.cmd == "snapshot":
            from clip_as_service_ray.pipelines.admin import snapshot_index

            man = snapshot_index(args.index_dir, args.snap_dir)
            print(json.dumps({"files": len(man["files"]),
                              "bytes": sum(man["files"].values())}))
        elif args.cmd == "restore":
            from clip_as_service_ray.pipelines.admin import restore_index

            man = restore_index(args.snap_dir, args.dest)
            print(json.dumps({"files": len(man["files"]), "dest": args.dest}))
        elif args.cmd == "slm":
            from clip_as_service_ray.pipelines.admin import slm_run

            print(json.dumps(slm_run(args.policy_dir, args.index_dir,
                                     keep=args.keep)))
        elif args.cmd == "alias":
            from clip_as_service_ray.pipelines import admin

            if args.set:
                out = admin.set_alias(args.registry, args.set[0], args.set[1])
            elif args.drop:
                out = admin.drop_alias(args.registry, args.drop)
            elif args.resolve:
                out = {args.resolve: admin.resolve_alias(args.registry, args.resolve)}
            else:
                out = admin.list_aliases(args.registry)
            print(json.dumps(out))
        elif args.cmd == "compact":
            from clip_as_service_ray.pipelines.segments import compact_segments

            print(json.dumps(compact_segments(args.index_root, EngineConfig()), default=str))
        elif args.cmd == "serve-segmented":
            from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

            synonyms = None
            if args.synonyms:
                with open(args.synonyms) as f:
                    synonyms = json.load(f)
            seg_cfg = (
                EngineConfig(analyzer=args.analyzer)
                if args.analyzer
                else EngineConfig()
            )
            srv = SegmentedSearchHTTPServer(
                args.index_root, seg_cfg, args.host, args.port,
                auth_token=args.auth_token,
                certfile=args.certfile, keyfile=args.keyfile,
                synonyms=synonyms,
            )
            print(json.dumps({"serving": srv.url, "index_root": args.index_root}), flush=True)
            try:
                srv._thread.join()  # serve until interrupted
            except KeyboardInterrupt:
                pass
            finally:
                srv.shutdown()
        elif args.cmd == "serve-grpc":
            from clip_as_service_ray.pipelines.grpc_api import GrpcSearchServer

            synonyms = None
            if args.synonyms:
                with open(args.synonyms) as f:
                    synonyms = json.load(f)
            srv = GrpcSearchServer(
                args.index_dir, EngineConfig(), args.host, args.port,
                auth_token=args.auth_token,
                certfile=args.certfile, keyfile=args.keyfile,
                synonyms=synonyms,
            )
            print(json.dumps({"serving": srv.url, "index_dir": args.index_dir}), flush=True)
            try:
                srv._accept_thread.join()  # serve until interrupted
            except KeyboardInterrupt:
                pass
            finally:
                srv.shutdown()
        elif args.cmd == "serve-ws":
            from clip_as_service_ray.pipelines.ws_api import WebSocketSearchServer

            srv = WebSocketSearchServer(
                args.index_root, EngineConfig(), args.host, args.port,
                positions=args.positions, auth_token=args.auth_token,
                certfile=args.certfile, keyfile=args.keyfile,
            )
            print(json.dumps({"serving": srv.url, "index_root": args.index_root}), flush=True)
            try:
                srv._thread.join()  # serve until interrupted
            except KeyboardInterrupt:
                pass
            finally:
                srv.shutdown()
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
