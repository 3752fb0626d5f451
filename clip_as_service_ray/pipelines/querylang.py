"""Query-string front end — the Lucene QueryParser analog.

The engine exposes its retrieval modes as separate flags/columns
(``search_table(conjunctive=, prefix=, fuzzy=)``, an ``exclude`` column,
``phrase_search_table(window=)``). This module maps ONE human query string
onto those primitives:

    merge window            OR (default)
    merge AND window        conjunctive (every term must match)
    merge NOT part          boolean NOT (also: merge -part)
    +merge window -part     Lucene occurs syntax -> full bool query: +term
                            is a must clause, bare terms are should
                            clauses, -term is must_not
    mer*                    wildcard prefix expansion
    *ger                    leading wildcard (suffix expansion)
    s?a* / m*ge             general wildcard (?/mid-pattern *) -> compiled
                            to the regex automaton, Lucene WildcardQuery
    /m.rge/                 regexp term query (full match over the vocab)
    mrge~2                  fuzzy (edit distance <= 2)
    merge^2 window          caret boost (weighted OR; weights multiply BM25)
    "merge window"          exact phrase (needs the positional artifact)
    "merge window"~4        proximity (terms within 4 tokens; 3+ terms
                            anchor at the first — span_near)
    "the win*"              match_phrase_prefix (trailing-* on the LAST
                            term expands over the dictionary)
    [mer TO mes]            term range, inclusive (Lucene TermRangeQuery;
                            {..} = exclusive end, * = unbounded)

Composition rules mirror what the engine's kernels implement; anything the
kernels cannot express (mixed AND/OR, multiple prefixes, a phrase plus
loose terms) raises ``ValueError`` instead of silently approximating.
``NOT`` composes with every mode (the exclude column flows through all
scorers). Caret-boosted queries skip server-level synonym expansion (the
boosted kernel has no per-group weight inheritance; QueryScorer rejects the
combination, so the parser routes boosted strings to a synonym-free pool)."""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig

def wildcard_to_regex(pattern: str) -> str:
    """ES/Lucene wildcard -> anchored regex: ``*`` = any sequence, ``?`` =
    any single char, everything else literal (Lucene WildcardQuery compiles
    to the same automaton). Full-match semantics — ``expand_regex`` uses
    ``fullmatch``, so no anchors needed."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


_PHRASE_RE = re.compile(r'^"(?P<body>[^"]+)"(?:~(?P<win>\d+))?$')
_FUZZY_RE = re.compile(r"^(?P<body>[^~\s]+)~(?P<dist>\d+)?$")
_BOOST_RE = re.compile(r"^(?P<body>[^\^\s]+)\^(?P<w>\d+(?:\.\d+)?)$")
_RANGE_RE = re.compile(r"^[\[{]\s*\S+\s+TO\s+\S+\s*[\]}]$")


@dataclass
class QuerySpec:
    """Parsed form of one query string; maps 1:1 onto engine kernels."""

    text: str = ""
    exclude: str = ""
    conjunctive: bool = False
    prefix: bool = False
    suffix: bool = False
    regex: bool = False
    fuzzy: int = 0
    boosted: bool = False
    term_range: bool = False
    phrase: str | None = None
    window: int = 0
    #: trailing-* last term inside quotes -> match_phrase_prefix kernel
    phrase_prefix: bool = False
    #: Lucene occurs form: +must clauses present -> the full bool kernel
    bool_query: bool = False
    should: str = ""
    #: raw positive tokens, pre-join (for tests / introspection)
    terms: list[str] = field(default_factory=list)


def parse_query(s: str) -> QuerySpec:
    """Parse one query string into a :class:`QuerySpec`. See module doc."""
    s = (s or "").strip()
    spec = QuerySpec()
    if not s:
        return spec

    if _RANGE_RE.match(s):
        # whole-query term range [lo TO hi] / {lo TO hi}; the reader's
        # parse_term_range owns bound/inclusivity parsing
        spec.term_range = True
        spec.text = s
        return spec

    m = _PHRASE_RE.match(s)
    if m:
        spec.phrase = m.group("body").strip()
        spec.window = int(m.group("win") or 0)
        if spec.window and len(spec.phrase.split()) < 2:
            raise ValueError('proximity form "a b"~N takes >= 2 terms')
        body_terms = spec.phrase.split()
        if body_terms and body_terms[-1].endswith("*"):
            # "the s*" -> match_phrase_prefix (ES) / MultiPhraseQuery
            spec.phrase_prefix = True
            if spec.window:
                raise ValueError(
                    'phrase-prefix does not compose with the ~N window'
                )
        if any(
            "*" in t[: -1 if i == len(body_terms) - 1 else None] or "?" in t
            for i, t in enumerate(body_terms)
        ):
            raise ValueError(
                "wildcards inside a phrase are only supported as a "
                "trailing-* on the LAST term (match_phrase_prefix)"
            )
        return spec
    if '"' in s:
        raise ValueError(
            "a phrase must be the whole query (loose terms beside a quoted "
            "phrase are not expressible by the positional kernel)"
        )

    raw = s.split()
    positives: list[str] = []
    musts: list[str] = []
    excludes: list[str] = []
    and_seen = or_gap = False
    expect_not = False
    for tok in raw:
        if tok == "AND":
            and_seen = True
            continue
        if tok == "OR":
            continue  # OR is the default combinator
        if tok == "NOT":
            expect_not = True
            continue
        if tok.startswith("-") and len(tok) > 1:
            excludes.append(tok[1:])
            continue
        if tok.startswith("+") and len(tok) > 1:
            musts.append(tok[1:])
            continue
        if expect_not:
            excludes.append(tok)
            expect_not = False
            continue
        positives.append(tok)
    if expect_not:
        raise ValueError("dangling NOT")
    if musts:
        # Lucene occurs syntax -> the full bool kernel: +terms are must
        # clauses, bare terms should clauses, -terms must_not. No other
        # marker composes (the kernels have no must-aware variants).
        if and_seen:
            raise ValueError("+must does not compose with AND (must IS and)")
        specials = [t for t in musts + positives
                    if t.endswith("*") or t.startswith("*") or "~" in t
                    or "^" in t or t.startswith("/")]
        if specials:
            raise ValueError(
                f"+must queries take plain terms only (got {specials[0]!r})"
            )
        spec.bool_query = True
        spec.terms = musts + positives
        spec.text = " ".join(musts)
        spec.should = " ".join(positives)
        spec.exclude = " ".join(excludes)
        return spec
    # AND must bind every gap: "a AND b c" would be a mixed-boolean tree the
    # conjunctive kernel cannot express
    if and_seen:
        n_gaps = len(positives) - 1
        n_ands = sum(1 for t in raw if t == "AND")
        if n_gaps != n_ands:
            raise ValueError(
                "mixed AND/OR is not expressible (AND must join every term)"
            )
        spec.conjunctive = True

    # wildcard / fuzzy markers
    cleaned: list[str] = []
    for tok in positives:
        pure_prefix = (
            tok.endswith("*") and len(tok) > 1
            and "*" not in tok[:-1] and "?" not in tok
        )
        pure_suffix = (
            tok.startswith("*") and len(tok) > 1
            and "*" not in tok[1:] and "?" not in tok
        )
        if (
            ("*" in tok or "?" in tok)
            and not pure_prefix and not pure_suffix
            and tok.strip("*?")
            and not (tok.startswith("/") and tok.endswith("/") and len(tok) > 2)
        ):
            # general wildcard (? anywhere / mid-pattern *): Lucene
            # WildcardQuery semantics — compile to the regex automaton
            if spec.regex or len(positives) > 1:
                raise ValueError("wildcard queries take exactly one pattern")
            spec.regex = True
            cleaned.append(wildcard_to_regex(tok))
            continue
        if pure_prefix:
            if spec.prefix or len(positives) > 1:
                raise ValueError("prefix queries take exactly one term*")
            spec.prefix = True
            cleaned.append(tok[:-1])
            continue
        if tok.startswith("*") and len(tok) > 1:
            if spec.suffix or len(positives) > 1:
                raise ValueError("suffix queries take exactly one *term")
            spec.suffix = True
            cleaned.append(tok[1:])
            continue
        if tok.startswith("/") and tok.endswith("/") and len(tok) > 2:
            if spec.regex or len(positives) > 1:
                raise ValueError("regex queries take exactly one /pattern/")
            spec.regex = True
            cleaned.append(tok[1:-1])
            continue
        fm = _FUZZY_RE.match(tok)
        if fm and "~" in tok:
            d = int(fm.group("dist") or 2)
            if spec.fuzzy and spec.fuzzy != d:
                raise ValueError("all fuzzy terms must share one distance")
            spec.fuzzy = d
            cleaned.append(fm.group("body"))
            continue
        if _BOOST_RE.match(tok):
            # keep the caret clause verbatim: the boosted kernel
            # (IndexReader.parse_boosts) owns weight parsing
            spec.boosted = True
        cleaned.append(tok)
    if spec.prefix and (spec.conjunctive or spec.fuzzy):
        raise ValueError("prefix does not compose with AND/fuzzy")
    if (spec.suffix or spec.regex) and (spec.conjunctive or spec.fuzzy):
        raise ValueError("suffix/regex do not compose with AND/fuzzy")
    if spec.conjunctive and spec.fuzzy:
        raise ValueError("fuzzy does not compose with AND")
    if spec.boosted and (spec.conjunctive or spec.prefix or spec.fuzzy
                         or spec.suffix or spec.regex):
        raise ValueError("caret boosts apply to plain OR queries only")

    spec.terms = cleaned
    spec.text = " ".join(cleaned)
    spec.exclude = " ".join(excludes)
    return spec


def query_string_table(
    index_dir: str,
    queries,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    limit: int | None = None,
    synonyms: dict | None = None,
) -> pa.Table:
    """Run query STRINGS end to end: parse each, group by kernel shape,
    dispatch to ``search_table`` / ``phrase_search_table``, and return the
    union of flat hits sorted (query_id ASC, rank ASC). ``queries`` is a
    list[str] (ids = positions) or a (query_id, text[, limit]) table of
    query-language strings."""
    from clip_as_service_ray.pipelines.oracle import HITS_SCHEMA
    from clip_as_service_ray.pipelines.phrase import phrase_search_table
    from clip_as_service_ray.pipelines.search import search_table

    if isinstance(queries, list):
        qids = list(range(len(queries)))
        texts = [str(q) for q in queries]
        limits = [limit or config.limit] * len(texts)
    else:
        qids = queries.column("query_id").to_pylist()
        texts = queries.column("text").to_pylist()
        limits = (
            queries.column("limit").to_pylist()
            if "limit" in queries.column_names
            else [limit or config.limit] * len(qids)
        )

    specs = [parse_query(t) for t in texts]
    parts: list[pa.Table] = []
    # group compatible specs into one engine call per kernel shape — the
    # request batcher: N strings of the same shape ride one actor-pool pass
    shapes: dict[tuple, list[int]] = {}
    for i, sp in enumerate(specs):
        if sp.phrase is not None:
            key = ("phrase", sp.window, sp.phrase_prefix)
        else:
            key = ("search", sp.conjunctive, sp.prefix, sp.fuzzy, sp.boosted,
                   sp.suffix, sp.regex, sp.term_range, sp.bool_query)
        shapes.setdefault(key, []).append(i)
    for key, idxs in shapes.items():
        if key[0] == "phrase":
            qt = pa.table(
                {
                    "query_id": pa.array([qids[i] for i in idxs], pa.int64()),
                    "text": pa.array([specs[i].phrase for i in idxs]),
                    "limit": pa.array([int(limits[i]) for i in idxs], pa.int32()),
                }
            )
            # eager artifact check: inside the actor pool a missing
            # positions dir surfaces as an opaque ActorDiedError
            from clip_as_service_ray.state import manifest as mf

            if not mf.stage_done(os.path.join(index_dir, "positions")):
                raise FileNotFoundError(
                    f"quoted-phrase queries need the positional artifact, "
                    f"which {index_dir!r} does not have — build it with "
                    f"build_index(..., positions=True) or the CLI "
                    f"`build-positions --index-dir {index_dir}`"
                )
            hits = phrase_search_table(
                index_dir, qt, config, window=key[1], prefix_last=key[2]
            )
            # phrase hits rank by phrase_tf (no BM25 model); surface it as
            # the score column so the union shares one flat schema
            parts.append(
                pa.table(
                    {
                        "query_id": hits.column("query_id"),
                        "rank": hits.column("rank"),
                        "conv_id": hits.column("conv_id"),
                        "turn_idx": hits.column("turn_idx"),
                        "score": hits.column("phrase_tf").cast(pa.float64()),
                    }
                )
            )
        else:
            _, conj, pref, fz, bo, suf, rx, trng, bq = key
            cols = {
                "query_id": pa.array([qids[i] for i in idxs], pa.int64()),
                "text": pa.array([specs[i].text for i in idxs]),
                "limit": pa.array([int(limits[i]) for i in idxs], pa.int32()),
            }
            if any(specs[i].exclude for i in idxs):
                cols["exclude"] = pa.array([specs[i].exclude for i in idxs])
            if bq and any(specs[i].should for i in idxs):
                cols["should"] = pa.array([specs[i].should for i in idxs])
            parts.append(
                search_table(
                    index_dir, pa.table(cols), config,
                    conjunctive=conj, prefix=pref, fuzzy=fz,
                    synonyms=None if (bo or suf or rx or trng or bq) else synonyms,
                    boosted=bo, suffix=suf, regex=rx, term_range=trng,
                    bool_query=bq,
                )
            )
    if not parts:
        return HITS_SCHEMA.empty_table()
    out = pa.concat_tables([p.cast(HITS_SCHEMA) for p in parts])
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])
