"""Deterministic synthetic transcripts table + reference query set.

Mirrors the reference's seeded benchmark generator
(``/root/reference/scripts/benchmark.py:19,56-66`` — docs = random vocab
words, fixed seed 123) but emits the exact ``input_hint`` schema from
BASELINE.json:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Determinism: numpy PCG64 with an explicit seed; no wall clock (ts is a fixed
epoch base + seeded increments). Same (n_turns, seed) -> byte-identical table.

Edge rows (FIXTURES.md §1) are injected at fixed positions in the first
conversation: empty text, whitespace-only, double-escaped HTML entities
(exercises the double html.unescape at simple_tokenizer.py:60), uppercase,
contractions (regex suffix branches, simple_tokenizer.py:89-92), digits,
punctuation runs, and non-Latin unicode.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Fixed base vocabulary; Zipf-weighted sampling makes the first entries
# stopword-hot (the skew path: "the" dominates df, exercising hot-term
# splitting).
VOCAB = (
    "the a of to and in for query data index search rank merge sort batch "
    "stream shard token score model vector table row column filter group join "
    "agent tool plan step code run test fix error retry cache disk memory "
    "node task actor block spill limit match hit term corpus turn reply ask "
    "answer think write read call result state config seed hash bucket "
    "don't we'll it's can't i'm you're they'd i've shouldn't "
    "naïve café coöperate zürich 東京 データ 検索 モデル"
).split()

# Extended tail vocabulary (deterministic compounds of base words): keeps the
# base words hot while giving the corpus a realistic vocabulary size (~8k
# terms) — without this every query is a stopword query and the index has
# one hot posting list per term.
_BASE_FOR_EXT = [w for w in VOCAB if w.isalpha() and w.isascii()]
FULL_VOCAB = VOCAB + [
    a + b for a in _BASE_FOR_EXT for b in _BASE_FOR_EXT if a != b
][: 8000 - len(VOCAB)]

EDGE_TEXTS = [
    "",  # empty-input contract (tests/test_client.py:83-98)
    "   \t  ",  # whitespace-only -> drops to zero terms
    "Tom &amp;amp; Jerry &amp;lt;tag&amp;gt;",  # double html.unescape path
    "SHOUTING CASE Text MiXeD",  # lowercase path
    "don't we'll it's CAN'T",  # contraction suffix branches
    "call 911 at 42nd street room 7",  # single-digit tokens
    "wow!!! really?!? ... --- ###",  # punctuation runs
    "東京 データ 検索 モデル naïve café",  # non-Latin / accented letters
]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return p / p.sum()


def synthesize_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    """Build a transcripts table with ~n_turns rows (exact count varies with
    the seeded conversation-length draw, then is trimmed to n_turns)."""
    rng = np.random.default_rng(seed)

    # conversation lengths: Zipf-ish in [1, 40]; draw until we cover n_turns
    draw = max(8, int(n_turns / 3))
    lens = np.minimum(rng.zipf(1.6, draw), 40).astype(np.int64)
    while lens.sum() < n_turns:
        lens = np.concatenate([lens, np.minimum(rng.zipf(1.6, draw), 40).astype(np.int64)])
    cum = np.cumsum(lens)
    n_convs = int(np.searchsorted(cum, n_turns, side="left")) + 1
    lens = lens[:n_convs]
    cum = cum[:n_convs]
    total = int(lens.sum())

    conv_ids_u = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)
    conv_idx = np.repeat(np.arange(n_convs), lens)
    conv_id = conv_ids_u[conv_idx]
    turn_idx = (np.arange(total) - np.repeat(cum - lens, lens)).astype(np.int32)

    roles = np.array(["user", "assistant", "system", "tool"], dtype=object)
    role = roles[rng.choice(4, total, p=[0.4, 0.4, 0.05, 0.15])]
    tools = np.array(["", "search", "bash", "python", "browser"], dtype=object)
    tool = np.where(
        role == "tool", tools[1 + rng.integers(0, 4, total)], ""
    ).astype(object)

    # per-turn text: dl words, Zipf term mixture over the full vocabulary
    # (base stopwords hot, long compound tail — realistic df skew)
    dl = np.clip(rng.lognormal(2.8, 0.9, total), 1, 300).astype(np.int64)
    probs = _zipf_probs(len(FULL_VOCAB))
    words = np.array(FULL_VOCAB, dtype=object)
    flat = words[rng.choice(len(FULL_VOCAB), int(dl.sum()), p=probs)]
    bounds = np.cumsum(dl)[:-1]
    texts = np.array([" ".join(chunk) for chunk in np.split(flat, bounds)], dtype=object)

    # inject edge rows at the head (first conversation's turns, then spill on)
    for i, t in enumerate(EDGE_TEXTS):
        if i < total:
            texts[i] = t

    # monotone timestamps within conversation; fixed epoch base
    base_us = 1_700_000_000_000_000  # fixed; no wall clock
    conv_base = rng.integers(0, 86_400_000_000, n_convs)
    step = rng.integers(1_000_000, 60_000_000, total)
    # cumulative step within each conversation: global cumsum minus the
    # cumsum value just before each conversation's first row
    cstep = np.cumsum(step)
    conv_start = cum - lens
    before = np.where(conv_start > 0, cstep[conv_start - 1], 0)
    within = cstep - np.repeat(before, lens)
    ts = base_us + conv_base[conv_idx] + within

    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    return table.slice(0, n_turns)


# Reference query set (FIXTURES.md §2): single-term, multi-term, one hot
# stopword (skew path), one absent term (empty-result path), one empty string
# (empty-input contract), plus contraction/unicode/digit probes.
REFERENCE_QUERIES = [
    ("index", 10),
    ("query data search", 10),
    ("the", 10),  # hot stopword
    ("zzzzunseen", 10),  # absent from corpus -> empty result
    ("", 10),  # empty-input contract
    ("don't", 10),
    ("東京 データ", 10),
    ("42 7", 10),
    ("merge sort batch stream", 10),
    ("actor block spill", 1),
    ("model vector", 2),
    ("Tom &amp; Jerry", 10),
]


def reference_query_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array(range(len(REFERENCE_QUERIES)), pa.int64()),
            "text": pa.array([q for q, _ in REFERENCE_QUERIES], pa.string()),
            "limit": pa.array([k for _, k in REFERENCE_QUERIES], pa.int32()),
        }
    )


def transcripts_path(n_turns: int, seed: int = 42, root: str = "/tmp/cas_ray_fixtures") -> str:
    """Materialize (once, cached) the synthetic table as a DIRECTORY of
    parquet shards; return the directory path.

    Many files, not one: a single parquet file serializes its footer/metadata
    handling and costs ~4x in read wall time at 8+ readers (measured on this
    box); at cluster scale the input is always many files, so the fixture
    mirrors that. Written atomically (tmp dir + rename) so concurrent bench
    processes at two parallelism levels can share one fixture.
    """
    os.makedirs(root, exist_ok=True)
    n_files = max(1, min(64, n_turns // 75_000))
    path = os.path.join(root, f"transcripts_n{n_turns}_s{seed}_f{n_files}")
    if not os.path.exists(path):
        table = synthesize_transcripts(n_turns, seed)
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        step = -(-table.num_rows // n_files)
        for i in range(n_files):
            pq.write_table(
                table.slice(i * step, step),
                os.path.join(tmp, f"part-{i:04d}.parquet"),
                row_group_size=64 * 1024,
            )
        try:
            os.replace(tmp, path)
        except OSError:  # lost the race: another process materialized it
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return path


def n_turns_for_sf(sf: float) -> int:
    """Scale mapping: sf0.001 ~ 24k turns, sf0.1 ~ 2.4M turns (sized so the
    bench build's compute dominates fixed job overheads — see BASELINE.md)."""
    return max(64, int(24_000_000 * sf))
