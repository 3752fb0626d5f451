"""Distributed BPE: corpus word-count -> merge training -> encode stage.

The reference loads a FROZEN 49k-merge vocab once per process and encodes
with a per-token LRU cache (simple_tokenizer.py:71-92). This engine keeps
that encode shape (broadcast ranks + per-worker cache, T6 in SURVEY §2)
but also LEARNS the table from the corpus, split Ray-Data-first:

- ``word_frequencies`` — the only corpus-sized pass: per-batch tokenize +
  ``value_counts`` partials (a combiner — only distinct (word, n) rows leave a
  batch), one small ``groupby(word)`` finishes the sums. ``min_count``
  prunes the hapax tail BEFORE the table comes to the driver; at web scale
  the surviving distinct-word table is orders of magnitude smaller than the
  corpus (the standard BPE-trainer contract — trainers operate on word
  frequencies, not running text).
- ``train_bpe_from_dataset`` — the merge loop itself runs on that weighted
  word table (corpus-size-independent; functions/bpe.py).
- ``BpeEncode`` — actor-pool ``map_batches`` stage: ranks fetched from the
  object store once per actor in ``__init__``, per-actor word cache, and
  within a batch each DISTINCT word is encoded once (factorize first) —
  zipfian text makes that a large constant factor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.partitions import parts_for_dataset

from clip_as_service_ray.functions.bpe import bpe_word, merge_ranks, train_bpe
from clip_as_service_ray.functions.tokenizer import tokenize_column_flat


def word_frequencies(
    ds,
    *,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
) -> pa.Table:
    """(word, n) over the corpus, n >= min_count, sorted by word."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        tokens, _ = tokenize_column_flat(batch.column(text_col))
        if len(tokens) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = tokens.value_counts()  # C++ hash count, replaces the Counter loop
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    if num_partitions is None:
        num_partitions = parts_for_dataset(ds)
    agg = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("word", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        agg = agg.filter(expr=f"n >= {min_count}")
    out = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return out.sort_by("word")


def train_bpe_from_dataset(
    ds,
    *,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    num_partitions: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed word count, then the driver-side merge loop."""
    wf = word_frequencies(
        ds, text_col=text_col, min_count=min_count, num_partitions=num_partitions
    )
    freqs = dict(
        zip(wf.column("word").to_pylist(),
            (int(n) for n in wf.column("n").to_pylist()))
    )
    return train_bpe(freqs, num_merges)


class BpeEncode:
    """map_batches actor: text -> bpe_tokens (list<string>) + n_bpe_tokens.

    ``ranks_ref`` is a ``ray.put`` of the ranks dict — one fetch per actor
    (T6 load-once), per-actor cross-batch word cache with a size cap.
    """

    CACHE_MAX = 1 << 18

    def __init__(self, ranks_ref, text_col: str = "text"):
        import ray

        self.ranks = ray.get(ranks_ref)
        self.text_col = text_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.cache) > self.CACHE_MAX:
            self.cache.clear()
        flat_tokens, lens = tokenize_column_flat(batch.column(self.text_col))
        denc = flat_tokens.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64) if len(flat_tokens) else np.array([], np.int64)
        uniques = denc.dictionary.to_pylist()
        encoded = [bpe_word(w, self.ranks, self.cache) for w in uniques]

        # ragged assembly: per input row, concatenate its words' token tuples
        toks_per_word = np.fromiter(
            (len(e) for e in encoded), dtype=np.int64, count=len(encoded)
        )
        word_tok_counts = toks_per_word[codes] if len(codes) else np.array([], np.int64)
        n_rows = len(lens)
        row_of_word = np.repeat(np.arange(n_rows), lens)
        n_tokens_row = np.bincount(
            row_of_word, weights=word_tok_counts, minlength=n_rows
        ).astype(np.int64)

        flat_bpe = [t for c in codes for t in encoded[c]]
        offsets = np.concatenate([[0], np.cumsum(n_tokens_row)]).astype(np.int64)
        tok_col = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat_bpe, pa.string())
        )
        return batch.append_column("bpe_tokens", tok_col).append_column(
            "n_bpe_tokens", pa.array(n_tokens_row, pa.int64())
        )


def bpe_encode(ds, merges: list[tuple[str, str]], *, text_col: str = "text",
               concurrency: int = 2, batch_size: int = 1024):
    """Attach bpe_tokens / n_bpe_tokens to every row of ``ds``."""
    import ray

    ranks_ref = ray.put(merge_ranks(merges))
    return ds.map_batches(
        BpeEncode,
        fn_constructor_kwargs={"ranks_ref": ranks_ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def bpe_token_counts(
    ds, merges: list[tuple[str, str]], *, text_col: str = "text",
    num_partitions: int | None = None, concurrency: int = 2,
) -> pa.Table:
    """Global (token, n) frequency table of the BPE-encoded corpus.

    Per-batch combiner (token counts partial) then one small groupby —
    identical exchange shape to ``word_frequencies``.
    """
    from ray.data.aggregate import Sum

    encoded = bpe_encode(ds, merges, text_col=text_col, concurrency=concurrency)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("bpe_tokens").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.flatten()
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())})

    agg = (
        encoded.map_batches(partial, batch_format="pyarrow")
        .groupby("token", num_partitions=num_partitions or parts_for_dataset(ds))
        .aggregate(Sum("n", alias_name="n"))
    )
    return pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
