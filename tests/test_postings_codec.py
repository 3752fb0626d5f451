"""Posting-list codec round-trip + block-max metadata properties."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clip_as_service_ray.functions import bm25
from clip_as_service_ray.state.postings import (
    BLOCK_SCHEMA,
    decode_block,
    encode_block,
    encode_postings_to_blocks,
)


def test_roundtrip_simple():
    docs = np.array([5, 7, 300, 70000, 2**33], dtype=np.int64)
    tfs = np.array([1, 2, 255, 256, 70000], dtype=np.int64)
    dls = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    doc_w, tf_w, dl_w, data = encode_block(docs, tfs, dls)
    d2, t2, l2 = decode_block(data, 5, doc_w, tf_w, dl_w, int(docs[0]))
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=100_000),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_roundtrip_property(rows):
    rows.sort()
    docs = np.array(sorted({d for d, _, _ in rows}), dtype=np.int64)
    tfs = np.array([1 + (int(d) % 97) for d in docs], dtype=np.int64)
    dls = np.array([1 + (int(d) % 31) for d in docs], dtype=np.int64)
    doc_w, tf_w, dl_w, data = encode_block(docs, tfs, dls)
    d2, t2, l2 = decode_block(data, len(docs), doc_w, tf_w, dl_w, int(docs[0]))
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)


def test_encode_postings_to_blocks():
    n = 1000
    docs = np.arange(0, 3 * n, 3, dtype=np.int64)
    tfs = 1 + (docs % 7)
    dls = 10 + (docs % 50)
    avgdl = 30.0
    cols = encode_postings_to_blocks(
        "term", docs, tfs, dls, block_size=128, avgdl=avgdl
    )
    table = pa.table(cols, schema=BLOCK_SCHEMA)
    assert table.num_rows == (n + 127) // 128
    # decode all blocks and reassemble
    got_docs, got_tfs, got_dls, got_max = [], [], [], []
    for row in table.to_pylist():
        d, t, l = decode_block(
            row["data"], row["n"], row["doc_w"], row["tf_w"], row["dl_w"], row["first_doc"]
        )
        assert row["last_doc"] == d[-1]
        got_docs.append(d)
        got_tfs.append(t)
        got_dls.append(l)
        # block-max invariant: every posting's tf_norm <= block max
        assert np.all(bm25.tf_norm(t, l, avgdl) <= row["max_tf_norm"] + 1e-12)
        got_max.append(row["max_tf_norm"])
    np.testing.assert_array_equal(np.concatenate(got_docs), docs)
    np.testing.assert_array_equal(np.concatenate(got_tfs), tfs)
    np.testing.assert_array_equal(np.concatenate(got_dls), dls)


def test_fused_emit_equals_chain():
    """TokenizeEmitPartials (one fused UDF) must produce the same posting
    multiset {(term, doc, tf, dl)} and the same ride-along stats row as the
    tokenize_batch ∘ EmitPartials chain on the same batch — the merge
    canonicalizes order, so set equality here implies identical final
    artifacts."""
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts
    from clip_as_service_ray.stages.merge import (
        STATS_PART,
        EmitPartials,
        TokenizeEmitPartials,
        _decode_runs,
    )
    from clip_as_service_ray.stages.tokenize import compute_conv_bases, tokenize_batch

    tbl = synthesize_transcripts(1500, seed=13)
    extents = (
        tbl.select(["conv_id", "turn_idx"])
        .group_by("conv_id")
        .aggregate([("turn_idx", "max")])
        .rename_columns(["conv_id", "max_turn"])
    )
    extents = extents.set_column(
        1, "max_turn", extents.column("max_turn").cast(pa.int64())
    ).sort_by("conv_id")
    cb = compute_conv_bases(extents)
    prep = {"conv_base": cb, "grp_width": 3}
    bucket = 512

    def postings_set(t: pa.Table):
        stats = t.filter(
            pa.compute.equal(t.column("part"), pa.scalar(STATS_PART, pa.int32()))
        )
        t = t.filter(
            pa.compute.not_equal(t.column("part"), pa.scalar(STATS_PART, pa.int32()))
        )
        n = t.column("n").to_numpy().astype(np.int64)
        docs_rel = _decode_runs(t.column("docs"), t.column("doc_w").to_numpy(), np.int64)
        tfs = _decode_runs(t.column("tfs"), t.column("tf_w").to_numpy(), np.int64)
        dls = _decode_runs(t.column("dls"), t.column("dl_w").to_numpy(), np.int64)
        buckets = np.repeat(t.column("bucket").to_numpy().astype(np.int64), n)
        docs = buckets * bucket + docs_rel
        terms = np.repeat(np.asarray(t.column("term").to_pylist(), dtype=object), n)
        stat = (
            (int(stats.column("n")[0].as_py()), int(stats.column("bucket")[0].as_py()))
            if stats.num_rows
            else None
        )
        return sorted(zip(terms, docs, tfs, dls)), stat

    chain = EmitPartials(8, bucket, prep, emit_stats=True)(
        tokenize_batch(tbl, conv_base_ref=prep)
    )
    fused = TokenizeEmitPartials(8, bucket, prep)(tbl)
    chain_posts, chain_stat = postings_set(chain)
    fused_posts, fused_stat = postings_set(fused)
    assert chain_stat == fused_stat and chain_stat is not None
    assert len(chain_posts) == len(fused_posts)
    assert chain_posts == fused_posts
