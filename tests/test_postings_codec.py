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
