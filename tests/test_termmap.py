"""SortedArrayMap / BlockRowsMap — the compact per-actor vocabulary
structures replacing Python dicts in IndexReader / PositionsReader
(round-3 verdict item 4: a 10^7-10^8-term vocab as a dict is GBs/actor)."""

import time

import numpy as np

from clip_as_service_ray.state.termmap import BlockRowsMap, SortedArrayMap


def _mk(n):
    keys = np.asarray([f"term{i:07d}" for i in range(n)], dtype=object)
    vals = np.arange(n, dtype=np.int64) * 3 + 1
    return keys, vals


def test_sorted_array_map_matches_dict():
    keys, vals = _mk(1000)
    m = SortedArrayMap(keys, vals)
    d = dict(zip(keys, vals))
    for probe in ["term0000000", "term0000500", "term0000999", "absent", "zzz", ""]:
        assert m.get(probe) == d.get(probe)
        assert (probe in m) == (probe in d)
    assert len(m) == len(d)
    assert list(m) == list(d)
    assert m["term0000007"] == d["term0000007"]
    try:
        m["absent"]
        assert False, "KeyError expected"
    except KeyError:
        pass


def test_block_rows_map_matches_dict_of_arrays():
    # 100 terms, variable run lengths, exactly the reader's CSR layout
    rng = np.random.RandomState(7)
    terms = np.asarray([f"t{i:03d}" for i in range(100)], dtype=object)
    lens = rng.randint(1, 6, size=100)
    ends = np.cumsum(lens)
    starts = np.concatenate([[0], ends[:-1]])
    order = rng.permutation(int(ends[-1])).astype(np.int64)
    m = BlockRowsMap(terms, starts, ends, order)
    d = {t: order[s:e] for t, s, e in zip(terms, starts, ends)}
    for t in ["t000", "t050", "t099"]:
        assert np.array_equal(m[t], d[t])
        assert np.array_equal(m.get(t), d[t])
    assert m.get("absent") is None
    assert "t042" in m and "absent" not in m
    assert sorted(m) == sorted(d)
    e = BlockRowsMap.empty()
    assert len(e) == 0 and e.get("x") is None


def test_million_term_vocab_init_is_cheap():
    # the verdict's scale probe: constructing the maps at a 10^6-term
    # vocabulary is array slicing only — no per-entry Python work. (The
    # old dict build at this size allocates 10^6 boxed entries.)
    keys, vals = _mk(1_000_000)
    t0 = time.time()
    m = SortedArrayMap(keys, vals)
    order = np.arange(len(keys), dtype=np.int64)
    b = BlockRowsMap(keys, order, order + 1, order)
    build_s = time.time() - t0
    assert build_s < 1.0, f"map construction did per-entry work? {build_s:.2f}s"
    assert m.get("term0999999") == vals[-1]
    assert np.array_equal(b["term0500000"], np.array([500000]))
    # lookups stay O(log n): 2k probes in well under a second
    t0 = time.time()
    for i in range(0, 1_000_000, 500):
        assert m.get(f"term{i:07d}") == vals[i]
    assert time.time() - t0 < 1.0
