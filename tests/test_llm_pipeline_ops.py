"""Round-4 LLM-data-pipeline operators (DSIR, SemDeDup, CCNet buckets):
invariant checks beyond the DuckDB hash twins in scripts/check_oracle.py."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_dsir_target_docs_score_higher(ray_session):
    import pyarrow.parquet as pq

    from clip_as_service_ray.pipelines.operators import dsir_importance_weights

    out = dsir_importance_weights(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    m = out.merge(docs, on="doc_id")
    # importance weights must separate the target distribution: mean log-w
    # of lang='en' docs above the rest (that is the whole point of DSIR)
    assert m[m.lang == "en"].log_w.mean() > m[m.lang != "en"].log_w.mean()
    assert (m.n_tokens > 0).all()


def test_semdedup_keeps_lowest_of_each_pair(ray_session):
    from clip_as_service_ray.pipelines.operators import cosine_dup_pairs, semdedup_keep

    out = semdedup_keep(SF).to_pandas().sort_values("vec_id")
    assert len(out) == 500 and out.vec_id.is_unique
    kept = set(out[out.keep].vec_id)
    dropped = set(out[~out.keep].vec_id)
    # every dropped vector has a kept-or-earlier >=0.42 partner in its
    # cluster; spot-check against the exact all-pairs kernel: a pair both
    # sides of which were dropped would need distinct earlier partners
    pairs = cosine_dup_pairs(SF, max_id=10_000, threshold=0.42).to_pandas()
    cluster = dict(zip(out.vec_id, out.cluster))
    in_cluster = pairs[[cluster[a] == cluster[b]
                       for a, b in zip(pairs.vec_a, pairs.vec_b)]]
    # the LOWEST id of every in-cluster dup pair is never dropped by that
    # pair alone; and every dropped id appears as the b-side of some pair
    for b in dropped:
        assert (in_cluster.vec_b == b).any()
    assert dropped, "threshold 0.42 plants real dups in the fixture"
    assert kept | dropped == set(out.vec_id)


def test_ccnet_buckets_balanced(ray_session):
    from clip_as_service_ray.pipelines.operators import ccnet_perplexity_buckets

    t = ccnet_perplexity_buckets(SF).to_pandas().set_index("bucket")
    assert list(t.index) == ["head", "middle", "tail"]
    n = t.n_docs.to_numpy()
    assert abs(int(n.max()) - int(n.min())) <= 1  # terciles balanced
    # head = lowest perplexity stratum
    assert t.loc["head", "avg_nll"] < t.loc["middle", "avg_nll"] < t.loc["tail", "avg_nll"]
