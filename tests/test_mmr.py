"""MMR diversified ANN re-rank: engine output vs an independent
brute-force greedy over the raw embeddings table."""

import os

import numpy as np
import pyarrow.parquet as pq

SF = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _brute_mmr(sf_dir: str, k: int, pool: int, lam: float):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = emb[vec_ids.tolist().index(0)]
    q = q / np.linalg.norm(q)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / np.where(norms == 0, 1.0, norms)[:, None]
    sims = unit @ q
    order = np.lexsort((vec_ids, -sims))[:pool]
    sims, vec_ids, unit = sims[order], vec_ids[order], unit[order]
    picked: list[int] = []
    for _ in range(min(k, len(vec_ids))):
        best, best_key = None, None
        for i in range(len(vec_ids)):
            if i in picked:
                continue
            pen = max((float(unit[i] @ unit[j]) for j in picked), default=0.0)
            mmr = lam * sims[i] - ((1.0 - lam) * pen if picked else 0.0)
            key = (-mmr, vec_ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        picked.append(best)
    idx = np.asarray(picked)
    return vec_ids[idx], np.round(sims[idx], 6)


def test_mmr_matches_bruteforce(ray_session):
    from clip_as_service_ray.pipelines.operators import ann_topk, ann_topk_mmr

    got = ann_topk_mmr(SF, k=8, pool=40, lam=0.7)
    want_ids, want_sims = _brute_mmr(SF, 8, 40, 0.7)
    assert got.column("vec_id").to_pylist() == want_ids.tolist()
    np.testing.assert_array_equal(got.column("sim").to_numpy(), want_sims)
    # first pick is the plain cosine top-1
    top1 = ann_topk(SF, k=1).column("vec_id").to_pylist()[0]
    assert got.column("vec_id").to_pylist()[0] == top1
    # diversity: lam=0 ignores relevance after the first pick; picks differ
    # from the plain top-k order for some rank (the corpus has near-dups)
    plain = ann_topk(SF, k=8).column("vec_id").to_pylist()
    diverse = ann_topk_mmr(SF, k=8, pool=40, lam=0.3).column("vec_id").to_pylist()
    assert plain[0] == diverse[0]
    assert plain != diverse
