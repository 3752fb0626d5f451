"""Naive Bayes text classification (train distributed + score streaming).

The oracle entry certifies float-exact parity with a DuckDB train+score
twin on the driver corpus; these tests pin the LEARNING behavior on a
planted separable corpus (accuracy must be perfect when class vocabularies
are disjoint) and the held-out split / tie-break contracts.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(path),
    )


@pytest.fixture()
def planted_sf(tmp_path):
    """60 docs, 3 classes with DISJOINT vocabularies: every held-out doc
    (doc_id % 10 == 0) is classifiable with certainty."""
    vocab = {
        "aa": "alpha beta gamma delta epsilon",
        "bb": "zeta eta theta iota kappa",
        "cc": "lam mu nu xi omicron",
    }
    langs = sorted(vocab)
    rows = []
    for i in range(60):
        lang = langs[i % 3]
        words = vocab[lang].split()
        # vary token mixtures deterministically so per-class counts differ
        text = " ".join(words[(i // 3) % 5 :] + words[: (i // 3) % 5] + words)
        rows.append((i, lang, text))
    sf = tmp_path / "sf"
    sf.mkdir()
    _write_docs(sf / "documents.parquet", rows)
    return str(sf)


def test_nb_separable_classes_perfect_accuracy(ray_session, planted_sf):
    from clip_as_service_ray.pipelines.operators import nb_classify_documents

    got = nb_classify_documents(planted_sf).to_pandas().sort_values("doc_id")
    assert len(got) == 6  # doc_id 0,10,20,30,40,50
    langs = ["aa", "bb", "cc"]
    want = {i: langs[i % 3] for i in range(0, 60, 10)}
    assert dict(zip(got["doc_id"], got["pred"])) == want
    # scores are finite rounded log-likelihoods
    assert np.all(np.isfinite(got["score"].to_numpy()))
    assert np.all(got["score"].to_numpy() < 0)


def test_nb_model_statistics(ray_session, planted_sf):
    """The trained sufficient statistics match a direct recount."""
    from clip_as_service_ray.pipelines.operators import nb_train_documents

    model = nb_train_documents(planted_sf)
    assert model["labels"] == ["aa", "bb", "cc"]
    # 54 train docs, 18 per class
    assert model["n_train"] == 54.0
    assert list(model["priors"]) == [18.0, 18.0, 18.0]
    # disjoint 5-word vocabularies -> V = 15
    assert model["v"] == 15.0
    # every train doc holds exactly 10 token occurrences
    assert list(model["ctot"]) == [180.0, 180.0, 180.0]
    # a specific count: "alpha" appears twice in docs where (i//3)%5 == 0..?
    # every aa train doc contains each aa word at least once and words
    # rotate — total occurrences of each aa word across 18 docs is 36
    keys = np.asarray(["aa\x1falpha", "bb\x1fzeta", "cc\x1flam"], dtype=object)
    assert list(model["counts_map"].lookup(keys)) == [36.0, 36.0, 36.0]
    # cross-class counts are zero (disjoint vocabularies)
    assert model["counts_map"].lookup(
        np.asarray(["aa\x1fzeta"], dtype=object)
    )[0] == 0.0


def test_nb_oov_and_empty_docs_dropped(ray_session, tmp_path):
    """Held-out docs whose tokens are ALL out-of-vocabulary are dropped
    (match the SQL twin's semantics); OOV tokens inside a mixed doc do not
    affect the score."""
    rows = [
        # train: two classes, disjoint vocab
        (1, "en", "apple banana apple"),
        (2, "en", "banana apple banana"),
        (3, "fr", "pomme banane pomme"),
        (4, "fr", "banane pomme banane"),
        # held out
        (10, "en", "apple apple qqqq"),  # qqqq is OOV -> ignored
        (20, "fr", "zzzz wwww"),  # all OOV -> dropped
        (30, "en", "pomme pomme"),  # fr vocabulary -> predicted fr
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    _write_docs(sf / "documents.parquet", rows)
    from clip_as_service_ray.pipelines.operators import nb_classify_documents

    got = (
        nb_classify_documents(str(sf))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [10, 30]
    assert got["pred"].tolist() == ["en", "fr"]

    # doc 10's score must equal the same doc without the OOV token
    rows2 = [r for r in rows if r[0] != 10] + [(10, "en", "apple apple")]
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    _write_docs(sf2 / "documents.parquet", rows2)
    got2 = (
        nb_classify_documents(str(sf2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    s1 = got.loc[got["doc_id"] == 10, "score"].iloc[0]
    s2 = got2.loc[got2["doc_id"] == 10, "score"].iloc[0]
    assert s1 == s2
